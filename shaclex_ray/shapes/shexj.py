"""ShExJ (JSON AST) schema loader.

The normalized in-engine schema IR *is* a ShExJ-shaped dict (the reference's
schema AST — ShapeExpr/TripleExpr sum types enumerated at
weso/shaclex modules/converter/src/main/scala/es/weso/shex/converter/ShEx2Shacl.scala:166-180 —
maps 1:1 onto ShExJ node types):

    {"start": shapeExpr|ref|None,
     "shapes": {label: shapeExpr},          # refs are plain label strings
     "te_refs": {label: tripleExpr}}        # triple-expression "id" targets

ShExJ is JSON-native, so the compiled schema broadcasts to Ray workers
verbatim (SURVEY.md A1: schema compiled once per actor in __init__).
"""

from __future__ import annotations

import json
import os
from urllib.parse import urljoin


def load_shexj(doc: dict | str) -> dict:
    """Normalize a ShExJ document into the engine schema IR."""
    if isinstance(doc, str):
        doc = json.loads(doc)
    if doc.get("type") != "Schema":
        raise ValueError("not a ShExJ Schema")
    shapes: dict[str, dict] = {}
    te_refs: dict[str, dict] = {}

    def index_te(te):
        if isinstance(te, dict):
            if "id" in te:
                te_refs[te["id"]] = te
            for k in ("expressions",):
                for sub in te.get(k, []) or []:
                    index_te(sub)
            if "valueExpr" in te and isinstance(te["valueExpr"], dict):
                index_se(te["valueExpr"])

    def index_se(se):
        if isinstance(se, dict):
            if "id" in se:
                shapes[se["id"]] = se
            for k in ("shapeExprs",):
                for sub in se.get(k, []) or []:
                    index_se(sub)
            if "shapeExpr" in se and isinstance(se["shapeExpr"], dict):
                index_se(se["shapeExpr"])
            if "expression" in se and isinstance(se["expression"], dict):
                index_te(se["expression"])

    for se in doc.get("shapes", []) or []:
        index_se(se)
    start = doc.get("start")
    if isinstance(start, dict):
        index_se(start)
    return {
        "start": start,
        "startActs": doc.get("startActs"),
        "shapes": shapes,
        "te_refs": te_refs,
        "imports": doc.get("imports", []),
    }


def _resolve_iris(schema: dict, base: str) -> dict:
    """Resolve relative IRIs in a normalized schema against the schema
    document's canonical IRI (the reference resolves them the same way
    during parse — ResolvedSchema.resolve, ShExWrapper.scala:42). Bnode
    labels ('_:…') are never touched; absolute IRIs are unchanged by
    urljoin."""

    def riri(v: str) -> str:
        if not isinstance(v, str) or v.startswith("_:"):
            return v
        return urljoin(base, v)

    def walk_se(se):
        if isinstance(se, dict):
            if "id" in se:
                se["id"] = riri(se["id"])
            if isinstance(se.get("shapeExpr"), str):
                se["shapeExpr"] = riri(se["shapeExpr"])
            elif isinstance(se.get("shapeExpr"), dict):
                walk_se(se["shapeExpr"])
            if se.get("shapeExprs"):
                se["shapeExprs"] = [
                    riri(s) if isinstance(s, str) else walk_se(s)
                    for s in se["shapeExprs"]
                ]
            if "datatype" in se:
                se["datatype"] = riri(se["datatype"])
            if "values" in se and se["values"] is not None:
                se["values"] = [
                    riri(v)
                    if isinstance(v, str)
                    else (
                        {**v, "stem": riri(v["stem"])}
                        if isinstance(v, dict)
                        and isinstance(v.get("stem"), str)
                        and v.get("type") in ("IriStem", "IriStemRange")
                        else v
                    )
                    for v in se["values"]
                ]
            if se.get("expression") is not None:
                if isinstance(se["expression"], str):
                    se["expression"] = riri(se["expression"])
                else:
                    walk_te(se["expression"])
        return se

    def walk_te(te):
        if isinstance(te, dict):
            if "id" in te:
                te["id"] = riri(te["id"])
            if "predicate" in te:
                te["predicate"] = riri(te["predicate"])
            for i, sub in enumerate(te.get("expressions", []) or []):
                if isinstance(sub, str):
                    te["expressions"][i] = riri(sub)
                else:
                    walk_te(sub)
            ve = te.get("valueExpr")
            if isinstance(ve, str):
                te["valueExpr"] = riri(ve)
            elif isinstance(ve, dict):
                walk_se(ve)
        return te

    schema["shapes"] = {riri(lbl): walk_se(se) for lbl, se in schema["shapes"].items()}
    schema["te_refs"] = {riri(lbl): walk_te(te) for lbl, te in schema["te_refs"].items()}
    if isinstance(schema.get("start"), str):
        schema["start"] = riri(schema["start"])
    elif isinstance(schema.get("start"), dict):
        walk_se(schema["start"])
    return schema


def load_shexj_file(path: str, _seen: set | None = None, base: str | None = None) -> dict:
    """Load a ShExJ file, resolving ``imports`` relative to the file path
    and (when ``base`` is given) relative IRIs against the schema's
    canonical IRI."""
    seen = _seen if _seen is not None else set()
    path = os.path.abspath(path)
    if path in seen:
        return {"start": None, "shapes": {}, "te_refs": {}, "imports": []}
    seen.add(path)
    schema = load_shexj(json.load(open(path)))
    if base:
        _resolve_iris(schema, base)
    for imp in schema.get("imports", []):
        # import IRI may be relative to the schema document location
        rel = urljoin("file://" + path, imp)
        ipath = rel[len("file://") :] if rel.startswith("file://") else rel
        if not os.path.splitext(ipath)[1]:
            ipath += ".json"
        elif ipath.endswith(".shex"):
            ipath = ipath[: -len(".shex")] + ".json"
        if os.path.exists(ipath):
            sub = load_shexj_file(ipath, seen)
            for lbl, se in sub["shapes"].items():
                schema["shapes"].setdefault(lbl, se)
            for lbl, te in sub["te_refs"].items():
                schema["te_refs"].setdefault(lbl, te)
            if schema["start"] is None:
                schema["start"] = sub["start"]
    return schema
