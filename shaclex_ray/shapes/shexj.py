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
        "shapes": shapes,
        "te_refs": te_refs,
        "imports": doc.get("imports", []),
    }


def load_shexj_file(path: str, _seen: set | None = None) -> dict:
    """Load a ShExJ file, resolving ``imports`` relative to the file path."""
    seen = _seen if _seen is not None else set()
    path = os.path.abspath(path)
    if path in seen:
        return {"start": None, "shapes": {}, "te_refs": {}, "imports": []}
    seen.add(path)
    schema = load_shexj(json.load(open(path)))
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
