"""Schema writers (SURVEY.md S10): render the engine schema IR back to
ShExC text (the reference's --outSchemaFile path, Main.scala:162-174 /
ShExSchema.scala:179-191), plus a compact JSON (ShExJ) writer."""

from __future__ import annotations

import json

from shaclex_ray.terms import XSD

_KIND_KW = {"iri": "IRI", "bnode": "BNODE", "literal": "LITERAL", "nonliteral": "NONLITERAL"}


def _iri(i: str) -> str:
    if i == "http://www.w3.org/1999/02/22-rdf-syntax-ns#type":
        return "a"
    if i.startswith(XSD):
        return "xsd:" + i[len(XSD):]
    return f"<{i}>"


def _card(te: dict) -> str:
    mn, mx = te.get("min", 1), te.get("max", 1)
    if (mn, mx) == (1, 1):
        return ""
    if (mn, mx) == (0, 1):
        return " ?"
    if (mn, mx) == (0, -1):
        return " *"
    if (mn, mx) == (1, -1):
        return " +"
    if mx == -1:
        return f" {{{mn},}}"
    return f" {{{mn},{mx}}}"


def _value(v) -> str:
    if isinstance(v, str):
        return _iri(v)
    t = v.get("type")
    if t == "IriStem":
        return _iri(v["stem"]) + "~"
    if t == "Language":
        return "@" + v["languageTag"]
    if t == "LanguageStem":
        return "@" + v["stem"] + "~"
    if "value" in v:
        lex = v["value"].replace('"', '\\"')
        if v.get("language"):
            return f'"{lex}"@{v["language"]}'
        if v.get("type") and v["type"] != XSD + "string":
            return f'"{lex}"^^{_iri(v["type"])}'
        return f'"{lex}"'
    return json.dumps(v)


def _node_constraint(nc: dict) -> str:
    parts = []
    if "nodeKind" in nc:
        parts.append(_KIND_KW[nc["nodeKind"]])
    if "datatype" in nc:
        parts.append(_iri(nc["datatype"]))
    if "values" in nc:
        parts.append("[ " + " ".join(_value(v) for v in nc["values"]) + " ]")
    for f in ("length", "minlength", "maxlength", "totaldigits", "fractiondigits",
              "mininclusive", "minexclusive", "maxinclusive", "maxexclusive"):
        if f in nc:
            parts.append(f"{f.upper()} {nc[f]}")
    if "pattern" in nc:
        parts.append("/" + nc["pattern"].replace("/", "\\/") + "/" + nc.get("flags", ""))
    return " ".join(parts) if parts else "."


def _shape_expr(se, indent: str = "  ") -> str:
    if isinstance(se, str):
        return "@" + _iri(se) if not se.startswith("_:") else "@" + se
    t = se.get("type")
    if t == "NodeConstraint":
        return _node_constraint(se)
    if t == "ShapeAnd":
        return " AND ".join(_shape_expr(s, indent) for s in se["shapeExprs"])
    if t == "ShapeOr":
        return " OR ".join(_shape_expr(s, indent) for s in se["shapeExprs"])
    if t == "ShapeNot":
        return "NOT " + _shape_expr(se["shapeExpr"], indent)
    if t == "ShapeExternal":
        return "EXTERNAL"
    if t == "Shape":
        head = ""
        if se.get("extra"):
            head += "EXTRA " + " ".join(_iri(p) for p in se["extra"]) + " "
        if se.get("closed"):
            head += "CLOSED "
        expr = se.get("expression")
        if expr is None:
            return head + "{ }"
        return head + "{\n" + indent + _triple_expr(expr, indent) + "\n}"
    raise ValueError(f"cannot render {t}")


def _triple_expr(te, indent: str) -> str:
    if isinstance(te, str):
        return "&" + _iri(te)
    t = te.get("type")
    if t == "TripleConstraint":
        inv = "^" if te.get("inverse") else ""
        v = te.get("valueExpr")
        vs = _shape_expr(v, indent) if v is not None else "."
        ann = ""
        for a in te.get("annotations", []) or []:
            obj = a.get("object")
            lit = obj.get("value", "") if isinstance(obj, dict) else str(obj)
            ann += f" // {_iri(a['predicate'])} {json.dumps(lit)}"
        return f"{inv}{_iri(te['predicate'])} {vs}{_card(te)}{ann}"
    if t == "EachOf":
        body = (" ;\n" + indent).join(_triple_expr(e, indent) for e in te["expressions"])
        if te.get("min", 1) != 1 or te.get("max", 1) != 1:
            return "(" + body + ")" + _card(te)
        return body
    if t == "OneOf":
        body = " | ".join(_triple_expr(e, indent) for e in te["expressions"])
        return "(" + body + ")" + _card(te)
    raise ValueError(f"cannot render tripleExpr {t}")


def render_shexc(schema: dict) -> str:
    """Engine schema IR -> ShExC text (round-trips through parse_shexc)."""
    out = ["prefix xsd: <http://www.w3.org/2001/XMLSchema#>", ""]
    if schema.get("start") is not None:
        out.append("start = " + _shape_expr(schema["start"]))
    for lbl in sorted(schema.get("shapes", {})):
        se = schema["shapes"][lbl]
        label = lbl if lbl.startswith("_:") else f"<{lbl}>"
        out.append(f"{label} " + _shape_expr(se))
        out.append("")
    return "\n".join(out)
