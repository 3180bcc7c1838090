"""Schema-to-schema converters (SURVEY.md C1/C2/C3).

Driver-side transforms between the ShEx IR and the SHACL IR, covering the
*flat* shape fragment the reference converts
(weso/shaclex modules/converter/src/main/scala/es/weso/shex/converter/
ShEx2Shacl.scala:17-493 — its FlatShapeConversion likewise rejects OneOf /
inclusions / groupings, FlatShapeConversion.scala:39-87; and
modules/converter/src/main/scala/es/weso/shacl/converter/Shacl2ShEx.scala:17-383,
targets → query shapemap per :46-70).
"""

from __future__ import annotations

from shaclex_ray.terms import SH, XSD


class ConversionError(ValueError):
    pass


def _parse_bound(lex: str):
    """Numeric facet bound from its lexical form (exponent/INF forms
    included); unparseable bounds raise ConversionError, never bare
    ValueError."""
    try:
        return int(lex)
    except ValueError:
        try:
            return float(lex)
        except ValueError:
            raise ConversionError(f"non-numeric facet bound {lex!r}") from None


# ---------------------------------------------------------------------------
# ShEx -> SHACL (C1)

_NC_TO_COMPONENT = {
    "iri": SH + "IRI",
    "bnode": SH + "BlankNode",
    "literal": SH + "Literal",
    "nonliteral": SH + "BlankNodeOrIRI",
}


def _nc_components(nc: dict) -> list:
    comps = []
    if "nodeKind" in nc:
        comps.append(("nodeKind", {"iri": _NC_TO_COMPONENT[nc["nodeKind"]]}))
    if "datatype" in nc:
        comps.append(("datatype", {"iri": nc["datatype"]}))
    if "pattern" in nc:
        comps.append(("pattern", {"pattern": nc["pattern"], "flags": nc.get("flags", "")}))
    if "minlength" in nc:
        comps.append(("minLength", {"n": nc["minlength"]}))
    if "maxlength" in nc:
        comps.append(("maxLength", {"n": nc["maxlength"]}))
    if "length" in nc:
        comps.append(("minLength", {"n": nc["length"]}))
        comps.append(("maxLength", {"n": nc["length"]}))
    for facet, comp in (
        ("mininclusive", "minInclusive"),
        ("minexclusive", "minExclusive"),
        ("maxinclusive", "maxInclusive"),
        ("maxexclusive", "maxExclusive"),
    ):
        if facet in nc:
            v = nc[facet]
            dt = XSD + ("integer" if isinstance(v, int) else "decimal")
            comps.append((comp, {"value": (str(v), dt)}))
    if "values" in nc:
        keys = []
        for v in nc["values"]:
            if isinstance(v, str):
                keys.append("I" + v)
            elif "value" in v:
                lang = v.get("language", "")
                dt = v.get("type", XSD + "string")
                if lang:
                    dt = "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString"
                keys.append("L" + v["value"] + "\x1f" + dt + "\x1f" + lang)
            else:
                raise ConversionError(f"value-set item not convertible: {v}")
        comps.append(("in", {"values": keys}))
    return comps


def shex_to_shacl(schema: dict) -> dict:
    """Flat ShEx schema IR -> compiled SHACL IR (shapes keyed like
    shapes/shacl.compile_shacl output)."""
    shapes: dict[str, dict] = {}

    def conv_shape(label: str, se) -> str:
        key = "I" + label if not label.startswith("_:") else "B" + label[2:]
        if key in shapes:
            return key
        shapes[key] = None
        base = {
            "id": key,
            "targets": [],
            "implicit_class": False,
            "path": None,
            "components": [],
            "properties": [],
            "closed": False,
            "ignored": [],
            "deactivated": False,
            "severity": SH + "Violation",
            "messages": [],
        }
        if isinstance(se, str):
            base["components"].append(("node", {"shape": conv_shape(se, schema["shapes"][se])}))
            shapes[key] = base
            return key
        t = se.get("type")
        if t == "NodeConstraint":
            base["components"] = _nc_components(se)
        elif t == "ShapeAnd":
            for i, sub in enumerate(se["shapeExprs"]):
                if isinstance(sub, dict) and sub.get("type") == "NodeConstraint":
                    base["components"].extend(_nc_components(sub))
                else:
                    sub_label = f"{label}/and{i}"
                    base["components"].append(
                        ("node", {"shape": conv_shape(sub_label, sub)})
                    )
        elif t == "Shape":
            expr = se.get("expression")
            tcs = []
            if expr is not None:
                et = expr.get("type") if isinstance(expr, dict) else None
                if et == "TripleConstraint":
                    tcs = [expr]
                elif et == "EachOf":
                    for sub in expr["expressions"]:
                        if not (isinstance(sub, dict) and sub.get("type") == "TripleConstraint"):
                            raise ConversionError("only flat EachOf of TripleConstraints converts")
                        tcs.append(sub)
                else:
                    raise ConversionError(f"non-flat tripleExpr {et} does not convert")
            if se.get("closed"):
                base["closed"] = True
                base["ignored"] = list(se.get("extra", []))
            for i, tc in enumerate(tcs):
                if tc.get("inverse"):
                    raise ConversionError("inverse constraints do not convert")
                pkey = f"{key}/prop{i}"
                pshape = {
                    "id": pkey,
                    "targets": [],
                    "implicit_class": False,
                    "path": {"pred": tc["predicate"]},
                    "components": [],
                    "properties": [],
                    "closed": False,
                    "ignored": [],
                    "deactivated": False,
                    "severity": SH + "Violation",
                    "messages": [],
                }
                mn, mx = tc.get("min", 1), tc.get("max", 1)
                if mn > 0:
                    pshape["components"].append(("minCount", {"n": mn}))
                if mx != -1:
                    pshape["components"].append(("maxCount", {"n": mx}))
                ve = tc.get("valueExpr")
                if isinstance(ve, dict) and ve.get("type") == "NodeConstraint":
                    pshape["components"].extend(_nc_components(ve))
                elif isinstance(ve, str):
                    pshape["components"].append(
                        ("node", {"shape": conv_shape(ve, schema["shapes"][ve])})
                    )
                elif ve is not None:
                    raise ConversionError("nested shape valueExpr does not convert flat")
                shapes[pkey] = pshape
                base["properties"].append(pkey)
        else:
            raise ConversionError(f"shapeExpr {t} does not convert")
        shapes[key] = base
        return key

    for label, se in sorted(schema["shapes"].items()):
        conv_shape(label, se)
    return {"shapes": shapes, "with_targets": []}


# ---------------------------------------------------------------------------
# SHACL -> ShEx (C2)

_COMPONENT_TO_NC = {v: k for k, v in _NC_TO_COMPONENT.items()}


def _register_logical(out_shapes: dict, parent: str, kind: str, refs: list[str]) -> str:
    """Register a synthetic ShapeOr/ShapeNot combination shape and return
    its label (sh:or / sh:not at node-shape level)."""
    label = f"_:{kind.lower()}-{parent}-{len(out_shapes)}"
    if kind == "ShapeNot":
        out_shapes[label] = {"type": "ShapeNot", "id": label, "shapeExpr": refs[0]}
    else:
        out_shapes[label] = {"type": kind, "id": label, "shapeExprs": list(refs)}
    return label


def shacl_to_shex(schema: dict) -> tuple[dict, list[str]]:
    """Compiled SHACL IR -> (ShEx schema IR, query shapemap selectors).

    Targets become shapemap selectors (reference: targetClass c →
    '{FOCUS rdf:type/rdfs:subClassOf* c}', Shacl2ShEx.scala:61-70; we emit
    the direct-type pattern, matching our distributed target resolution)."""
    out_shapes: dict[str, dict] = {}
    selectors: list[str] = []

    def label_of(key: str) -> str:
        return key[1:] if key.startswith("I") else "_:" + key[1:]

    def class_shape_ref(cls_key: str) -> str:
        """Synthetic shape encoding ``sh:class c`` as a ShEx direct-type
        check (reference emits the rdf:type/subClassOf* query pattern,
        Shacl2ShEx.scala:61-70; we emit the direct-type shape matching our
        target resolution): ``{ a [c] +  // EXTRA a }``."""
        cls = cls_key[1:] if cls_key.startswith("I") else cls_key
        label = f"_:class-{cls}"
        if label not in out_shapes:
            out_shapes[label] = {
                "type": "Shape",
                "id": label,
                "extra": ["http://www.w3.org/1999/02/22-rdf-syntax-ns#type"],
                "expression": {
                    "type": "TripleConstraint",
                    "predicate": "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
                    "valueExpr": {"type": "NodeConstraint", "values": [cls]},
                    "min": 1,
                    "max": -1,
                },
            }
        return label

    def conv(key: str) -> str:
        label = label_of(key)
        if label in out_shapes:
            return label
        sh = schema["shapes"][key]
        out_shapes[label] = {"type": "Shape", "id": label}
        node_refs: list[str] = []  # node-level sh:node / sh:class conjuncts
        nc: dict = {"type": "NodeConstraint"}
        for kind, params in sh["components"]:
            if kind == "nodeKind":
                nc["nodeKind"] = _COMPONENT_TO_NC.get(params["iri"], "nonliteral")
            elif kind == "datatype":
                nc["datatype"] = params["iri"]
            elif kind == "pattern":
                nc["pattern"] = params["pattern"]
                if params.get("flags"):
                    nc["flags"] = params["flags"]
            elif kind == "minLength":
                nc["minlength"] = params["n"]
            elif kind == "maxLength":
                nc["maxlength"] = params["n"]
            elif kind in ("minInclusive", "minExclusive", "maxInclusive", "maxExclusive"):
                nc[kind.lower()] = _parse_bound(params["value"][0])
            elif kind == "in":
                values = []
                for vk in params["values"]:
                    if vk.startswith("I"):
                        values.append(vk[1:])
                    elif vk.startswith("L"):
                        lex, dt, lang = vk[1:].split("\x1f")
                        v = {"value": lex}
                        if lang:
                            v["language"] = lang
                        elif dt and dt != XSD + "string":
                            v["type"] = dt
                        values.append(v)
                nc["values"] = values
            elif kind == "node":
                node_refs.append(conv(params["shape"]))
            elif kind == "class":
                node_refs.append(class_shape_ref(params["cls"]))
            elif kind == "hasValue":
                # node-level hasValue: the focus itself must equal the value
                vk = params["value"]
                if vk.startswith("I"):
                    nc["values"] = [vk[1:]]
                else:
                    lex, dt, lang = vk[1:].split("\x1f")
                    v = {"value": lex}
                    if lang:
                        v["language"] = lang
                    elif dt and dt != XSD + "string":
                        v["type"] = dt
                    nc["values"] = [v]
            elif kind in ("and", "or", "not"):
                refs = (
                    [conv(s) for s in params["shapes"]]
                    if kind != "not"
                    else [conv(params["shape"])]
                )
                if kind == "and":
                    node_refs.extend(refs)
                elif kind == "or":
                    node_refs.append(
                        _register_logical(out_shapes, label, "ShapeOr", refs)
                    )
                else:
                    node_refs.append(
                        _register_logical(out_shapes, label, "ShapeNot", refs)
                    )
            else:
                raise ConversionError(
                    f"SHACL component {kind!r} does not convert to ShEx"
                )
        exprs = []
        for pk in sh["properties"]:
            psh = schema["shapes"][pk]
            if not (psh and psh["path"] and "pred" in psh["path"]):
                continue
            tc = {"type": "TripleConstraint", "predicate": psh["path"]["pred"]}
            mn, mx = 0, -1
            pnc = {"type": "NodeConstraint"}
            refs: list[str] = []
            for kind, params in psh["components"]:
                if kind == "minCount":
                    mn = params["n"]
                elif kind == "maxCount":
                    mx = params["n"]
                elif kind == "datatype":
                    pnc["datatype"] = params["iri"]
                elif kind == "nodeKind":
                    pnc["nodeKind"] = _COMPONENT_TO_NC.get(params["iri"], "nonliteral")
                elif kind == "pattern":
                    pnc["pattern"] = params["pattern"]
                    if params.get("flags"):
                        pnc["flags"] = params["flags"]
                elif kind == "minLength":
                    pnc["minlength"] = params["n"]
                elif kind == "maxLength":
                    pnc["maxlength"] = params["n"]
                elif kind in (
                    "minInclusive",
                    "minExclusive",
                    "maxInclusive",
                    "maxExclusive",
                ):
                    pnc[kind.lower()] = _parse_bound(params["value"][0])
                elif kind == "in":
                    values = []
                    for vk in params["values"]:
                        if vk.startswith("I"):
                            values.append(vk[1:])
                        else:
                            lex, dt, lang = vk[1:].split("\x1f")
                            v = {"value": lex}
                            if lang:
                                v["language"] = lang
                            elif dt and dt != XSD + "string":
                                v["type"] = dt
                            values.append(v)
                    pnc["values"] = values
                elif kind == "node":
                    refs.append(conv(params["shape"]))
                elif kind == "class":
                    refs.append(class_shape_ref(params["cls"]))
                else:
                    raise ConversionError(
                        f"SHACL property component {kind!r} does not convert to ShEx"
                    )
            tc["min"], tc["max"] = mn, mx
            parts: list = ([pnc] if len(pnc) > 1 else []) + refs
            if len(parts) > 1:
                tc["valueExpr"] = {"type": "ShapeAnd", "shapeExprs": parts}
            elif parts:
                tc["valueExpr"] = parts[0]
            exprs.append(tc)
        shape: dict = {"type": "Shape", "id": label}
        if sh["closed"]:
            shape["closed"] = True
            shape["extra"] = list(sh["ignored"])
        if len(exprs) == 1:
            shape["expression"] = exprs[0]
        elif exprs:
            shape["expression"] = {"type": "EachOf", "expressions": exprs}
        # conjoin node constraint + node-level sh:node/sh:class refs
        # (reference wraps in a conjunction rather than dropping them)
        conjuncts: list = []
        if len(nc) > 1:
            conjuncts.append(nc)
        conjuncts.extend(node_refs)
        if conjuncts:
            shape = {
                "type": "ShapeAnd",
                "id": label,
                "shapeExprs": conjuncts
                + [{k: v for k, v in shape.items() if k != "id"}],
            }
        out_shapes[label] = shape

        for kind, val in sh["targets"]:
            if kind == "node":
                node = val[1:] if val.startswith("I") else val
                selectors.append(f"<{node}>@<{label}>")
            elif kind == "class":
                cls = val[1:] if val.startswith("I") else val
                selectors.append(
                    "{FOCUS <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> <"
                    + cls
                    + ">}@<"
                    + label
                    + ">"
                )
            elif kind == "subjectsOf":
                selectors.append("{FOCUS <" + val + "> _}@<" + label + ">")
            elif kind == "objectsOf":
                selectors.append("{_ <" + val + "> FOCUS}@<" + label + ">")
        return label

    for key in sorted(schema["shapes"]):
        sh = schema["shapes"][key]
        # property shapes (path != None) convert inline as TripleConstraints
        # of their parent — not as standalone node shapes
        if sh is not None and sh.get("path") is None:
            conv(key)
    return (
        {"start": None, "shapes": out_shapes, "te_refs": {}, "imports": []},
        selectors,
    )


# ---------------------------------------------------------------------------
# linter (C3/G7): shape-usage counts + inline single-use bnode shapes

def count_usages(schema: dict) -> dict[str, int]:
    counts: dict[str, int] = {lbl: 0 for lbl in schema["shapes"]}

    def walk_se(se):
        if isinstance(se, str):
            if se in counts:
                counts[se] += 1
            return
        if not isinstance(se, dict):
            return
        for sub in se.get("shapeExprs", []) or []:
            walk_se(sub)
        if isinstance(se.get("shapeExpr"), dict) or isinstance(se.get("shapeExpr"), str):
            walk_se(se["shapeExpr"])
        if se.get("expression") is not None:
            walk_te(se["expression"])

    def walk_te(te):
        if isinstance(te, str):
            return
        for sub in te.get("expressions", []) or []:
            walk_te(sub)
        if te.get("valueExpr") is not None:
            walk_se(te["valueExpr"])

    for se in schema["shapes"].values():
        walk_se(se) if isinstance(se, str) else None
        if isinstance(se, dict):
            walk_se(se)
    return counts


def lint_inline_single_use(schema: dict) -> dict:
    """Inline bnode-labeled shapes referenced exactly once
    (reference ShExLinter.scala:9-74)."""
    import copy

    schema = copy.deepcopy(schema)
    counts = count_usages(schema)
    inlinable = {
        lbl
        for lbl, n in counts.items()
        if lbl.startswith("_:") and n == 1
    }

    def sub_se(se):
        if isinstance(se, str):
            if se in inlinable:
                target = schema["shapes"].pop(se)
                if isinstance(target, dict):
                    target = dict(target)
                    target.pop("id", None)
                return sub_se(target)
            return se
        if not isinstance(se, dict):
            return se
        if "shapeExprs" in se:
            se["shapeExprs"] = [sub_se(s) for s in se["shapeExprs"]]
        if "shapeExpr" in se:
            se["shapeExpr"] = sub_se(se["shapeExpr"])
        if se.get("expression") is not None:
            se["expression"] = sub_te(se["expression"])
        return se

    def sub_te(te):
        if isinstance(te, str):
            return te
        if "expressions" in te:
            te["expressions"] = [sub_te(t) for t in te["expressions"]]
        if te.get("valueExpr") is not None:
            te["valueExpr"] = sub_se(te["valueExpr"])
        return te

    for lbl in list(schema["shapes"]):
        if lbl in schema["shapes"] and lbl not in inlinable:
            schema["shapes"][lbl] = sub_se(schema["shapes"][lbl])
    return schema


# ---------------------------------------------------------------------------
# ShEx -> JSON Schema (C6)
#
# The reference DECLARES this converter but leaves it unimplemented
# (modules/converter/src/main/scala/es/weso/shex/converter/
# ShEx2JsonSchema.scala:11-15 is a bare `???`); there is no behavior to
# match, so we define the natural mapping over the same flat fragment
# FlatShapeConversion accepts (see shex_to_shacl above):
#
#   shape label            -> $defs entry (local-name key, IRI on collision)
#   Shape + TripleConstraints -> {"type":"object", properties, required};
#     card (0..1/1..1)     -> plain property (+required when min>=1)
#     card (max>1 or *)    -> {"type":"array","items":...,min/maxItems}
#     CLOSED               -> additionalProperties: false (EXTRA preds stay
#                             allowed via their own property entries)
#   NodeConstraint         -> scalar schema (datatype -> JSON type/format,
#     string/numeric facets -> pattern/minLength/minimum/... , value sets
#     -> enum); non-JSON-native datatypes keep an `x-rdf-datatype` marker
#   @ref                   -> {"$ref": "#/$defs/<key>"}
#   ShapeAnd/Or/Not        -> allOf / anyOf / not
#   start                  -> top-level $ref

_DT_TO_JSON = {
    XSD + "string": {"type": "string"},
    XSD + "boolean": {"type": "boolean"},
    XSD + "decimal": {"type": "number"},
    XSD + "double": {"type": "number"},
    XSD + "float": {"type": "number"},
    XSD + "date": {"type": "string", "format": "date"},
    XSD + "dateTime": {"type": "string", "format": "date-time"},
    XSD + "time": {"type": "string", "format": "time"},
    XSD + "anyURI": {"type": "string", "format": "uri"},
}
for _it in (
    "integer", "long", "int", "short", "byte", "nonNegativeInteger",
    "nonPositiveInteger", "negativeInteger", "positiveInteger",
    "unsignedLong", "unsignedInt", "unsignedShort", "unsignedByte",
):
    _DT_TO_JSON[XSD + _it] = {"type": "integer"}


def _local_name(iri: str) -> str:
    for sep in ("#", "/", ":"):
        if sep in iri:
            tail = iri.rsplit(sep, 1)[1]
            if tail:
                return tail
    return iri


def _nc_to_jsonschema(nc: dict) -> dict:
    out: dict = {}
    if "datatype" in nc:
        dt = nc["datatype"]
        out.update(_DT_TO_JSON.get(dt) or {"type": "string", "x-rdf-datatype": dt})
    if "nodeKind" in nc:
        nk = nc["nodeKind"]
        if nk == "iri":
            out.update({"type": "string", "format": "iri"})
        elif nk == "bnode":
            out.update({"type": "string", "pattern": "^_:"})
        elif nk == "nonliteral":
            out.setdefault("type", "string")
        # "literal": any JSON scalar -- unconstrained
    if "pattern" in nc:
        if nc.get("flags"):
            raise ConversionError("regex flags do not convert to JSON Schema")
        out["pattern"] = nc["pattern"]
    if "minlength" in nc:
        out["minLength"] = nc["minlength"]
    if "maxlength" in nc:
        out["maxLength"] = nc["maxlength"]
    if "length" in nc:
        out["minLength"] = out["maxLength"] = nc["length"]
    for facet, kw in (
        ("mininclusive", "minimum"),
        ("minexclusive", "exclusiveMinimum"),
        ("maxinclusive", "maximum"),
        ("maxexclusive", "exclusiveMaximum"),
    ):
        if facet in nc:
            out[kw] = nc[facet]
            out.setdefault("type", "number")
    if "values" in nc:
        enum = []
        for v in nc["values"]:
            if isinstance(v, str):
                enum.append(v)  # IRI -> its string form
            elif isinstance(v, dict) and "value" in v:
                dt = v.get("type", "")
                if dt in _DT_TO_JSON and _DT_TO_JSON[dt].get("type") == "integer":
                    enum.append(int(v["value"]))
                elif dt in _DT_TO_JSON and _DT_TO_JSON[dt].get("type") == "number":
                    enum.append(float(v["value"]))
                else:
                    enum.append(v["value"])
            else:
                raise ConversionError(f"value-set item not convertible: {v}")
        out["enum"] = enum
    return out


def shex_to_jsonschema(schema: dict) -> dict:
    """Flat ShEx schema IR -> a JSON Schema (draft 2020-12) document."""
    labels = sorted(schema.get("shapes", {}))
    keys: dict[str, str] = {}
    seen: dict[str, str] = {}
    for lbl in labels:
        k = _local_name(lbl)
        if k in seen.values():
            k = lbl
        keys[lbl] = k
        seen[lbl] = k

    def ref(label: str) -> dict:
        if label not in keys:
            raise ConversionError(f"reference to unknown shape {label}")
        return {"$ref": f"#/$defs/{keys[label]}"}

    def conv_se(se) -> dict:
        if isinstance(se, str):
            return ref(se)
        t = se.get("type")
        if t == "NodeConstraint":
            return _nc_to_jsonschema(se)
        if t == "ShapeAnd":
            return {"allOf": [conv_se(s) for s in se["shapeExprs"]]}
        if t == "ShapeOr":
            return {"anyOf": [conv_se(s) for s in se["shapeExprs"]]}
        if t == "ShapeNot":
            return {"not": conv_se(se["shapeExpr"])}
        if t == "Shape":
            expr = se.get("expression")
            tcs = []
            if expr is not None:
                et = expr.get("type") if isinstance(expr, dict) else None
                if et == "TripleConstraint":
                    tcs = [expr]
                elif et == "EachOf":
                    for sub in expr["expressions"]:
                        if not (
                            isinstance(sub, dict)
                            and sub.get("type") == "TripleConstraint"
                        ):
                            raise ConversionError(
                                "only flat EachOf of TripleConstraints converts"
                            )
                        tcs.append(sub)
                else:
                    raise ConversionError(
                        f"non-flat tripleExpr {et} does not convert"
                    )
            props: dict = {}
            required = []
            for tc in tcs:
                if tc.get("inverse"):
                    raise ConversionError("inverse constraints do not convert")
                pname = _local_name(tc["predicate"])
                if pname in props:
                    raise ConversionError(
                        f"duplicate property name {pname!r} in one shape"
                    )
                ve = tc.get("valueExpr")
                if ve is None:
                    vschema: dict = {}
                elif isinstance(ve, str) or isinstance(ve, dict):
                    vschema = conv_se(ve)
                else:
                    raise ConversionError("valueExpr does not convert")
                mn, mx = tc.get("min", 1), tc.get("max", 1)
                if mx == 1:
                    props[pname] = vschema
                else:
                    arr: dict = {"type": "array", "items": vschema}
                    if mn > 0:
                        arr["minItems"] = mn
                    if mx != -1:
                        arr["maxItems"] = mx
                    props[pname] = arr
                if mn > 0:
                    required.append(pname)
            out: dict = {"type": "object", "properties": props}
            if required:
                out["required"] = required
            if se.get("closed"):
                out["additionalProperties"] = False
                for extra in se.get("extra", []):
                    props.setdefault(_local_name(extra), {})
            return out
        raise ConversionError(f"shapeExpr {t} does not convert")

    defs = {keys[lbl]: conv_se(schema["shapes"][lbl]) for lbl in labels}
    doc: dict = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$defs": defs,
    }
    start = schema.get("start")
    if isinstance(start, str) and start in keys:
        doc["$ref"] = f"#/$defs/{keys[start]}"
    return doc
