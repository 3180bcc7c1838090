"""SHACL shapes-graph compiler: triples -> shape IR.

Re-expresses the reference's SHACL schema front-end (weso/shaclex
modules/schema/src/main/scala/es/weso/schema/ShaclexSchema.scala:110-147 —
shapes parsed from an RDF graph; component inventory per the conversion
tables in modules/converter/src/main/scala/es/weso/shacl/converter/
Shacl2ShEx.scala:215-303) as a from-scratch compiler over our term model.

The compiled schema is a plain JSON-able dict (broadcastable to Ray actors):

    {"shapes": {shape_key: {...}}, "with_targets": [shape_key, ...]}

shape dicts carry: targets, path (compiled property path), components
(ordered list of (kind, params)), nested property-shape refs, closed /
ignored, deactivated, severity, messages.
"""

from __future__ import annotations

from collections import defaultdict

from shaclex_ray.terms import RDF_FIRST, RDF_NIL, RDF_REST, RDF_TYPE, SH, term_key

RDFS_CLASS = "http://www.w3.org/2000/01/rdf-schema#Class"
RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"

# constraint-parameter predicates -> component kind
_SCALAR_PARAMS = {
    SH + "class": "class",
    SH + "datatype": "datatype",
    SH + "nodeKind": "nodeKind",
    SH + "minCount": "minCount",
    SH + "maxCount": "maxCount",
    SH + "minExclusive": "minExclusive",
    SH + "minInclusive": "minInclusive",
    SH + "maxExclusive": "maxExclusive",
    SH + "maxInclusive": "maxInclusive",
    SH + "minLength": "minLength",
    SH + "maxLength": "maxLength",
    SH + "pattern": "pattern",
    SH + "languageIn": "languageIn",
    SH + "uniqueLang": "uniqueLang",
    SH + "equals": "equals",
    SH + "disjoint": "disjoint",
    SH + "lessThan": "lessThan",
    SH + "lessThanOrEquals": "lessThanOrEquals",
    SH + "not": "not",
    SH + "and": "and",
    SH + "or": "or",
    SH + "xone": "xone",
    SH + "node": "node",
    SH + "in": "in",
    SH + "hasValue": "hasValue",
}


class _G:
    """Triple index over the shapes graph."""

    def __init__(self, triples):
        self.spo = defaultdict(lambda: defaultdict(list))
        self.pos = defaultdict(lambda: defaultdict(list))
        for s, p, o in triples:
            sk = term_key(s)
            self.spo[sk][p].append(o)
            self.pos[p][term_key(o)].append(s)
        self.terms = {}
        for s, p, o in triples:
            self.terms.setdefault(term_key(s), s)
            self.terms.setdefault(term_key(o), o)

    def objs(self, skey: str, pred: str) -> list:
        return self.spo.get(skey, {}).get(pred, [])

    def obj1(self, skey: str, pred: str):
        v = self.objs(skey, pred)
        return v[0] if v else None

    def rdf_list(self, head) -> list:
        out = []
        cur = head
        while cur is not None and not (cur[0] == "iri" and cur[1] == RDF_NIL):
            k = term_key(cur)
            first = self.obj1(k, RDF_FIRST)
            if first is not None:
                out.append(first)
            cur = self.obj1(k, RDF_REST)
        return out


def _compile_path(g: _G, node) -> dict:
    """SHACL property path term -> path IR (SURVEY.md §4.3.3: sequence =
    chained equi-joins, zeroOrMore = bounded transitive closure)."""
    if node[0] == "iri" and node[1] != RDF_NIL:
        k = term_key(node)
        # IRI could still head a list (unusual); predicate path is default
        if not g.objs(k, RDF_FIRST):
            return {"pred": node[1]}
    k = term_key(node)
    if g.objs(k, RDF_FIRST):
        return {"seq": [_compile_path(g, x) for x in g.rdf_list(node)]}
    inv = g.obj1(k, SH + "inversePath")
    if inv is not None:
        return {"inverse": _compile_path(g, inv)}
    alt = g.obj1(k, SH + "alternativePath")
    if alt is not None:
        return {"alt": [_compile_path(g, x) for x in g.rdf_list(alt)]}
    zom = g.obj1(k, SH + "zeroOrMorePath")
    if zom is not None:
        return {"zeroOrMore": _compile_path(g, zom)}
    oom = g.obj1(k, SH + "oneOrMorePath")
    if oom is not None:
        return {"oneOrMore": _compile_path(g, oom)}
    zoo = g.obj1(k, SH + "zeroOrOnePath")
    if zoo is not None:
        return {"zeroOrOne": _compile_path(g, zoo)}
    raise ValueError(f"cannot compile path {node!r}")


def compile_shacl(triples) -> dict:
    g = _G(triples)
    shapes: dict[str, dict] = {}
    pending: list = []

    def shape_ref(term) -> str:
        k = term_key(term)
        if k not in shapes:
            shapes[k] = None  # placeholder to break cycles
            pending.append(term)
        return k

    # discover shapes with targets or explicit type
    roots = set()
    for skey, po in list(g.spo.items()):
        types = {term_key(t) for t in po.get(RDF_TYPE, [])}
        is_shape_type = ("I" + SH + "NodeShape") in types or (
            "I" + SH + "PropertyShape"
        ) in types
        has_target = any(
            p in po
            for p in (
                SH + "targetNode",
                SH + "targetClass",
                SH + "targetSubjectsOf",
                SH + "targetObjectsOf",
            )
        )
        implicit_class = ("I" + RDFS_CLASS) in types and (
            is_shape_type or any(p.startswith(SH) for p in po)
        )
        if is_shape_type or has_target or implicit_class:
            roots.add(skey)

    for skey in roots:
        shape_ref(g.terms[skey])

    while pending:
        term = pending.pop()
        k = term_key(term)
        shapes[k] = _compile_shape(g, term, shape_ref)

    # qualifiedValueShapesDisjoint: sibling qualified shapes are the
    # qualified shapes of the *other* property shapes of the same parent
    for sh in shapes.values():
        if not sh:
            continue
        qualified_of_child = {}
        for pk in sh["properties"]:
            child = shapes.get(pk)
            if not child:
                continue
            for kind, params in child["components"]:
                if kind == "qualified":
                    qualified_of_child[pk] = params["shape"]
        for pk in sh["properties"]:
            child = shapes.get(pk)
            if not child:
                continue
            for kind, params in child["components"]:
                if kind == "qualified" and params.get("disjoint"):
                    params["siblings"] = [
                        q for cpk, q in qualified_of_child.items() if cpk != pk
                    ]

    with_targets = [
        k for k, sh in shapes.items() if sh and (sh["targets"] or sh["implicit_class"])
    ]
    return {"shapes": shapes, "with_targets": sorted(with_targets)}


def _compile_shape(g: _G, term, shape_ref) -> dict:
    k = term_key(term)
    po = g.spo.get(k, {})
    types = {term_key(t) for t in po.get(RDF_TYPE, [])}

    targets = []
    for t in po.get(SH + "targetNode", []):
        targets.append(("node", term_key(t)))
    for t in po.get(SH + "targetClass", []):
        targets.append(("class", term_key(t)))
    for t in po.get(SH + "targetSubjectsOf", []):
        targets.append(("subjectsOf", t[1]))
    for t in po.get(SH + "targetObjectsOf", []):
        targets.append(("objectsOf", t[1]))
    implicit_class = ("I" + RDFS_CLASS) in types

    path_t = g.obj1(k, SH + "path")
    path = _compile_path(g, path_t) if path_t is not None else None

    components: list = []
    for pred, kind in _SCALAR_PARAMS.items():
        for val in po.get(pred, []):
            if kind in ("and", "or", "xone"):
                members = [shape_ref(x) for x in g.rdf_list(val)]
                components.append((kind, {"shapes": members}))
            elif kind in ("not", "node"):
                components.append((kind, {"shape": shape_ref(val)}))
            elif kind == "in":
                components.append(("in", {"values": [term_key(x) for x in g.rdf_list(val)]}))
            elif kind == "languageIn":
                components.append(
                    ("languageIn", {"langs": [x[1] for x in g.rdf_list(val)]})
                )
            elif kind == "hasValue":
                components.append(("hasValue", {"value": term_key(val)}))
            elif kind in ("class",):
                components.append(("class", {"cls": term_key(val)}))
            elif kind in ("datatype", "nodeKind"):
                components.append((kind, {"iri": val[1]}))
            elif kind in ("minCount", "maxCount", "minLength", "maxLength"):
                components.append((kind, {"n": int(val[1])}))
            elif kind in ("equals", "disjoint", "lessThan", "lessThanOrEquals"):
                components.append((kind, {"pred": val[1]}))
            elif kind == "pattern":
                flags = g.obj1(k, SH + "flags")
                components.append(
                    ("pattern", {"pattern": val[1], "flags": flags[1] if flags else ""})
                )
            elif kind == "uniqueLang":
                if val[1] == "true":
                    components.append(("uniqueLang", {}))
            else:  # numeric range facets keep the literal term
                components.append((kind, {"value": (val[1], val[2])}))

    qvs = g.obj1(k, SH + "qualifiedValueShape")
    if qvs is not None:
        qmin = g.obj1(k, SH + "qualifiedMinCount")
        qmax = g.obj1(k, SH + "qualifiedMaxCount")
        qdisj = g.obj1(k, SH + "qualifiedValueShapesDisjoint")
        components.append(
            (
                "qualified",
                {
                    "shape": shape_ref(qvs),
                    "min": int(qmin[1]) if qmin else None,
                    "max": int(qmax[1]) if qmax else None,
                    "disjoint": bool(qdisj and qdisj[1] == "true"),
                },
            )
        )

    closed_t = g.obj1(k, SH + "closed")
    closed = bool(closed_t and closed_t[1] == "true")
    ignored = []
    ign = g.obj1(k, SH + "ignoredProperties")
    if ign is not None:
        ignored = [x[1] for x in g.rdf_list(ign)]

    props = [shape_ref(x) for x in po.get(SH + "property", [])]

    deact = g.obj1(k, SH + "deactivated")
    sev = g.obj1(k, SH + "severity")
    msgs = [x[1] for x in po.get(SH + "message", [])]

    return {
        "id": k,
        "targets": targets,
        "implicit_class": implicit_class,
        "path": path,
        "components": components,
        "properties": props,
        "closed": closed,
        "ignored": ignored,
        "deactivated": bool(deact and deact[1] == "true"),
        "severity": sev[1] if sev else SH + "Violation",
        "messages": msgs,
    }
