"""In-memory SHACL-core validator producing `sh:ValidationReport` results.

From-scratch implementation of the SHACL core semantics the reference
exercises via its vendored W3C core suite
(weso/shaclex src/test/resources/shacl/tests/core/** — 116 manifest tests;
engine entry at modules/schema/src/main/scala/es/weso/schema/
ShaclexSchema.scala:35-69). Target resolution per SURVEY.md J2, components
per M8/J7/J8/G1-G3.

Results are dicts: {focus, path, value, component, severity, source,
message} with term-key-encoded node fields — the row shape of the engine's
distributed report table (terms.REPORT_SCHEMA).
"""

from __future__ import annotations

import re
from decimal import Decimal

from shaclex_ray.terms import RDF_TYPE, SH, XSD_STRING, key_to_term, term_key
from shaclex_ray.validate.local import Graph
from shaclex_ray.validate.nodecheck import (
    NUMERIC_DTS,
    compile_pattern,
    datetime_value,
    numeric_value,
    valid_lexical,
)

RDFS_SUBCLASS = "http://www.w3.org/2000/01/rdf-schema#subClassOf"

_C = SH  # component IRI prefix


def _component(name: str) -> str:
    return _C + name + "ConstraintComponent"


class ShaclValidator:
    def __init__(self, schema: dict, graph: Graph):
        self.schema = schema
        self.graph = graph
        self._conf_memo: dict[tuple[str, str], bool] = {}
        self._in_progress: set[tuple[str, str]] = set()
        self._subclass_memo: dict[str, set[str]] = {}

    # ------------------------------------------------------------------ API
    def validate_all(self):
        """Validate every targeted shape; returns (conforms, results)."""
        results = []
        for skey in self.schema["with_targets"]:
            shape = self.schema["shapes"][skey]
            for focus_key in self.focus_nodes(shape):
                results.extend(self.validate_shape(focus_key, skey))
        return (len(results) == 0, results)

    # ------------------------------------------------------------- targets
    def focus_nodes(self, shape: dict) -> list[str]:
        """SHACL target resolution (reference conversion:
        Shacl2ShEx.scala:46-70; conformance core/targets/*)."""
        out: list[str] = []
        seen = set()

        def add(k: str):
            if k not in seen:
                seen.add(k)
                out.append(k)

        for kind, val in shape["targets"]:
            if kind == "node":
                add(val)
            elif kind == "class":
                for nk in self._instances_of(val):
                    add(nk)
            elif kind == "subjectsOf":
                for sk, po in self.graph.by_subj.items():
                    if any(p == val for p, _o in po):
                        add(sk)
            elif kind == "objectsOf":
                for ok, po in self.graph.by_obj.items():
                    if any(p == val for p, _s in po):
                        add(ok)
        if shape["implicit_class"]:
            for nk in self._instances_of(shape["id"]):
                add(nk)
        return out

    def _subclasses(self, cls_key: str) -> set[str]:
        """All classes whose instances count as instances of cls (transitive
        rdfs:subClassOf, reflexive)."""
        if cls_key in self._subclass_memo:
            return self._subclass_memo[cls_key]
        result = {cls_key}
        frontier = [cls_key]
        while frontier:
            cur = frontier.pop()
            # subclasses of cur: subjects of (x subClassOf cur)
            for p, s in self.graph.arcs_in(cur):
                if p == RDFS_SUBCLASS:
                    sk = term_key(s)
                    if sk not in result:
                        result.add(sk)
                        frontier.append(sk)
        self._subclass_memo[cls_key] = result
        return result

    def _instances_of(self, cls_key: str) -> list[str]:
        classes = self._subclasses(cls_key)
        out = []
        seen = set()
        for c in classes:
            for p, s in self.graph.arcs_in(c):
                if p == RDF_TYPE:
                    sk = term_key(s)
                    if sk not in seen:
                        seen.add(sk)
                        out.append(sk)
        return out

    def _is_instance(self, node_key: str, cls_key: str) -> bool:
        classes = self._subclasses(cls_key)
        for p, o in self.graph.arcs_out(node_key):
            if p == RDF_TYPE and term_key(o) in classes:
                return True
        return False

    # ---------------------------------------------------------------- paths
    def path_values(self, focus_key: str, path: dict) -> list[str]:
        """Value nodes of a property path (SURVEY.md §4.3.3)."""
        if "pred" in path:
            return [term_key(o) for p, o in self.graph.arcs_out(focus_key) if p == path["pred"]]
        if "inverse" in path:
            sub = path["inverse"]
            if "pred" in sub:
                return [term_key(s) for p, s in self.graph.arcs_in(focus_key) if p == sub["pred"]]
            # inverse of a complex path: inversion distributes over every
            # SHACL path constructor, so rewrite down to elementary
            # inverse hops and evaluate forward — no global node scan
            return _dedup(self.path_values(focus_key, invert_path(sub)))
        if "seq" in path:
            cur = [focus_key]
            for sub in path["seq"]:
                nxt = []
                for nk in cur:
                    nxt.extend(self.path_values(nk, sub))
                cur = _dedup(nxt)
            return cur
        if "alt" in path:
            out = []
            for sub in path["alt"]:
                out.extend(self.path_values(focus_key, sub))
            return _dedup(out)
        if "zeroOrMore" in path:
            return self._closure(focus_key, path["zeroOrMore"], include_self=True)
        if "oneOrMore" in path:
            sub = path["oneOrMore"]
            start = []
            for nk in self.path_values(focus_key, sub):
                start.append(nk)
            out = []
            for nk in _dedup(start):
                for x in self._closure(nk, sub, include_self=True):
                    out.append(x)
            return _dedup(out)
        if "zeroOrOne" in path:
            return _dedup([focus_key] + self.path_values(focus_key, path["zeroOrOne"]))
        raise ValueError(f"bad path {path!r}")

    def _closure(self, start_key: str, path: dict, include_self: bool) -> list[str]:
        seen = []
        seen_set = set()
        frontier = [start_key]
        if include_self:
            seen.append(start_key)
            seen_set.add(start_key)
        while frontier:
            cur = frontier.pop()
            for nk in self.path_values(cur, path):
                if nk not in seen_set:
                    seen_set.add(nk)
                    seen.append(nk)
                    frontier.append(nk)
        return seen

    def _all_nodes(self):
        keys = set(self.graph.by_subj) | set(self.graph.by_obj)
        return sorted(keys)

    # ----------------------------------------------------------- validation
    def conforms(self, focus_key: str, shape_key: str) -> bool:
        memo_key = (focus_key, shape_key)
        if memo_key in self._conf_memo:
            return self._conf_memo[memo_key]
        if memo_key in self._in_progress:
            return True  # recursion guard (SHACL leaves recursion undefined)
        self._in_progress.add(memo_key)
        try:
            res = len(self.validate_shape(focus_key, shape_key)) == 0
        finally:
            self._in_progress.discard(memo_key)
        self._conf_memo[memo_key] = res
        return res

    def validate_shape(self, focus_key: str, shape_key: str) -> list[dict]:
        shape = self.schema["shapes"][shape_key]
        if shape is None or shape["deactivated"]:
            return []
        path = shape["path"]
        if path is None:
            value_keys = [focus_key]
        else:
            value_keys = self.path_values(focus_key, path)

        results: list[dict] = []

        def emit(component: str, value_key: str | None, path_override=None):
            results.append(
                {
                    "focus": focus_key,
                    "path": _path_str(path) if path_override is None else path_override,
                    "value": value_key,
                    "component": component,
                    "severity": shape["severity"],
                    "source": shape_key,
                    "message": shape["messages"][0] if shape["messages"] else "",
                }
            )

        for kind, params in shape["components"]:
            self._check_component(
                kind, params, focus_key, value_keys, path, emit
            )

        if shape["closed"]:
            allowed = set(shape["ignored"])
            for pk in shape["properties"]:
                psh = self.schema["shapes"][pk]
                if psh and psh["path"] and "pred" in psh["path"]:
                    allowed.add(psh["path"]["pred"])
            for p, o in self.graph.arcs_out(focus_key):
                if p not in allowed:
                    emit(_component("Closed"), term_key(o), path_override=p)

        for pk in shape["properties"]:
            for vk in value_keys:
                results.extend(self.validate_shape(vk, pk))
        return results

    # ------------------------------------------------------------ components
    def _check_component(self, kind, params, focus_key, value_keys, path, emit):
        g = self.graph
        if kind == "class":
            for vk in value_keys:
                t = key_to_term(vk)
                if t[0] == "lit" or not self._is_instance(vk, params["cls"]):
                    emit(_component("Class"), vk)
        elif kind == "datatype":
            dt = params["iri"]
            for vk in value_keys:
                t = key_to_term(vk)
                if t[0] != "lit" or t[2] != dt or not valid_lexical(t[1], dt):
                    emit(_component("Datatype"), vk)
        elif kind == "nodeKind":
            nk = params["iri"]
            allowed = {
                SH + "IRI": {"iri"},
                SH + "BlankNode": {"bnode"},
                SH + "Literal": {"lit"},
                SH + "BlankNodeOrIRI": {"bnode", "iri"},
                SH + "BlankNodeOrLiteral": {"bnode", "lit"},
                SH + "IRIOrLiteral": {"iri", "lit"},
            }[nk]
            for vk in value_keys:
                if key_to_term(vk)[0] not in allowed:
                    emit(_component("NodeKind"), vk)
        elif kind == "minCount":
            if len(value_keys) < params["n"]:
                emit(_component("MinCount"), None)
        elif kind == "maxCount":
            if len(value_keys) > params["n"]:
                emit(_component("MaxCount"), None)
        elif kind in ("minExclusive", "minInclusive", "maxExclusive", "maxInclusive"):
            blex, bdt = params["value"]
            for vk in value_keys:
                c = _cmp_term_to_bound(key_to_term(vk), blex, bdt)
                ok = (
                    c is not None
                    and (
                        (kind == "minInclusive" and c >= 0)
                        or (kind == "minExclusive" and c > 0)
                        or (kind == "maxInclusive" and c <= 0)
                        or (kind == "maxExclusive" and c < 0)
                    )
                )
                if not ok:
                    emit(_component(kind[0].upper() + kind[1:]), vk)
        elif kind in ("minLength", "maxLength"):
            n = params["n"]
            for vk in value_keys:
                t = key_to_term(vk)
                if t[0] == "bnode":
                    emit(_component(kind[0].upper() + kind[1:]), vk)
                    continue
                s = t[1]
                if (kind == "minLength" and len(s) < n) or (
                    kind == "maxLength" and len(s) > n
                ):
                    emit(_component(kind[0].upper() + kind[1:]), vk)
        elif kind == "pattern":
            try:
                rx = compile_pattern(params["pattern"], params.get("flags", ""))
            except re.error:
                rx = None
            for vk in value_keys:
                t = key_to_term(vk)
                if t[0] == "bnode" or rx is None or not rx.search(t[1]):
                    emit(_component("Pattern"), vk)
        elif kind == "languageIn":
            langs = [x.lower() for x in params["langs"]]
            for vk in value_keys:
                t = key_to_term(vk)
                ok = t[0] == "lit" and t[3] and any(
                    t[3].lower() == r or t[3].lower().startswith(r + "-") for r in langs
                )
                if not ok:
                    emit(_component("LanguageIn"), vk)
        elif kind == "uniqueLang":
            seen: dict[str, int] = {}
            for vk in value_keys:
                t = key_to_term(vk)
                if t[0] == "lit" and t[3]:
                    seen[t[3].lower()] = seen.get(t[3].lower(), 0) + 1
            for lang, cnt in sorted(seen.items()):
                if cnt > 1:
                    emit(_component("UniqueLang"), None)
        elif kind in ("equals", "disjoint"):
            other = {
                term_key(o) for p, o in g.arcs_out(focus_key) if p == params["pred"]
            }
            vals = set(value_keys)
            if kind == "equals":
                for vk in sorted(vals - other):
                    emit(_component("Equals"), vk)
                for vk in sorted(other - vals):
                    emit(_component("Equals"), vk)
            else:
                for vk in sorted(vals & other):
                    emit(_component("Disjoint"), vk)
        elif kind in ("lessThan", "lessThanOrEquals"):
            other = [
                term_key(o) for p, o in g.arcs_out(focus_key) if p == params["pred"]
            ]
            comp = _component(
                "LessThan" if kind == "lessThan" else "LessThanOrEquals"
            )
            for vk in value_keys:
                for ok_ in other:
                    c = _cmp_terms(key_to_term(vk), key_to_term(ok_))
                    good = c is not None and (c < 0 if kind == "lessThan" else c <= 0)
                    if not good:
                        emit(comp, vk)  # one result per failing (v, w) pair
        elif kind == "not":
            for vk in value_keys:
                if self.conforms(vk, params["shape"]):
                    emit(_component("Not"), vk)
        elif kind == "and":
            for vk in value_keys:
                if not all(self.conforms(vk, s) for s in params["shapes"]):
                    emit(_component("And"), vk)
        elif kind == "or":
            for vk in value_keys:
                if not any(self.conforms(vk, s) for s in params["shapes"]):
                    emit(_component("Or"), vk)
        elif kind == "xone":
            for vk in value_keys:
                n = sum(1 for s in params["shapes"] if self.conforms(vk, s))
                if n != 1:
                    emit(_component("Xone"), vk)
        elif kind == "node":
            for vk in value_keys:
                if not self.conforms(vk, params["shape"]):
                    emit(_component("Node"), vk)
        elif kind == "in":
            allowed = set(params["values"])
            for vk in value_keys:
                if vk not in allowed:
                    emit(_component("In"), vk)
        elif kind == "hasValue":
            if params["value"] not in set(value_keys):
                emit(_component("HasValue"), None)
        elif kind == "qualified":
            qshape = params["shape"]
            conforming = [vk for vk in value_keys if self.conforms(vk, qshape)]
            if params.get("disjoint"):
                sibs = params.get("siblings", [])
                conforming = [
                    vk
                    for vk in conforming
                    if not any(self.conforms(vk, s) for s in sibs)
                ]
            n = len(conforming)
            if params["min"] is not None and n < params["min"]:
                emit(_component("QualifiedMinCount"), None)
            if params["max"] is not None and n > params["max"]:
                emit(_component("QualifiedMaxCount"), None)


def invert_path(p: dict) -> dict:
    """Push SHACL path inversion down to elementary predicates.

    inv(seq(a,..,z)) = seq(inv(z),..,inv(a)); inv(alt(..)) = alt(inv ..);
    inv(p*) = (inv p)*; inv(p+) = (inv p)+; inv(p?) = (inv p)?;
    inv(inv(p)) = p — standard regular-path identities, so any inverse of
    a complex path evaluates as a forward walk over elementary inverse
    hops (which both the local index and the distributed hop protocol
    support natively)."""
    if "pred" in p:
        return {"inverse": p}
    if "inverse" in p:
        return p["inverse"]
    if "seq" in p:
        return {"seq": [invert_path(s) for s in reversed(p["seq"])]}
    if "alt" in p:
        return {"alt": [invert_path(s) for s in p["alt"]]}
    for k in ("zeroOrMore", "oneOrMore", "zeroOrOne"):
        if k in p:
            return {k: invert_path(p[k])}
    raise ValueError(f"bad path {p!r}")


def _dedup(keys: list[str]) -> list[str]:
    seen = set()
    out = []
    for k in keys:
        if k not in seen:
            seen.add(k)
            out.append(k)
    return out


def _path_str(path) -> str | None:
    """SPARQL-property-path rendering of a SHACL path for report rows."""
    if path is None:
        return None
    if "pred" in path:
        return path["pred"]

    def render(p) -> str:
        if "pred" in p:
            return f"<{p['pred']}>"
        if "inverse" in p:
            return "^" + render(p["inverse"])
        if "seq" in p:
            return "(" + "/".join(render(s) for s in p["seq"]) + ")"
        if "alt" in p:
            return "(" + "|".join(render(s) for s in p["alt"]) + ")"
        if "zeroOrMore" in p:
            return render(p["zeroOrMore"]) + "*"
        if "oneOrMore" in p:
            return render(p["oneOrMore"]) + "+"
        if "zeroOrOne" in p:
            return render(p["zeroOrOne"]) + "?"
        return repr(p)

    return render(path)


def _cmp_terms(a: tuple, b: tuple):
    """SPARQL-ish value comparison; None = incomparable."""
    if a[0] != "lit" or b[0] != "lit":
        return None
    av, bv = numeric_value(a[1], a[2]), numeric_value(b[1], b[2])
    if av is not None and bv is not None:
        return (av > bv) - (av < bv)
    ad, bd = datetime_value(a[1], a[2]), datetime_value(b[1], b[2])
    if ad is not None and bd is not None and a[2] == b[2]:
        if ad[0] != bd[0]:
            return None  # tz vs no-tz: incomparable in the XSD partial order
        return (ad[1] > bd[1]) - (ad[1] < bd[1])
    if a[2] == b[2] == XSD_STRING:
        return (a[1] > b[1]) - (a[1] < b[1])
    return None


def _cmp_term_to_bound(t: tuple, blex: str, bdt: str):
    return _cmp_terms(t, ("lit", blex, bdt, ""))
