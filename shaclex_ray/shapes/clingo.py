"""Clingo (ASP) program writer — SURVEY.md S11/C5; reference
SLang2Clingo.scala:39-316 + Clingo.scala (the ``--clingoFile`` /
``--showClingo`` debug artifact, Main.scala:182-188).

``validate_to_clingo(triples_ds, schema, assocs)`` grounds a ShEx
validation problem into an answer-set program: the schema compiles to
SLang (shapes/slang.py), each focus node's outgoing-arc closure becomes
``arc/3`` + ``iri/1``/``bNode/1``/``literal/2`` facts, the schema
becomes ``schema/2`` + ``shape/1`` + ``label/1`` facts, and a fixed set
of ``hasShape`` rule fragments (selected by which SLang constructors the
schema actually uses, SLang2Clingo.scala:124-146) encodes the 4-valued
conformance semantics. ``#show result/2`` reports per-association
conformance.

Ray-Data shape: the closure BFS broadcasts the frontier (``ray.put``)
and scans the triples Dataset once per hop — the scan is distributed,
only the (small) neighborhood lands on the driver, exactly the
reference's in-heap closure (SLang2Clingo.scala:231-239 groundRDF). Fact
rendering is vectorized Arrow string kernels. Divergence from the
reference, documented: we ground the UNION closure of all focus nodes
once and elide duplicate facts (the reference re-grounds per
association, SLang2Clingo.scala:50-58 — duplicate ASP facts are
semantically inert, so the programs are equivalent); association order
and rule text are preserved.

Like the reference, property paths other than a plain predicate are NOT
groundable: EachOf compiles to a ``NoPreds`` qualified arc, which
SLang2Clingo.scala:283-287 (getPred) rejects with "Unsupported ... yet"
— its ClingoTest suite is `.pending`. We raise ClingoUnsupportedError
with the same boundary.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

from shaclex_ray.shapes.slang import shex_to_slang, walk
from shaclex_ray.terms import XSD_INTEGER, XSD_STRING


class ClingoUnsupportedError(Exception):
    pass


# ------------------------------------------------------------- term render


def _iri_term(i: str) -> str:
    # iri2Term: StringTerm("<" + iri + ">")
    return f'"<{i}>"'


def node_term(t: tuple) -> str:
    """node2Term (SLang2Clingo.scala:296-303)."""
    if t[0] == "iri":
        return _iri_term(t[1])
    if t[0] == "bnode":
        return f'"_:{t[1]}"'
    lex, dt, lang = t[1], t[2], t[3]
    if lang:
        return f'"{lex}@{lang}"'
    if dt == XSD_INTEGER:
        try:
            return str(int(lex))
        except ValueError:
            pass
    if dt == XSD_STRING:
        return f'"{lex}"'
    return f'"{lex}^^<{dt}>"'


def shape_term(s: tuple) -> str:
    """shape2Term (SLang2Clingo.scala:268-281)."""
    tag = s[0]
    if tag == "true":
        return "true"
    if tag == "and":
        return f"and({shape_term(s[1])},{shape_term(s[2])})"
    if tag == "bnode":
        return "bNode"
    if tag == "iri":
        return "iri"
    if tag == "datatype":
        return f"datatype({_iri_term(s[1])})"
    if tag == "not":
        return f"no({shape_term(s[1])})"
    if tag == "ref":
        return f"ref({_iri_term(s[1])})"
    if tag == "qa":
        pp, sub, (mn, mx) = s[1], s[2], s[3]
        if pp[0] != "pred":
            # getPred (SLang2Clingo.scala:283-287) — NoPreds (EachOf's
            # closed-world leftover check) has no ASP encoding yet
            raise ClingoUnsupportedError(f"Unsupported {pp} yet")
        mxs = "star" if mx == "star" else f"intMax({mx})"
        return f"qa({_iri_term(pp[1])},{shape_term(sub)},{mn},{mxs})"
    raise ClingoUnsupportedError(f"shape2Term: {s}")


# ----------------------------------------------------------- rule fragments
# hasShape semantics per constructor (SLang2Clingo.scala:63-122); the
# fragment set is selected by which constructors the schema uses.

_FRAG = {
    "true": "hasShape(X,true):-node(X) .",
    "datatype": (
        "hasShape(X, datatype(D)):- shape(datatype(D)), literal(X,D).\n"
        ":- hasShape(X, datatype(D)), not literal(X,D)."
    ),
    "iri": (
        "hasShape(X, iri):-iri(X).\n:- hasShape(X, iri), not iri(X)."
    ),
    "bnode": (
        "hasShape(X, bNode) :- bNode(X).\n:- hasShape(X, bNode), not bNode(X)."
    ),
    "qa_intmax": (
        "hasShape(X,qa(P,S,Min,intMax(Max))):-\n"
        " shape(qa(P,S,Min,intMax(Max))),\n"
        " countPropShape(X,P,S,C), Min <= C, C <= Max .\n"
        ":- hasShape(X,qa(P,S,Min,intMax(Max))), countPropShape(X,P,S,C), C < Min .\n"
        ":- hasShape(X,qa(P,S,Min,intMax(Max))), countPropShape(X,P,S,C), C > Max ."
    ),
    "qa_star": (
        "hasShape(X,qa(P,S,Min,star)):-\n"
        " shape(qa(P,S,Min,star)),\n"
        " countPropShape(X,P,S,C), Min <= C .\n"
        ":- hasShape(X,qa(P,S,Min,star)), countPropShape(X,P,S,C), C < Min ."
    ),
    "and": (
        "hasShape(X,and(S1,S2)):-\n"
        " shape(and(S1,S2)), hasShape(X,S1), hasShape(X,S2) .\n"
        ":-hasShape(X,and(S1,_)), not hasShape(X,S1) .\n"
        ":-hasShape(X,and(_,S2)), not hasShape(X,S2) ."
    ),
    "ref": (
        "hasShape(X,ref(Lbl)):-\n"
        "  shape(ref(Lbl)), schema(Lbl,S), hasShape(X,S).\n"
        ":-hasShape(X,ref(Lbl)), schema(Lbl,S), not hasShape(X,S) ."
    ),
    "not": (
        "hasShape(X,no(S)):- node(X), shape(no(S)), not hasShape(X,S) .\n"
        ":- hasShape(X, no(S)), hasShape(X,S) ."
    ),
}

# the fixed tail: result reporting, CWA removal, counting + derivation
# rules (SLang2Clingo.scala:148-184)
_TAIL = """#show result/2 .
result(X,Lbl) :- shapeMap(X,Lbl), schema(Lbl,S), hasShape(X,S).
result(X,no(Lbl)):- shapeMap(X,Lbl), schema(Lbl,S), not hasShape(X,S) .

% Remove CWA on hasShape
hasShape(X,S) | not hasShape(X,S):-node(X), shape(S) .

countPropShape(X,P,S,T):-
 node(X), pred(P), shape(S),
 #count { V: arcWithShape(X,P,S,V) } = T .

countPropShape(X,P,S,0):-
 node(X),
 pred(P),
 shape(S),
 not arcWithShape(X,P,S,_).

arcWithShape(X,P,S,V):-arc(X,P,V),hasShape(V,S).

node(X):-shapeMap(X,_).
node(X):-arc(X,_,_).
node(X):-arc(_,_,X).
pred(P):-arc(_,P,_).
pred(P):-shape(qa(P,_,_,_)).
"""

_FRAG_ORDER = [
    "true", "datatype", "iri", "bnode", "qa_intmax", "qa_star",
    "and", "ref", "not",
]


def _fragment_keys(slang_schema: dict) -> set[str]:
    keys = set()
    for s in walk(slang_schema.values()):
        tag = s[0]
        if tag == "qa":
            keys.add("qa_star" if s[3][1] == "star" else "qa_intmax")
        elif tag in _FRAG:
            keys.add(tag)
    return keys


def common_statements(slang_schema: dict) -> str:
    frags = _fragment_keys(slang_schema)
    return "\n".join(_FRAG[k] for k in _FRAG_ORDER if k in frags) + "\n" + _TAIL


# --------------------------------------------------------------- grounding


def ground_rdf_closure(
    triples_ds, focus_subjs: set[str], max_hops: int = 32
) -> pa.Table:
    """Outgoing-arc closure from the focus set (Graph.traverse /
    traverseWithArcs analog): per hop, broadcast the frontier and filter
    the triples Dataset distributed; objects become the next frontier.
    Returns the closure triples driver-side (bounded by neighborhood
    size, not corpus size)."""
    visited: set[str] = set()
    frontier = set(focus_subjs)
    out: list[pa.Table] = []
    for _ in range(max_hops):
        frontier -= visited
        if not frontier:
            break
        visited |= frontier
        ref = ray.put(frontier)

        def pick(batch: pa.Table, _ref=ref) -> pa.Table:
            want = ray.get(_ref)
            mask = pc.is_in(
                batch.column("subj"), value_set=pa.array(sorted(want), pa.string())
            )
            return batch.filter(mask)

        hop = pa.concat_tables(
            b if isinstance(b, pa.Table) else pa.Table.from_batches([b])
            for b in triples_ds.map_batches(pick, batch_format="pyarrow").iter_batches(
                batch_format="pyarrow"
            )
        )
        if hop.num_rows == 0:
            break
        out.append(hop)
        kinds = hop.column("obj_kind")
        lex = hop.column("obj_lex")
        frontier = set(pc.filter(lex, pc.not_equal(kinds, "literal")).to_pylist())
    cols = ["subj", "pred", "obj_kind", "obj_lex", "obj_dt", "obj_lang"]
    if not out:
        return pa.schema([(c, pa.string()) for c in cols]).empty_table()
    # distinct arcs (the union-closure dedupe; see module docstring)
    tbl = pa.concat_tables(out).select(cols)
    return tbl.group_by(cols, use_threads=False).aggregate([]).cast(tbl.schema)


def _subj_terms(arr: pa.ChunkedArray) -> pa.Array:
    """Vectorized node_term for subject-position nodes (iri | bnode)."""
    arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
    quoted_bnode = pc.binary_join_element_wise('"', arr, '"', "")
    quoted_iri = pc.binary_join_element_wise('"<', arr, '>"', "")
    return pc.if_else(pc.starts_with(arr, "_:"), quoted_bnode, quoted_iri)


def _obj_terms(tbl: pa.Table) -> pa.Array:
    kinds = tbl.column("obj_kind").combine_chunks()
    lex = tbl.column("obj_lex").combine_chunks()
    dt = tbl.column("obj_dt").combine_chunks()
    lang = tbl.column("obj_lang").combine_chunks()
    is_lit = pc.equal(kinds, "literal")
    node_like = _subj_terms(lex)  # iri/bnode objects carry the node in lex
    lang_t = pc.binary_join_element_wise('"', lex, "@", lang, '"', "")
    plain_t = pc.binary_join_element_wise('"', lex, '"', "")
    typed_t = pc.binary_join_element_wise('"', lex, "^^<", dt, '>"', "")
    is_int = pc.and_(pc.equal(dt, XSD_INTEGER), pc.match_substring_regex(lex, r"^[+-]?\d+$"))
    # mask non-integers to "0" before the cast — if_else evaluates both
    # branches, and a normalizing int round-trip ("+30"/"030" → "30")
    # mirrors IntTerm(n).show (Clingo.scala:21-23)
    int_t = pc.cast(pc.cast(pc.if_else(is_int, lex, "0"), pa.int64()), pa.string())
    lit_t = pc.if_else(
        pc.not_equal(lang, ""),
        lang_t,
        pc.if_else(
            is_int,
            int_t,
            pc.if_else(pc.equal(dt, XSD_STRING), plain_t, typed_t),
        ),
    )
    return pc.if_else(is_lit, lit_t, node_like)


def ground_rdf_statements(closure: pa.Table) -> list[str]:
    """arc/3 facts + node-kind facts for every node in the closure
    (groundRDF, SLang2Clingo.scala:231-239), vectorized."""
    if closure.num_rows == 0:
        return []
    s_terms = _subj_terms(closure.column("subj"))
    p_terms = _subj_terms(closure.column("pred"))
    o_terms = _obj_terms(closure)
    arcs = pc.binary_join_element_wise(
        "arc(", s_terms, ",", p_terms, ",", o_terms, ").", ""
    )
    stmts: list[str] = []
    seen: set[str] = set()
    # node facts: subjects (iri|bnode) + objects by kind
    subj = closure.column("subj").combine_chunks()
    for t, is_b in zip(s_terms.to_pylist(), pc.starts_with(subj, "_:").to_pylist()):
        f = f"bNode({t})." if is_b else f"iri({t})."
        if f not in seen:
            seen.add(f)
            stmts.append(f)
    kinds = closure.column("obj_kind").to_pylist()
    dts = closure.column("obj_dt").to_pylist()
    for t, k, dt in zip(o_terms.to_pylist(), kinds, dts):
        if k == "iri":
            f = f"iri({t})."
        elif k == "bnode":
            f = f"bNode({t})."
        else:
            f = f"literal({t},{_iri_term(dt)})."
        if f not in seen:
            seen.add(f)
            stmts.append(f)
    for a in arcs.to_pylist():
        if a not in seen:
            seen.add(a)
            stmts.append(a)
    return stmts


# ----------------------------------------------------------------- program


def validate_to_clingo(triples_ds, schema: dict, assocs: list[dict]) -> str:
    """Ground a ShEx validation problem to an ASP program
    (validate2Clingo, SLang2Clingo.scala:45-59). ``assocs`` are parsed
    shapemap associations; only fixed-node selectors are groundable
    (the reference raises on anything else, SLang2Clingo.scala:56)."""
    slang_schema = shex_to_slang(schema)
    parts = [common_statements(slang_schema)]

    focus: list[tuple[tuple, str]] = []
    for a in assocs:
        if a.get("kind") != "node" or a.get("node") is None:
            raise ClingoUnsupportedError(
                f"Unhandled association node: {a.get('kind')}"
            )
        lbl = a["shape"]
        if lbl in (None, "START"):
            raise ClingoUnsupportedError(
                "Not supported start in clingo conversion yet"
            )
        if lbl not in slang_schema:
            raise ClingoUnsupportedError(
                f"Label {lbl} not found in Schema. Available labels: "
                f"{sorted(slang_schema)}"
            )
        focus.append((a["node"], lbl))

    # RDF grounding: one shared BFS for the union focus set
    subjs = {
        (t[1] if t[0] == "iri" else "_:" + t[1]) for t, _ in focus
    }
    closure = ground_rdf_closure(triples_ds, subjs)
    parts.extend(ground_rdf_statements(closure))

    # shape facts: every sub-shape reachable from any association's label
    shape_stmts: list[str] = []
    seen: set[str] = set()
    for _t, lbl in focus:
        for s in walk([slang_schema[lbl]]):
            f = f"shape({shape_term(s)})."
            if f not in seen:
                seen.add(f)
                shape_stmts.append(f)
    parts.extend(shape_stmts)

    # schema facts: schema(lbl, shape) + label(lbl) per label
    for lbl, s in slang_schema.items():
        parts.append(f"schema({_iri_term(lbl)},{shape_term(s)}).")
    for lbl in slang_schema:
        parts.append(f"label({_iri_term(lbl)}).")

    # shapeMap facts per association (order preserved)
    for t, lbl in focus:
        parts.append(f"shapeMap({node_term(t)},{_iri_term(lbl)}).")

    return "\n".join(parts) + "\n"
