"""Compact ShapeMap parser + distributed focus resolution (SURVEY.md S7/J1).

Grammar subset per the reference's
doc/grammars/shapeMapGrammar.bnf:21-44 and ValidationTrigger.scala:45-95:

    shapeMap     ::= association (',' association)*
    association  ::= nodeSelector '@' shapeLabel
    nodeSelector ::= node | '{' 'FOCUS' pred obj '}' | '{' subj pred 'FOCUS' '}'
    node         ::= <iri> | prefixed:name | literal | _:bnode
    obj/subj     ::= node | '_'   (wildcard)

Selector resolution ("fixShapeMap", invoked at ShExSchema.scala:55) is a
vectorized semi-join over the triples Dataset: filter on the bound
predicate/object (or subject/predicate), project the FOCUS side, distinct.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from shaclex_ray.terms import RDF_TYPE, XSD_STRING, obj_key, subj_to_key, term_key

_TOK = re.compile(
    r"""
    \s+
  | (?P<iriref><[^<>\s]*>)
  | (?P<str>"(?:[^"\\]|\\.)*"(?:@[a-zA-Z-]+|\^\^(?:<[^<>\s]*>|[\w.\-]*:[\w.\-]*))?)
  | (?P<bnode>_:[\w.\-]+)
  | (?P<keyword>FOCUS|START|a)
  | (?P<punct>[{}@,])
  | (?P<wild>_\b)
  | (?P<pname>[\w.\-]*:[\w.\-]*)
    """,
    re.VERBOSE,
)


class ShapeMapError(ValueError):
    pass


def _tokens(s: str):
    pos = 0
    out = []
    while pos < len(s):
        m = _TOK.match(s, pos)
        if not m:
            raise ShapeMapError(f"bad shapemap at {s[pos:pos+30]!r}")
        if m.lastgroup:
            out.append((m.lastgroup, m.group()))
        pos = m.end()
    return out


def parse_shapemap(text: str, prefixes: dict[str, str] | None = None) -> list[dict]:
    """-> list of associations:
    {"kind": "node"|"focus_obj"|"focus_subj", ...fields..., "shape": label}"""
    prefixes = prefixes or {}
    toks = _tokens(text)
    i = 0

    def term(tok):
        k, v = tok
        if k == "iriref":
            return ("iri", v[1:-1])
        if k == "bnode":
            return ("bnode", v[2:])
        if k == "pname":
            pfx, _, local = v.partition(":")
            if pfx not in prefixes:
                raise ShapeMapError(f"undefined prefix {pfx!r}")
            return ("iri", prefixes[pfx] + local)
        if k == "keyword" and v == "a":
            return ("iri", RDF_TYPE)
        if k == "str":
            m = re.match(r'"((?:[^"\\]|\\.)*)"(?:@([a-zA-Z-]+)|\^\^(.*))?$', v)
            lex = m.group(1).replace('\\"', '"')
            if m.group(2):
                return ("lit", lex, "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", m.group(2).lower())
            if m.group(3):
                dt = m.group(3)
                if dt.startswith("<"):
                    dt = dt[1:-1]
                else:
                    pfx, _, local = dt.partition(":")
                    dt = prefixes.get(pfx, pfx + ":") + local
                return ("lit", lex, dt, "")
            return ("lit", lex, XSD_STRING, "")
        raise ShapeMapError(f"bad node {v!r}")

    out = []
    while i < len(toks):
        k, v = toks[i]
        if v == ",":
            i += 1
            continue
        if v == "{":
            # triple pattern
            parts = []
            i += 1
            while toks[i][1] != "}":
                parts.append(toks[i])
                i += 1
            i += 1  # }
            if len(parts) != 3:
                raise ShapeMapError("triple pattern needs 3 parts")
            if parts[0][1] == "FOCUS":
                pred = term(parts[1])
                assoc = {"kind": "focus_subj", "pred": pred[1]}
                if parts[2][0] == "wild" or parts[2][1] == "_":
                    assoc["obj"] = None
                else:
                    assoc["obj"] = term(parts[2])
            elif parts[2][1] == "FOCUS":
                pred = term(parts[1])
                assoc = {"kind": "focus_obj", "pred": pred[1]}
                if parts[0][0] == "wild" or parts[0][1] == "_":
                    assoc["subj"] = None
                else:
                    assoc["subj"] = term(parts[0])
            else:
                raise ShapeMapError("pattern must contain FOCUS")
            i -= 1  # compensate the shared post-selector advance below
        elif k == "keyword" and v == "START":
            assoc = {"kind": "node", "node": None}
        else:
            assoc = {"kind": "node", "node": term(toks[i])}
        i += 1
        if toks[i][1] != "@":
            raise ShapeMapError(f"expected @ got {toks[i][1]!r}")
        i += 1
        k2, v2 = toks[i]
        i += 1
        if k2 == "keyword" and v2 == "START":
            shape = "START"
        else:
            shape = term((k2, v2))
            shape = ("_:" + shape[1]) if shape[0] == "bnode" else shape[1]
        assoc["shape"] = shape
        out.append(assoc)
    return out


def fix_shapemap(triples_ds, associations: list[dict]):
    """Resolve selectors against the data into concrete (node, shape) focus
    pairs — the reference's fixShapeMap as Dataset semi-joins. Concrete
    node selectors give a small pa.Table; pattern selectors ({FOCUS p o})
    yield a *streaming* Dataset unioned with it — the matched focus set
    never materializes on the driver (bucket actors dedup on submit)."""
    pairs: set[tuple[str, str]] = set()
    pattern_assocs = [a for a in associations if a["kind"] != "node"]
    for a in associations:
        if a["kind"] == "node" and a["node"] is not None:
            pairs.add((term_key(a["node"]), a["shape"]))
        elif a["kind"] == "node":
            raise ShapeMapError("START node selector needs a concrete node")

    if pattern_assocs:

        def find(batch: pa.Table) -> pa.Table:
            nodes, shapes = [], []
            pred_col = batch.column("pred")
            for a in pattern_assocs:
                mask = pc.equal(pred_col, a["pred"])
                if a["kind"] == "focus_subj":
                    if a.get("obj") is not None:
                        k, lx, dt, lg = _obj_cols(a["obj"])
                        mask = pc.and_(mask, pc.equal(batch.column("obj_kind"), k))
                        mask = pc.and_(mask, pc.equal(batch.column("obj_lex"), lx))
                    for s in pc.filter(batch.column("subj"), mask).to_pylist():
                        nodes.append(subj_to_key(s))
                        shapes.append(a["shape"])
                else:  # focus_obj
                    if a.get("subj") is not None:
                        from shaclex_ray.terms import subj_str

                        mask = pc.and_(
                            mask, pc.equal(batch.column("subj"), subj_str(a["subj"]))
                        )
                    sub = batch.filter(mask)
                    for k, lx, dt, lg in zip(
                        sub.column("obj_kind").to_pylist(),
                        sub.column("obj_lex").to_pylist(),
                        sub.column("obj_dt").to_pylist(),
                        sub.column("obj_lang").to_pylist(),
                    ):
                        nodes.append(obj_key(k, lx, dt, lg))
                        shapes.append(a["shape"])
            return pa.table(
                {"node": pa.array(nodes, pa.string()), "shape": pa.array(shapes, pa.string())}
            )

        import ray.data as rd

        sp = sorted(pairs)
        concrete = pa.table(
            {
                "node": pa.array([p[0] for p in sp], pa.string()),
                "shape": pa.array([p[1] for p in sp], pa.string()),
            }
        )
        matched = triples_ds.map_batches(find, batch_format="pyarrow")
        if concrete.num_rows:
            matched = matched.union(rd.from_arrow(concrete))
        return matched

    sp = sorted(pairs)
    return pa.table(
        {
            "node": pa.array([p[0] for p in sp], pa.string()),
            "shape": pa.array([p[1] for p in sp], pa.string()),
        }
    )


def _obj_cols(t: tuple):
    from shaclex_ray.terms import obj_cols

    return obj_cols(t)
