"""RDFS inference pre-pass (SURVEY.md S4: the reference's --inference hook,
Main.scala:262-266 — optional Dataset → Dataset entailment stage).

Covers the RDFS entailments that matter for validation targets:
  rdfs2/3  (domain/range → rdf:type)            — broadcast pred→class maps
  rdfs7    (subPropertyOf: p ⊑ q, (s,p,o) → (s,q,o))
  rdfs9/11 (subClassOf: type propagation through the closure)

The class/property hierarchies are the small side: collected once on the
driver, closed transitively, broadcast; the entailment itself is one
vectorized map_batches pass (derived triples carry span_idx = -2 lineage).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

from shaclex_ray.terms import RDF_TYPE, RDFS

RDFS_SUBCLASS = RDFS + "subClassOf"
RDFS_SUBPROP = RDFS + "subPropertyOf"
RDFS_DOMAIN = RDFS + "domain"
RDFS_RANGE = RDFS + "range"


def _closure(edges: dict[str, set[str]]) -> dict[str, set[str]]:
    out: dict[str, set[str]] = {}
    for start in edges:
        seen: set[str] = set()
        frontier = [start]
        while frontier:
            cur = frontier.pop()
            for nxt in edges.get(cur, ()):
                if nxt not in seen:
                    seen.add(nxt)
                    frontier.append(nxt)
        out[start] = seen
    return out


def rdfs_entailment(triples_ds):
    """Append RDFS-entailed triples (deduplicate downstream — graphs are
    sets, G10)."""

    def schema_rows(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch.column("pred"),
            value_set=pa.array([RDFS_SUBCLASS, RDFS_SUBPROP, RDFS_DOMAIN, RDFS_RANGE]),
        )
        return batch.filter(mask).select(["subj", "pred", "obj_lex"])

    rows = triples_ds.map_batches(schema_rows, batch_format="pyarrow").take_all()
    subclass: dict[str, set[str]] = {}
    subprop: dict[str, set[str]] = {}
    domain: dict[str, str] = {}
    range_: dict[str, str] = {}
    for r in rows:
        if r["pred"] == RDFS_SUBCLASS:
            subclass.setdefault(r["subj"], set()).add(r["obj_lex"])
        elif r["pred"] == RDFS_SUBPROP:
            subprop.setdefault(r["subj"], set()).add(r["obj_lex"])
        elif r["pred"] == RDFS_DOMAIN:
            domain[r["subj"]] = r["obj_lex"]
        elif r["pred"] == RDFS_RANGE:
            range_[r["subj"]] = r["obj_lex"]
    sc_closure = _closure(subclass)
    sp_closure = _closure(subprop)
    spec_ref = ray.put((sc_closure, sp_closure, domain, range_))

    def entail(batch: pa.Table) -> pa.Table:
        sc, sp, dom, rng = ray.get(spec_ref)
        subj, pred, okind, olex = (
            batch.column("subj").to_pylist(),
            batch.column("pred").to_pylist(),
            batch.column("obj_kind").to_pylist(),
            batch.column("obj_lex").to_pylist(),
        )
        odt, olang = batch.column("obj_dt").to_pylist(), batch.column("obj_lang").to_pylist()
        n_s, n_p, n_k, n_l, n_d, n_g = [], [], [], [], [], []

        def add_type(s, cls):
            n_s.append(s)
            n_p.append(RDF_TYPE)
            n_k.append("iri")
            n_l.append(cls)
            n_d.append("")
            n_g.append("")

        for i in range(batch.num_rows):
            p = pred[i]
            # rdfs7: superproperties (and their domains/ranges apply too)
            supers = sp.get(p, ())
            for q in supers:
                n_s.append(subj[i])
                n_p.append(q)
                n_k.append(okind[i])
                n_l.append(olex[i])
                n_d.append(odt[i])
                n_g.append(olang[i])
            # rdfs2/3: domain/range typing
            for prop in (p, *supers):
                if prop in dom:
                    add_type(subj[i], dom[prop])
                if prop in rng and okind[i] != "literal":
                    # bnode objects need the subject-column '_:' prefix
                    # (otherwise the derived subject decodes as an IRI)
                    o_subj = "_:" + olex[i] if okind[i] == "bnode" else olex[i]
                    add_type(o_subj, rng[prop])
            # rdfs9: subclass type propagation
            if p == RDF_TYPE and okind[i] == "iri":
                for sup in sc.get(olex[i], ()):
                    add_type(subj[i], sup)
        m = len(n_s)
        derived = pa.table(
            {
                "subj": pa.array(n_s, pa.string()),
                "pred": pa.array(n_p, pa.string()),
                "obj_kind": pa.array(n_k, pa.string()),
                "obj_lex": pa.array(n_l, pa.string()),
                "obj_dt": pa.array(n_d, pa.string()),
                "obj_lang": pa.array(n_g, pa.string()),
                "doc_id": pa.array([""] * m, pa.string()),
                "span_idx": pa.array([-2] * m, pa.int32()),
            }
        )
        cols = ["subj", "pred", "obj_kind", "obj_lex", "obj_dt", "obj_lang", "doc_id", "span_idx"]
        have = [c for c in cols if c in batch.schema.names]
        return pa.concat_tables([batch.select(have), derived.select(have)])

    return triples_ds.map_batches(entail, batch_format="pyarrow")
