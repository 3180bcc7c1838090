"""Entity linking + canonicalization (SURVEY.md A5/J9, the north-star ops).

Stages:
  1. mention harvest: filter mention triples, project surfaces, distinct
     (bucketed dedup — no full-table shuffle of non-mention triples)
  2. blocking: normalize(surface) is the blocking key; within each block a
     groupby-aggregate emits union edges (mention_iri, canonical_iri)
  3. union-find merge on the driver (edge list ~ |distinct mentions|, the
     designed small side; multi-key blocking would add more edge sources —
     the merge is the same)
  4. canonicalization: the mention→canonical map is broadcast once via
     ``ray.put`` and each triple batch rewrites subj/obj IRIs with a
     vectorized index_in/take substitution (no per-batch re-shipping)

Determinism: canonical IRI is a pure function of the normalized surface;
union-find uses lexicographic minimum as representative, so retried tasks
produce identical rows.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray

from shaclex_ray.stages.extract import (
    C_ENTITY,
    ENT_NS,
    MENTION_NS,
    P_MENTIONS,
    P_SURFACE,
    RDF_TYPE,
    XSD_STRING,
)


def normalize_mention(surface: str) -> str:
    """Blocking/canonicalization key for a mention surface form."""
    return surface.strip().lower()


class UnionFind:
    """Deterministic union-find: representative = lexicographic minimum."""

    def __init__(self):
        self.parent: dict[str, str] = {}

    def find(self, x: str) -> str:
        p = self.parent.setdefault(x, x)
        while p != self.parent.get(p, p):
            self.parent[p] = self.parent.get(self.parent[p], self.parent[p])
            p = self.parent[p]
        self.parent[x] = p
        return p

    def union(self, a: str, b: str):
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        lo, hi = (ra, rb) if ra < rb else (rb, ra)
        self.parent[hi] = lo


def harvest_mentions(triples_ds):
    """Distinct mention surfaces with their normalized blocking key."""

    def project(batch: pa.Table) -> pa.Table:
        mask = pc.equal(batch.column("pred"), P_MENTIONS)
        iris = pc.filter(batch.column("obj_lex").combine_chunks(), mask)
        surfaces = pc.utf8_replace_slice(iris, 0, len(MENTION_NS), "")
        block = pc.utf8_lower(pc.utf8_trim_whitespace(surfaces))
        tbl = pa.table(
            {"mention_iri": iris, "surface": surfaces, "block_key": block}
        )
        # batch-local distinct (combiner)
        df = tbl.to_pandas().drop_duplicates(subset=["mention_iri"], ignore_index=True)
        return pa.Table.from_pandas(df, preserve_index=False).cast(tbl.schema)

    def per_block(group: pa.Table) -> pa.Table:
        df = (
            group.to_pandas()
            .drop_duplicates(subset=["mention_iri"], ignore_index=True)
            .sort_values("mention_iri", ignore_index=True)
        )
        return pa.Table.from_pandas(df, preserve_index=False).cast(group.schema)

    return (
        triples_ds.map_batches(project, batch_format="pyarrow")
        .groupby("block_key")
        .map_groups(per_block, batch_format="pyarrow")
    )


def build_entity_links(triples_ds) -> pa.Table:
    """mention_iri -> canonical_iri table (driver-materialized small side)."""
    mentions = harvest_mentions(triples_ds)
    # per-block union edges: every mention in a block links to the block's
    # canonical entity IRI
    edges = mentions.map_batches(
        lambda b: pa.table(
            {
                "a": b.column("mention_iri"),
                "b": pc.binary_join_element_wise(
                    ENT_NS, b.column("block_key").combine_chunks(), ""
                ),
            }
        ),
        batch_format="pyarrow",
    ).take_all()  # small side by design (distinct mentions only)

    uf = UnionFind()
    for row in edges:
        uf.union(row["a"], row["b"])
    mapping: dict[str, str] = {}
    for row in edges:
        mapping[row["a"]] = uf.find(row["a"])
    return pa.table(
        {
            "mention": pa.array(sorted(mapping), pa.string()),
            "canonical_iri": pa.array(
                [mapping[k] for k in sorted(mapping)], pa.string()
            ),
        }
    )


class Canonicalizer:
    """Actor-pool batch rewriter: the link map is deserialized once per
    actor (__init__), not once per batch (SURVEY.md A5)."""

    def __init__(self, link_ref):
        link_tbl: pa.Table = ray.get(link_ref) if isinstance(link_ref, ray.ObjectRef) else link_ref
        self.keys = link_tbl.column("mention").combine_chunks()
        self.vals = link_tbl.column("canonical_iri").combine_chunks()

    def _sub(self, arr: pa.ChunkedArray) -> pa.Array:
        arr = arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr
        idx = pc.index_in(arr, value_set=self.keys)
        replaced = pc.take(self.vals, idx)
        return pc.if_else(pc.is_valid(idx), replaced, arr)

    def __call__(self, batch: pa.Table) -> pa.Table:
        subj = self._sub(batch.column("subj"))
        obj_lex = batch.column("obj_lex").combine_chunks()
        iri_mask = pc.equal(batch.column("obj_kind"), "iri")
        obj_sub = self._sub(obj_lex)
        obj_lex = pc.if_else(iri_mask, obj_sub, obj_lex)
        return batch.set_column(0, "subj", subj).set_column(
            batch.schema.get_field_index("obj_lex"), "obj_lex", obj_lex
        )


def entity_triples(link_tbl: pa.Table) -> pa.Table:
    """Canonical-entity metadata triples derived from the link table."""
    import pyarrow.compute as _pc

    canon = _pc.unique(link_tbl.column("canonical_iri").combine_chunks())
    canon = canon.take(_pc.array_sort_indices(canon))
    surfaces = _pc.utf8_replace_slice(canon, 0, len(ENT_NS), "")
    n = len(canon)
    return pa.table(
        {
            "subj": canon,
            "pred": pa.array([RDF_TYPE] * n, pa.string()),
            "obj_kind": pa.array(["iri"] * n, pa.string()),
            "obj_lex": pa.array([C_ENTITY] * n, pa.string()),
            "obj_dt": pa.array([""] * n, pa.string()),
            "obj_lang": pa.array([""] * n, pa.string()),
            "doc_id": pa.array([""] * n, pa.string()),
            "span_idx": pa.array([-1] * n, pa.int32()),
        }
    ), pa.table(
        {
            "subj": canon,
            "pred": pa.array([P_SURFACE] * n, pa.string()),
            "obj_kind": pa.array(["literal"] * n, pa.string()),
            "obj_lex": surfaces,
            "obj_dt": pa.array([XSD_STRING] * n, pa.string()),
            "obj_lang": pa.array([""] * n, pa.string()),
            "doc_id": pa.array([""] * n, pa.string()),
            "span_idx": pa.array([-1] * n, pa.int32()),
        }
    )


def canonicalize_triples(triples_ds, link_tbl: pa.Table, concurrency=None):
    """Rewrite mention IRIs to canonical entity IRIs and append entity
    metadata triples."""
    link_ref = ray.put(link_tbl)
    rewritten = triples_ds.map_batches(
        Canonicalizer,
        fn_constructor_args=(link_ref,),
        batch_format="pyarrow",
        concurrency=concurrency
        or (2, max(2, int(ray.cluster_resources().get("CPU", 4)))),
    )
    t1, t2 = entity_triples(link_tbl)
    import ray.data as rd

    extra = rd.from_arrow(pa.concat_tables([t1, t2]))
    return rewritten.union(extra)
