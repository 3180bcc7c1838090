"""Exact triple deduplication (SURVEY.md G10): RDF graphs are sets.

Two-phase, skew-proof (north-star: "salted hash shuffles + per-partition
triple-dedup sort-merge"):

  1. batch-local dedup inside ``map_batches`` (combiner — removes the bulk
     of duplicates before any network traffic; duplicates are overwhelmingly
     intra-document, hence intra-batch)
  2. hash-bucket the triple identity key into ``nbuckets`` coarse partitions
     and dedup each bucket vectorized in one ``map_groups`` call.

Bucketing by a *hash of the full identity tuple* (not by ``subj``) means a
hub subject with 10^7 arcs spreads over all buckets — the salt is the
(pred, obj) part of the key, exactly the salted-aggregate shape from
SURVEY.md §4.2. Determinism: the final table is a pure function of the
input rows (lineage column kept = lexicographically-least (doc_id,
span_idx) witness); the bucket hash is pandas' fixed-key siphash, stable
across processes and runs.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from shaclex_ray.terms import TRIPLE_ID_COLS

DEFAULT_NBUCKETS = 64
_SORT_COLS = TRIPLE_ID_COLS + ["doc_id", "span_idx"]


def _key_series(df: pd.DataFrame) -> np.ndarray:
    key = df[TRIPLE_ID_COLS[0]].astype(str)
    for c in TRIPLE_ID_COLS[1:]:
        key = key + "\x1f" + df[c].astype(str)
    return key.to_numpy(dtype=object)


def _dedup_df(df: pd.DataFrame) -> pd.DataFrame:
    df = df.sort_values(_SORT_COLS, kind="mergesort", ignore_index=True)
    return df.drop_duplicates(subset=TRIPLE_ID_COLS, ignore_index=True)


def _dedup_table(tbl: pa.Table) -> pa.Table:
    out = pa.Table.from_pandas(_dedup_df(tbl.to_pandas()), preserve_index=False)
    return out.select(tbl.schema.names).cast(tbl.schema)


def dedup_triples(triples_ds, nbuckets: int = DEFAULT_NBUCKETS):
    """Distinct triples (on TRIPLE_ID_COLS), streaming, skew-resistant.

    Dataset-API variant (one groupby sort-shuffle). See
    ``dedup_triples_fast`` for the explicit single-pass hash exchange used
    by the pipeline at bench scale."""

    def bucket_fn(batch: pa.Table) -> pa.Table:
        df = _dedup_df(batch.to_pandas())
        bucket = (pd.util.hash_array(_key_series(df)) % np.uint64(nbuckets)).astype(
            "int64"
        )
        df["bucket"] = bucket
        return pa.Table.from_pandas(df, preserve_index=False)

    def group_fn(group: pa.Table) -> pa.Table:
        tbl = group.drop_columns(["bucket"])
        return _dedup_table(tbl)

    return (
        triples_ds.map_batches(bucket_fn, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(group_fn, batch_format="pyarrow")
    )


# ---------------------------------------------------------------------------
# explicit hash exchange (the north-star "salted hash shuffles +
# per-partition triple-dedup sort-merge" with rows moving exactly once)

def _dedup_split_impl(nbuckets: int, *tbls: pa.Table):
    from shaclex_ray.terms import TRIPLES_SCHEMA

    # zero-row blocks from upstream map_groups can carry an EMPTY schema —
    # filter them (and synthesize a typed empty table if nothing remains)
    real = [t for t in tbls if t.num_rows > 0]
    if not real:
        real = [TRIPLES_SCHEMA.empty_table()]
    base = pa.concat_tables(real).combine_chunks()
    df = _dedup_df(base.to_pandas())  # map-side combine
    buckets = (pd.util.hash_array(_key_series(df)) % np.uint64(nbuckets)).astype(
        np.int64
    )
    order = np.argsort(buckets, kind="stable")
    sorted_tbl = pa.Table.from_pandas(df.iloc[order], preserve_index=False)
    # from_pandas of an all-empty group infers null types — pin the real
    # schema so every split group emits concat-compatible parts
    sorted_tbl = sorted_tbl.select(base.schema.names).cast(base.schema)
    sorted_b = buckets[order]
    bounds = np.searchsorted(sorted_b, np.arange(nbuckets + 1))
    if nbuckets == 1:
        return sorted_tbl  # num_returns=1: the single return IS the table
    return tuple(
        sorted_tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        for i in range(nbuckets)
    )


def _dedup_bucket_impl(*parts: pa.Table) -> pa.Table:
    return _dedup_table(pa.concat_tables(list(parts)).combine_chunks())


def dedup_triples_fast(triples_ds, nbuckets: int | None = None):
    """Explicit one-move hash exchange: blocks → map-side combine +
    single-sort partition → per-bucket sort-merge dedup; result wraps back
    into a Dataset via from_arrow_refs (zero-copy)."""
    import ray
    import ray.data as rd

    if nbuckets is None:
        nbuckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    split_task = ray.remote(_dedup_split_impl)
    bucket_task = ray.remote(_dedup_bucket_impl)

    mat = triples_ds.materialize()
    refs = mat.to_arrow_refs()
    ngroups = max(1, min(len(refs), nbuckets))
    groups = [refs[g::ngroups] for g in range(ngroups)]
    split_refs = [
        split_task.options(num_returns=nbuckets).remote(nbuckets, *grp)
        for grp in groups
    ]
    if nbuckets == 1:
        split_refs = [[r] for r in split_refs]
    out_refs = [
        bucket_task.remote(*[grp[b] for grp in split_refs]) for b in range(nbuckets)
    ]
    return rd.from_arrow_refs(out_refs)
