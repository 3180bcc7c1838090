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
span_idx) witness).
"""

from __future__ import annotations

import polars as pl
import pyarrow as pa

from shaclex_ray.terms import TRIPLE_ID_COLS

DEFAULT_NBUCKETS = 64


def _dedup_table(tbl: pa.Table) -> pa.Table:
    df = pl.from_arrow(tbl)
    out = (
        df.sort(TRIPLE_ID_COLS + ["doc_id", "span_idx"])
        .unique(subset=TRIPLE_ID_COLS, keep="first", maintain_order=True)
    )
    return out.to_arrow().cast(tbl.schema)


def _local_dedup(batch: pa.Table) -> pa.Table:
    return _dedup_table(batch)


def _add_bucket(batch: pa.Table, nbuckets: int) -> pa.Table:
    df = pl.from_arrow(batch)
    b = (
        df.select(pl.concat_str([pl.col(c) for c in TRIPLE_ID_COLS], separator="\x1f").hash())
        .to_series()
        .rename("bucket")
        % nbuckets
    )
    return batch.append_column("bucket", pa.array(b.to_list(), pa.int64()))


def dedup_triples(triples_ds, nbuckets: int = DEFAULT_NBUCKETS):
    """Distinct triples (on TRIPLE_ID_COLS), streaming, skew-resistant."""

    def bucket_fn(batch: pa.Table) -> pa.Table:
        return _add_bucket(_dedup_table(batch), nbuckets)

    def group_fn(group: pa.Table) -> pa.Table:
        return _dedup_table(group.drop_columns(["bucket"]))

    return (
        triples_ds.map_batches(bucket_fn, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(group_fn, batch_format="pyarrow")
    )
