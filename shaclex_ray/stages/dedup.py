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
    """Distinct triples (on TRIPLE_ID_COLS), streaming, skew-resistant."""

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
