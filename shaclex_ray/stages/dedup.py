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
SURVEY.md §4.2.

Hot path: a 64-bit row hash (polars ``hash_rows`` — vectorized Rust,
zero-copy from Arrow; deterministic for a fixed seed within one library
build, which a cluster shares) orders rows with an integer
``np.lexsort``; only rows whose hash collides with another row's (true
duplicates plus astronomically rare 64-bit collisions) get the exact
string comparison, so the expensive multi-key string sort touches the
duplicate fraction, never the whole table. Identical identities always
share a hash, so the result is EXACT — a unique-hash row can have no
duplicate. Determinism: the final table is a pure function of the input
rows (lineage column kept = lexicographically-least (doc_id, span_idx)
witness); bucket assignment is internal and never observable in output.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from shaclex_ray.terms import TRIPLE_ID_COLS

DEFAULT_NBUCKETS = 64
_SORT_COLS = TRIPLE_ID_COLS + ["doc_id", "span_idx"]
_SORT_KEYS = [(c, "ascending") for c in _SORT_COLS]

try:  # polars is baked into the runtime; keep a pandas fallback anyway
    import polars as _pl
except ImportError:  # pragma: no cover
    _pl = None


def _row_hash(tbl: pa.Table, cols: list[str] | None = None) -> np.ndarray:
    """64-bit content hash of each row's identity tuple (vectorized)."""
    cols = TRIPLE_ID_COLS if cols is None else cols
    if tbl.num_rows == 0:
        return np.zeros(0, dtype=np.uint64)
    sel = tbl.select(cols)
    if _pl is not None:
        return _pl.from_arrow(sel).hash_rows(seed=0).to_numpy().astype(np.uint64)
    arrs = [
        pc.cast(sel.column(c).combine_chunks(), pa.string()) for c in cols
    ]
    key = pc.binary_join_element_wise(*arrs, "\x1f")
    return pd.util.hash_array(key.to_numpy(zero_copy_only=False))


def _bucket_array(tbl: pa.Table, nbuckets: int) -> np.ndarray:
    return (_row_hash(tbl) % np.uint64(nbuckets)).astype(np.int64)


def _dedup_id_filter(s: pa.Table) -> pa.Table:
    """Drop rows whose identity equals the previous row's (``s`` must be
    sorted with identity columns grouped adjacently; the first row of each
    run — the least witness — survives)."""
    n = s.num_rows
    if n <= 1:
        return s
    s = s.combine_chunks()
    neq = None
    for c in TRIPLE_ID_COLS:
        arr = s.column(c).chunk(0)
        d = pc.not_equal(arr.slice(1), arr.slice(0, n - 1))
        neq = d if neq is None else pc.or_(neq, d)
    keep = pa.concat_arrays([pa.array([True], pa.bool_()), neq])
    return s.filter(keep)


def _hash_keep_mask(
    s: pa.Table,
    hs: np.ndarray,
    id_cols: list[str] | None = None,
    sort_keys: list | None = None,
) -> np.ndarray:
    """Keep-mask for a table sorted by row hash ``hs``: rows with a unique
    hash survive untouched; rows inside an equal-hash run get the exact
    (identity, witness) treatment and only the least witness per distinct
    identity survives."""
    id_cols = TRIPLE_ID_COLS if id_cols is None else id_cols
    sort_keys = _SORT_KEYS if sort_keys is None else sort_keys
    n = s.num_rows
    if n <= 1:
        return np.ones(n, dtype=bool)
    eq_prev = np.zeros(n, dtype=bool)
    eq_prev[1:] = hs[1:] == hs[:-1]
    run = eq_prev.copy()
    run[:-1] |= eq_prev[1:]
    keep = np.ones(n, dtype=bool)
    if not run.any():
        return keep
    sub_pos = np.nonzero(run)[0]
    sub = s.take(pa.array(sub_pos))
    # exact sort of just the duplicate fraction: hash first (confines
    # string comparisons to within a run), then identity, then witness
    subt = sub.append_column("_h", pa.array(hs[sub_pos]))
    idx = pc.sort_indices(
        subt, sort_keys=[("_h", "ascending")] + sort_keys
    ).to_numpy()
    ss = subt.take(pa.array(idx)).combine_chunks()
    m = len(idx)
    dup = np.ones(m, dtype=bool)  # True = identity equals previous row's
    neq = None
    for c in id_cols:
        arr = ss.column(c).chunk(0)
        d = pc.not_equal(arr.slice(1), arr.slice(0, m - 1)).to_numpy(
            zero_copy_only=False
        )
        neq = d if neq is None else (neq | d)
    dup[0] = False
    dup[1:] = ~neq
    keep[sub_pos[idx[dup]]] = False
    return keep


def _dedup_table(tbl: pa.Table) -> pa.Table:
    """Distinct on TRIPLE_ID_COLS keeping the least (doc_id, span_idx)
    witness — integer hash sort + exact treatment of the dup fraction."""
    if tbl.num_rows <= 1:
        return tbl
    h = _row_hash(tbl)
    order = np.argsort(h, kind="stable")
    s = tbl.take(pa.array(order))
    keep = _hash_keep_mask(s, h[order])
    return s.filter(pa.array(keep))


def dedup_triples(triples_ds, nbuckets: int = DEFAULT_NBUCKETS):
    """Distinct triples (on TRIPLE_ID_COLS), streaming, skew-resistant.

    Dataset-API variant (one groupby sort-shuffle). See
    ``dedup_triples_fast`` for the explicit single-pass hash exchange used
    by the pipeline at bench scale."""

    def bucket_fn(batch: pa.Table) -> pa.Table:
        batch = _dedup_table(batch)  # map-side combine
        return batch.append_column(
            "bucket", pa.array(_bucket_array(batch, nbuckets))
        )

    def group_fn(group: pa.Table) -> pa.Table:
        return _dedup_table(group.drop_columns(["bucket"]))

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
    h = _row_hash(base)
    b = (h % np.uint64(nbuckets)).astype(np.int64)
    # ONE integer lexsort orders rows (bucket, hash): partition bounds and
    # the adjacency the dedup needs come from the same pass. Equal hashes
    # imply equal buckets, so hash runs never straddle a bucket boundary.
    order = np.lexsort((h, b))
    s = base.take(pa.array(order))
    keep = _hash_keep_mask(s, h[order])  # map-side combine
    out = s.filter(pa.array(keep))
    if nbuckets == 1:
        return out  # num_returns=1: the single return IS the table
    sorted_b = b[order][keep]
    bounds = np.searchsorted(sorted_b, np.arange(nbuckets + 1))
    return tuple(
        out.slice(bounds[i], bounds[i + 1] - bounds[i])
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


# ---------------------------------------------------------------------------
# generic exact distinct-rows: the same one-move hash exchange for ANY
# Arrow-schema Dataset. Replaces groupby().map_groups distincts, whose
# sort-based shuffle + one-Python-call-per-group costs seconds of fixed
# overhead even on tiny intermediates.

def _distinct_split_impl(nbuckets: int, cols: list[str], *tbls: pa.Table):
    real = [t for t in tbls if t.num_rows > 0]
    if not real:
        schema = pa.schema([(c, pa.string()) for c in cols])
        for t in tbls:
            if t.num_columns:
                schema = t.schema
                break
        empty = schema.empty_table()
        return empty if nbuckets == 1 else tuple(empty for _ in range(nbuckets))
    base = pa.concat_tables(real).combine_chunks()
    h = _row_hash(base, cols)
    b = (h % np.uint64(nbuckets)).astype(np.int64)
    order = np.lexsort((h, b))
    s = base.take(pa.array(order))
    keep = _hash_keep_mask(
        s, h[order], id_cols=cols, sort_keys=[(c, "ascending") for c in cols]
    )
    out = s.filter(pa.array(keep))
    if nbuckets == 1:
        return out
    sorted_b = b[order][keep]
    bounds = np.searchsorted(sorted_b, np.arange(nbuckets + 1))
    return tuple(
        out.slice(bounds[i], bounds[i + 1] - bounds[i])
        for i in range(nbuckets)
    )


def _distinct_bucket_impl(cols: list[str], *parts: pa.Table):
    base = pa.concat_tables(list(parts)).combine_chunks()
    if base.num_rows <= 1:
        return base
    h = _row_hash(base, cols)
    order = np.argsort(h, kind="stable")
    s = base.take(pa.array(order))
    keep = _hash_keep_mask(
        s, h[order], id_cols=cols, sort_keys=[(c, "ascending") for c in cols]
    )
    return s.filter(pa.array(keep))


def distinct_rows_fast(ds, nbuckets: int | None = None):
    """Exact DISTINCT over all columns of a Dataset: blocks → map-side
    combine + single-pass hash partition → per-bucket vectorized distinct.
    One data move, no sort-based shuffle, no per-group Python calls."""
    import ray
    import ray.data as rd

    if nbuckets is None:
        nbuckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    cols = mat.schema().names
    split_task = ray.remote(_distinct_split_impl)
    bucket_task = ray.remote(_distinct_bucket_impl)
    ngroups = max(1, min(len(refs), nbuckets))
    groups = [refs[g::ngroups] for g in range(ngroups)]
    split_refs = [
        split_task.options(num_returns=nbuckets).remote(nbuckets, cols, *grp)
        for grp in groups
    ]
    if nbuckets == 1:
        split_refs = [[r] for r in split_refs]
    out_refs = [
        bucket_task.remote(cols, *[grp[b] for grp in split_refs])
        for b in range(nbuckets)
    ]
    return rd.from_arrow_refs(out_refs)
