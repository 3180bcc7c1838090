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


def _adjacent_identity_neq(tbl: pa.Table, id_cols: list[str]) -> np.ndarray:
    """bool[n-1]: row i+1's identity differs from row i's (vectorized).

    Null-aware with SQL-DISTINCT semantics (matching the row hash, which
    gives all nulls one fixed hash): null == null, null != value. Without
    the null handling, ``pc.not_equal`` yields null for any null operand
    and the numpy conversion degrades to an object array that crashes the
    ``|=`` — so a duplicate pair carrying a null identity column killed
    the whole task."""
    t = tbl.combine_chunks()
    m = t.num_rows
    neq = np.zeros(max(m - 1, 0), dtype=bool)
    for c in id_cols:
        arr = t.column(c).chunk(0)
        a, b = arr.slice(1), arr.slice(0, m - 1)
        d = pc.not_equal(a, b)
        if d.null_count:
            d = pc.or_(
                pc.fill_null(d, False), pc.xor(pc.is_null(a), pc.is_null(b))
            )
        neq |= d.to_numpy(zero_copy_only=False)
    return neq


def _partition_slices(tbl: pa.Table, sorted_b: np.ndarray, nbuckets: int):
    """Slice a bucket-sorted table into ``nbuckets`` zero-copy views.
    ``sorted_b`` is the (nondecreasing) bucket id per row of ``tbl``."""
    bounds = np.searchsorted(sorted_b, np.arange(nbuckets + 1))
    return tuple(
        tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        for i in range(nbuckets)
    )


def _keep_rows(
    base: pa.Table,
    order: np.ndarray,
    hs: np.ndarray,
    id_cols: list[str] | None = None,
    witness_cols: list[str] | None = None,
) -> np.ndarray:
    """Surviving row indices (into ``base``), in ``order``'s sequence.

    ``order`` must group equal hashes adjacently. Unique-hash rows
    survive untouched; rows inside an equal-hash run get the exact
    treatment: the run is ordered by the INTEGER witness columns (or kept
    as-is when ``witness_cols`` is None — full-row distinct keeps any
    one of a set of identical rows), the least witness per distinct
    identity survives, and identity equality is VERIFIED by string
    comparison. A run where verification finds a second identity (a
    64-bit hash collision) is re-treated with a full multi-key sort, so
    the result is exact — the string sort touches collision runs only,
    never the whole duplicate fraction."""
    id_cols = TRIPLE_ID_COLS if id_cols is None else id_cols
    n = len(order)
    if n <= 1:
        return order
    hso = hs[order]
    eq_prev = np.zeros(n, dtype=bool)
    eq_prev[1:] = hso[1:] == hso[:-1]
    run = eq_prev.copy()
    run[:-1] |= eq_prev[1:]
    if not run.any():
        return order
    sub_pos = np.flatnonzero(run)  # positions in the sorted sequence
    sub_rows = order[sub_pos]  # rows in base
    h_sub = hso[sub_pos]
    if witness_cols:
        # hash-then-witness sort of the dup subset via Arrow's C multi-key
        # sort (doc_id is a STRING column — np.lexsort would fall back to
        # object-dtype Python comparisons)
        sub_rows_pa = pa.array(sub_rows)
        wt = pa.table(
            {
                "_h": pa.array(h_sub),
                **{c: base.column(c).take(sub_rows_pa) for c in witness_cols},
            }
        )
        idx = pc.sort_indices(
            wt,
            sort_keys=[("_h", "ascending")]
            + [(c, "ascending") for c in witness_cols],
        ).to_numpy()
    else:
        idx = np.arange(len(sub_pos))
    sr = sub_rows[idx]
    h_sorted = h_sub[idx]
    neq = _adjacent_identity_neq(base.select(id_cols).take(pa.array(sr)), id_cols)
    m = len(sr)
    cont = np.zeros(m, dtype=bool)  # equal-hash continuation of previous row
    cont[1:] = h_sorted[1:] == h_sorted[:-1]
    keep_sub = ~cont  # keep each run's first (= least witness) row
    coll = cont[1:] & neq  # same hash, different identity: collision
    if coll.any():
        run_ids = np.cumsum(~cont) - 1
        bad_runs = np.unique(run_ids[1:][coll])
        bp = np.flatnonzero(np.isin(run_ids, bad_runs))
        bt = base.take(pa.array(sr[bp])).append_column(
            "_h", pa.array(h_sorted[bp])
        )
        skeys = [("_h", "ascending")] + [
            (c, "ascending") for c in list(id_cols) + list(witness_cols or [])
        ]
        sidx = pc.sort_indices(bt, sort_keys=skeys).to_numpy()
        st = bt.take(pa.array(sidx))
        nq = _adjacent_identity_neq(st.select(id_cols), id_cols)
        hh = h_sorted[bp][sidx]
        k = len(sidx)
        keep_bad = np.ones(k, dtype=bool)
        keep_bad[1:] = ~((hh[1:] == hh[:-1]) & ~nq)
        keep_sub[bp] = False
        keep_sub[bp[sidx[keep_bad]]] = True
    keep_mask = np.ones(n, dtype=bool)
    keep_mask[sub_pos[idx[~keep_sub]]] = False
    return order[keep_mask]


def _dedup_table(tbl: pa.Table) -> pa.Table:
    """Distinct on TRIPLE_ID_COLS keeping the least (doc_id, span_idx)
    witness — integer hash sort + exact treatment of the dup fraction."""
    if tbl.num_rows <= 1:
        return tbl
    h = _row_hash(tbl)
    order = np.argsort(h, kind="stable")
    kept = _keep_rows(tbl, order, h, TRIPLE_ID_COLS, ["doc_id", "span_idx"])
    return tbl.take(pa.array(kept))


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

def _dedup_split_impl(nbuckets: int, link_tbl, *tbls: pa.Table):
    from shaclex_ray.terms import TRIPLES_SCHEMA

    # zero-row blocks from upstream map_groups can carry an EMPTY schema —
    # filter them (and synthesize a typed empty table if nothing remains)
    real = [t for t in tbls if t.num_rows > 0]
    if not real:
        real = [TRIPLES_SCHEMA.empty_table()]
    if link_tbl is not None:
        # fused canonicalization (broadcast regime): rewrite mention IRIs
        # per block INSIDE the exchange's map side — the rewritten table
        # never materializes as an intermediate Dataset in the object store
        from shaclex_ray.stages.link import Canonicalizer

        cz = Canonicalizer(link_tbl)
        real = [cz(t) if t.num_rows else t for t in real]
    # concat_tables is ZERO-COPY (chunked views); everything downstream
    # (polars hash, takes) handles chunked columns — never flatten the
    # full group into a fresh copy
    base = pa.concat_tables(real)
    h = _row_hash(base)
    b = (h % np.uint64(nbuckets)).astype(np.int64)
    # ONE integer lexsort orders rows (bucket, hash): partition bounds and
    # the adjacency the dedup needs come from the same pass. Equal hashes
    # imply equal buckets, so hash runs never straddle a bucket boundary.
    order = np.lexsort((h, b))
    # map-side combine: surviving rows gathered in ONE take (the sorted
    # full table is never materialized)
    kept = _keep_rows(base, order, h, TRIPLE_ID_COLS, ["doc_id", "span_idx"])
    out = base.take(pa.array(kept))
    if nbuckets == 1:
        return out  # num_returns=1: the single return IS the table
    return _partition_slices(out, b[kept], nbuckets)


def _dedup_bucket_impl(*parts: pa.Table) -> pa.Table:
    return _dedup_table(pa.concat_tables(list(parts)))


def _dedup_split_files_impl(nbuckets: int, link_tbl, files: list[str]):
    """Split variant reading its parquet shards DIRECTLY from storage —
    the exchange input never stages through the object store."""
    import pyarrow.parquet as pq

    tbls = [pq.read_table(f) for f in files]
    return _dedup_split_impl(nbuckets, link_tbl, *tbls)


def dedup_triples_fast_from_parquet(
    path: str,
    nbuckets: int | None = None,
    canonicalize_with: pa.Table | None = None,
    extra_tables: list[pa.Table] | None = None,
):
    """File-granular fused exchange over a parquet checkpoint directory:
    each split task reads its own shard files (storage → task heap, no
    object-store staging), optionally applies the broadcast
    canonicalization, and partitions in one pass. The 100-TB shape: input
    bytes move exactly once, from storage into the exchange."""
    import glob as _glob

    import ray
    import ray.data as rd

    files = sorted(_glob.glob(f"{path}/*.parquet"))
    if not files:
        raise FileNotFoundError(f"no parquet shards under {path}")
    split_task = ray.remote(_dedup_split_files_impl)
    bucket_task = ray.remote(_dedup_bucket_impl)
    link_ref = (
        ray.put(canonicalize_with) if canonicalize_with is not None else None
    )
    # bound rows per split group, NOT groups per cpu: a group must fit a
    # task heap (~2M rows ≈ 300MB + working copies) regardless of input
    # volume — at 10-100x the corpus, cpu-count-sized groups balloon to
    # gigabytes each and the concurrent peak thrashes the node
    import math as _math
    import os as _os

    import pyarrow.parquet as _pq

    total_rows = sum(
        _pq.ParquetFile(f).metadata.num_rows for f in files
    )
    target = int(_os.environ.get("SHACLEX_SPLIT_ROWS", "2000000"))
    if nbuckets is None:
        # the REDUCE side is volume-bounded too: per-bucket rows ≈
        # total/nbuckets must fit a task heap, so buckets scale with the
        # data (≈2×SPLIT_ROWS each), floored at cluster width and capped
        # at 1024 — the split-output ref matrix is ngroups×nbuckets, and
        # past ~10^9 rows the right move is a second recursive exchange
        # level per oversized bucket, not more refs
        nbuckets = max(
            8,
            int(ray.cluster_resources().get("CPU", 8)),
            min(1024, _math.ceil(total_rows / (2 * target))),
        )
    ngroups = max(1, min(len(files), _math.ceil(total_rows / target)))
    groups = [files[g::ngroups] for g in range(ngroups)]
    split_refs = [
        split_task.options(num_returns=nbuckets).remote(nbuckets, link_ref, grp)
        for grp in groups
    ]
    if extra_tables:
        extra_refs = [ray.put(t) for t in extra_tables]
        split_refs.append(
            ray.remote(_dedup_split_impl)
            .options(num_returns=nbuckets)
            .remote(nbuckets, None, *extra_refs)
        )
    if nbuckets == 1:
        split_refs = [[r] for r in split_refs]
    out_refs = [
        bucket_task.remote(*[grp[b] for grp in split_refs]) for b in range(nbuckets)
    ]
    return rd.from_arrow_refs(out_refs)


def dedup_triples_fast(
    triples_ds,
    nbuckets: int | None = None,
    canonicalize_with: pa.Table | None = None,
    extra_tables: list[pa.Table] | None = None,
):
    """Explicit one-move hash exchange: blocks → map-side combine +
    single-sort partition → per-bucket sort-merge dedup; result wraps back
    into a Dataset via from_arrow_refs (zero-copy).

    ``canonicalize_with``: small (broadcast) link table — the mention→
    canonical rewrite runs fused inside the split tasks, so the rewritten
    table never materializes between canonicalization and dedup (one full
    object-store round-trip saved). ``extra_tables``: small side tables
    (entity metadata triples) that join the exchange so witness selection
    across rewritten+extra rows is identical to the unfused pipeline."""
    import ray
    import ray.data as rd

    split_task = ray.remote(_dedup_split_impl)
    bucket_task = ray.remote(_dedup_bucket_impl)

    link_ref = (
        ray.put(canonicalize_with) if canonicalize_with is not None else None
    )
    mat = triples_ds.materialize()
    refs = mat.to_arrow_refs()
    total_rows = mat.count()
    if nbuckets is None:
        # size the exchange to the data (see distinct_rows_fast)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        nbuckets = max(1, min(ncpu, total_rows // 200_000 + 1))
    import math as _math
    import os as _os2

    target = int(_os2.environ.get("SHACLEX_SPLIT_ROWS", "2000000"))
    ngroups = max(
        1, min(len(refs), max(nbuckets, _math.ceil(total_rows / target)))
    )
    groups = [list(refs[g::ngroups]) for g in range(ngroups)]
    extra_refs = [ray.put(t) for t in (extra_tables or [])]
    split_refs = [
        split_task.options(num_returns=nbuckets).remote(nbuckets, link_ref, *grp)
        for grp in groups
    ]
    if extra_refs:
        # extras bypass the rewrite (they are already canonical) but join
        # the same exchange via one extra split task
        split_refs.append(
            split_task.options(num_returns=nbuckets).remote(
                nbuckets, None, *extra_refs
            )
        )
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

def _distinct_split_impl(
    nbuckets: int, cols: list[str], schema: pa.Schema, *tbls: pa.Table
):
    real = [t for t in tbls if t.num_rows > 0]
    if not real:
        # a strided split group can be ALL degenerate zero-column empty
        # blocks; the driver-supplied dataset schema is the authority, so
        # the empty partial always concats cleanly with real partials
        empty = schema.empty_table()
        return empty if nbuckets == 1 else tuple(empty for _ in range(nbuckets))
    base = pa.concat_tables(real)
    h = _row_hash(base, cols)
    b = (h % np.uint64(nbuckets)).astype(np.int64)
    order = np.lexsort((h, b))
    kept = _keep_rows(base, order, h, id_cols=cols, witness_cols=None)
    out = base.take(pa.array(kept))
    if nbuckets == 1:
        return out
    return _partition_slices(out, b[kept], nbuckets)


def _distinct_bucket_impl(cols: list[str], *parts: pa.Table):
    base = pa.concat_tables(list(parts))
    if base.num_rows <= 1:
        return base
    h = _row_hash(base, cols)
    order = np.argsort(h, kind="stable")
    kept = _keep_rows(base, order, h, id_cols=cols, witness_cols=None)
    return base.take(pa.array(kept))


def distinct_rows_fast(ds, nbuckets: int | None = None, empty_schema=None):
    """Exact DISTINCT over all columns of a Dataset: blocks → map-side
    combine + single-pass hash partition → per-bucket vectorized distinct.
    One data move, no sort-based shuffle, no per-group Python calls."""
    import ray
    import ray.data as rd

    mat = ds.materialize()
    refs = mat.to_arrow_refs()
    schema = mat.schema()
    if schema is None:
        # a fully-empty upstream can surface ZERO blocks (no schema at
        # all); the distinct of nothing is nothing — keep the declared
        # column set if the caller gave one so downstream maps see fields
        if empty_schema is not None:
            return rd.from_arrow(empty_schema.empty_table())
        return mat
    cols = schema.names
    if nbuckets is None:
        # size the exchange to the DATA, not the cluster: a tiny distinct
        # must not fan out cpus x cpus near-empty objects (a 32x32 grid of
        # ~0-row slices costs seconds of dispatch for nothing)
        ncpu = int(ray.cluster_resources().get("CPU", 8))
        nbuckets = max(1, min(ncpu, mat.count() // 200_000 + 1))
    split_task = ray.remote(_distinct_split_impl)
    bucket_task = ray.remote(_distinct_bucket_impl)
    import math as _math
    import os as _os3

    target = int(_os3.environ.get("SHACLEX_SPLIT_ROWS", "2000000"))
    ngroups = max(
        1,
        min(len(refs), max(nbuckets, _math.ceil(mat.count() / target))),
    )
    groups = [refs[g::ngroups] for g in range(ngroups)]
    pa_schema = pa.schema(list(zip(schema.names, schema.types)))
    split_refs = [
        split_task.options(num_returns=nbuckets).remote(
            nbuckets, cols, pa_schema, *grp
        )
        for grp in groups
    ]
    if nbuckets == 1:
        split_refs = [[r] for r in split_refs]
    out_refs = [
        bucket_task.remote(cols, *[grp[b] for grp in split_refs])
        for b in range(nbuckets)
    ]
    return rd.from_arrow_refs(out_refs)
