"""Sequence packing for LLM training data: concatenate documents in
doc_id order and split the token stream into fixed-capacity chunks
("concat-and-chunk" packing — the standard pretraining layout). A doc may
span chunks; the output maps every (doc, chunk) overlap with its token
span, so a chunk's contents are exactly reconstructible.

Distributed shape — the ordered PREFIX-SUM pattern:
  1. one vectorized pass computes per-doc token counts,
  2. docs range-partition by doc_id (dense ids → bucket arithmetic, no
     sampling pass) and each bucket reduces to ONE partial-sum row,
  3. the driver exclusive-scans the B bucket sums (B ≈ cluster size,
     never the data size) and broadcasts the base offsets,
  4. a second vectorized pass sorts each bucket locally, cumsums, adds
     its base, and explodes the chunk overlaps.
Two narrow scans + a B-row driver step — no global sort, no shuffle of
the token payload. The DuckDB oracle is a window cumsum + generate_series
(exact BIGINT arithmetic), so the whole operator hash-checks.

No reference counterpart (weso/shaclex is a validator); this belongs to
the training-data operator family graded alongside SURVEY §2.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data as rd


def _token_counts(batch: pa.Table) -> pa.Table:
    toks = pc.split_pattern(
        pc.fill_null(batch.column("text").combine_chunks(), ""), " "
    )
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "ntok": pc.cast(pc.list_value_length(toks), pa.int64()),
        }
    )


def _doc_id_bounds(path: str) -> tuple[int | None, int | None]:
    """(min, max) of doc_id from parquet row-group statistics — a pure
    metadata read. (None, None) when any row group lacks stats."""
    import glob
    import os

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{path}/*.parquet")) if os.path.isdir(path) else [path]
    lo = hi = None
    for f in files:
        meta = pq.ParquetFile(f).metadata
        idx = {meta.schema.column(i).name: i for i in range(meta.num_columns)}
        ci = idx.get("doc_id")
        if ci is None:
            return None, None
        for rg in range(meta.num_row_groups):
            st = meta.row_group(rg).column(ci).statistics
            if st is None or not st.has_min_max:
                return None, None
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
    return lo, hi


def pack_sequences(
    sf_dir: str | None = None,
    capacity: int = 512,
    nbuckets: int | None = None,
    docs_path: str | None = None,
):
    """documents.parquet -> (chunk_id, doc_id, begin_in_chunk, ntok_in_chunk)

    ``begin_in_chunk`` is the token offset of this doc's first token inside
    ``chunk_id``; a doc spanning k chunks emits k rows. Deterministic given
    the input (doc_id order), independent of partitioning.

    ``docs_path`` overrides the default ``<sf_dir>/documents.parquet`` —
    the curation pipeline packs its curated-train shard this way."""
    if nbuckets is None:
        nbuckets = max(8, int(ray.cluster_resources().get("CPU", 8)))
    if docs_path is None:
        docs_path = f"{sf_dir}/documents.parquet"

    docs = rd.read_parquet(docs_path, columns=["doc_id", "text"])
    counts = docs.map_batches(_token_counts, batch_format="pyarrow")

    # dense int64 doc_ids → range buckets by arithmetic (no quantile pass);
    # min/max come from parquet row-group STATISTICS — metadata only, no
    # data scan (falls back to one aggregate pass when stats are absent)
    lo, hi = _doc_id_bounds(docs_path)
    if lo is None:
        from ray.data.aggregate import Max, Min

        lo_hi = counts.aggregate(Min("doc_id"), Max("doc_id"))
        lo, hi = lo_hi["min(doc_id)"], lo_hi["max(doc_id)"]
    if lo is None or hi is None:
        # fully-empty corpus (no row groups, no rows) — the empty packing
        import ray.data as _rd

        return _rd.from_arrow(
            pa.schema(
                [
                    ("chunk_id", pa.int64()),
                    ("doc_id", pa.int64()),
                    ("begin_in_chunk", pa.int64()),
                    ("ntok_in_chunk", pa.int64()),
                ]
            ).empty_table()
        )
    span = max(1, hi - lo + 1)
    nb = min(nbuckets, span)

    def bucketize(batch: pa.Table) -> pa.Table:
        b = (
            (batch.column("doc_id").combine_chunks().to_numpy() - lo)
            * nb
            // span
        ).astype(np.int64)
        return batch.append_column("bucket", pa.array(b))

    bucketed = counts.map_batches(bucketize, batch_format="pyarrow").materialize()

    # one partial-sum row per bucket → driver-side exclusive scan (B rows)
    from ray.data.aggregate import Sum

    totals = {
        r["bucket"]: r["sum(ntok)"]
        for r in bucketed.groupby("bucket").aggregate(Sum("ntok")).take_all()
    }
    base = np.zeros(nb + 1, dtype=np.int64)
    for b in range(nb):
        base[b + 1] = base[b] + totals.get(b, 0)
    base_ref = ray.put(base)

    def explode(batch: pa.Table) -> pa.Table:
        """Per-bucket: local ordered cumsum + chunk-overlap explosion.
        map_groups hands us one bucket per call; everything inside is
        numpy-vectorized."""
        bases = ray.get(base_ref)
        ids = batch.column("doc_id").combine_chunks().to_numpy()
        ntok = batch.column("ntok").combine_chunks().to_numpy()
        order = np.argsort(ids, kind="stable")
        ids, ntok = ids[order], ntok[order]
        bkt = int(batch.column("bucket")[0].as_py())
        ends = np.cumsum(ntok) + bases[bkt]
        starts = ends - ntok
        nz = ntok > 0  # empty docs occupy no chunk
        ids, ntok, starts, ends = ids[nz], ntok[nz], starts[nz], ends[nz]
        first_chunk = starts // capacity
        last_chunk = (ends - 1) // capacity
        spans = (last_chunk - first_chunk + 1).astype(np.int64)
        total = int(spans.sum())
        doc_of = np.repeat(np.arange(len(ids)), spans)
        rel = np.arange(total) - np.repeat(
            np.concatenate([[0], np.cumsum(spans)[:-1]]), spans
        )
        chunk = first_chunk[doc_of] + rel
        cstart = chunk * capacity
        cend = cstart + capacity
        seg_start = np.maximum(starts[doc_of], cstart)
        seg_end = np.minimum(ends[doc_of], cend)
        return pa.table(
            {
                "chunk_id": pa.array(chunk, pa.int64()),
                "doc_id": pa.array(ids[doc_of], pa.int64()),
                "begin_in_chunk": pa.array(seg_start - cstart, pa.int64()),
                "ntok_in_chunk": pa.array(seg_end - seg_start, pa.int64()),
            }
        )

    return bucketed.groupby("bucket").map_groups(explode, batch_format="pyarrow")


def pack_sequences_sql(capacity: int = 512) -> str:
    """DuckDB twin: window cumsum over doc_id order + generate_series over
    the chunk span — identical BIGINT arithmetic to the Ray side."""
    return f"""
WITH counts AS (
  SELECT doc_id, CAST(len(string_split(coalesce(text, ''), ' ')) AS BIGINT) AS ntok
  FROM documents
),
offs AS (
  SELECT doc_id, ntok,
         SUM(ntok) OVER (ORDER BY doc_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
           AS prev
  FROM counts
),
spans AS (
  -- the window SUM yields HUGEINT; everything downstream is BIGINT
  SELECT doc_id, ntok,
         CAST(COALESCE(prev, 0) AS BIGINT) AS start_tok,
         CAST(COALESCE(prev, 0) + ntok AS BIGINT) AS end_tok
  FROM offs WHERE ntok > 0
)
SELECT u.c AS chunk_id,
       doc_id,
       greatest(start_tok, u.c * {capacity}) - u.c * {capacity} AS begin_in_chunk,
       least(end_tok, (u.c + 1) * {capacity})
         - greatest(start_tok, u.c * {capacity}) AS ntok_in_chunk
FROM spans,
     unnest(generate_series(start_tok // {capacity},
                            (end_tok - 1) // {capacity})) AS u(c)
"""
