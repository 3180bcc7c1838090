"""Bigram language-model scoring over the documents table — the
CCNet-style quality signal a pretraining pipeline runs corpus-wide:
train an n-gram LM on a fixed-size reference slice, score every other
document by how familiar its bigrams are to the model.

Two scorers sharing one model build:

  * ``lm_novelty``:    per-doc INTEGER sufficient statistics
                       (n_bigrams, n_oov, sum_ref_count) — hash-exact
                       against the SQL twin (``lm_novelty_sql``), so it
                       is the oracle-checked surface.
  * ``lm_perplexity``: the float score — add-one-smoothed conditional
                       bigram perplexity exp(-mean ln P(w2|w1)),
                       P(w2|w1) = (c(w1 w2)+1)/(c(w1)+V). Floats sum in
                       document order (deterministic on the Ray side)
                       but a SQL aggregate reorders them, so this one
                       is pinned by a pure-Python reference in pytest
                       instead of the DuckDB oracle.

Scale shape (the CCNet argument): the reference slice is FIXED-SIZE by
construction (a curated reference corpus — Wikipedia in CCNet — not a
fraction that grows with the input), so the model table is broadcast
once via ``ray.put`` and every scoring batch does one vectorized
``pc.index_in`` probe (C++ hash join against the broadcast keys) — the
corpus side never shuffles and the whole pass is one pruned
(doc_id, text) read. For a model too large to broadcast, hash-partition
the bigram stream and the model on the bigram key instead (the
``stages/groupagg`` one-move exchange, which already builds the model
here). Bigrams are compared as exact strings (tokens cannot contain the
separator, so ``w1 || ' ' || w2`` is injective) — no hash-collision
caveat.

No counterpart in the reference (weso/shaclex is a validation engine);
this extends the engine toward the training-data-pipeline surface, in
the style of functions/curate.py / text.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from shaclex_ray.stages.groupagg import grouped_aggregate_fast

_EMPTY_BG = pa.array([], pa.string())


def _bigrams(text, par: np.ndarray):
    """All within-document token bigrams of a batch as strings
    ``w1 + ' ' + w2``, plus each bigram's parent row index. ``text`` is
    the flattened token array, ``par`` its per-token parent row."""
    n = len(text)
    if n < 2:
        return _EMPTY_BG, np.array([], np.int64)
    same = par[:-1] == par[1:]
    left = text.slice(0, n - 1)
    right = text.slice(1, n - 1)
    big = pc.binary_join_element_wise(left, right, " ")
    return big.filter(pa.array(same)), par[:-1][same]


def _flat_tokens(batch: pa.Table):
    toks = pc.split_pattern(
        pc.fill_null(batch.column("text").combine_chunks(), ""), " "
    )
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    par = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
    return flat, par


def _model_tables(sf_dir: str, ref_mod: int):
    """(bigram counts, unigram counts, unigram vocab size) of the
    reference slice (doc_id % ref_mod == 0), as driver Arrow tables —
    reference-corpus-sized, independent of corpus size."""
    path = f"{sf_dir}/documents.parquet"

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % ref_mod == 0))
        if batch.num_rows == 0:
            return pa.table(
                {"g": _EMPTY_BG, "kind": pa.array([], pa.string()),
                 "c": pa.array([], pa.int64())}
            )
        flat, par = _flat_tokens(batch)
        big, _ = _bigrams(flat, par)
        # map-side combine: one Arrow group_by per batch, C++-side
        out = []
        for arr, kind in ((big, "b"), (flat, "u")):
            t = pa.table({"g": arr})
            gb = t.group_by(["g"], use_threads=False).aggregate([("g", "count")])
            out.append(
                pa.table(
                    {
                        "g": gb.column("g"),
                        "kind": pa.array([kind] * gb.num_rows, pa.string()),
                        "c": gb.column("g_count").cast(pa.int64()),
                    }
                )
            )
        return pa.concat_tables(out)

    parts = ray.data.read_parquet(path, columns=["doc_id", "text"]).map_batches(
        partial, batch_format="pyarrow"
    )
    agg = grouped_aggregate_fast(parts, ["g", "kind"], [("c", "sum")], ["c"])
    blocks = [ray.get(r) for r in agg.materialize().to_arrow_refs()]
    blocks = [b for b in blocks if "kind" in b.column_names]
    if not blocks:  # fully-empty reference slice → empty model
        empty = pa.table({"g": _EMPTY_BG, "c": pa.array([], pa.int64())})
        return empty, empty, 0
    model = pa.concat_tables(blocks).combine_chunks()
    kind = model.column("kind")
    bg = model.filter(pc.equal(kind, "b")).select(["g", "c"])
    uni = model.filter(pc.equal(kind, "u")).select(["g", "c"])
    return bg, uni, uni.num_rows


def _probe(big, model_tbl: pa.Table):
    """counts of each bigram under the model (0 where unseen) + oov mask."""
    idx = pc.index_in(big, value_set=model_tbl.column("g").combine_chunks())
    cnt = pc.take(model_tbl.column("c").combine_chunks(), idx)
    oov = pc.is_null(idx).to_numpy(zero_copy_only=False)
    cnt = pc.fill_null(cnt, 0).to_numpy(zero_copy_only=False)
    return cnt, oov


def lm_novelty(sf_dir: str, ref_mod: int = 10):
    """Per-document bigram novelty vs the reference-slice model: for every
    doc with doc_id % ref_mod != 0, the integer sufficient statistics
    (n_bigrams, n_oov, sum_ref_count) — n_oov high / sum_ref_count low
    means unfamiliar text (the quality-filter ordering without floats)."""
    path = f"{sf_dir}/documents.parquet"
    bg_tbl, _, _ = _model_tables(sf_dir, ref_mod)
    model_ref = ray.put(bg_tbl)

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % ref_mod != 0))
        nrows = batch.num_rows
        if nrows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "n_oov": pa.array([], pa.int64()),
                    "sum_ref_count": pa.array([], pa.int64()),
                }
            )
        # zero-copy plasma view of the broadcast model (shipped per node
        # once); index_in is the per-batch C++ hash probe
        model = ray.get(model_ref)
        flat, par = _flat_tokens(batch)
        big, bpar = _bigrams(flat, par)
        cnt, oov = _probe(big, model)
        n_big = np.zeros(nrows, np.int64)
        n_oov = np.zeros(nrows, np.int64)
        sum_rc = np.zeros(nrows, np.int64)
        np.add.at(n_big, bpar, 1)
        np.add.at(n_oov, bpar, oov.astype(np.int64))
        np.add.at(sum_rc, bpar, cnt)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").combine_chunks().cast(pa.int64()),
                "n_bigrams": pa.array(n_big, pa.int64()),
                "n_oov": pa.array(n_oov, pa.int64()),
                "sum_ref_count": pa.array(sum_rc, pa.int64()),
            }
        )

    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    return ds.map_batches(score, batch_format="pyarrow")


def lm_novelty_sql(ref_mod: int = 10) -> str:
    return f"""
    WITH toks AS (
      SELECT doc_id, string_split(coalesce(text, ''), ' ') AS l FROM documents
    ),
    big AS (
      SELECT doc_id,
             unnest(list_transform(range(1, len(l)),
                                   i -> l[i] || ' ' || l[i+1])) AS bg
      FROM toks
    ),
    model AS (
      SELECT bg, CAST(count(*) AS BIGINT) AS c
      FROM big WHERE doc_id % {ref_mod} = 0 GROUP BY bg
    ),
    agg AS (
      SELECT e.doc_id,
             CAST(count(*) AS BIGINT) AS n_bigrams,
             CAST(sum(CASE WHEN m.c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_oov,
             CAST(sum(coalesce(m.c, 0)) AS BIGINT) AS sum_ref_count
      FROM big e LEFT JOIN model m USING (bg)
      WHERE e.doc_id % {ref_mod} != 0
      GROUP BY e.doc_id
    )
    SELECT d.doc_id,
           coalesce(a.n_bigrams, 0) AS n_bigrams,
           coalesce(a.n_oov, 0) AS n_oov,
           coalesce(a.sum_ref_count, 0) AS sum_ref_count
    FROM documents d LEFT JOIN agg a USING (doc_id)
    WHERE d.doc_id % {ref_mod} != 0
    """


def lm_perplexity(sf_dir: str, ref_mod: int = 10):
    """Add-one-smoothed conditional bigram perplexity of every non-reference
    document under the reference-slice model:

        ppl = exp(-(1/n) * sum ln((c(w1 w2) + 1) / (c(w1) + V)))

    with V = reference unigram vocabulary size and c(.) = 0 for unseen
    grams. Docs with no bigrams score null. Same broadcast-probe shape as
    ``lm_novelty``; pinned by a pure-Python reference in pytest (float
    sums are order-sensitive, so no SQL oracle)."""
    path = f"{sf_dir}/documents.parquet"
    bg_tbl, uni_tbl, vocab = _model_tables(sf_dir, ref_mod)
    bg_ref, uni_ref = ray.put(bg_tbl), ray.put(uni_tbl)

    def score(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        batch = batch.filter(pa.array(ids % ref_mod != 0))
        nrows = batch.num_rows
        if nrows == 0:
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "n_bigrams": pa.array([], pa.int64()),
                    "ppl": pa.array([], pa.float64()),
                }
            )
        bg_m, uni_m = ray.get(bg_ref), ray.get(uni_ref)
        flat, par = _flat_tokens(batch)
        big, bpar = _bigrams(flat, par)
        bg_cnt, _ = _probe(big, bg_m)
        # context counts: the first token of each bigram
        n = len(flat)
        left = flat.slice(0, n - 1).filter(pa.array(par[:-1] == par[1:]))
        w1_cnt, _ = _probe(left, uni_m)
        logp = np.log((bg_cnt + 1.0) / (w1_cnt + float(vocab)))
        n_big = np.zeros(nrows, np.int64)
        s_logp = np.zeros(nrows, np.float64)
        np.add.at(n_big, bpar, 1)
        np.add.at(s_logp, bpar, logp)
        with np.errstate(divide="ignore", invalid="ignore"):
            ppl = np.exp(-s_logp / n_big)
        return pa.table(
            {
                "doc_id": batch.column("doc_id").combine_chunks().cast(pa.int64()),
                "n_bigrams": pa.array(n_big, pa.int64()),
                "ppl": pa.array(
                    np.where(n_big > 0, ppl, np.nan), pa.float64()
                ).cast(pa.float64()),
            }
        )

    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    out = ds.map_batches(score, batch_format="pyarrow")

    def null_empty(batch: pa.Table) -> pa.Table:
        # nan -> null for docs with no bigrams (stable driver hashing)
        ppl = batch.column("ppl").combine_chunks()
        mask = pc.is_nan(ppl)
        return batch.set_column(
            batch.schema.get_field_index("ppl"),
            "ppl",
            pc.if_else(mask, pa.scalar(None, pa.float64()), ppl),
        )

    return out.map_batches(null_empty, batch_format="pyarrow")
