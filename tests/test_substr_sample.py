"""Unit tests for substring dedup and balanced-sampling kernels."""

import numpy as np
import pyarrow as pa

from shaclex_ray.functions.curate import _sample_partial
from shaclex_ray.functions.substr import (
    _dup_bucket_impl,
    _span_bucket_impl,
    _windows_batch,
)


def _doc(doc_id, text):
    return pa.table({"doc_id": pa.array([doc_id], pa.int64()), "text": [text]})


def test_windows_short_doc_yields_none():
    out = _windows_batch(_doc(1, "a b c"), k=8)
    assert out.num_rows == 0


def test_windows_count_and_offsets():
    text = " ".join(str(i) for i in range(10))
    out = _windows_batch(_doc(7, text), k=8)
    assert out.num_rows == 3  # starts 0, 1, 2
    assert out.column("start").to_pylist() == [0, 1, 2]
    assert set(out.column("doc_id").to_pylist()) == {7}


def test_windows_never_cross_docs():
    batch = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": ["a b c d e f g h", "a b c d e f g h"],
        }
    )
    out = _windows_batch(batch, k=8)
    # each doc has exactly one window; both hash identically
    assert out.num_rows == 2
    h = out.column("h1").to_pylist()
    assert h[0] == h[1]


def test_dup_bucket_keeps_only_repeated_hashes():
    tbl = pa.table(
        {
            "h1": pa.array([1, 1, 2], pa.uint64()),
            "h2": pa.array([9, 9, 9], pa.uint64()),
            "doc_id": pa.array([10, 11, 12], pa.int64()),
            "start": pa.array([0, 5, 3], pa.int64()),
        }
    )
    out = _dup_bucket_impl(2, tbl)
    assert sorted(out.column("doc_id").to_pylist()) == [10, 11]


def test_span_merge_overlap_adjacent_and_gap():
    k = 4
    # doc 1: windows at 0,2 overlap -> one span [0,6); window at 6 is
    # adjacent (6 == 2+4) -> merges into [0,10); window at 11 gaps -> own span
    tbl = pa.table(
        {
            "doc_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "start": pa.array([0, 2, 6, 11, 0], pa.int64()),
        }
    )
    out = _span_bucket_impl(k, tbl)
    rows = sorted(
        zip(
            out.column("doc_id").to_pylist(),
            out.column("span_start").to_pylist(),
            out.column("span_end").to_pylist(),
            out.column("n_windows").to_pylist(),
        )
    )
    assert rows == [(1, 0, 10, 3), (1, 11, 15, 1), (2, 0, 4, 1)]


def test_sample_partial_keeps_n_smallest_per_source():
    tbl = pa.table(
        {
            "doc_id": pa.array([5, 3, 9, 1, 2, 8], pa.int64()),
            "source": ["a", "a", "a", "b", "b", "b"],
        }
    )
    out = _sample_partial(tbl, 2)
    got = sorted(zip(out.column("source").to_pylist(), out.column("doc_id").to_pylist()))
    assert got == [("a", 3), ("a", 5), ("b", 1), ("b", 2)]


def test_trim_bucket_impl_cuts_and_passthrough():
    from shaclex_ray.functions.substr import _trim_bucket_impl

    spans = pa.table(
        {
            "doc_id": pa.array([1, 1], pa.int64()),
            "span_start": pa.array([0, 6], pa.int64()),
            "span_end": pa.array([2, 8], pa.int64()),
            "n_windows": pa.array([1, 1], pa.int64()),
        }
    )
    docs = pa.table(
        {
            "doc_id": pa.array([2, 1], pa.int64()),
            "text": ["u v w", "a b c d e f g h"],
            "lang": ["en", "de"],
        }
    )
    out = _trim_bucket_impl(2, spans, docs)
    by_id = {
        r["doc_id"]: r for r in out.to_pylist()
    }
    assert by_id[1]["text"] == "c d e f"
    assert by_id[1]["ntok"] == 4 and by_id[1]["ntok_cut"] == 4
    assert by_id[1]["lang"] == "de"
    # untouched doc passes through reconstructed
    assert by_id[2]["text"] == "u v w" and by_id[2]["ntok_cut"] == 0


def test_trim_bucket_impl_full_cut_and_empty():
    from shaclex_ray.functions.substr import _trim_bucket_impl

    spans = pa.table(
        {
            "doc_id": pa.array([5], pa.int64()),
            "span_start": pa.array([0], pa.int64()),
            "span_end": pa.array([3], pa.int64()),
            "n_windows": pa.array([1], pa.int64()),
        }
    )
    docs = pa.table(
        {"doc_id": pa.array([5], pa.int64()), "text": ["x y z"]}
    )
    out = _trim_bucket_impl(3, spans, docs)
    assert out.column("text").to_pylist() == [""]
    assert out.column("ntok").to_pylist() == [0]
    # empty bucket returns a typed empty table
    empty = _trim_bucket_impl(3, spans.slice(0, 0), docs.slice(0, 0))
    assert empty.num_rows == 0
    assert set(empty.column_names) >= {"doc_id", "text", "ntok", "ntok_cut"}


def test_substr_ops_on_empty_corpus(ray_session, tmp_path):
    """Zero-row corpora and no-duplicate corpora pass cleanly through
    dedup_substring / trim_substring_spans (the zero-block exchange used
    to IndexError in the split kernels)."""
    import pyarrow.parquet as pq

    from shaclex_ray.functions.substr import dedup_substring, trim_substring_spans

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "text": pa.array([], pa.string()),
            "lang": pa.array([], pa.string()),
        }
    )
    p = str(tmp_path / "empty.parquet")
    pq.write_table(empty, p)
    assert dedup_substring(docs_path=p).count() == 0
    out = trim_substring_spans(docs_path=p, columns=("doc_id", "text", "lang"))
    assert out.count() == 0
    assert set(out.schema().names) == {"doc_id", "text", "ntok", "ntok_cut", "lang"}

    # all-unique corpus: no duplicated window anywhere -> untrimmed passthrough
    uniq = pa.table(
        {
            "doc_id": pa.array([1, 2], pa.int64()),
            "text": pa.array(["a b c d", "e f g h"], pa.string()),
        }
    )
    p2 = str(tmp_path / "uniq.parquet")
    pq.write_table(uniq, p2)
    rows = {r["doc_id"]: r for r in trim_substring_spans(docs_path=p2, k=2).take_all()}
    assert rows[1]["text"] == "a b c d" and rows[1]["ntok_cut"] == 0
    assert rows[2]["text"] == "e f g h" and rows[2]["ntok_cut"] == 0
