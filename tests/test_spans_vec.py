"""Parity: the vectorized span builder equals the per-row reference
builder byte-for-byte on real corpus batches and crafted edge cases."""

import pyarrow as pa
import pyarrow.parquet as pq

from shaclex_ray.sources.documents import build_spans_batch, build_spans_batch_vec


def _cmp(batch):
    a = build_spans_batch(batch)
    b = build_spans_batch_vec(batch)
    assert a.schema.equals(b.schema)
    assert a.equals(b), "vectorized span builder diverged"


def test_spans_vec_matches_on_corpus():
    tbl = pq.read_table(
        "/root/testdata/sf0.01/documents.parquet",
        columns=["doc_id", "text", "lang", "source"],
    )
    _cmp(tbl)


def test_spans_vec_edge_cases():
    rows = {
        "doc_id": pa.array([0, 1, 2, 3, 6, 13], pa.int64()),
        "text": pa.array(
            [
                "spark window hash",          # entities at several variants
                "a b c d e f g h i j k l",    # multiple chunks, no entities
                "x",                          # single token
                "spark  spark",               # double space -> empty token
                "merge join stream vector customer spark window hash merge",
                "t " * 40 + "spark",          # long doc, entity in last chunk
            ]
        ),
        "lang": pa.array(["en"] * 6),
        "source": pa.array(["s"] * 6),
    }
    _cmp(pa.table(rows))


def test_spans_vec_empty_text_falls_back():
    rows = {
        "doc_id": pa.array([0, 1], pa.int64()),
        "text": pa.array(["", "spark hash"]),
        "lang": pa.array(["en", "en"]),
        "source": pa.array(["s", "s"]),
    }
    _cmp(pa.table(rows))
