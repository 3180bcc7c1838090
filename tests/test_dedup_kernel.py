"""Unit tests for the dedup keep-rows kernel (stages/dedup.py):
witness selection, hash-collision fallback exactness, and parity between
the one-move exchange and a pandas reference distinct."""

import numpy as np
import pandas as pd
import pyarrow as pa

from shaclex_ray.stages.dedup import _keep_rows, _row_hash
from shaclex_ray.terms import TRIPLE_ID_COLS


def _triples_table(rows):
    cols = {c: [] for c in TRIPLE_ID_COLS + ["doc_id", "span_idx"]}
    for r in rows:
        for c in cols:
            cols[c].append(r[c])
    return pa.table(
        {
            c: pa.array(
                v, pa.int64() if c in ("doc_id", "span_idx") else pa.string()
            )
            for c, v in cols.items()
        }
    )


def _row(subj, doc, span, pred="p"):
    return {
        "subj": subj,
        "pred": pred,
        "obj_kind": "iri",
        "obj_lex": "o",
        "obj_dt": "",
        "obj_lang": "",
        "doc_id": doc,
        "span_idx": span,
    }


def test_keep_rows_least_witness_survives():
    tbl = _triples_table(
        [
            _row("a", 7, 3),
            _row("a", 2, 9),
            _row("a", 2, 1),
            _row("b", 5, 5),
        ]
    )
    h = _row_hash(tbl)
    order = np.argsort(h, kind="stable")
    kept = _keep_rows(tbl, order, h, TRIPLE_ID_COLS, ["doc_id", "span_idx"])
    out = tbl.take(pa.array(kept)).to_pandas()
    assert len(out) == 2
    a = out[out.subj == "a"].iloc[0]
    assert (a.doc_id, a.span_idx) == (2, 1)  # least (doc_id, span_idx)


def test_keep_rows_collision_fallback_exact():
    # craft a fake hash array where DIFFERENT identities share one hash,
    # interleaved by witness order — the integer-witness fast path alone
    # would over-keep; the fallback must resolve it exactly
    tbl = _triples_table(
        [
            _row("x", 1, 0),
            _row("y", 2, 0),
            _row("x", 3, 0),
            _row("y", 4, 0),
            _row("z", 1, 1),
        ]
    )
    h = np.array([11, 11, 11, 11, 99], dtype=np.uint64)
    order = np.argsort(h, kind="stable")
    kept = _keep_rows(tbl, order, h, TRIPLE_ID_COLS, ["doc_id", "span_idx"])
    out = tbl.take(pa.array(kept)).to_pandas()
    assert sorted(out.subj) == ["x", "y", "z"]
    assert out[out.subj == "x"].iloc[0].doc_id == 1  # min witness per identity
    assert out[out.subj == "y"].iloc[0].doc_id == 2


def test_keep_rows_no_witness_full_row_distinct():
    tbl = pa.table({"a": ["u", "v", "u", "w"], "b": ["1", "2", "1", "3"]})
    h = _row_hash(tbl, ["a", "b"])
    order = np.argsort(h, kind="stable")
    kept = _keep_rows(tbl, order, h, ["a", "b"], None)
    out = tbl.take(pa.array(kept)).to_pandas()
    ref = tbl.to_pandas().drop_duplicates()
    assert sorted(map(tuple, out.values.tolist())) == sorted(
        map(tuple, ref.values.tolist())
    )


def test_dedup_fast_matches_pandas_reference(ray_session):
    import ray.data as rd

    from shaclex_ray.stages.dedup import dedup_triples_fast

    rng = np.random.default_rng(0)
    rows = [
        _row(f"s{rng.integers(40)}", int(rng.integers(10)), int(rng.integers(6)),
             pred=f"p{rng.integers(3)}")
        for _ in range(4000)
    ]
    tbl = _triples_table(rows)
    out = (
        dedup_triples_fast(rd.from_arrow(tbl), nbuckets=4)
        .to_pandas()
        .sort_values(TRIPLE_ID_COLS, ignore_index=True)
    )
    ref = (
        tbl.to_pandas()
        .sort_values(TRIPLE_ID_COLS + ["doc_id", "span_idx"])
        .drop_duplicates(subset=TRIPLE_ID_COLS, keep="first")
        .sort_values(TRIPLE_ID_COLS, ignore_index=True)
    )
    pd.testing.assert_frame_equal(out, ref)


def test_fused_canonical_dedup_equals_unfused(ray_session):
    """The fused canonicalize+dedup exchange (pipelines/kg.py broadcast
    regime) produces the exact table of the unfused compose."""
    import ray.data as rd

    from shaclex_ray.sources.documents import read_documents
    from shaclex_ray.stages.dedup import dedup_triples_fast
    from shaclex_ray.stages.extract import extract_triples
    from shaclex_ray.stages.link import (
        build_entity_links,
        canonicalize_triples,
        entity_triples,
    )

    raw = extract_triples(read_documents("/root/testdata/sf0.001")).materialize()
    links = build_entity_links(raw)
    assert isinstance(links, pa.Table)

    cano = canonicalize_triples(raw, links)
    unfused = dedup_triples_fast(cano, nbuckets=4).to_pandas()

    t1, t2 = entity_triples(links)
    fused = dedup_triples_fast(
        raw, nbuckets=4, canonicalize_with=links, extra_tables=[t1, t2]
    ).to_pandas()

    cols = list(unfused.columns)
    unfused = unfused.sort_values(cols, ignore_index=True)
    fused = fused.sort_values(cols, ignore_index=True)[cols]
    pd.testing.assert_frame_equal(fused, unfused)


def test_fused_from_parquet_equals_unfused(ray_session, tmp_path):
    import ray.data as rd

    from shaclex_ray.sources.documents import read_documents
    from shaclex_ray.stages.dedup import (
        dedup_triples_fast,
        dedup_triples_fast_from_parquet,
    )
    from shaclex_ray.stages.extract import extract_triples
    from shaclex_ray.stages.link import (
        build_entity_links,
        canonicalize_triples,
        entity_triples,
    )

    raw = extract_triples(read_documents("/root/testdata/sf0.001")).materialize()
    raw.write_parquet(str(tmp_path / "raw"))
    links = build_entity_links(raw)
    cano = canonicalize_triples(raw, links)
    unfused = dedup_triples_fast(cano, nbuckets=4).to_pandas()

    t1, t2 = entity_triples(links)
    fused = dedup_triples_fast_from_parquet(
        str(tmp_path / "raw"), nbuckets=4,
        canonicalize_with=links, extra_tables=[t1, t2],
    ).to_pandas()

    cols = list(unfused.columns)
    pd.testing.assert_frame_equal(
        fused.sort_values(cols, ignore_index=True)[cols],
        unfused.sort_values(cols, ignore_index=True),
    )


def test_distinct_rows_null_identity_columns(ray_session):
    """Duplicate rows carrying nulls in identity columns must dedup (SQL
    DISTINCT: null == null), not crash — pc.not_equal yields null for
    null operands and the old kernel degraded to an object-dtype array
    that killed the |= reduction."""
    import ray.data as rd

    from shaclex_ray.stages.dedup import distinct_rows_fast

    tbl = pa.table(
        {
            "a": pa.array(["x", "x", "z", None, None], pa.string()),
            "b": pa.array([None, None, "y", "w", "w"], pa.string()),
        }
    )
    out = distinct_rows_fast(rd.from_arrow(tbl))
    rows = sorted(
        ((r["a"], r["b"]) for r in out.take_all()),
        key=lambda t: tuple("" if v is None else v for v in t),
    )
    assert rows == [(None, "w"), ("x", None), ("z", "y")]


def test_distinct_rows_empty_keeps_real_types(ray_session):
    """An empty distinct must carry the INPUT schema (the old fallback
    fabricated all-string columns, breaking downstream concat/union)."""
    import ray.data as rd

    from shaclex_ray.stages.dedup import distinct_rows_fast

    schema = pa.schema([("a", pa.int64()), ("b", pa.string())])
    out = distinct_rows_fast(rd.from_arrow(schema.empty_table()))
    got = out.schema()
    assert list(got.names) == ["a", "b"]
    assert got.types[0] == pa.int64()
