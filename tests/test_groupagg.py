"""grouped_aggregate_fast: the vectorized one-move group reduction that
replaces groupby().map_groups at the per-key call-sites."""

import pyarrow as pa
import pytest

import ray.data as rd

from shaclex_ray.stages.groupagg import grouped_aggregate_fast


def _sorted_rows(ds):
    return sorted(ds.take_all(), key=lambda r: tuple(sorted(r.items())))


def test_min_count(ray_session):
    tbl = pa.table(
        {
            "k": ["a", "b", "a", "c", "b", "a"],
            "v": [5, 2, 3, 9, 1, 7],
        }
    )
    out = grouped_aggregate_fast(
        rd.from_arrow(tbl), ["k"], [("v", "min"), ("v", "count")], ["mn", "n"]
    )
    rows = {r["k"]: (r["mn"], r["n"]) for r in out.take_all()}
    assert rows == {"a": (3, 3), "b": (1, 2), "c": (9, 1)}


def test_matches_duckdb_on_random(ray_session):
    import duckdb
    import numpy as np

    rng = np.random.default_rng(7)
    n = 50_000
    tbl = pa.table(
        {
            "k": pa.array([f"k{v}" for v in rng.integers(0, 997, n)]),
            "v": pa.array(rng.integers(-1000, 1000, n), pa.int64()),
        }
    )
    out = grouped_aggregate_fast(
        rd.from_arrow(tbl),
        ["k"],
        [("v", "min"), ("v", "max"), ("v", "sum"), ("v", "count")],
        ["mn", "mx", "sm", "n"],
        nbuckets=4,
    )
    got = out.to_pandas().sort_values("k", ignore_index=True)
    want = duckdb.sql(
        "SELECT k, min(v) mn, max(v) mx, sum(v)::BIGINT sm, count(v) n "
        "FROM tbl GROUP BY k ORDER BY k"
    ).df()
    assert got[["k", "mn", "mx", "sm", "n"]].equals(want)


def test_count_distinct(ray_session):
    import duckdb
    import numpy as np

    rng = np.random.default_rng(11)
    n = 20_000
    tbl = pa.table(
        {
            "k": pa.array([f"k{v}" for v in rng.integers(0, 200, n)]),
            "e": pa.array([f"e{v}" for v in rng.integers(0, 50, n)]),
        }
    )
    out = grouped_aggregate_fast(
        rd.from_arrow(tbl), ["k"], [("e", "count_distinct")], ["nd"], nbuckets=3
    )
    got = out.to_pandas().sort_values("k", ignore_index=True)
    want = duckdb.sql(
        "SELECT k, count(DISTINCT e) nd FROM tbl GROUP BY k ORDER BY k"
    ).df()
    assert got[["k", "nd"]].equals(want)


def test_count_distinct_must_be_sole(ray_session):
    tbl = pa.table({"k": ["a"], "v": [1], "e": ["x"]})
    with pytest.raises(ValueError):
        grouped_aggregate_fast(
            rd.from_arrow(tbl),
            ["k"],
            [("v", "min"), ("e", "count_distinct")],
            ["mn", "nd"],
        )


def test_empty_input(ray_session):
    tbl = pa.table({"k": pa.array([], pa.string()), "v": pa.array([], pa.int64())})
    out = grouped_aggregate_fast(
        rd.from_arrow(tbl), ["k"], [("v", "min")], ["mn"]
    )
    assert out.count() == 0


def test_grouped_topk_empty_input(ray_session):
    """Empty input must short-circuit to an empty, correctly-shaped
    result (zero block refs previously crashed the split kernel)."""
    from shaclex_ray.stages.groupagg import grouped_topk

    tbl = pa.table(
        {
            "q": pa.array([], pa.int64()),
            "score": pa.array([], pa.float64()),
            "vid": pa.array([], pa.int64()),
        }
    )
    out = grouped_topk(
        rd.from_arrow(tbl),
        "q",
        [("score", "descending")],
        3,
        rank_name="rank",
        keep_cols=["q", "vid", "rank"],
    )
    assert out.count() == 0
    assert out.schema().names == ["q", "vid", "rank"]


def test_top_orders_degenerate_segment(ray_session):
    """A market segment matching no customers must return an empty
    result, not crash the searchsorted probe / empty concat."""
    from shaclex_ray.functions.relational import top_orders

    out = top_orders("/root/testdata/sf0.001", segment="NO_SUCH_SEGMENT")
    assert out.num_rows == 0


def test_grouped_topk_matches_scalar_reference(ray_session):
    """grouped_topk vs a per-key python sort over random tables, across
    bucket counts (exchange widths)."""
    import numpy as np
    import pyarrow as pa

    import ray.data as rd

    from shaclex_ray.stages.groupagg import grouped_topk

    rng = np.random.default_rng(7)
    n = 5000
    tbl = pa.table(
        {
            "q": pa.array(rng.integers(0, 40, n), pa.int64()),
            "score": pa.array(rng.integers(0, 15, n).astype(np.float64)),
            "vid": pa.array(rng.permutation(n).astype(np.int64)),
        }
    )
    k = 4
    exp = {}
    rows = list(zip(*[tbl.column(c).to_pylist() for c in ("q", "score", "vid")]))
    by_q = {}
    for q, s, v in rows:
        by_q.setdefault(q, []).append((-s, v))
    for q, lst in by_q.items():
        lst.sort()
        exp[q] = [(v, i + 1) for i, (_, v) in enumerate(lst[:k])]

    for nb in (1, 3, 8):
        out = grouped_topk(
            rd.from_arrow(tbl).repartition(6),
            "q",
            [("score", "descending"), ("vid", "ascending")],
            k,
            rank_name="rank",
            keep_cols=["q", "vid", "rank"],
            nbuckets=nb,
        ).take_all()
        got = {}
        for r in out:
            got.setdefault(r["q"], []).append((r["rank"], r["vid"]))
        assert set(got) == set(exp)
        for q in exp:
            assert sorted(got[q]) == [(rk, v) for v, rk in exp[q]], (nb, q)
