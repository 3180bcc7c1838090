"""Relational star-schema queries: the broadcast and hash-join regimes of
the size-adaptive switch must produce identical rows (the oracle parity
itself is covered by test_oracle_parity.py)."""

import pytest

SF = "/root/testdata/sf0.001"


@pytest.mark.parametrize("fn_name", ["top_orders", "regional_volume"])
def test_rel_join_regimes_equal(ray_session, monkeypatch, fn_name):
    from shaclex_ray.functions import relational

    fn = getattr(relational, fn_name)

    def rows(res):
        import pyarrow as pa

        import ray.data

        if isinstance(res, ray.data.Dataset):
            res = res.to_pandas()
        elif isinstance(res, pa.Table):
            res = res.to_pandas()
        return sorted(map(tuple, res[sorted(res.columns)].values.tolist()))

    bcast = rows(fn(SF))
    monkeypatch.setenv("SHACLEX_REL_BCAST_THRESHOLD", "0")
    joined = rows(fn(SF))
    assert bcast == joined
    assert len(bcast) > 0
