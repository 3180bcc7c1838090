"""One pinned seed of the randomized differential parity fuzz
(tools/fuzz_parity.py): a corpus with INDEPENDENT per-column random
poisons — nulls at random rows/rates in every poisonable column,
random duplicate content, degenerate embeddings, dangling keys — run
over the full oracle-twinned queries() surface against DuckDB.

The fixed dirty-parity corpus poisons every star-schema column on the
SAME row, so a row that loses one column always loses its filters too;
this seed exercises the independent-null regime that caught four real
divergences (null measures summed as garbage, a Ray Dataset.groupby
crash on a null event_type key, a null event_id crash in the as-of
join, a column-less empty result when every row filters out)."""

import numpy as np
import pytest


@pytest.mark.parametrize("seed", [0])
def test_fuzz_seed_parity(ray_session, seed):
    from tools.fuzz_parity import run_seed

    failures = run_seed(seed, "/root/testdata/sf0.001")
    assert not failures, failures
