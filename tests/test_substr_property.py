"""Property test: the vectorized substring-dedup kernels against a direct
Python reference over random token sequences."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from shaclex_ray.functions.substr import (
    _dup_bucket_impl,
    _span_bucket_impl,
    _windows_batch,
)

K = 3
VOCAB = ["a", "b", "c", "d"]


def _reference(docs: list[list[str]], k: int) -> set[tuple[int, int, int, int]]:
    """Direct per-window reference: dict-count windows, merge spans with a
    scalar loop."""
    from collections import Counter

    wins = []  # (doc, start, text)
    for d, toks in enumerate(docs):
        for s in range(max(0, len(toks) - k + 1)):
            wins.append((d, s, " ".join(toks[s : s + k])))
    counts = Counter(w for _, _, w in wins)
    dup = sorted((d, s) for d, s, w in wins if counts[w] >= 2)
    out = []
    for d, s in dup:
        if out and out[-1][0] == d and s <= out[-1][2]:
            prev = out[-1]
            out[-1] = (d, prev[1], s + k, prev[3] + 1)
        else:
            out.append((d, s, s + k, 1))
    return set(out)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(VOCAB), min_size=0, max_size=12),
        min_size=1,
        max_size=8,
    )
)
def test_substr_kernels_match_reference(docs):
    batch = pa.table(
        {
            "doc_id": pa.array(range(len(docs)), pa.int64()),
            "text": [" ".join(t) for t in docs],
        }
    )
    wins = _windows_batch(batch, K)
    dup = _dup_bucket_impl(2, wins)
    spans = _span_bucket_impl(K, dup)
    got = set(
        zip(
            spans.column("doc_id").to_pylist(),
            spans.column("span_start").to_pylist(),
            spans.column("span_end").to_pylist(),
            spans.column("n_windows").to_pylist(),
        )
    )
    assert got == _reference(docs, K)
