"""Property tests for the pure kernels behind the BPE trainer/encoder and
the kNN vote stage — fuzzed against independent scalar references (no Ray
session needed)."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from shaclex_ray.functions.bpe import EOW, _encode_word, _train_merges

WORD = st.text(alphabet="abcd", min_size=1, max_size=6)


def _naive_train(word_freqs, n_merges, min_freq):
    syms = {w: tuple(w) + (EOW,) for w in word_freqs}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, f in word_freqs.items():
            s = syms[w]
            for p in zip(s, s[1:]):
                counts[p] = counts.get(p, 0) + f
        if not counts:
            break
        best = min(counts, key=lambda p: (-counts[p], p))
        if counts[best] < min_freq:
            break
        merges.append((best[0], best[1], counts[best]))
        for w in syms:
            s, out, i = syms[w], [], 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(s[i] + s[i + 1])
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            syms[w] = tuple(out)
    return merges, syms


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(WORD, st.integers(min_value=1, max_value=50), min_size=1, max_size=20),
    st.integers(min_value=1, max_value=25),
    st.integers(min_value=1, max_value=3),
)
def test_incremental_trainer_matches_naive(freqs, n_merges, min_freq):
    words = sorted(freqs)
    f = np.array([freqs[w] for w in words], np.int64)
    got = _train_merges(words, f, n_merges, min_freq)
    exp, _ = _naive_train(freqs, n_merges, min_freq)
    assert got == exp


@settings(max_examples=60, deadline=None)
@given(
    st.dictionaries(WORD, st.integers(min_value=1, max_value=50), min_size=1, max_size=15),
    WORD,
)
def test_greedy_encode_equals_rank_order_application(freqs, word):
    """Lowest-rank-first greedy merging == applying merges in rank order."""
    words = sorted(freqs)
    f = np.array([freqs[w] for w in words], np.int64)
    merges = _train_merges(words, f, 20, 1)
    ranks = {(l, r): i for i, (l, r, _) in enumerate(merges)}
    # reference: rewrite with each merge in rank order
    s = list(word) + [EOW]
    for l, r, _ in merges:
        out, i = [], 0
        while i < len(s):
            if i + 1 < len(s) and s[i] == l and s[i + 1] == r:
                out.append(l + r)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    assert _encode_word(word, ranks) == len(s)


@settings(max_examples=40, deadline=None)
@given(st.data())
def test_knn_vote_matches_scalar_reference(data):
    from shaclex_ray.functions.ann import KnnLabelVote

    rng = np.random.default_rng(data.draw(st.integers(0, 2**32 - 1)))
    n_seed = data.draw(st.integers(2, 8))
    n_rows = data.draw(st.integers(1, 12))
    k = data.draw(st.integers(1, 6))
    dim = data.draw(st.integers(2, 5))
    # low-resolution vectors force frequent exact cosine ties
    sm = rng.integers(-1, 2, (n_seed, dim)).astype(np.float64)
    sm[np.linalg.norm(sm, axis=1) == 0] = 1.0
    em = rng.integers(-1, 2, (n_rows, dim)).astype(np.float64)
    em[np.linalg.norm(em, axis=1) == 0] = 1.0
    seed_ids = np.arange(n_seed, dtype=np.int64)
    seed_labels = rng.integers(0, 3, n_seed).astype(np.int64)
    ids = np.arange(100, 100 + n_rows, dtype=np.int64)

    batch = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [list(map(float, row)) for row in em],
                pa.list_(pa.float32()),
            ),
        }
    )
    stage = KnnLabelVote((seed_ids, sm.copy(), seed_labels), k)
    out = stage(batch)
    got = {
        v: (p, n)
        for v, p, n in zip(
            out.column("vec_id").to_pylist(),
            out.column("pred_label").to_pylist(),
            out.column("n_votes").to_pylist(),
        )
    }

    # scalar reference (float32-quantized rows, matching the Arrow column)
    em32 = em.astype(np.float32).astype(np.float64)
    for ri in range(n_rows):
        sims = []
        for si in range(n_seed):
            a, b = em32[ri], sm[si]
            cos = float(
                a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
            )
            sims.append((-cos, si))
        sims.sort()
        top = [seed_labels[si] for _, si in sims[:k]]
        votes = {}
        for lab in top:
            votes[lab] = votes.get(lab, 0) + 1
        best = min(votes, key=lambda l: (-votes[l], l))
        assert got[ids[ri]] == (best, votes[best]), ri
