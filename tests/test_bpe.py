"""BPE trainer/encoder pinned against an independent naive reference:
the reference recounts every pair from scratch each round and applies
merges by whole-vocabulary rewrite in rank order — no shared code with
the incremental trainer or the memoized encoder."""

import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


def _naive_train(word_freqs, n_merges, min_freq, eow):
    syms = {w: tuple(w) + (eow,) for w in word_freqs}
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


def _corpus_word_freqs(path):
    t = pq.read_table(path, columns=["text"])
    freqs = {}
    for txt in t.column("text").to_pylist():
        for w in txt.split(" "):
            freqs[w] = freqs.get(w, 0) + 1
    return freqs


@pytest.fixture(scope="module")
def trained(ray_session):
    from shaclex_ray.functions.bpe import EOW, bpe_train

    n_merges, min_freq = 60, 2
    got = bpe_train(SF, n_merges=n_merges, min_freq=min_freq)
    freqs = _corpus_word_freqs(f"{SF}/documents.parquet")
    exp_merges, exp_syms = _naive_train(freqs, n_merges, min_freq, EOW)
    return got, exp_merges, exp_syms, n_merges, min_freq


def test_bpe_train_matches_naive_reference(trained):
    got, exp_merges, _, _, _ = trained
    got_rows = list(
        zip(
            got.column("left").to_pylist(),
            got.column("right").to_pylist(),
            got.column("freq").to_pylist(),
        )
    )
    assert got_rows == exp_merges
    assert got.column("rank").to_pylist() == list(range(len(exp_merges)))


def test_bpe_encode_matches_naive_reference(trained, ray_session):
    from shaclex_ray.functions.bpe import bpe_encode

    _, _, exp_syms, n_merges, min_freq = trained
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_words"])
        for r in bpe_encode(SF, n_merges=n_merges, min_freq=min_freq).take_all()
    }
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    assert len(got) == t.num_rows
    for did, txt in zip(
        t.column("doc_id").to_pylist(), t.column("text").to_pylist()
    ):
        words = txt.split(" ")
        # the naive reference already holds every corpus word's final
        # segmentation after all merges
        exp_tokens = sum(len(exp_syms[w]) for w in words)
        assert got[did] == (exp_tokens, len(words)), did


def test_bpe_train_cap_is_deterministic(trained, ray_session):
    """Capping the word table must not change the result when the corpus
    vocabulary fits under the cap."""
    from shaclex_ray.functions.bpe import bpe_train

    got, _, _, n_merges, min_freq = trained
    small_cap = bpe_train(
        SF, n_merges=n_merges, min_freq=min_freq, max_words=10_000
    )
    assert small_cap.equals(got)


def test_bpe_long_word_chunk_policy(ray_session, tmp_path):
    """A megabyte-scale whitespace token (base64 blob / minified JS) must
    not poison the trainer or the O(len^2) greedy encode: both sides chunk
    it into MAX_WORD_LEN pieces (each its own EOW word). Pinned against
    the naive reference run over the chunked word-frequency table."""
    import pyarrow as pa
    import pyarrow.parquet as pq2

    from shaclex_ray.functions.bpe import (
        EOW,
        MAX_WORD_LEN,
        _chunk_word,
        bpe_encode,
        bpe_train,
    )

    huge = "ab" * (MAX_WORD_LEN * 40)  # 80 chunks, 2 distinct
    docs = [
        "the cat sat on the mat",
        "the dog sat on the log",
        f"payload {huge} trailer",
    ]
    out = tmp_path / "corpus"
    out.mkdir()
    pq2.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "text": pa.array(docs, pa.string()),
            }
        ),
        out / "documents.parquet",
    )
    n_merges, min_freq = 40, 2
    freqs = {}
    for txt in docs:
        for w in txt.split(" "):
            for piece in _chunk_word(w, MAX_WORD_LEN):
                freqs[piece] = freqs.get(piece, 0) + 1
    exp_merges, exp_syms = _naive_train(freqs, n_merges, min_freq, EOW)
    got = bpe_train(str(out), n_merges=n_merges, min_freq=min_freq)
    got_rows = list(
        zip(
            got.column("left").to_pylist(),
            got.column("right").to_pylist(),
            got.column("freq").to_pylist(),
        )
    )
    assert got_rows == exp_merges
    enc = {
        r["doc_id"]: (r["n_tokens"], r["n_words"])
        for r in bpe_encode(
            str(out), n_merges=n_merges, min_freq=min_freq
        ).take_all()
    }
    for did, txt in enumerate(docs):
        words = txt.split(" ")
        exp_tokens = sum(
            len(exp_syms[p])
            for w in words
            for p in _chunk_word(w, MAX_WORD_LEN)
        )
        # n_words counts the original whitespace token once, chunked or not
        assert enc[did] == (exp_tokens, len(words)), did
