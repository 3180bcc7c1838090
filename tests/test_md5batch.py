"""Vectorized MD5 (functions/md5batch.py) parity against hashlib — every
padding length class plus random fuzz, and the md5_number_lower u64 view
the DuckDB oracles depend on."""

import hashlib
import random

import numpy as np
import pyarrow as pa

from shaclex_ray.functions.md5batch import md5_hex_batch, md5_u64_batch


def _expected_u64(msgs):
    return np.array(
        [int.from_bytes(hashlib.md5(m.encode()).digest()[8:], "little") for m in msgs],
        dtype=np.uint64,
    )


def test_md5_u64_length_classes():
    msgs = [
        "",                    # empty (padding-only block)
        "a",
        "x" * 55,              # max single-block content
        "y" * 56,              # first two-block length
        "z" * 63,
        "w" * 64,
        "q" * 119,             # max two-block content
        "r" * 120,             # three blocks
        "münchén — ünïcode" * 7,  # multi-byte utf8
    ]
    got = md5_u64_batch(pa.array(msgs, pa.string()))
    assert np.array_equal(got, _expected_u64(msgs))


def test_md5_u64_fuzz_mixed_blocks():
    rng = random.Random(42)
    msgs = [
        "".join(rng.choices("abcdef ghij\n", k=rng.randint(0, 400)))
        for _ in range(3000)
    ]
    got = md5_u64_batch(pa.array(msgs, pa.string()))
    assert np.array_equal(got, _expected_u64(msgs))


def test_md5_hex_parity():
    msgs = ["", "hello world", "x" * 200]
    assert md5_hex_batch(pa.array(msgs)) == [
        hashlib.md5(m.encode()).hexdigest() for m in msgs
    ]


def test_md5_accepts_python_lists_and_sliced_arrays():
    msgs = ["alpha", "beta", "gamma", "delta"]
    full = md5_u64_batch(msgs)
    assert np.array_equal(full, _expected_u64(msgs))
    sliced = pa.array(msgs).slice(1, 2)  # non-zero array offset
    assert np.array_equal(md5_u64_batch(sliced), _expected_u64(msgs[1:3]))


def test_gram_hashes_match_scalar_spec():
    """_batch_gram_hashes reproduces the per-doc scalar definition
    (including the short-doc whole-text gram)."""
    from shaclex_ray.functions.dedup import _batch_gram_hashes, _md5_u64

    texts = ["a b c d e", "one two", "single", "", "x  y   z q"]
    h, starts = _batch_gram_hashes(pa.array(texts), 3)
    for i, t in enumerate(texts):
        toks = t.split(" ")
        grams = [
            " ".join(toks[j : j + 3]) for j in range(max(1, len(toks) - 3 + 1))
        ]
        expect = [_md5_u64(g.encode()) for g in grams]
        assert list(h[starts[i] : starts[i + 1]]) == expect, t
