"""Batch MD5 over Arrow string/binary arrays (``md5_number_lower``
semantics: last 8 digest bytes, little-endian — DuckDB's function of that
name, which the SQL oracles rely on).

Implementation note: these are plain hashlib loops. A numpy lane-parallel
MD5 (64 compression steps as uint32 array ops over all messages at once)
was tried first and MEASURED SLOWER — 10x on 1M single-block shingles,
30x on multi-block document texts: CPython's ~0.4µs call overhead plus
OpenSSL's C MD5 (~1µs for a short message) beats ~900 numpy kernel
launches over wide lanes. Exactness against hashlib for every length
class (0, <56, 56..63, 64, multi-block) is pinned in
tests/test_md5batch.py.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa


def _as_bytes_list(arr) -> list[bytes]:
    # engine-wide null policy: a NULL string hashes as the EMPTY string
    # (real corpora carry null text; digesting None would crash the task)
    if isinstance(arr, (list, tuple)):
        return [
            x.encode() if isinstance(x, str) else (x if x is not None else b"")
            for x in arr
        ]
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        arr = arr.cast(pa.binary())
    if arr.null_count:
        import pyarrow.compute as pc

        arr = pc.fill_null(arr, b"")
    return arr.to_pylist()


def md5_state_batch(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """MD5 state words (a, b, c, d) per element of an Arrow string/binary
    array (or a Python list of str/bytes)."""
    msgs = _as_bytes_list(arr)
    n = len(msgs)
    dig = np.frombuffer(
        b"".join(hashlib.md5(m).digest() for m in msgs), dtype="<u4"
    ).reshape(n, 4) if n else np.empty((0, 4), np.uint32)
    return (
        dig[:, 0].copy(),
        dig[:, 1].copy(),
        dig[:, 2].copy(),
        dig[:, 3].copy(),
    )


def md5_u64_batch(arr) -> np.ndarray:
    """``md5_number_lower`` per element: uint64 from the last 8 digest
    bytes, little-endian."""
    msgs = _as_bytes_list(arr)
    n = len(msgs)
    if not n:
        return np.empty(0, np.uint64)
    return np.frombuffer(
        b"".join(hashlib.md5(m).digest()[8:] for m in msgs), dtype="<u8"
    ).copy()


def md5_hex_batch(arr) -> list[str]:
    """Hex digest per element."""
    return [hashlib.md5(m).hexdigest() for m in _as_bytes_list(arr)]


def md5_u128_batch(arr) -> tuple[np.ndarray, np.ndarray]:
    """Full 128-bit digest per element as two uint64 arrays (hi, lo):
    a collision-safe content fingerprint for representative grouping
    (64 bits has a ~3% birthday collision chance at 10^9 distinct docs;
    128 bits is ~1e-21)."""
    msgs = _as_bytes_list(arr)
    n = len(msgs)
    if not n:
        return np.empty(0, np.uint64), np.empty(0, np.uint64)
    dig = np.frombuffer(
        b"".join(hashlib.md5(m).digest() for m in msgs), dtype="<u8"
    ).reshape(n, 2)
    return dig[:, 0].copy(), dig[:, 1].copy()
