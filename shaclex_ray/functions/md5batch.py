"""Vectorized batch MD5 (RFC 1321) over Arrow string/binary arrays.

The dedup/text operators hash millions of short strings (token shingles,
tokens) per batch with ``md5_number_lower`` semantics (last 8 digest
bytes, little-endian — DuckDB's function of that name, which the SQL
oracles rely on). Calling hashlib per string makes the Python call
overhead the stage bottleneck at corpus scale; this module computes the
same digests with numpy:

  * padding is laid out for the WHOLE batch with vectorized scatters
    (one uint8 buffer, content bytes + 0x80 terminators + bit lengths)
  * messages are grouped by block count (shingles are overwhelmingly
    1-2 blocks) and each group runs the 64-step MD5 compression as
    uint32 numpy array ops — ~500 C kernels per group instead of a
    Python call per message

Exactness is pinned by tests against hashlib for every length class
(0, <56, 56..63, 64, multi-block).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4 + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint8,
)
_K = np.array(
    [int(abs(math.sin(i + 1)) * 2**32) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
# per-step message-word index g(i)
_G = np.array(
    [i for i in range(16)]
    + [(5 * i + 1) % 16 for i in range(16, 32)]
    + [(3 * i + 5) % 16 for i in range(32, 48)]
    + [(7 * i) % 16 for i in range(48, 64)],
    dtype=np.int64,
)

_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)


def _compress(M: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """MD5 over padded messages M: (n, nblocks*16) little-endian uint32.
    Returns the four state words (n,) uint32 each."""
    n, width = M.shape
    nblocks = width // 16
    a0 = np.full(n, _INIT[0], np.uint32)
    b0 = np.full(n, _INIT[1], np.uint32)
    c0 = np.full(n, _INIT[2], np.uint32)
    d0 = np.full(n, _INIT[3], np.uint32)
    with np.errstate(over="ignore"):
        for blk in range(nblocks):
            X = M[:, blk * 16 : (blk + 1) * 16]
            A, B, C, D = a0.copy(), b0.copy(), c0.copy(), d0.copy()
            for i in range(64):
                if i < 16:
                    F = (B & C) | (~B & D)
                elif i < 32:
                    F = (D & B) | (~D & C)
                elif i < 48:
                    F = B ^ C ^ D
                else:
                    F = C ^ (B | ~D)
                F = F + A + _K[i] + X[:, _G[i]]
                A = D
                D = C
                C = B
                s = int(_S[i])
                B = B + ((F << np.uint32(s)) | (F >> np.uint32(32 - s)))
            a0 += A
            b0 += B
            c0 += C
            d0 += D
    return a0, b0, c0, d0


def _offsets_and_data(arr) -> tuple[np.ndarray, np.ndarray]:
    """(byte offsets int64 (n+1,), flat data uint8) of a string/binary
    Arrow array (no nulls expected)."""
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count:
        raise ValueError("md5 batch input must not contain nulls")
    buffers = arr.buffers()
    if pa.types.is_large_string(arr.type) or pa.types.is_large_binary(arr.type):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    offs = np.frombuffer(buffers[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data_buf = buffers[2]
    data = (
        np.frombuffer(data_buf, dtype=np.uint8)
        if data_buf is not None and len(data_buf)
        else np.zeros(0, np.uint8)
    )
    return offs, data


def md5_state_batch(arr) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """MD5 state words (a, b, c, d) per element of an Arrow string/binary
    array (or a Python list of str/bytes)."""
    if isinstance(arr, (list, tuple)):
        arr = pa.array(
            [x.encode() if isinstance(x, str) else x for x in arr], pa.binary()
        )
    offs, data = _offsets_and_data(arr)
    n = len(offs) - 1
    out = [np.empty(n, np.uint32) for _ in range(4)]
    if n == 0:
        return tuple(out)  # type: ignore[return-value]

    lengths = offs[1:] - offs[:-1]
    nb = (lengths + 9 + 63) // 64  # blocks per message
    padded_len = nb * 64
    pstarts = np.zeros(n + 1, np.int64)
    np.cumsum(padded_len, out=pstarts[1:])
    total = int(pstarts[-1])
    buf = np.zeros(total, np.uint8)

    # scatter content bytes: src byte j of message m lands at
    # pstart[m] + (j - srcstart[m]) — one linear scatter for the batch
    total_content = int(lengths.sum())
    if total_content:
        src = data[offs[0] : offs[-1]]
        shift = pstarts[:-1] - (offs[:-1] - offs[0])
        dst = np.repeat(shift, lengths)
        dst += np.arange(total_content)
        buf[dst] = src
    # 0x80 terminator + 64-bit little-endian bit length
    buf[pstarts[:-1] + lengths] = 0x80
    bitlen = (lengths.astype(np.uint64) * np.uint64(8))[:, None]
    shifts = (np.arange(8, dtype=np.uint64) * np.uint64(8))[None, :]
    len_bytes = ((bitlen >> shifts) & np.uint64(0xFF)).astype(np.uint8)
    tail = (pstarts[1:] - 8)[:, None] + np.arange(8)[None, :]
    buf[tail] = len_bytes

    # group messages by block count (vast majority share one class); a
    # homogeneous batch needs no gather at all — buf already IS the
    # (n, blocks*64) matrix
    classes = np.unique(nb)
    if len(classes) == 1:
        M = buf.reshape(n, int(classes[0]) * 64).view("<u4")
        a, b, c, d = _compress(M)
        out[0][:], out[1][:], out[2][:], out[3][:] = a, b, c, d
        return tuple(out)  # type: ignore[return-value]
    for blocks in classes:
        sel = np.nonzero(nb == blocks)[0]
        seg = (
            pstarts[:-1][sel][:, None] + np.arange(int(blocks) * 64)[None, :]
        ).ravel()
        M = buf[seg].reshape(len(sel), int(blocks) * 64).view("<u4")
        a, b, c, d = _compress(M)
        out[0][sel] = a
        out[1][sel] = b
        out[2][sel] = c
        out[3][sel] = d
    return tuple(out)  # type: ignore[return-value]


def md5_u64_batch(arr) -> np.ndarray:
    """``md5_number_lower`` per element: last 8 digest bytes little-endian
    = c | d << 32 (digest byte order is a,b,c,d each little-endian)."""
    _a, _b, c, d = md5_state_batch(arr)
    return c.astype(np.uint64) | (d.astype(np.uint64) << np.uint64(32))


def md5_hex_batch(arr) -> list[str]:
    """Full 32-char hex digest per element (hashlib.hexdigest parity)."""
    a, b, c, d = md5_state_batch(arr)
    n = len(a)
    raw = np.empty((n, 4), np.uint32)
    raw[:, 0], raw[:, 1], raw[:, 2], raw[:, 3] = a, b, c, d
    by = raw.view(np.uint8).reshape(n, 16)
    return [bytes(row).hex() for row in by]
