"""Document-level deduplication family (training-data-pipeline surface):

  * exact:     md5(text) hash groups → keep lowest doc_id
  * minhash:   k-permutation MinHash over token shingles, banded LSH
               (shingle → minhash → band → bucket groupby → pairs)
  * simhash:   64-bit SimHash over token hashes, duplicates = equal keys
  * ngram_jaccard: verified near-dup pairs — jaccard over token n-grams
               computed *within* LSH candidate buckets only

All hashes are content-derived (md5/blake2) — deterministic across runs,
workers and retries. Heavy stages are vectorized or numpy-per-batch;
pair generation only ever happens inside a bucket (never a global cross
join).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_M61 = (1 << 61) - 1


def _read_docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


# ---------------------------------------------------------------- exact

def exact_groups(sf_dir: str):
    """(fingerprint, canonical_doc_id, n_dups): one row per distinct text."""

    def fp(batch: pa.Table) -> pa.Table:
        texts = batch.column("text").to_pylist()
        hs = [hashlib.md5(t.encode()).hexdigest() for t in texts]
        return pa.table(
            {"fingerprint": pa.array(hs, pa.string()), "doc_id": batch.column("doc_id")}
        )

    def combine(group: pa.Table) -> pa.Table:
        ids = group.column("doc_id")
        return pa.table(
            {
                "fingerprint": group.column("fingerprint").slice(0, 1),
                "canonical_doc_id": pa.array([pc.min(ids).as_py()], pa.int64()),
                "n_dups": pa.array([group.num_rows], pa.int64()),
            }
        )

    return (
        _read_docs(sf_dir)
        .map_batches(fp, batch_format="pyarrow")
        .groupby("fingerprint")
        .map_groups(combine, batch_format="pyarrow")
    )


# ---------------------------------------------------------------- minhash

def _token_hashes(text: str, shingle: int) -> np.ndarray:
    """64-bit shingle hashes."""
    toks = text.split(" ")
    grams = [" ".join(toks[i : i + shingle]) for i in range(max(1, len(toks) - shingle + 1))]
    return np.fromiter(
        (
            int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(), "big")
            for g in grams
        ),
        dtype=np.uint64,
        count=len(grams),
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """64-bit finalizer (wrapping uint64 arithmetic is the point)."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


class MinHasher:
    """Actor-pool stage: permutation seeds built once per actor. Each
    "permutation" is splitmix64 over (shingle-hash XOR seed) — a well-mixed
    min-wise family, one vectorized numpy expression per doc."""

    def __init__(self, num_perm: int = 64, shingle: int = 3):
        rng = np.random.RandomState(12345)  # fixed seed: deterministic LSH
        self.seeds = rng.randint(0, 2**63 - 1, size=num_perm, dtype=np.int64).astype(
            np.uint64
        )
        self.num_perm = num_perm
        self.shingle = shingle

    def signature(self, text: str) -> np.ndarray:
        h = _token_hashes(text, self.shingle)
        if len(h) == 0:
            return np.zeros(self.num_perm, dtype=np.uint64)
        vals = _splitmix64(h[None, :] ^ self.seeds[:, None])
        return vals.min(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs = [self.signature(t) for t in batch.column("text").to_pylist()]
        arr = np.vstack(sigs) if sigs else np.zeros((0, self.num_perm), dtype=np.uint64)
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "sig": pa.array(list(arr), pa.list_(pa.uint64(), self.num_perm)),
            }
        )


def minhash_candidates(sf_dir: str, num_perm: int = 64, bands: int = 16):
    """LSH candidate pairs (doc_a < doc_b) from banded minhash buckets."""
    rows_per_band = num_perm // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sigs = batch.column("sig").to_pylist()
        out_ids, out_keys = [], []
        for did, sig in zip(ids, sigs):
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                key = hashlib.blake2b(
                    (str(b) + ":" + ",".join(map(str, chunk))).encode(), digest_size=8
                ).hexdigest()
                out_ids.append(did)
                out_keys.append(key)
        return pa.table(
            {"doc_id": pa.array(out_ids, pa.int64()), "band_key": pa.array(out_keys, pa.string())}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        a, b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                a.append(ids[i])
                b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    sigs = _read_docs(sf_dir).map_batches(
        MinHasher, fn_constructor_args=(num_perm,), batch_format="pyarrow", concurrency=(1, 2)
    )
    pairs = (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )

    # distinct pairs (a pair can fire in several bands)
    def distinct(group: pa.Table) -> pa.Table:
        import polars as pl

        return (
            pl.from_arrow(group)
            .unique(subset=["doc_a", "doc_b"], maintain_order=True)
            .sort(["doc_a", "doc_b"])
            .to_arrow()
            .cast(group.schema)
        )

    return pairs.groupby("doc_a").map_groups(distinct, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash

class SimHasher:
    def __init__(self):
        self._memo: dict[str, int] = {}  # token-hash cache (vocab is small)
        self._shifts = np.arange(64, dtype=np.uint64)

    def _tok_hash(self, tok: str) -> int:
        h = self._memo.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            self._memo[tok] = h
        return h

    def _simhash(self, text: str) -> int:
        hs = np.fromiter(
            (self._tok_hash(t) for t in text.split(" ")), dtype=np.uint64
        )
        if len(hs) == 0:
            return 0
        bits = ((hs[:, None] >> self._shifts[None, :]) & np.uint64(1)).astype(np.int64)
        acc = (bits * 2 - 1).sum(axis=0)
        mask = acc > 0
        return int((mask.astype(np.uint64) << self._shifts).sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        hs = [self._simhash(t) for t in batch.column("text").to_pylist()]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "simhash": pa.array([format(h, "016x") for h in hs], pa.string()),
            }
        )


def simhashes(sf_dir: str):
    return _read_docs(sf_dir).map_batches(SimHasher, batch_format="pyarrow", concurrency=(1, 2))


# ------------------------------------------------------- ngram jaccard

def ngram_jaccard_dups(sf_dir: str, shingle: int = 3, threshold: float = 0.8):
    """Verified near-duplicate pairs: jaccard over token n-grams computed
    inside minhash-LSH candidate buckets (never a global cross join)."""
    cands = minhash_candidates(sf_dir, num_perm=32, bands=8)
    docs = _read_docs(sf_dir)

    # broadcast doc texts needed for verification: collect only docs that
    # appear in candidate pairs (small side)
    cand_tbl = pa.concat_tables(
        list(cands.iter_batches(batch_format="pyarrow", batch_size=None))
        or [pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})]
    )
    needed = set(cand_tbl.column("doc_a").to_pylist()) | set(
        cand_tbl.column("doc_b").to_pylist()
    )
    texts: dict[int, set] = {}
    for b in docs.iter_batches(batch_format="pyarrow", batch_size=4096):
        for did, t in zip(b.column("doc_id").to_pylist(), b.column("text").to_pylist()):
            if did in needed:
                toks = t.split(" ")
                texts[did] = {
                    " ".join(toks[i : i + shingle])
                    for i in range(max(1, len(toks) - shingle + 1))
                }
    a_out, b_out, j_out = [], [], []
    for da, db in sorted(
        zip(cand_tbl.column("doc_a").to_pylist(), cand_tbl.column("doc_b").to_pylist())
    ):
        sa, sb = texts.get(da, set()), texts.get(db, set())
        if not sa or not sb:
            continue
        j = len(sa & sb) / len(sa | sb)
        if j >= threshold:
            a_out.append(da)
            b_out.append(db)
            j_out.append(j)
    return pa.table(
        {
            "doc_a": pa.array(a_out, pa.int64()),
            "doc_b": pa.array(b_out, pa.int64()),
            "jaccard": pa.array(j_out, pa.float64()),
        }
    )
