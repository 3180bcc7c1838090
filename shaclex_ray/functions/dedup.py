"""Document-level deduplication family (training-data-pipeline surface):

  * exact:     md5(text) hash groups → keep lowest doc_id
  * minhash:   k-permutation MinHash over token shingles, banded LSH
               (shingle → minhash → band → bucket groupby → pairs)
  * simhash:   64-bit SimHash over token hashes, duplicates = equal keys
  * ngram_jaccard: verified near-dup pairs — jaccard over token n-gram
               hash sets, candidates from LSH buckets, texts shuffle-joined
               onto pairs and verified inside map_batches (fully
               distributed — no driver-side text harvest)

All hashes are md5-derived (``md5_number_lower`` semantics: last 8 digest
bytes little-endian) so a DuckDB oracle can reproduce every stage
end-to-end. Deterministic across runs, workers and retries. Heavy stages
are vectorized or numpy-per-batch; pair generation only ever happens
inside a bucket (never a global cross join), with a degenerate-bucket cap.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

# all-pairs cap inside one LSH bucket: a degenerate band bucket (every doc
# identical) would otherwise emit O(n²) pairs; chaining consecutive ids
# preserves the connected component at O(n)
MAX_BUCKET_PAIRS_DOCS = 4096


def _cpus() -> int:
    try:
        return max(2, int(ray.cluster_resources().get("CPU", 4)))
    except Exception:  # pragma: no cover - ray not initialised
        return 4


def _pool():
    """Autoscaling actor-pool bounds: scale to the cluster, don't starve it."""
    return (2, _cpus())


def _read_docs(sf_dir: str):
    return ray.data.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])


def _md5_u64(data: bytes) -> int:
    """64-bit content hash = DuckDB md5_number_lower: last 8 md5 digest
    bytes, little-endian. Pinned so SQL oracles reproduce it exactly."""
    return int.from_bytes(hashlib.md5(data).digest()[8:], "little")


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
    """64-bit shingle hashes (md5_number_lower of each token n-gram)."""
    toks = text.split(" ")
    grams = [" ".join(toks[i : i + shingle]) for i in range(max(1, len(toks) - shingle + 1))]
    return np.fromiter(
        (_md5_u64(g.encode()) for g in grams), dtype=np.uint64, count=len(grams)
    )


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """64-bit finalizer (wrapping uint64 arithmetic is the point)."""
    with np.errstate(over="ignore"):
        x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return x ^ (x >> np.uint64(31))


def minhash_seeds(num_perm: int) -> np.ndarray:
    """The fixed permutation seeds (shared with the SQL oracle generator)."""
    rng = np.random.RandomState(12345)  # fixed seed: deterministic LSH
    return rng.randint(0, 2**63 - 1, size=num_perm, dtype=np.int64).astype(np.uint64)


class MinHasher:
    """Actor-pool stage: permutation seeds built once per actor. Each
    "permutation" is splitmix64 over (shingle-hash XOR seed) — a well-mixed
    min-wise family, one vectorized numpy expression per doc."""

    def __init__(self, num_perm: int = 64, shingle: int = 3):
        self.seeds = minhash_seeds(num_perm)
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


def band_key(band: int, chunk) -> str:
    """LSH band bucket key: md5 hex (first 16) of 'band:v0,v1,...' —
    reproducible in SQL as substr(md5(...), 1, 16)."""
    return hashlib.md5(
        (str(band) + ":" + ",".join(map(str, chunk))).encode()
    ).hexdigest()[:16]


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
                out_ids.append(did)
                out_keys.append(band_key(b, chunk))
        return pa.table(
            {"doc_id": pa.array(out_ids, pa.int64()), "band_key": pa.array(out_keys, pa.string())}
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(set(group.column("doc_id").to_pylist()))
        if len(ids) > MAX_BUCKET_PAIRS_DOCS:
            # degenerate bucket: chain consecutive ids — same connected
            # component, O(n) pairs instead of O(n²). Logged, never silent.
            print(
                f"[dedup_minhash] degenerate LSH bucket: {len(ids)} docs, "
                f"chaining instead of all-pairs",
                flush=True,
            )
            a, b = ids[:-1], ids[1:]
        else:
            a, b = [], []
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    a.append(ids[i])
                    b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    sigs = _read_docs(sf_dir).map_batches(
        MinHasher,
        fn_constructor_args=(num_perm,),
        batch_format="pyarrow",
        concurrency=_pool(),
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
            h = _md5_u64(tok.encode())
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
    return _read_docs(sf_dir).map_batches(
        SimHasher, batch_format="pyarrow", concurrency=_pool()
    )


# ------------------------------------------------------- ngram jaccard

def shingle_sets(sf_dir: str, shingle: int = 3):
    """(doc_id, shingles: list<uint64>) — the distinct n-gram hash set per
    document, computed once and joined onto candidate pairs."""

    def sh(batch: pa.Table) -> pa.Table:
        # sorted-unique uint64 hashes packed as bytes (Arrow's hash join
        # cannot carry list payload columns; binary passes through fine)
        out = [
            np.unique(_token_hashes(t, shingle)).tobytes()
            for t in batch.column("text").to_pylist()
        ]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "shingles": pa.array(out, pa.binary()),
            }
        )

    return _read_docs(sf_dir).map_batches(sh, batch_format="pyarrow")


def ngram_jaccard_dups(sf_dir: str, shingle: int = 3, threshold: float = 0.8):
    """Verified near-duplicate pairs: jaccard over distinct token n-gram
    hashes. Candidates come from minhash LSH buckets; shingle sets are
    hash-joined onto the pairs and verified inside map_batches — the whole
    path is distributed (no driver-side collect)."""
    cands = minhash_candidates(sf_dir, num_perm=32, bands=8)
    sh = shingle_sets(sf_dir, shingle)
    nparts = max(2, min(16, _cpus() // 2))
    joined = cands.join(
        sh, "inner", num_partitions=nparts, on=("doc_a",), right_on=("doc_id",)
    ).join(
        sh,
        "inner",
        num_partitions=nparts,
        on=("doc_b",),
        right_on=("doc_id",),
        left_suffix="_a",
        right_suffix="_b",
    )

    def verify(batch: pa.Table) -> pa.Table:
        a_out, b_out, j_out = [], [], []
        da = batch.column("doc_a").to_pylist()
        db = batch.column("doc_b").to_pylist()
        sa_l = batch.column("shingles_a").to_pylist()
        sb_l = batch.column("shingles_b").to_pylist()
        for x, y, sab, sbb in zip(da, db, sa_l, sb_l):
            sa = np.frombuffer(sab, dtype=np.uint64)
            sb = np.frombuffer(sbb, dtype=np.uint64)
            if len(sa) == 0 or len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union
            if j >= threshold:
                a_out.append(x)
                b_out.append(y)
                j_out.append(j)
        return pa.table(
            {
                "doc_a": pa.array(a_out, pa.int64()),
                "doc_b": pa.array(b_out, pa.int64()),
                "jaccard": pa.array(j_out, pa.float64()),
            }
        )

    return joined.map_batches(verify, batch_format="pyarrow")
