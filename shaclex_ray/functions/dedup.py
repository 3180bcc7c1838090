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
    """Batch-mapping stage: permutation seeds built once per worker process
    (the state is 64 ints — a task fn with a process-level seed cache beats
    an actor pool, whose startup dominates at interactive scale). Each
    "permutation" is splitmix64 over (shingle-hash XOR seed) — a well-mixed
    min-wise family, one vectorized numpy expression per doc."""

    _seed_cache: dict[int, np.ndarray] = {}

    def __init__(self, num_perm: int = 64, shingle: int = 3):
        cached = MinHasher._seed_cache.get(num_perm)
        if cached is None:
            cached = MinHasher._seed_cache[num_perm] = minhash_seeds(num_perm)
        self.seeds = cached
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
    """LSH candidate pairs (doc_a < doc_b) from banded minhash buckets.

    ONE shuffle total: band rows carry the full signature, and a pair is
    emitted only in its *lowest* colliding band (earlier-band collisions
    are recomputable bucket-locally from the two signatures) — exact
    distinct-pair semantics without a second groupby exchange."""
    rows_per_band = num_perm // bands

    def band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        sigs = batch.column("sig").to_pylist()
        out_ids, out_band, out_keys, out_sig = [], [], [], []
        for did, sig in zip(ids, sigs):
            for b in range(bands):
                chunk = sig[b * rows_per_band : (b + 1) * rows_per_band]
                out_ids.append(did)
                out_band.append(b)
                out_keys.append(band_key(b, chunk))
                out_sig.append(sig)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_keys, pa.string()),
                "sig": pa.array(out_sig, pa.list_(pa.uint64(), num_perm)),
            }
        )

    def bucket_pairs(group: pa.Table) -> pa.Table:
        band = group.column("band")[0].as_py()
        by_id = {}
        for did, sig in zip(
            group.column("doc_id").to_pylist(), group.column("sig").to_pylist()
        ):
            by_id[did] = sig
        ids = sorted(by_id)

        def first_collision(x, y) -> bool:
            sx, sy = by_id[x], by_id[y]
            for b2 in range(band):
                lo, hi = b2 * rows_per_band, (b2 + 1) * rows_per_band
                if sx[lo:hi] == sy[lo:hi]:
                    return False  # already emitted by an earlier band
            return True

        a, b = [], []
        if len(ids) > MAX_BUCKET_PAIRS_DOCS:
            # degenerate bucket: chain consecutive ids — same connected
            # component, O(n) pairs instead of O(n²). Logged, never silent.
            print(
                f"[dedup_minhash] degenerate LSH bucket: {len(ids)} docs, "
                f"chaining instead of all-pairs",
                flush=True,
            )
            for x, y in zip(ids[:-1], ids[1:]):
                if first_collision(x, y):
                    a.append(x)
                    b.append(y)
        else:
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    if first_collision(ids[i], ids[j]):
                        a.append(ids[i])
                        b.append(ids[j])
        return pa.table(
            {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
        )

    # plain task fn (not an actor pool): per-batch work is a vectorized
    # numpy expression, the "state" is 64 cached ints — task scheduling
    # parallelizes across the whole cluster with zero pool-startup cost
    hasher = MinHasher(num_perm)
    sigs = _read_docs(sf_dir).map_batches(hasher, batch_format="pyarrow")
    return (
        sigs.map_batches(band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_pairs, batch_format="pyarrow")
    )


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
    # task fn: the only state is the per-process token-hash memo
    return _read_docs(sf_dir).map_batches(SimHasher(), batch_format="pyarrow")


def simhash_groups(sf_dir: str):
    """SimHash duplicate groups: docs sharing a 64-bit simhash key
    (the dup-pair reduction over the signatures — hash-partition groupby,
    map-side nothing needed; groups of size 1 are dropped)."""

    def combine(group: pa.Table) -> pa.Table:
        if group.num_rows < 2:
            return pa.table(
                {
                    "simhash": pa.array([], pa.string()),
                    "canonical_doc_id": pa.array([], pa.int64()),
                    "n_dups": pa.array([], pa.int64()),
                }
            )
        ids = group.column("doc_id")
        return pa.table(
            {
                "simhash": group.column("simhash").slice(0, 1),
                "canonical_doc_id": pa.array([pc.min(ids).as_py()], pa.int64()),
                "n_dups": pa.array([group.num_rows], pa.int64()),
            }
        )

    return (
        simhashes(sf_dir)
        .groupby("simhash")
        .map_groups(combine, batch_format="pyarrow")
    )


# ------------------------------------------------------- ngram jaccard

def ngram_jaccard_dups(
    sf_dir: str,
    shingle: int = 3,
    threshold: float = 0.8,
    num_perm: int = 32,
    bands: int = 8,
):
    """Verified near-duplicate pairs: jaccard over distinct token n-gram
    hashes, verified WHERE the candidates live — the band rows carry each
    doc's shingle-hash set through the one LSH shuffle, and the bucket
    task both generates pairs (emit-on-first-collision dedup) and verifies
    them in place. One shuffle end-to-end, no joins, no driver collect."""
    rows_per_band = num_perm // bands
    seeds = minhash_seeds(num_perm)

    def sig_band_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        out_ids, out_band, out_keys, out_sig, out_sh = [], [], [], [], []
        for did, text in zip(ids, texts):
            th = _token_hashes(text, shingle)
            sh_bytes = np.unique(th).tobytes()
            sig = (
                _splitmix64(th[None, :] ^ seeds[:, None]).min(axis=1)
                if len(th)
                else np.zeros(num_perm, dtype=np.uint64)
            )
            sig_l = sig.tolist()
            for b in range(bands):
                out_ids.append(did)
                out_band.append(b)
                out_keys.append(
                    band_key(b, sig_l[b * rows_per_band : (b + 1) * rows_per_band])
                )
                out_sig.append(sig_l)
                out_sh.append(sh_bytes)
        return pa.table(
            {
                "doc_id": pa.array(out_ids, pa.int64()),
                "band": pa.array(out_band, pa.int32()),
                "band_key": pa.array(out_keys, pa.string()),
                "sig": pa.array(out_sig, pa.list_(pa.uint64(), num_perm)),
                "shingles": pa.array(out_sh, pa.binary()),
            }
        )

    def bucket_verify(group: pa.Table) -> pa.Table:
        band = group.column("band")[0].as_py()
        by_id: dict[int, tuple] = {}
        for did, sig, shb in zip(
            group.column("doc_id").to_pylist(),
            group.column("sig").to_pylist(),
            group.column("shingles").to_pylist(),
        ):
            by_id[did] = (sig, shb)
        ids = sorted(by_id)
        if len(ids) > MAX_BUCKET_PAIRS_DOCS:
            print(
                f"[dedup_ngram] degenerate LSH bucket: {len(ids)} docs, "
                f"chaining instead of all-pairs",
                flush=True,
            )
            cand = list(zip(ids[:-1], ids[1:]))
        else:
            cand = [
                (ids[i], ids[j])
                for i in range(len(ids))
                for j in range(i + 1, len(ids))
            ]
        a_out, b_out, j_out = [], [], []
        for x, y in cand:
            sx, shx = by_id[x]
            sy, shy = by_id[y]
            if any(
                sx[b2 * rows_per_band : (b2 + 1) * rows_per_band]
                == sy[b2 * rows_per_band : (b2 + 1) * rows_per_band]
                for b2 in range(band)
            ):
                continue  # pair already handled by an earlier band's bucket
            sa = np.frombuffer(shx, dtype=np.uint64)
            sb = np.frombuffer(shy, dtype=np.uint64)
            if len(sa) == 0 or len(sb) == 0:
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            j = inter / (len(sa) + len(sb) - inter)
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

    return (
        _read_docs(sf_dir)
        .map_batches(sig_band_rows, batch_format="pyarrow")
        .groupby("band_key")
        .map_groups(bucket_verify, batch_format="pyarrow")
    )
