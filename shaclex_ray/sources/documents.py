"""Interleaved text+media document source (the pipeline input per
BASELINE.json input_hint):

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string,
                        offset: int32>>

The sandbox has no Lance package and no external corpus, so the table is
*synthesized deterministically* from the driver-provided flat
``documents.parquet`` (doc_id:int64, text, lang, source) — seed-free, purely
content-derived, so every run (and the DuckDB oracle) produces the identical
table. Rules:

  * tokens = text split on single spaces; chunks of ``CHUNK`` tokens become
    ``text`` spans (text = the chunk joined by spaces)
  * every token in ENTITY_VOCAB additionally emits an ``entity`` span whose
    surface form is a deterministic case variant (exercises entity linking;
    vocabulary skew exercises hub-entity salting)
  * after chunk c of doc d, if (d + c) % MEDIA_EVERY == 0, an ``image`` span
    with media_ref = "media://h/" + md5(doc_id_str + "/" + c) is interleaved
  * offset = span ordinal within the doc (monotonically increasing)

Per-row invariant (vs the reference semantics, SURVEY.md §2.10): the
sequence [(kind, text, media_ref, order)] per doc is preserved by every
downstream transform via the carried span_idx.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data

CHUNK = 8
MEDIA_EVERY = 7
ENTITY_VOCAB = (
    "spark",
    "customer",
    "vector",
    "window",
    "stream",
    "hash",
    "merge",
    "join",
)
_ENTITY_SET = set(ENTITY_VOCAB)

SPAN_STRUCT = pa.struct(
    [
        pa.field("kind", pa.string()),
        pa.field("text", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("offset", pa.int32()),
    ]
)


def doc_id_str(doc_id: int) -> str:
    return f"doc-{doc_id:08d}"


def mention_variant(token: str, doc_id: int, tok_idx: int) -> str:
    """Deterministic surface-form variant (exercises canonicalization)."""
    v = (doc_id + tok_idx) % 3
    if v == 1:
        return token.upper()
    if v == 2:
        return token[:1].upper() + token[1:]
    return token


def build_spans_batch(batch: pa.Table) -> pa.Table:
    """Vectorized-ish span builder: Arrow in, Arrow out.

    The nested variable-length construction is done with Python lists feeding
    a single ListArray.from_arrays at the end (one allocation per column);
    per-token work is plain string ops on pre-split token lists.
    """
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()

    offsets = [0]
    kinds: list[str] = []
    span_texts: list[str] = []
    media_refs: list[str] = []
    span_offsets: list[int] = []
    out_ids: list[str] = []

    for did, text in zip(doc_ids, texts):
        toks = text.split(" ") if text else []
        ordinal = 0
        nchunks = (len(toks) + CHUNK - 1) // CHUNK
        for c in range(nchunks):
            chunk_toks = toks[c * CHUNK : (c + 1) * CHUNK]
            kinds.append("text")
            span_texts.append(" ".join(chunk_toks))
            media_refs.append("")
            span_offsets.append(ordinal)
            ordinal += 1
            for j, t in enumerate(chunk_toks):
                if t in _ENTITY_SET:
                    kinds.append("entity")
                    span_texts.append(mention_variant(t, did, c * CHUNK + j))
                    media_refs.append("")
                    span_offsets.append(ordinal)
                    ordinal += 1
            if (did + c) % MEDIA_EVERY == 0:
                h = hashlib.md5(f"{doc_id_str(did)}/{c}".encode()).hexdigest()
                kinds.append("image")
                span_texts.append("")
                media_refs.append("media://h/" + h)
                span_offsets.append(ordinal)
                ordinal += 1
        out_ids.append(doc_id_str(did))
        offsets.append(len(kinds))

    spans = pa.ListArray.from_arrays(
        pa.array(offsets, pa.int32()),
        pa.StructArray.from_arrays(
            [
                pa.array(kinds, pa.string()),
                pa.array(span_texts, pa.string()),
                pa.array(media_refs, pa.string()),
                pa.array(span_offsets, pa.int32()),
            ],
            fields=list(SPAN_STRUCT),
        ),
    )
    return pa.table(
        {
            "doc_id": pa.array(out_ids, pa.string()),
            "spans": spans,
            "lang": batch.column("lang"),
            "source": batch.column("source"),
        }
    )


def read_documents(sf_dir: str, parallelism: int = 32) -> "ray.data.Dataset":
    """sf_dir/documents.parquet -> interleaved-span documents Dataset.

    Column-pruned read (only the columns the span builder needs leave
    storage); span construction streams through map_batches. Block count
    is pinned to ~2× the cluster CPUs via ``override_num_blocks``: Ray's
    default split of a single large file is far finer (hundreds of
    ~2 MB blocks), and the per-block driver dispatch then serializes the
    whole stage — coarse blocks keep every core on UDF work. (This also
    splits a one-row-group test file without a repartition shuffle; pass
    parallelism=0 to take the file's natural blocks.)
    """
    path = f"{sf_dir}/documents.parquet"
    if parallelism:
        ncpu = int(ray.cluster_resources().get("CPU", parallelism))
        nblocks = max(parallelism, 2 * ncpu)
        ds = ray.data.read_parquet(
            path,
            columns=["doc_id", "text", "lang", "source"],
            override_num_blocks=nblocks,
        )
    else:
        ds = ray.data.read_parquet(
            path, columns=["doc_id", "text", "lang", "source"]
        )
    return ds.map_batches(build_spans_batch, batch_format="pyarrow")
