"""Multimodal (media) column handling: opaque binary payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

The container has no image/audio codecs, so the *decode* kernel is stubbed
(NotImplementedError behind ``decode_real=True``, deterministic fake
features otherwise) — but the Ray-side plumbing is real and tested: schema,
actor signature, batch sizing, and output layout are exactly what a codec-
backed implementation would use (swap ``_fake_decode`` for the real
library call in ``MediaFeaturizer.__call__``).
"""

from __future__ import annotations

import hashlib

import ray

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_FEATURES_DIM = 8


def media_refs_from_documents(docs_ds):
    """documents (interleaved spans) -> media table
    (media_ref, doc_id, span_offset, payload: binary)."""

    def explode(batch: pa.Table) -> pa.Table:
        spans = batch.column("spans").combine_chunks()
        flat = pc.list_flatten(spans)
        parents = pc.list_parent_indices(spans)
        kind = flat.field("kind")
        mask = pc.equal(kind, "image")
        refs = pc.filter(flat.field("media_ref"), mask)
        offs = pc.filter(flat.field("offset"), mask)
        dids = pc.take(batch.column("doc_id").combine_chunks(), pc.filter(parents, mask))
        # payload: the sandbox has no object store for media bytes — the
        # payload is a deterministic pseudo-blob derived from the ref (the
        # real system would fetch bytes by media_ref here)
        payloads = [
            hashlib.blake2b(r.encode(), digest_size=32).digest()
            for r in refs.to_pylist()
        ]
        return pa.table(
            {
                "media_ref": refs,
                "doc_id": dids,
                "span_offset": offs,
                "payload": pa.array(payloads, pa.binary()),
            }
        )

    return docs_ds.map_batches(explode, batch_format="pyarrow")


class MediaFeaturizer:
    """Actor-pool decode/feature stage. ``__init__`` is where a codec /
    model would load once per actor; small batch_size is the right setting
    for large binary payloads."""

    def __init__(self, decode_real: bool = False):
        self.decode_real = decode_real

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic stand-in for decode+embed
        h = hashlib.blake2b(payload, digest_size=MEDIA_FEATURES_DIM * 4).digest()
        return (
            np.frombuffer(h, dtype=np.uint32).astype(np.float64)
            / np.iinfo(np.uint32).max
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch.column("payload").to_pylist():
            if self.decode_real:
                raise NotImplementedError(
                    "image decode requires a codec library not present in "
                    "this container; wire e.g. PIL.Image.open here"
                )
            feats.append(self._fake_decode(payload))
        arr = np.vstack(feats) if feats else np.zeros((0, MEDIA_FEATURES_DIM))
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "doc_id": batch.column("doc_id"),
                "features": pa.array(list(arr), pa.list_(pa.float64(), MEDIA_FEATURES_DIM)),
            }
        )


def media_features(docs_ds, concurrency=None, batch_size: int = 256):
    media = media_refs_from_documents(docs_ds)
    return media.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        concurrency=concurrency
        or (1, max(2, int(ray.cluster_resources().get("CPU", 4)))),
        batch_size=batch_size,
    )


class MediaResizer:
    """Actor-pool resize stage: payload -> resized payload + dimensions.
    Decode/encode is the stubbed kernel (swap for PIL / libvips); the
    plumbing — binary in, binary + typed metadata out, small batches,
    per-actor codec init — is the production layout."""

    def __init__(self, width: int = 64, height: int = 64, decode_real: bool = False):
        self.width = width
        self.height = height
        self.decode_real = decode_real

    def _fake_resize(self, payload: bytes) -> bytes:
        # deterministic stand-in: real impl = decode → resize → re-encode
        seed = hashlib.blake2b(
            payload + f"{self.width}x{self.height}".encode(), digest_size=8
        ).digest()
        n = self.width * self.height // 16
        out = bytearray()
        cur = seed
        while len(out) < n:
            cur = hashlib.blake2b(cur, digest_size=32).digest()
            out.extend(cur)
        return bytes(out[:n])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = []
        for payload in batch.column("payload").to_pylist():
            if self.decode_real:
                raise NotImplementedError(
                    "image resize requires a codec library not present in "
                    "this container; wire e.g. PIL.Image.resize here"
                )
            payloads.append(self._fake_resize(payload))
        n = batch.num_rows
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "doc_id": batch.column("doc_id"),
                "payload": pa.array(payloads, pa.binary()),
                "width": pa.array([self.width] * n, pa.int32()),
                "height": pa.array([self.height] * n, pa.int32()),
            }
        )


def media_resize(docs_ds, width: int = 64, height: int = 64, batch_size: int = 128):
    """Resize every media payload (actor pool; small batches for binaries)."""
    media = media_refs_from_documents(docs_ds)
    return media.map_batches(
        MediaResizer,
        fn_constructor_args=(width, height),
        batch_format="pyarrow",
        concurrency=(1, max(2, int(ray.cluster_resources().get("CPU", 4)))),
        batch_size=batch_size,
    )


class FrameSampler:
    """Actor-pool video frame-sampling stage: one input payload explodes to
    ``n_frames`` frame rows (flat_map-shaped output — the row-count change
    is the real plumbing being exercised; the frame extraction kernel is
    the stub to swap for pyav/ffmpeg)."""

    def __init__(self, n_frames: int = 4, decode_real: bool = False):
        self.n_frames = n_frames
        self.decode_real = decode_real

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, dids, fidx, frames = [], [], [], []
        for ref, did, payload in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("doc_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if self.decode_real:
                raise NotImplementedError(
                    "frame sampling requires a video codec not present in "
                    "this container; wire e.g. av.open here"
                )
            for i in range(self.n_frames):
                refs.append(ref)
                dids.append(did)
                fidx.append(i)
                frames.append(
                    hashlib.blake2b(payload + bytes([i]), digest_size=32).digest()
                )
        return pa.table(
            {
                "media_ref": pa.array(refs, pa.string()),
                "doc_id": pa.array(dids, pa.string()),
                "frame_idx": pa.array(fidx, pa.int32()),
                "frame": pa.array(frames, pa.binary()),
            }
        )


def media_frame_samples(docs_ds, n_frames: int = 4, batch_size: int = 64):
    """Sample ``n_frames`` frames per media payload (1→N row explosion)."""
    media = media_refs_from_documents(docs_ds)
    return media.map_batches(
        FrameSampler,
        fn_constructor_args=(n_frames,),
        batch_format="pyarrow",
        concurrency=(1, max(2, int(ray.cluster_resources().get("CPU", 4)))),
        batch_size=batch_size,
    )
