"""Multimodal (media) column handling: opaque binary payloads with typed
metadata, processed by actor-pool ``map_batches`` stages.

``decode_real=True`` uses Pillow when it is importable (loaded once per
actor in ``__init__`` — the codec-load-per-actor pattern); in a container
without Pillow it raises NotImplementedError at actor construction, and
the default deterministic fake kernel keeps the Ray-side plumbing —
schema, actor signature, batch sizing, 1→N frame explosion, output
layout — real and tested either way.
"""

from __future__ import annotations

import hashlib

import ray

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

MEDIA_FEATURES_DIM = 8


def _load_pillow(what: str):
    """Per-actor codec load for the ``decode_real`` branches; raises with
    a clear message when the extra isn't installed."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError as exc:
        raise NotImplementedError(
            f"{what} with decode_real=True requires Pillow, which is not "
            "installed in this environment (pip install Pillow)"
        ) from exc


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
        # real system would fetch bytes by media_ref here). sha256 rather
        # than blake2b so the DuckDB oracle can derive the identical blob
        # (DuckDB ships sha256, not blake2b).
        payloads = [
            hashlib.sha256(r.encode()).digest() for r in refs.to_pylist()
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
        self._image_mod = _load_pillow("image decode") if decode_real else None

    def _fake_decode(self, payload: bytes) -> np.ndarray:
        # deterministic stand-in for decode+embed: sha256 over the
        # payload's lowercase hex (not the raw bytes) because DuckDB's
        # sha256 takes VARCHAR only — this keeps the whole fake
        # decode chain SQL-reproducible (sql twin in __ray_entry__.py
        # media_features oracle), so even the media query is hash-checked
        h = hashlib.sha256(payload.hex().encode()).digest()
        return (
            np.frombuffer(h[: MEDIA_FEATURES_DIM * 4], dtype="<u4").astype(
                np.float64
            )
            / np.iinfo(np.uint32).max
        )

    def _real_decode(self, payload: bytes) -> np.ndarray:
        """Pillow decode → 8 deterministic image statistics (mean/std per
        RGB channel + log-dims) — a stand-in embedding with the same
        fixed-size-list output contract as a model head."""
        import io

        img = self._image_mod.open(io.BytesIO(payload)).convert("RGB")
        arr = np.asarray(img, dtype=np.float64) / 255.0
        return np.array(
            [
                *arr.mean(axis=(0, 1)),
                *arr.std(axis=(0, 1)),
                np.log1p(img.width),
                np.log1p(img.height),
            ]
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        decode = self._real_decode if self.decode_real else self._fake_decode
        feats = [decode(p) for p in batch.column("payload").to_pylist()]
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
        self._image_mod = _load_pillow("image resize") if decode_real else None

    def _fake_resize(self, payload: bytes) -> bytes:
        # deterministic stand-in: real impl = decode → resize → re-encode.
        # sha256 chain over hex strings (seed = payload hex + 'WxH', block
        # j = sha256 applied j+1 times) so the DuckDB oracle reproduces
        # every output byte with nested sha256 calls (media_resize query)
        seed = hashlib.sha256(
            (payload.hex() + f"-{self.width}x{self.height}").encode()
        ).hexdigest()
        n = self.width * self.height // 16
        out = bytearray()
        cur = seed
        while len(out) < n:
            cur = hashlib.sha256(cur.encode()).hexdigest()
            out.extend(bytes.fromhex(cur))
        return bytes(out[:n])

    def _real_resize(self, payload: bytes) -> bytes:
        import io

        img = self._image_mod.open(io.BytesIO(payload))
        out = io.BytesIO()
        img.resize((self.width, self.height)).save(out, format="PNG")
        return out.getvalue()

    def __call__(self, batch: pa.Table) -> pa.Table:
        resize = self._real_resize if self.decode_real else self._fake_resize
        payloads = [resize(p) for p in batch.column("payload").to_pylist()]
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
        # Pillow covers multi-frame containers (GIF/TIFF/WebP); a video
        # codec (pyav/ffmpeg) slots in the same way for mp4 et al.
        self._image_mod = _load_pillow("frame sampling") if decode_real else None

    def _real_frames(self, payload: bytes) -> list[bytes]:
        """Sample n_frames evenly across the container's frames, re-encoded
        as PNG bytes."""
        import io

        img = self._image_mod.open(io.BytesIO(payload))
        total = getattr(img, "n_frames", 1)
        picks = [min(total - 1, i * total // self.n_frames) for i in range(self.n_frames)]
        out = []
        for f in picks:
            img.seek(f)
            buf = io.BytesIO()
            img.convert("RGB").save(buf, format="PNG")
            out.append(buf.getvalue())
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs, dids, fidx, frames = [], [], [], []
        for ref, did, payload in zip(
            batch.column("media_ref").to_pylist(),
            batch.column("doc_id").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if self.decode_real:
                sampled = self._real_frames(payload)
            else:
                # sha256 over (payload hex || '-' || idx) — like the fake
                # decode chain, chosen so the DuckDB oracle reproduces
                # every frame byte-for-byte (media_frames query)
                sampled = [
                    hashlib.sha256(
                        (payload.hex() + f"-{i}").encode()
                    ).digest()
                    for i in range(self.n_frames)
                ]
            for i, frame in enumerate(sampled):
                refs.append(ref)
                dids.append(did)
                fidx.append(i)
                frames.append(frame)
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
