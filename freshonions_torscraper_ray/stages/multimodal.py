"""Multimodal (image/audio) stages: opaque binary columns + typed metadata.

The interleaved input payload carries media spans (``kind='image'`` with a
``media_ref``). This module provides the Ray-side plumbing a multimodal
training pipeline needs — schema, actor signature, batch sizing, output
layout — with the actual codec work STUBBED: the sandbox ships no
image/audio libraries, so decode produces a deterministic fake (seeded by
the payload hash) and the real-library call sites are clearly marked.

Batch-size note: media payloads are large-binary; callers should use a
small ``batch_size`` (≤256) so batch × concurrency stays inside worker
heaps — blocks of wide binary rows are exactly the case
``DataContext.target_max_block_size`` exists for.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.hashing import hash64

MEDIA_SCHEMA = pa.schema(
    [
        pa.field("doc_id", pa.string()),
        pa.field("media_ref", pa.string()),
        pa.field("payload", pa.large_binary()),
        pa.field("media_type", pa.string()),  # "image" | "audio" | "video"
    ]
)


def media_rows_from_spans(batch: pa.Table) -> pa.Table:
    """Explode media spans → MEDIA_SCHEMA rows with deterministic fake
    payloads (payload = seeded bytes; a real crawler stores fetched bytes)."""
    spans = batch["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    kinds = pc.struct_field(flat, "kind")
    refs = pc.struct_field(flat, "media_ref")
    mask = pc.equal(kinds, "image")
    refs_np = pc.filter(refs, mask).to_numpy(zero_copy_only=False)
    par_np = pc.filter(parents, mask).to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    payloads = []
    for r in refs_np:
        rng = np.random.RandomState(hash64(r) & 0x7FFFFFFF)
        payloads.append(rng.bytes(64 + (hash64(r) % 192)))
    return pa.Table.from_arrays(
        [
            pa.array([doc_ids[p] for p in par_np], pa.string()),
            pa.array(list(refs_np), pa.string()),
            pa.array(payloads, pa.large_binary()),
            pa.array(["image"] * len(refs_np), pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


class ImageDecoder:
    """Actor-pool decode stage: payload bytes → (height, width, feature vec).

    Real implementation would do ``PIL.Image.open(io.BytesIO(payload))``
    in ``__call__`` with the library imported once here in ``__init__``.
    Neither PIL nor cv2 exists in this container, so decode is a
    deterministic fake keyed by the payload hash; set ``strict=True`` to
    get the honest NotImplementedError instead.
    """

    def __init__(self, feature_dim: int = 8, strict: bool = False):
        self.feature_dim = feature_dim
        self.strict = strict
        try:  # pragma: no cover - not installed in this container
            import PIL.Image  # type: ignore # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self._pil:
            raise NotImplementedError("image decode requires PIL/cv2 (not in this container)")
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        n = len(payloads)
        h = np.empty(n, dtype=np.int32)
        w = np.empty(n, dtype=np.int32)
        feats = np.empty((n, self.feature_dim), dtype=np.float32)
        for i, p in enumerate(payloads):
            seed = hash64(bytes(p))
            h[i] = 32 + seed % 480
            w[i] = 32 + (seed >> 16) % 640
            rng = np.random.RandomState(seed & 0x7FFFFFFF)
            feats[i] = rng.standard_normal(self.feature_dim).astype(np.float32)
        out = batch.drop_columns(["payload"])  # decoded stages drop raw bytes
        out = out.append_column("height", pa.array(h))
        out = out.append_column("width", pa.array(w))
        return out.append_column("features", pa.array(list(feats), pa.list_(pa.float32())))


class FrameSampler:
    """Actor-pool frame-sampling stage for video payloads: one output row
    per sampled frame (``flat_map``-shaped explode inside map_batches).

    Real implementation would open the container once per payload
    (``av.open(io.BytesIO(payload))``) and decode only the sampled frame
    indices; no video library ships in this container, so the frame
    COUNT is a deterministic fake keyed by the payload hash and the
    frame payload is a seeded stub — the Ray-side plumbing (explode
    layout, stride policy, per-frame schema, small-batch discipline for
    wide binary rows) is the real, tested part.
    """

    def __init__(self, stride: int = 10, max_frames: int = 8, strict: bool = False):
        self.stride = max(stride, 1)
        self.max_frames = max(max_frames, 1)
        self.strict = strict
        try:  # pragma: no cover - not installed in this container
            import av  # type: ignore # noqa: F401

            self._av = True
        except ImportError:
            self._av = False

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.strict and not self._av:
            raise NotImplementedError("frame sampling requires PyAV/ffmpeg (not in this container)")
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        refs = batch["media_ref"].to_numpy(zero_copy_only=False)
        out_doc, out_ref, out_idx, out_frame = [], [], [], []
        for i, p in enumerate(payloads):
            seed = hash64(bytes(p))
            n_frames = 1 + seed % 300  # fake container length
            idxs = list(range(0, n_frames, self.stride))[: self.max_frames]
            rng = np.random.RandomState(seed & 0x7FFFFFFF)
            for fi in idxs:
                out_doc.append(doc_ids[i])
                out_ref.append(refs[i])
                out_idx.append(fi)
                out_frame.append(rng.bytes(32))  # stub frame payload
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.string()),
                pa.array(out_ref, pa.string()),
                pa.array(out_idx, pa.int32()),
                pa.array(out_frame, pa.large_binary()),
            ],
            names=["doc_id", "media_ref", "frame_idx", "frame"],
        )


class ImageResizer:
    """Actor-pool resize stage (stub): clamps dims to a target box,
    preserving aspect; real impl would transform pixels."""

    def __init__(self, max_side: int = 224):
        self.max_side = max_side

    def __call__(self, batch: pa.Table) -> pa.Table:
        h = batch["height"].to_numpy(zero_copy_only=False).astype(np.float64)
        w = batch["width"].to_numpy(zero_copy_only=False).astype(np.float64)
        scale = np.minimum(1.0, self.max_side / np.maximum(h, w))
        out = batch.drop_columns(["height", "width"])
        out = out.append_column("height", pa.array((h * scale).astype(np.int32)))
        return out.append_column("width", pa.array((w * scale).astype(np.int32)))
