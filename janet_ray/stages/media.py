"""Multimodal (image/audio/video) columns as opaque binary + typed metadata
(SURVEY.md §2.11).

Real decoders (JPEG/PNG/WAV/MP4) are NOT in this container — they are stubbed
behind ``NotImplementedError`` in ``_decode_standard``. The Ray-side plumbing is
real and tested against a deterministic in-repo container family:

    JIMG: b"JIMG" u16 width u16 height | width*height grayscale bytes
    JAUD: b"JAUD" u32 n_samples        | n_samples  i16 little-endian samples
    JVID: b"JVID" u16 n_frames         | n_frames length-prefixed JIMG frames

Stages are actor-pool ``map_batches`` classes — decoder tables and filter kernels
are built once per actor in ``__init__`` (the reference's lazy singleton intent,
apps/ocr/src/lib/ocr-utils.ts:61-83, done right). Batches of binary payloads are
memory-bounded: size ``batch_size`` so batch_bytes × concurrency fits the worker
heap (large payloads ⇒ small batches, SURVEY.md §4 memory row).
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

MEDIA_META_TYPE = pa.struct([
    ("format", pa.string()),
    ("width", pa.int32()),
    ("height", pa.int32()),
    ("n_frames", pa.int32()),
    ("n_samples", pa.int64()),
    ("ok", pa.bool_()),
    ("error", pa.string()),
])


class MediaFormatError(ValueError):
    pass


# ---------------------------------------------------------------- encoders
# (used by tests/synth to build deterministic corpora)

def encode_jimg(img: np.ndarray) -> bytes:
    h, w = img.shape
    return b"JIMG" + struct.pack("<HH", w, h) + img.astype(np.uint8).tobytes()


def encode_jaud(samples: np.ndarray) -> bytes:
    return b"JAUD" + struct.pack("<I", len(samples)) + samples.astype("<i2").tobytes()


def encode_jvid(frames: list[np.ndarray]) -> bytes:
    out = [b"JVID", struct.pack("<H", len(frames))]
    for f in frames:
        b = encode_jimg(f)
        out.append(struct.pack("<I", len(b)))
        out.append(b)
    return b"".join(out)


# ---------------------------------------------------------------- decoders

def decode_jimg(payload: bytes) -> np.ndarray:
    if len(payload) < 8 or payload[:4] != b"JIMG":
        raise MediaFormatError("not a JIMG payload")
    w, h = struct.unpack("<HH", payload[4:8])
    body = payload[8 : 8 + w * h]
    if len(body) != w * h:
        raise MediaFormatError(f"JIMG truncated: want {w * h} bytes, have {len(body)}")
    return np.frombuffer(body, dtype=np.uint8).reshape(h, w)


def decode_jaud(payload: bytes) -> np.ndarray:
    if len(payload) < 8 or payload[:4] != b"JAUD":
        raise MediaFormatError("not a JAUD payload")
    (n,) = struct.unpack("<I", payload[4:8])
    body = payload[8 : 8 + 2 * n]
    if len(body) != 2 * n:
        raise MediaFormatError("JAUD truncated")
    return np.frombuffer(body, dtype="<i2")


def decode_jvid(payload: bytes) -> list[np.ndarray]:
    if len(payload) < 6 or payload[:4] != b"JVID":
        raise MediaFormatError("not a JVID payload")
    (n,) = struct.unpack("<H", payload[4:6])
    frames, off = [], 6
    for _ in range(n):
        if off + 4 > len(payload):
            raise MediaFormatError("JVID truncated")
        (ln,) = struct.unpack("<I", payload[off : off + 4])
        off += 4
        frames.append(decode_jimg(payload[off : off + ln]))
        off += ln
    return frames


def _decode_standard(payload: bytes) -> None:
    """Production path for real codecs — requires PIL/libav, absent here."""
    magic = payload[:4]
    known = {b"\xff\xd8\xff\xe0": "jpeg", b"\x89PNG": "png", b"RIFF": "wav/avi"}
    name = next((v for k, v in known.items() if magic.startswith(k[:len(magic)])), None)
    if name:
        raise NotImplementedError(
            f"{name} decoding requires an image/audio library not present in this "
            "environment; production deployments plug a real decoder in here"
        )
    raise MediaFormatError(f"unrecognized media magic {magic!r}")


# ---------------------------------------------------------------- stages

class MediaProbeStage:
    """(id, media:binary) batch → + ``media_meta`` struct column. Errors are data
    (ok=False + message), mirroring the engine-wide error-as-data rule."""

    def __init__(self, *, media_col: str = "media"):
        self.media_col = media_col

    def _probe(self, payload: bytes | None) -> dict:
        meta = dict(format="", width=0, height=0, n_frames=0, n_samples=0,
                    ok=False, error="")
        if not payload:
            meta["error"] = "empty payload"
            return meta
        try:
            magic = payload[:4]
            if magic == b"JIMG":
                img = decode_jimg(payload)
                meta.update(format="jimg", width=img.shape[1], height=img.shape[0],
                            n_frames=1, ok=True)
            elif magic == b"JAUD":
                s = decode_jaud(payload)
                meta.update(format="jaud", n_samples=int(len(s)), ok=True)
            elif magic == b"JVID":
                frames = decode_jvid(payload)
                w, h = (frames[0].shape[1], frames[0].shape[0]) if frames else (0, 0)
                meta.update(format="jvid", width=w, height=h,
                            n_frames=len(frames), ok=True)
            else:
                _decode_standard(payload)
        except NotImplementedError as e:
            meta["error"] = f"stub: {e}"
        except MediaFormatError as e:
            meta["error"] = str(e)
        return meta

    def __call__(self, batch: pa.Table) -> pa.Table:
        metas = [self._probe(p) for p in batch[self.media_col].to_pylist()]
        return batch.append_column("media_meta", pa.array(metas, MEDIA_META_TYPE))


class ImageFeatureStage:
    """Decode JIMG → fixed-size feature vector (16-bin normalized byte histogram
    + mean/std). The bin-edge table is actor state (built once)."""

    def __init__(self, *, media_col: str = "media", n_bins: int = 16):
        self.media_col = media_col
        self.edges = np.linspace(0, 256, n_bins + 1)
        self.n_bins = n_bins

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        for payload in batch[self.media_col].to_pylist():
            try:
                img = decode_jimg(payload or b"")
                hist, _ = np.histogram(img, bins=self.edges)
                v = hist.astype(np.float64) / max(img.size, 1)
                feats.append(np.concatenate([v, [img.mean() / 255.0, img.std() / 255.0]]).tolist())
            except MediaFormatError:
                feats.append([0.0] * (self.n_bins + 2))
        return batch.append_column(
            "features", pa.array(feats, pa.list_(pa.float64()))
        )


class ImageResizeStage:
    """Nearest-neighbor resize of JIMG payloads to (out_w, out_h) — the decode /
    transform / re-encode plumbing of a real thumbnailing stage."""

    def __init__(self, *, media_col: str = "media", out_w: int = 32, out_h: int = 32):
        self.media_col = media_col
        self.out_w, self.out_h = out_w, out_h

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch[self.media_col].to_pylist():
            try:
                img = decode_jimg(payload or b"")
                ys = (np.arange(self.out_h) * img.shape[0] // self.out_h)
                xs = (np.arange(self.out_w) * img.shape[1] // self.out_w)
                out.append(encode_jimg(img[np.ix_(ys, xs)]))
            except MediaFormatError:
                out.append(None)
        return batch.append_column("media_resized", pa.array(out, pa.binary()))


class FrameSampleStage:
    """JVID → every ``stride``-th frame re-encoded as JIMG list (video sampling)."""

    def __init__(self, *, media_col: str = "media", stride: int = 2):
        self.media_col = media_col
        self.stride = stride

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for payload in batch[self.media_col].to_pylist():
            try:
                frames = decode_jvid(payload or b"")
                out.append([encode_jimg(f) for f in frames[:: self.stride]])
            except MediaFormatError:
                out.append([])
        return batch.append_column("frames", pa.array(out, pa.list_(pa.binary())))


class AudioFeatureStage:
    """JAUD → (rms, zero_crossings, n_samples) — batched vectorized DSP."""

    def __init__(self, *, media_col: str = "media"):
        self.media_col = media_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        rms, zc, ns = [], [], []
        for payload in batch[self.media_col].to_pylist():
            try:
                s = decode_jaud(payload or b"").astype(np.float64)
                rms.append(float(np.sqrt(np.mean(s * s))) if len(s) else 0.0)
                zc.append(int(np.sum(np.signbit(s[1:]) != np.signbit(s[:-1]))))
                ns.append(len(s))
            except MediaFormatError:
                rms.append(0.0); zc.append(0); ns.append(0)
        return batch.append_column("rms", pa.array(rms, pa.float64())) \
                    .append_column("zero_crossings", pa.array(zc, pa.int64())) \
                    .append_column("n_samples", pa.array(ns, pa.int64()))
