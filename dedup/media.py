"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads ride as Arrow ``binary`` columns; decode /
resize / feature-extract / frame-sample are **actor-pool map_batches
stages** (codec state built once per actor in ``__init__``). No image or
audio library ships in this container, so the two formats the synthetic
corpus uses are decoded with **pure numpy + stdlib zlib/struct**:

  - ``decode_image``: real PNG decode — IHDR parse, concatenated-IDAT
    zlib inflate, per-scanline unfilter (None/Sub/Up/Average/Paeth) for
    8-bit gray/RGB/gray+alpha/RGBA → (H, W, C) uint8.
  - ``decode_audio``: real WAV decode — RIFF/fmt/data chunk walk for
    PCM 8/16/32-bit int and 32-bit IEEE float → ((frames, channels)
    float32 in [-1, 1], sample_rate).

``encode_png``/``encode_wav`` are the matching minimal encoders (used to
synthesize deterministic payloads in tests/benches). Formats needing a
real codec lib (JPEG/GIF/MP3) raise ``NotImplementedError``.

Scale notes: binary payloads dominate block memory → use small
``batch_size`` (default 64) and let the streaming executor backpressure;
features are emitted as ``fixed_size_list<float>`` so downstream
embedding ops (dedup.embed) consume them directly.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .hashing import xxh64_arrow

FEATURE_DIM = 16

_MAGIC = [
    (b"\x89PNG", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF8", "image/gif"),
    (b"RIFF", "audio/wav"),
    (b"<html", "text/html"),
    (b"<!doc", "text/html"),
]


def sniff_type(payload: bytes) -> str:
    head = payload[:8].lower() if payload[:1] in (b"<",) else payload[:8]
    for magic, mime in _MAGIC:
        if head[: len(magic)] == magic:
            return mime
    return "application/octet-stream"


def sniff_types(payload: pa.Array) -> list[str]:
    """Vectorized magic sniff: slice 8-byte heads in Arrow (``binary_slice``
    — never copies the multi-MB payloads into Python, only the heads) and
    classify the tiny head list. ≅ per-row ``sniff_type`` semantics."""
    import pyarrow.compute as pc

    heads = pc.binary_slice(pc.fill_null(payload, b""), 0, 8).to_pylist()
    return [
        next(
            (mime for magic, mime in _MAGIC
             if (h.lower() if h[:1] == b"<" else h)[: len(magic)] == magic),
            "application/octet-stream",
        )
        for h in heads
    ]


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # gray, RGB, gray+alpha, RGBA


def decode_image(payload: bytes) -> np.ndarray:
    """Pure-numpy PNG decode → (H, W, C) uint8.

    Supports the baseline subset the synthetic corpus emits: 8-bit depth,
    color types 0/2/4/6, non-interlaced, zlib-inflated concatenated IDAT,
    all five scanline filters. Other image formats raise
    ``NotImplementedError`` (JPEG/GIF need codec libs not in this
    container).
    """
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise NotImplementedError(
            f"unsupported image format (magic {payload[:4]!r}); only PNG is "
            "decodable without codec libs"
        )
    pos, ihdr, idat = len(_PNG_SIG), None, []
    while pos + 8 <= len(payload):
        (length,), ctype = struct.unpack(">I", payload[pos : pos + 4]), payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    width, height, depth, ctype_, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0 or ctype_ not in _PNG_CHANNELS:
        raise NotImplementedError(
            f"PNG variant not supported (depth={depth} color={ctype_} interlace={interlace})"
        )
    ch = _PNG_CHANNELS[ctype_]
    stride = width * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("malformed PNG: bad decompressed length")
    raw = raw.reshape(height, stride + 1)
    filters, lines = raw[:, 0], raw[:, 1:].astype(np.int32)
    out = np.zeros((height, stride), np.int32)
    prev = np.zeros(stride, np.int32)
    for y in range(height):
        f, cur = filters[y], lines[y]
        if f == 0:  # None
            rec = cur.copy()
        elif f == 2:  # Up
            rec = (cur + prev) & 0xFF
        else:  # Sub/Average/Paeth need the in-row left neighbor: per-pixel
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                left = rec[x - ch] if x >= ch else 0
                up = prev[x]
                if f == 1:  # Sub
                    pred = left
                elif f == 3:  # Average
                    pred = (left + up) >> 1
                elif f == 4:  # Paeth
                    ul = prev[x - ch] if x >= ch else 0
                    p = left + up - ul
                    pa_, pb_, pc_ = abs(p - left), abs(p - up), abs(p - ul)
                    pred = left if pa_ <= pb_ and pa_ <= pc_ else (up if pb_ <= pc_ else ul)
                else:
                    raise ValueError(f"bad PNG filter byte {f}")
                rec[x] = (cur[x] + pred) & 0xFF
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(height, width, ch)


def decode_audio(payload: bytes) -> tuple[np.ndarray, int]:
    """Pure-numpy WAV decode → ((frames, channels) float32 in [-1, 1],
    sample_rate).

    Supports PCM 8/16/32-bit int and 32-bit IEEE float. Other audio
    containers raise ``NotImplementedError``.
    """
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise NotImplementedError(
            f"unsupported audio format (magic {payload[:4]!r}); only RIFF/WAV "
            "is decodable without codec libs"
        )
    pos, fmt, data = 12, None, None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (length,) = struct.unpack("<I", payload[pos + 4 : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("malformed WAV: missing fmt/data chunk")
    audio_format, channels, sample_rate, _brate, _balign, bits = fmt
    if audio_format == 1 and bits == 8:
        x = (np.frombuffer(data, np.uint8).astype(np.float32) - 128.0) / 128.0
    elif audio_format == 1 and bits == 16:
        x = np.frombuffer(data, "<i2").astype(np.float32) / 32768.0
    elif audio_format == 1 and bits == 32:
        x = np.frombuffer(data, "<i4").astype(np.float32) / 2147483648.0
    elif audio_format == 3 and bits == 32:
        x = np.frombuffer(data, "<f4").astype(np.float32)
    else:
        raise NotImplementedError(f"WAV encoding not supported (format={audio_format} bits={bits})")
    frames = len(x) // channels
    return x[: frames * channels].reshape(frames, channels), sample_rate


def encode_png(pixels: np.ndarray) -> bytes:
    """Minimal PNG encoder (filter 0, one IDAT) for (H, W, C) uint8 with
    C ∈ {1, 2, 3, 4} — the deterministic payload source for tests/benches."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, c = pixels.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), np.uint8), pixels.reshape(h, w * c)], axis=1
    ).tobytes()
    return (
        _PNG_SIG + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")
    )


def encode_wav(samples: np.ndarray, sample_rate: int = 16000) -> bytes:
    """Minimal PCM-16 WAV encoder for (frames,) or (frames, channels)
    samples: float32 in [-1, 1] (quantized ×32767) or int16 (written
    verbatim — the exact-round-trip path used by planted-media tests)."""
    if samples.ndim == 1:
        samples = samples[:, None]
    frames, channels = samples.shape
    if samples.dtype == np.int16:
        pcm = samples.astype("<i2").tobytes()
    else:
        pcm = np.clip(np.round(samples * 32767.0), -32768, 32767).astype("<i2").tobytes()
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * channels * 2, channels * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(pcm)) + pcm
    return b"RIFF" + struct.pack("<I", len(body)) + body


class MediaFeaturizer:
    """Actor-pool stage: binary payload column → typed metadata + a
    deterministic feature vector (fixed_size_list<float>[FEATURE_DIM]).

    Real pipelines replace ``_featurize`` with model inference; the
    actor shape (weights loaded once in ``__init__``) is already right.
    """

    def __init__(self, payload_col: str = "html", id_col: str = "url"):
        self.payload_col = payload_col
        self.id_col = id_col
        # ≅ model load: per-actor deterministic projection matrix
        rng = np.random.default_rng(1234)
        self.proj = rng.standard_normal((8, FEATURE_DIM)).astype(np.float32)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column(self.payload_col)
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        n = len(batch)
        # vectorized hash of the raw payload bytes (content identity)
        h = xxh64_arrow(payload)
        sizes = pa.compute.binary_length(payload).to_numpy(zero_copy_only=False)
        types = sniff_types(payload)
        # deterministic fake feature: hash → 8 lanes → projection
        lanes = np.empty((n, 8), dtype=np.float32)
        hh = h.copy()
        for j in range(8):
            lanes[:, j] = (hh & np.uint64(0xFF)).astype(np.float32) / 255.0
            hh >>= np.uint64(8)
        feats = lanes @ self.proj
        flat = pa.array(feats.reshape(-1), pa.float32())
        feat_col = pa.FixedSizeListArray.from_arrays(flat, FEATURE_DIM)
        return pa.table(
            {
                self.id_col: batch.column(self.id_col),
                "media_bytes": pa.array(sizes.astype(np.int64), pa.int64()),
                "media_type": pa.array(types, pa.string()),
                "media_hash": pa.array(h.view(np.int64), pa.int64()),
                "feature": feat_col,
            }
        )


def media_featurize(
    ds: Dataset,
    payload_col: str = "html",
    id_col: str = "url",
    concurrency: tuple[int, int] = (1, 4),
    batch_size: int = 64,
) -> Dataset:
    """Full actor-pool featurize stage (small batches: wide binary rows)."""
    return ds.map_batches(
        MediaFeaturizer,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )


def media_features(ds: Dataset, payload_col: str = "html", id_col: str = "url") -> Dataset:
    """Oracle-checkable projection: (id, media_bytes, media_type).

    Stateless task version (no pool) — the SQL-mirrorable subset of
    ``media_featurize``.
    """

    def fn(batch: pa.Table) -> pa.Table:
        payload = batch.column(payload_col)
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        sizes = pa.compute.binary_length(payload).to_numpy(zero_copy_only=False)
        types = sniff_types(payload)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "media_bytes": pa.array(sizes.astype(np.int64), pa.int64()),
                "media_type": pa.array(types, pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


# --- planted-media synthesis + decode stage -------------------------------
#
# Deterministic PNG/WAV payloads generated from an integer id by the
# closed-form formulas below; the SQL oracle (queries.ORACLES
# ["media_decode"]) regenerates the expected dims and content sums from
# the SAME formulas, so the decode stage must recover every pixel /
# sample exactly to pass. Even ids carry an image, odd ids audio.

def synth_media_payload(i: int) -> bytes:
    """One deterministic payload for integer id ``i`` (formulas mirrored
    in the media_decode oracle SQL)."""
    if i % 2 == 0:
        h = 8 + i % 9
        w = 8 + i % 7
        c = 1 if i % 4 == 0 else 3
        y, x, ch = np.ogrid[0:h, 0:w, 0:c]
        px = ((i * 7 + y * 5 + x * 3 + ch) % 256).astype(np.uint8)
        return encode_png(px)
    frames = 32 + i % 33
    channels = 1 + (i // 2) % 2
    rate = 8000 * (1 + i % 3)
    n = frames * channels
    v = (((i * 31 + np.arange(n, dtype=np.int64) * 17) % 65536) - 32768).astype(
        np.int16
    )
    return encode_wav(v.reshape(frames, channels), sample_rate=rate)


def synth_media(ds: Dataset, id_col: str = "doc_id", payload_col: str = "payload") -> Dataset:
    """Append the planted binary payload column to ``ds``."""

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            payload_col, pa.array([synth_media_payload(int(i)) for i in ids], pa.binary())
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=256, zero_copy_batch=True)


class MediaDecoder:
    """Actor-pool stage: PNG/WAV payload column → decoded metadata table
    (kind, height, width, channels, frames, sample_rate, content_sum).

    ``content_sum`` is the exact integer content checksum — Σ pixel
    values for images, Σ int16 sample values for audio (the float32
    samples are re-quantized ×32768; exact because /32768 is a power of
    two). Per-payload decode is inherently row-wise (each payload is its
    own container) — the batch loop IS the codec work, not a missing
    vectorization.
    """

    def __init__(self, payload_col: str = "payload", id_col: str = "doc_id"):
        self.payload_col = payload_col
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payload = batch.column(self.payload_col)
        if isinstance(payload, pa.ChunkedArray):
            payload = payload.combine_chunks()
        n = len(batch)
        kind = [""] * n
        cols = {k: np.zeros(n, np.int64) for k in
                ("height", "width", "channels", "frames", "sample_rate", "content_sum")}
        for j in range(n):
            p = payload[j].as_py()
            t = sniff_type(p)
            if t == "image/png":
                px = decode_image(p)
                kind[j] = "image"
                cols["height"][j], cols["width"][j], cols["channels"][j] = px.shape
                cols["content_sum"][j] = int(px.astype(np.int64).sum())
            elif t == "audio/wav":
                x, rate = decode_audio(p)
                kind[j] = "audio"
                cols["frames"][j], cols["channels"][j] = x.shape
                cols["sample_rate"][j] = rate
                cols["content_sum"][j] = int(np.round(x.astype(np.float64) * 32768.0).sum())
            else:
                kind[j] = "other"
        out = {self.id_col: batch.column(self.id_col),
               "kind": pa.array(kind, pa.string())}
        out.update({k: pa.array(v, pa.int64()) for k, v in cols.items()})
        return pa.table(out)


def media_decode(
    ds: Dataset,
    payload_col: str = "payload",
    id_col: str = "doc_id",
    concurrency: tuple[int, int] = (1, 8),
    batch_size: int = 64,
) -> Dataset:
    """Decode stage as an actor pool (small batches: wide binary rows)."""
    return ds.map_batches(
        MediaDecoder,
        fn_constructor_kwargs={"payload_col": payload_col, "id_col": id_col},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        zero_copy_batch=True,
    )
