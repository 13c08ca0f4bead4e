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

  - ``decode_jpeg``: real baseline-sequential JPEG decode (ITU-T T.81) —
    DQT/DHT/SOF0/SOS parse, Huffman entropy decode, dequant + zigzag,
    separable float IDCT, chroma upsample, YCbCr→RGB.

  - ``decode_gif``: real GIF87a/89a decode — color tables, variable-width
    LSB-first LZW, interlace — lossless for palette images, so GIF
    payloads carry planted pixel sums exactly.

``encode_png``/``encode_wav``/``encode_jpeg``/``encode_gif`` are the
matching minimal encoders (used to synthesize deterministic payloads in
tests/benches). Formats needing a real codec lib (MP3, progressive
JPEG) raise ``NotImplementedError``.

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


def sniff_type(payload: "bytes | None") -> str:
    # null payloads are in-contract (sniff_types fill_nulls them too)
    payload = payload or b""
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
    all five scanline filters. Baseline JPEG (``decode_jpeg``) and
    GIF87a/89a (``decode_gif``) are dispatched by magic bytes; other
    image formats (progressive JPEG, MP3-era containers) raise
    ``NotImplementedError``.
    """
    if payload[:3] == b"\xff\xd8\xff":
        return decode_jpeg(payload)
    if payload[:4] == b"GIF8":
        return decode_gif(payload)
    if payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise NotImplementedError(
            f"unsupported image format (magic {payload[:4]!r}); only PNG, "
            "baseline JPEG and GIF are decodable without codec libs"
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
        # fill_null BEFORE to_numpy: a null length otherwise becomes a
        # float NaN whose int64 cast is INT64_MIN, not 0
        sizes = pa.compute.fill_null(
            pa.compute.binary_length(payload), 0
        ).to_numpy(zero_copy_only=False)
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
        sizes = pa.compute.fill_null(
            pa.compute.binary_length(payload), 0
        ).to_numpy(zero_copy_only=False)
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
        if c == 3 and i % 8 == 2:
            # same planted pixels in a GIF container (≤256 distinct
            # (r,g,b) triples by construction — lossless round-trip, so
            # the media_decode oracle sums are unchanged)
            return encode_gif(px, interlace=(i % 16 == 2))
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
            if t in ("image/png", "image/jpeg", "image/gif"):
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


# --- baseline JPEG (ITU-T T.81, public spec) -------------------------------
#
# Pure numpy + stdlib baseline-sequential JPEG: the encoder emits
# grayscale or 4:4:4 YCbCr with its OWN canonical Huffman tables written
# to DHT (fixed-length canonical codes — valid per spec, compression
# ratio irrelevant here), and the decoder is a general baseline reader
# (DQT 8/16-bit, any DHT, SOF0 with sampling factors 1-2, DRI/RSTn,
# byte unstuffing). Progressive (SOF2) and arithmetic coding raise
# NotImplementedError.

def _zigzag_order() -> list[tuple[int, int]]:
    """Standard 8x8 zigzag scan order, generated (not typed) to avoid
    transcription bugs: even diagonals run bottom-left→top-right."""
    out = []
    for s in range(15):
        diag = [(i, s - i) for i in range(max(0, s - 7), min(s, 7) + 1)]
        out.extend(diag if s % 2 == 1 else diag[::-1])
    return out


_ZZ = _zigzag_order()  # index k → (row, col)
_ZZ_ROWS = np.array([r for r, _ in _ZZ])
_ZZ_COLS = np.array([c for _, c in _ZZ])

# DCT-II orthonormal basis: D[u, x] = c(u)/2 * cos((2x+1)uπ/16)
_DCT = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _DCT[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """symbol → (bit length, code) canonical Huffman assignment in JPEG
    order (length-major, symbol order preserved)."""
    by_len: dict[int, list[int]] = {}
    for sym, ln in lengths.items():
        by_len.setdefault(ln, []).append(sym)
    code, out = 0, {}
    for ln in range(1, 17):
        for sym in by_len.get(ln, []):
            out[sym] = (ln, code)
            code += 1
        code <<= 1
    return out


# encoder tables: every DC category gets a 5-bit code, every AC symbol a
# 9-bit code — canonical, never the all-ones max-length word
_ENC_DC_LENS = {s: 5 for s in range(12)}
_ENC_AC_LENS = {0x00: 9, 0xF0: 9}
for _r in range(16):
    for _s in range(1, 11):
        _ENC_AC_LENS[(_r << 4) | _s] = 9
_ENC_DC = _canonical_codes(_ENC_DC_LENS)
_ENC_AC = _canonical_codes(_ENC_AC_LENS)


class _BitWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)  # byte stuffing
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.buf)


def _dht_segment(tclass: int, tid: int, lens: dict[int, int]) -> bytes:
    by_len: dict[int, list[int]] = {}
    for sym, ln in lens.items():
        by_len.setdefault(ln, []).append(sym)
    counts = bytes(len(by_len.get(ln, [])) for ln in range(1, 17))
    vals = bytes(s for ln in range(1, 17) for s in by_len.get(ln, []))
    body = bytes([(tclass << 4) | tid]) + counts + vals
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def _cat_and_bits(v: int) -> tuple[int, int]:
    """JPEG magnitude category + value bits for a coefficient."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    bits = v if v > 0 else v + (1 << size) - 1
    return size, bits


def encode_jpeg(pixels: np.ndarray, quant: int = 1) -> bytes:
    """Minimal baseline JPEG encoder for (H, W) / (H, W, 1) grayscale or
    (H, W, 3) RGB (encoded as 4:4:4 YCbCr). ``quant`` fills the whole
    quantization table with one value: ``quant=1`` makes DC-only content
    (8x8-block-constant images) round-trip EXACTLY — the property the
    decode tests pin."""
    if pixels.ndim == 2:
        pixels = pixels[:, :, None]
    h, w, nc = pixels.shape
    if nc not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    px = pixels.astype(np.float64)
    if nc == 3:
        r, g, b = px[:, :, 0], px[:, :, 1], px[:, :, 2]
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]
    else:
        planes = [px[:, :, 0]]
    q = np.full((8, 8), int(quant), np.int32)

    out = bytearray(b"\xff\xd8")  # SOI
    qzz = q[_ZZ_ROWS, _ZZ_COLS].astype(np.uint8).tobytes()
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + qzz  # DQT id 0
    sof = struct.pack(">BHHB", 8, h, w, nc)
    for ci in range(nc):
        sof += bytes([ci + 1, 0x11, 0])  # 1x1 sampling, quant table 0
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof  # SOF0
    out += _dht_segment(0, 0, _ENC_DC_LENS) + _dht_segment(1, 0, _ENC_AC_LENS)
    sos = bytes([nc]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(nc))
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    bw = _BitWriter()
    bh, bwid = -(-h // 8), -(-w // 8)
    pred = [0] * nc
    for by in range(bh):
        for bx in range(bwid):
            for ci, plane in enumerate(planes):
                blk = np.empty((8, 8))
                ys = np.minimum(by * 8 + np.arange(8), h - 1)
                xs = np.minimum(bx * 8 + np.arange(8), w - 1)
                blk[:] = plane[np.ix_(ys, xs)] - 128.0
                coef = _DCT @ blk @ _DCT.T
                qc = np.round(coef / q).astype(np.int64)
                zz = qc[_ZZ_ROWS, _ZZ_COLS]
                diff = int(zz[0]) - pred[ci]
                pred[ci] = int(zz[0])
                size, bits = _cat_and_bits(diff)
                ln, code = _ENC_DC[size]
                bw.put(code, ln)
                if size:
                    bw.put(bits, size)
                run = 0
                last_nz = int(np.max(np.nonzero(zz)[0])) if np.any(zz[1:]) else 0
                for k in range(1, last_nz + 1):
                    v = int(zz[k])
                    if v == 0:
                        run += 1
                        continue
                    while run >= 16:
                        ln, code = _ENC_AC[0xF0]
                        bw.put(code, ln)
                        run -= 16
                    size, bits = _cat_and_bits(v)
                    ln, code = _ENC_AC[(run << 4) | size]
                    bw.put(code, ln)
                    bw.put(bits, size)
                    run = 0
                if last_nz < 63:
                    ln, code = _ENC_AC[0x00]  # EOB
                    bw.put(code, ln)
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


class _BitReader:
    """Entropy-coded segment reader: unstuffs 0xFF00, stops at markers."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        while self.nbits <= 24 and self.pos < len(d):
            byte = d[self.pos]
            if byte == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0
                if nxt == 0x00:
                    self.pos += 2
                elif 0xD0 <= nxt <= 0xD7:  # RSTn — consumed by reset()
                    break
                else:  # real marker: end of scan
                    break
            else:
                self.pos += 1
            self.acc = (self.acc << 8) | byte
            self.nbits += 8

    def get(self, n: int) -> int:
        while self.nbits < n:
            before = self.nbits
            self._fill()
            if self.nbits == before:  # truncated stream: pad with zeros
                self.acc <<= 8
                self.nbits += 8
        v = (self.acc >> (self.nbits - n)) & ((1 << n) - 1)
        self.nbits -= n
        self.acc &= (1 << self.nbits) - 1
        return v

    def reset_at_rst(self) -> None:
        """Skip an RSTn marker and byte-align (restart interval)."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1


def _extend(bits: int, size: int) -> int:
    if size == 0:
        return 0
    return bits if bits >= (1 << (size - 1)) else bits - (1 << size) + 1


def decode_jpeg(payload: bytes) -> np.ndarray:
    """Baseline-sequential JPEG decode → (H, W, C) uint8 (C = 1 or 3).

    General reader: tables from the stream (DQT 8/16-bit, DHT), SOF0,
    sampling factors 1-2 per axis (4:4:4 / 4:2:2 / 4:2:0), DRI/RSTn.
    Progressive/arithmetic variants raise NotImplementedError."""
    d = payload
    if d[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG stream")
    pos = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None
    restart = 0
    while pos + 4 <= len(d):
        if d[pos] != 0xFF:
            pos += 1
            continue
        marker = d[pos + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", d[pos + 2 : pos + 4])
        body = d[pos + 4 : pos + 2 + seglen]
        if marker == 0xDB:  # DQT
            bp = 0
            while bp < len(body):
                pq, tq = body[bp] >> 4, body[bp] & 0xF
                bp += 1
                if pq:
                    vals = np.frombuffer(body[bp : bp + 128], ">u2").astype(np.int32)
                    bp += 128
                else:
                    vals = np.frombuffer(body[bp : bp + 64], np.uint8).astype(np.int32)
                    bp += 64
                tbl = np.zeros((8, 8), np.int32)
                tbl[_ZZ_ROWS, _ZZ_COLS] = vals
                qt[tq] = tbl
        elif marker == 0xC4:  # DHT
            bp = 0
            while bp < len(body):
                tc, th = body[bp] >> 4, body[bp] & 0xF
                counts = body[bp + 1 : bp + 17]
                bp += 17
                table: dict[tuple[int, int], int] = {}
                code = 0
                for ln in range(1, 17):
                    for _ in range(counts[ln - 1]):
                        table[(ln, code)] = body[bp]
                        bp += 1
                        code += 1
                    code <<= 1
                huff[(tc, th)] = table
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 (baseline/ext seq)
            prec, fh, fw, nc = struct.unpack(">BHHB", body[:6])
            if prec != 8:
                raise NotImplementedError(f"JPEG precision {prec} unsupported")
            comps = []
            for ci in range(nc):
                cid, samp, tq = body[6 + 3 * ci : 9 + 3 * ci]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError("only baseline-sequential JPEG is supported")
        elif marker == 0xDD:  # DRI
            (restart,) = struct.unpack(">H", body[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("malformed JPEG: SOS before SOF")
            ns = body[0]
            if ns != len(frame[2]):
                # A spec-valid baseline file may carry one scan PER
                # component (non-interleaved); each such scan uses a
                # component-local MCU geometry (one 8x8 block per MCU,
                # T.81 A.2.2) that _jpeg_scan's interleaved walk would
                # silently mis-decode — fail loud per the module policy.
                raise NotImplementedError(
                    "only single-scan interleaved baseline JPEG is "
                    f"supported (scan covers {ns}/{len(frame[2])} components)"
                )
            scan = []
            for si in range(ns):
                cs, tt = body[1 + 2 * si], body[2 + 2 * si]
                scan.append((cs, tt >> 4, tt & 0xF))
            data_pos = pos + 2 + seglen
            return _jpeg_scan(d, data_pos, frame, scan, qt, huff, restart)
        elif marker == 0xD9:  # EOI
            break
        pos += 2 + seglen
    raise ValueError("malformed JPEG: no scan found")


def _jpeg_scan(d, data_pos, frame, scan, qt, huff, restart) -> np.ndarray:
    fh, fw, comps = frame
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-fw // (8 * hmax))
    mcuy = -(-fh // (8 * vmax))
    by_id = {c["id"]: c for c in comps}
    planes = []
    for c in comps:
        pw, ph = mcux * 8 * c["h"], mcuy * 8 * c["v"]
        planes.append(np.zeros((ph, pw), np.float64))
    br = _BitReader(d, data_pos)

    def read_symbol(table: dict[tuple[int, int], int]) -> int:
        code, ln = 0, 0
        for _ in range(16):
            code = (code << 1) | br.get(1)
            ln += 1
            sym = table.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code in JPEG scan")

    pred = {c["id"]: 0 for c in comps}
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart and mcu_count and mcu_count % restart == 0:
                br.reset_at_rst()
                for k in pred:
                    pred[k] = 0
            mcu_count += 1
            for (cid, tdc, tac) in scan:
                c = by_id[cid]
                ci = comps.index(c)
                q = qt[c["tq"]]
                for vy in range(c["v"]):
                    for vx in range(c["h"]):
                        zz = np.zeros(64, np.int64)
                        size = read_symbol(huff[(0, tdc)])
                        diff = _extend(br.get(size), size) if size else 0
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            sym = read_symbol(huff[(1, tac)])
                            if sym == 0x00:  # EOB
                                break
                            run, sz = sym >> 4, sym & 0xF
                            if sz == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC overflow")
                            zz[k] = _extend(br.get(sz), sz)
                            k += 1
                        coef = np.zeros((8, 8), np.float64)
                        coef[_ZZ_ROWS, _ZZ_COLS] = zz * q[_ZZ_ROWS, _ZZ_COLS]
                        blk = _DCT.T @ coef @ _DCT + 128.0
                        y0 = (my * c["v"] + vy) * 8
                        x0 = (mx * c["h"] + vx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk

    # upsample to full resolution and crop
    full = []
    for c, plane in zip(comps, planes):
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            plane = np.repeat(np.repeat(plane, ry, axis=0), rx, axis=1)
        full.append(plane[:fh, :fw])
    if len(full) == 1:
        out = full[0][:, :, None]
    else:
        y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
        out = np.stack(
            [y + 1.402 * cr, y - 0.344136 * cb - 0.714136 * cr, y + 1.772 * cb],
            axis=2,
        )
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


# --- GIF (GIF87a/89a, public spec; LZW per Welch 1984) ---------------------
#
# Palette-based and lossless for <=256-color frames, so GIF payloads can
# join the planted media corpus where lossy JPEG cannot: the decoder must
# reproduce the oracle's per-pixel sums exactly. The decoder reads the
# first image frame (global/local color table, optional interlace,
# variable-width LSB-first LZW with clear/EOI and deferred-clear); the
# encoder is the matching minimal writer used by synth_media_payload.


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/89a stream → (H, W, 3) uint8 RGB."""
    d = payload
    if d[:4] != b"GIF8" or d[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF stream")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", d[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(d[pos : pos + 3 * n], np.uint8).reshape(n, 3)
        pos += 3 * n
    while pos < len(d):
        b0 = d[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while pos < len(d) and d[pos] != 0:
                pos += 1 + d[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            left, top, iw, ih, ipk = struct.unpack("<HHHHB", d[pos + 1 : pos + 10])
            pos += 10
            if left or top or (iw, ih) != (sw, sh):
                # a positioned/partial first frame does not cover the
                # logical screen; decoding it as the whole canvas would
                # silently report wrong dims + pixel sums — refuse loudly
                raise NotImplementedError(
                    "GIF first frame is positioned/partial "
                    f"(frame {iw}x{ih}@{left},{top} vs screen {sw}x{sh}); "
                    "only full-canvas first frames are decodable"
                )
            ct = gct
            if ipk & 0x80:
                n = 2 << (ipk & 0x07)
                ct = np.frombuffer(d[pos : pos + 3 * n], np.uint8).reshape(n, 3)
                pos += 3 * n
            if ct is None:
                raise ValueError("GIF frame has no color table")
            mcs = d[pos]
            pos += 1
            chunks = []
            while pos < len(d) and d[pos] != 0:
                ln = d[pos]
                chunks.append(d[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(b"".join(chunks), mcs, iw * ih)
            img = idx.reshape(ih, iw)
            if ipk & 0x40:  # interlaced: rows written in 4 passes
                out = np.empty_like(img)
                order = np.concatenate(
                    [np.arange(s, ih, t) for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))]
                )
                out[order] = img
                img = out
            if int(img.max(initial=0)) >= len(ct):
                raise ValueError("GIF pixel index outside color table")
            return ct[img]
        elif b0 == 0x3B:  # trailer
            break
        else:
            raise ValueError(f"unknown GIF block 0x{b0:02x}")
    raise ValueError("malformed GIF: no image frame")


def _lzw_decode(data: bytes, mcs: int, n_out: int) -> np.ndarray:
    """GIF-variant LZW: variable 3-12 bit codes, LSB-first packing."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    roots = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(roots)
    width = mcs + 1
    acc = nbits = di = 0
    out = bytearray()
    prev: bytes | None = None
    while len(out) < n_out:
        while nbits < width:
            if di >= len(data):
                raise ValueError("truncated GIF LZW stream")
            acc |= data[di] << nbits
            di += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = list(roots)
            width = mcs + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError("corrupt GIF LZW code")
        out += entry
        prev = entry
        # grow width when the NEXT code would not fit (deferred at 12)
        if len(table) == (1 << width) and width < 12:
            width += 1
    if len(out) < n_out:
        raise ValueError("GIF LZW stream ended early")
    return np.frombuffer(bytes(out[:n_out]), np.uint8)


def _lzw_encode(indices: np.ndarray, mcs: int) -> bytes:
    """GIF-variant LZW encoder (dict keyed on (prefix_code, symbol))."""
    clear, eoi = 1 << mcs, (1 << mcs) + 1
    acc = nbits = 0
    out = bytearray()

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = mcs + 1
    put(clear, width)
    it = iter(indices.tolist())
    try:
        prev = next(it)
    except StopIteration:
        put(eoi, width)
        if nbits:
            out.append(acc & 0xFF)
        return bytes(out)
    for k in it:
        key = (prev, k)
        if key in table:
            prev = table[key]
            continue
        put(prev, width)
        table[key] = next_code
        if next_code == (1 << width) and width < 12:
            width += 1
        next_code += 1
        if next_code > 4095:
            put(clear, width)
            table.clear()
            next_code = eoi + 1
            width = mcs + 1
        prev = k
    put(prev, width)
    put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(H, W, 3) uint8 with ≤256 distinct colors → GIF89a bytes."""
    px = np.asarray(pixels, np.uint8)
    if px.ndim == 3 and px.shape[2] == 1:
        px = np.repeat(px, 3, axis=2)
    if px.ndim != 3 or px.shape[2] != 3:
        raise ValueError("encode_gif expects (H, W, 3) uint8")
    h, w, _ = px.shape
    flat = px.reshape(-1, 3)
    palette, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"GIF needs ≤256 colors, image has {len(palette)}")
    pbits = max(1, int(len(palette) - 1).bit_length())
    n_pal = 1 << pbits
    pal = np.zeros((n_pal, 3), np.uint8)
    pal[: len(palette)] = palette
    img = idx.astype(np.uint8).reshape(h, w)
    if interlace:
        order = np.concatenate(
            [np.arange(s, h, t) for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))]
        )
        img = img[order]
    mcs = max(2, pbits)
    lzw = _lzw_encode(img.reshape(-1), mcs)
    out = bytearray(b"GIF89a")
    out += struct.pack("<HHBBB", w, h, 0x80 | 0x70 | (pbits - 1), 0, 0)
    out += pal.tobytes()
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, 0x40 if interlace else 0)
    out.append(mcs)
    for i in range(0, len(lzw), 255):
        blk = lzw[i : i + 255]
        out.append(len(blk))
        out += blk
    out += b"\x00\x3b"
    return bytes(out)
