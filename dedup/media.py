"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata.

Image/audio/video payloads ride as Arrow ``binary`` columns; decode /
resize / feature-extract / frame-sample are **actor-pool map_batches
stages** (codec state built once per actor in ``__init__``). The
image/audio libraries are not in this container, so the codec calls are
STUBBED: ``decode_image``/``decode_audio`` raise ``NotImplementedError``
unless ``fake=True``, in which case a deterministic payload-hash-seeded
fake is produced. The Ray-side plumbing — schema, batch sizing, actor
signature, output layout — is real and tested (tests/test_media.py).

Scale notes: binary payloads dominate block memory → use small
``batch_size`` (default 64) and let the streaming executor backpressure;
features are emitted as ``fixed_size_list<float>`` so downstream
embedding ops (dedup.embed) consume them directly.
"""

from __future__ import annotations

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


def decode_image(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode requires PIL/cv2 (not in this container).

    With ``fake=True`` returns a deterministic 8×8×3 uint8 array seeded by
    the payload hash — stands in for pixel data in tests/benches.
    """
    if not fake:
        raise NotImplementedError("image decode requires PIL/cv2 (not installed)")
    from .hashing import xxh64

    rng = np.random.default_rng(xxh64(payload))
    return rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)


def decode_audio(payload: bytes, fake: bool = False) -> np.ndarray:
    """STUB: real decode requires soundfile/ffmpeg (not in this container)."""
    if not fake:
        raise NotImplementedError("audio decode requires soundfile/ffmpeg")
    from .hashing import xxh64

    rng = np.random.default_rng(xxh64(payload))
    return rng.standard_normal(256).astype(np.float32)


class MediaFeaturizer:
    """Actor-pool stage: binary payload column → typed metadata + a
    deterministic feature vector (fixed_size_list<float>[FEATURE_DIM]).

    Real pipelines replace ``_featurize`` with model inference; the
    actor shape (weights loaded once in ``__init__``) is already right.
    """

    def __init__(self, payload_col: str = "html", id_col: str = "url", fake: bool = True):
        self.payload_col = payload_col
        self.id_col = id_col
        self.fake = fake
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
