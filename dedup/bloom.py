"""Bloom-filter membership screening for corpus-scale exact dedup.

The 100-TB regime for incremental dedup (new crawl batch vs a
10^10-doc corpus) cannot afford to ship or scan the corpus hash set per
batch. A Bloom filter over the corpus ``doc_hash`` column is the classic
answer (Bloom 1970; Broder & Mitzenmacher, "Network applications of
Bloom filters", 2004): ~10 bits/key at 1% false-positive rate — a
10^10-doc corpus fits a ~12 GiB sidecar, and a batch probe touches zero
corpus I/O for every true-new key the filter rejects. Because Bloom
filters have NO false negatives, "not in filter" is definitive; only the
(true-dup + fpp·batch) "maybe" remainder needs an exact confirmation
probe against the index, so the output is EXACTLY the anti-join — the
filter is a pure I/O screen, never a correctness approximation. That
contract is what the ``bloom_new_docs`` oracle pins.

Reference analogue: the checksum-memoization read path
(src/file_db.rs:353-454, src/process_matches.rs:435-452 — "is this
content already known?"), restated as a constant-size broadcastable
sketch instead of a DB query per item.

Build is distributed: each input block folds its keys into a partial
filter inside ``map_batches`` (vectorized double hashing, Kirsch &
Mitzenmacher 2006: h_i = h1 + i·h2); the driver OR-reduces one
``m/8``-byte blob per block as they stream in, holding only the filter
itself. At sidecar sizes past driver memory, shard the filter by key
range (each shard built/probed independently) — the sharding key is
``doc_hash`` itself, so probes stay single-shard; this module keeps the
single-filter layout and documents the shard path.
"""

from __future__ import annotations

import math
import os

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .hashing import fmix64

U64 = np.uint64
_MAGIC = b"BLM1"


class BloomFilter:
    """Vectorized Bloom filter over uint64 keys (numpy bit array)."""

    def __init__(self, m_bits: int, k: int, words: np.ndarray | None = None):
        if m_bits <= 0 or k <= 0:
            raise ValueError("m_bits and k must be positive")
        self.m_bits = int(m_bits)
        self.k = int(k)
        n_words = (self.m_bits + 63) // 64
        if words is None:
            words = np.zeros(n_words, dtype=np.uint64)
        if len(words) != n_words:
            raise ValueError("word array does not match m_bits")
        self.words = words

    # -- parameter selection -------------------------------------------
    @classmethod
    def for_capacity(cls, n_expected: int, fpp: float = 0.01) -> "BloomFilter":
        """Optimal (m, k) for ``n_expected`` keys at target false-positive
        probability: m = -n·ln p / ln²2, k = (m/n)·ln 2."""
        n = max(1, int(n_expected))
        m = max(64, int(math.ceil(-n * math.log(fpp) / (math.log(2) ** 2))))
        k = max(1, int(round(m / n * math.log(2))))
        return cls(m, k)

    # -- hashing (double hashing over two fmix64 streams) ---------------
    def _h12(self, keys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        u = np.ascontiguousarray(keys).view(U64)
        with np.errstate(over="ignore"):
            h1 = fmix64(u)
            h2 = fmix64(u ^ U64(0x9E3779B97F4A7C15)) | U64(1)
        return h1, h2

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        h1, h2 = self._h12(keys)
        m = U64(self.m_bits)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                idx = (h1 + U64(i) * h2) % m
                np.bitwise_or.at(
                    self.words, (idx >> U64(6)).astype(np.int64),
                    U64(1) << (idx & U64(63)),
                )

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        """→ bool mask; False is definitive (no false negatives)."""
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = self._h12(keys)
        m = U64(self.m_bits)
        out = np.ones(len(keys), dtype=bool)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                idx = (h1 + U64(i) * h2) % m
                bit = (
                    self.words[(idx >> U64(6)).astype(np.int64)]
                    >> (idx & U64(63))
                ) & U64(1)
                out &= bit.astype(bool)
        return out

    # -- merge / serialize ----------------------------------------------
    def union_(self, other: "BloomFilter") -> "BloomFilter":
        if (other.m_bits, other.k) != (self.m_bits, self.k):
            raise ValueError("cannot union filters with different params")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    def or_words(self, words: np.ndarray) -> None:
        np.bitwise_or(self.words, words, out=self.words)

    def to_bytes(self) -> bytes:
        head = _MAGIC + np.array([self.m_bits, self.k], dtype="<u8").tobytes()
        return head + self.words.astype("<u8").tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        if buf[:4] != _MAGIC:
            raise ValueError("not a bloom sidecar")
        m_bits, k = np.frombuffer(buf, dtype="<u8", count=2, offset=4)
        words = np.frombuffer(buf, dtype="<u8", offset=20).astype(np.uint64)
        return cls(int(m_bits), int(k), words)


def bloom_build(
    ds: Dataset, col: str, n_expected: int, fpp: float = 0.01
) -> BloomFilter:
    """Distributed build: per-block partial filters inside map_batches,
    streamed to the driver as m/8-byte blobs and OR-reduced — the driver
    holds the filter plus one blob, never the key column."""
    proto = BloomFilter.for_capacity(n_expected, fpp)
    m_bits, k = proto.m_bits, proto.k

    def part(batch: pa.Table) -> pa.Table:
        f = BloomFilter(m_bits, k)
        f.add_many(
            batch.column(col).to_numpy(zero_copy_only=False).view(np.uint64)
        )
        return pa.table({"blob": pa.array([f.words.tobytes()], pa.large_binary())})

    out = BloomFilter(m_bits, k)
    for b in ds.select_columns([col]).map_batches(
        part, batch_format="pyarrow"
    ).iter_batches(batch_size=1, batch_format="pyarrow"):
        for blob in b.column("blob"):
            out.or_words(np.frombuffer(blob.as_py(), dtype=np.uint64))
    return out


def bloom_split(ds: Dataset, col: str, bloom: BloomFilter) -> Dataset:
    """Tag every row with ``__maybe`` = filter membership of ``col``.
    ``__maybe == False`` rows are DEFINITELY absent from the corpus (no
    false negatives); ``True`` rows need the exact confirmation probe.
    The word array ships once via ray.put and every task reads the ONE
    plasma copy zero-copy (numpy arrays deserialize as read-only views;
    ``contains_many`` only reads) — no per-batch blob copy, no
    ``from_bytes``/``astype`` word-array round-trip."""
    ref = ray.put((bloom.words, bloom.m_bits, bloom.k))

    def tag(batch: pa.Table) -> pa.Table:
        words, m_bits, k = ray.get(ref)  # zero-copy plasma view
        f = BloomFilter(m_bits, k, words)
        keys = batch.column(col).to_numpy(zero_copy_only=False).view(np.uint64)
        return batch.append_column("__maybe", pa.array(f.contains_many(keys)))

    return ds.map_batches(tag, batch_format="pyarrow")


# ---------------------------------------------------------------- sidecar
def write_bloom_sidecar(
    index_dir: str, fpp: float = 0.01, col: str = "doc_hash"
) -> str:
    """Build the Bloom sidecar for a persisted incremental index
    (dedup/incremental.py layout): bloom.bin next to sigs/. Idempotent;
    rebuild after update_index appends."""
    import ray.data as rd

    sigs_dir = os.path.join(index_dir, "sigs")
    docs = rd.read_parquet(sigs_dir, columns=[col])
    n = docs.count()
    f = bloom_build(docs, col, n_expected=max(n, 1), fpp=fpp)
    path = os.path.join(index_dir, "bloom.bin")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(f.to_bytes())
    os.replace(tmp, path)
    return path


def read_bloom_sidecar(index_dir: str) -> BloomFilter:
    with open(os.path.join(index_dir, "bloom.bin"), "rb") as fh:
        return BloomFilter.from_bytes(fh.read())
