"""Benchmark decontamination: flag corpus docs that share an n-token
gram with a benchmark/eval set.

The standard training-data hygiene pass (public practice: GPT-3 appendix
C's 13-gram overlap filter, Brown et al. 2020; The Pile / Dolma use the
same shape): any document containing an n-gram that also occurs in an
evaluation benchmark is "contaminated" and must be dropped or flagged
before training. At corpus scale this is a membership test of every
document's n-grams against a broadcastable benchmark gram set — the
benchmark side is small by definition (eval sets, not the corpus), so
the corpus side streams through ``map_batches`` with zero shuffle.

Token definition is the repo-wide shared one (textstats.TOKEN_SPLIT_RE,
lowered ASCII word chars) so the DuckDB oracle tokenizes identically.
Grams are hashed (XXH64 of the space-joined token window, sliced out of
the per-doc normalized string — no per-gram Python string build); the
benchmark set ships once via ``ray.put`` as a sorted uint64 array.

Reference analogue: the exclude-glob gate applied at walk time
(src/options.rs:186-204, src/process_matches.rs:111-114) — a broadcast
deny-set consulted per record — generalized from path globs to content
n-grams.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .hashing import xxh64_bytes_many
from .textstats import _tokenize

U64 = np.uint64


def _gram_hashes(
    text: pa.Array | pa.ChunkedArray, n: int
) -> tuple[np.ndarray, np.ndarray]:
    """text column → (gram_hashes uint64, doc_index int64) for every
    n-token window of every doc, using the shared token definition.

    Fully vectorized: tokens come from one Arrow split, the normalized
    per-doc string (tokens joined by ' ') is built once, and each gram is
    hashed as a byte-slice of that buffer — no Python loop over grams."""
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    flat, counts = _tokenize(text)
    counts = counts.astype(np.int64)
    n_docs = len(counts)
    if n_docs == 0 or len(flat) == 0:
        return np.empty(0, U64), np.empty(0, np.int64)
    offsets = np.concatenate([[0], np.cumsum(counts)])
    lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), flat)
    norm = pc.binary_join(lists, " ")
    if isinstance(norm, pa.ChunkedArray):
        norm = norm.combine_chunks()
    norm_off = (
        np.frombuffer(norm.buffers()[1], dtype=np.int32)[
            norm.offset : norm.offset + len(norm) + 1
        ].astype(np.int64)
    )
    norm_buf = np.frombuffer(norm.buffers()[2], dtype=np.uint8)

    klens = pc.binary_length(flat).to_numpy(zero_copy_only=False).astype(np.int64)
    seg_start = offsets[:-1]
    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), counts)
    gcum = np.concatenate([[0], np.cumsum(klens)])
    # byte offset of token i inside its doc's normalized string:
    # preceding token bytes + one ' ' per preceding token
    j_within = np.arange(len(klens), dtype=np.int64) - np.repeat(seg_start, counts)
    tok_start = (gcum[:-1] - gcum[seg_start[doc_of]]) + j_within
    abs_start = norm_off[doc_of] + tok_start

    # a gram starts at every token whose doc still has n-1 tokens after it
    valid = j_within <= counts[doc_of] - n
    if not valid.any():
        return np.empty(0, U64), np.empty(0, np.int64)
    gi = np.nonzero(valid)[0]
    g_start = abs_start[gi]
    g_end = abs_start[gi + n - 1] + klens[gi + n - 1]
    hashes = xxh64_bytes_many(norm_buf, g_start, g_end - g_start)
    return hashes, doc_of[gi]


def benchmark_grams(
    bench: Dataset, n: int = 8, text_col: str = "text"
) -> np.ndarray:
    """Benchmark Dataset → sorted unique uint64 gram-hash array (small by
    definition — eval sets; collected on the driver for broadcast)."""
    parts = []
    for b in bench.select_columns([text_col]).map_batches(
        lambda t: pa.table(
            {"h": pa.array(np.unique(_gram_hashes(t.column(text_col), n)[0]), pa.uint64())}
        ),
        batch_format="pyarrow",
    ).iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        parts.append(b.column("h").to_numpy(zero_copy_only=False))
    if not parts:
        return np.empty(0, U64)
    return np.unique(np.concatenate(parts))


def decontaminate(
    corpus: Dataset,
    bench_hashes: np.ndarray,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """→ Dataset(id_col, contaminated bool, n_bench_grams int64): per doc,
    the number of DISTINCT benchmark grams it contains. The benchmark
    hash set broadcasts once; the corpus never shuffles."""
    ref = ray.put(np.sort(np.asarray(bench_hashes, dtype=U64)))

    def tag(batch: pa.Table) -> pa.Table:
        bh = ray.get(ref)
        ids = batch.column(id_col)
        hashes, doc_of = _gram_hashes(batch.column(text_col), n)
        nhit = np.zeros(len(batch), dtype=np.int64)
        if len(hashes) and len(bh):
            pos = np.searchsorted(bh, hashes)
            pos_c = np.minimum(pos, len(bh) - 1)
            hit = bh[pos_c] == hashes
            if hit.any():
                # distinct contaminated grams per doc: unique (doc, hash)
                d, h = doc_of[hit], hashes[hit]
                order = np.lexsort((h, d))
                d, h = d[order], h[order]
                new = np.ones(len(d), dtype=bool)
                new[1:] = (d[1:] != d[:-1]) | (h[1:] != h[:-1])
                np.add.at(nhit, d[new], 1)
        return pa.table(
            {
                id_col: ids,
                "contaminated": pa.array(nhit > 0),
                "n_bench_grams": pa.array(nhit, pa.int64()),
            }
        )

    return corpus.map_batches(tag, batch_format="pyarrow")
