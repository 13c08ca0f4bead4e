"""Line-level (boilerplate) deduplication — CCNet/Gopher-style.

Standard LLM-corpus cleaning step the reference has no analogue for
(its unit is whole files): drop every LINE whose exact text occurs in
≥ ``min_docs`` distinct documents (navigation bars, cookie banners,
footers), then reassemble each document from its surviving lines in
order.

Two streaming passes, no wide shuffle of text:

1. count pass — per batch: split each doc on ``\\n``, hash lines
   (vectorized XXH64), de-duplicate (doc, line_hash) locally (a doc is
   one row, so batch-local distinct == per-doc distinct), emit
   (line_hash, partial_doc_count) combiner rows; a narrow groupby sums
   them; line hashes with count ≥ ``min_docs`` — the boilerplate set,
   small relative to the corpus — are collected and broadcast.
2. filter pass — per batch: split again, drop lines in the broadcast
   set, rejoin with ``\\n`` (pure-Arrow list reassembly).

Empty lines count like any other line (they repeat across docs and are
dropped once ``min_docs`` docs contain one — same as the SQL mirror).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset
from ray.data.aggregate import Sum

from .hashing import U64
from .minhash import DEFAULT_TOKEN_HASH, _hash_tokens


def _split_lines(text: pa.Array) -> tuple[pa.Array, np.ndarray, np.ndarray]:
    """text column → (flat line array, lines-per-doc, line hashes).

    Keeps empty lines — ``"a\\n\\nb"`` has three lines, matching
    DuckDB ``string_split(text, chr(10))``.
    """
    lists = pc.split_pattern(pc.fill_null(text, ""), "\n")
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = lists.flatten()
    offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    counts = offsets[1:] - offsets[:-1]
    hashes = _hash_tokens(flat, DEFAULT_TOKEN_HASH) if len(flat) else np.empty(0, U64)
    return flat, counts, hashes


def boilerplate_line_hashes(
    docs: Dataset, min_docs: int = 2, text_col: str = "text"
) -> np.ndarray:
    """Sorted int64 hashes of lines appearing in ≥ ``min_docs`` docs."""

    def partial(batch: pa.Table) -> pa.Table:
        _, counts, hashes = _split_lines(batch.column(text_col))
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        if len(hashes):
            pairs = np.stack([doc_of, hashes.view(np.int64)], axis=1)
            u = np.unique(pairs, axis=0)  # distinct lines per doc
            lh, cnt = np.unique(u[:, 1], return_counts=True)
        else:
            lh = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
        return pa.table(
            {"lh": pa.array(lh, pa.int64()), "pd": pa.array(cnt, pa.int64())}
        )

    agg = (
        docs.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("lh")
        .aggregate(Sum("pd", alias_name="n_docs"))
    )
    out = []
    for b in agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        n = b.column("n_docs").to_numpy(zero_copy_only=False)
        out.append(b.column("lh").to_numpy(zero_copy_only=False)[n >= min_docs])
    return np.sort(np.concatenate(out)) if out else np.empty(0, np.int64)


def line_dedup(
    docs: Dataset,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """→ Dataset(id, text) with boilerplate lines removed.

    A doc whose every line is boilerplate keeps an empty text (the row
    is not dropped — pair with the ingest size gate to discard it).
    """
    drop = boilerplate_line_hashes(docs, min_docs=min_docs, text_col=text_col)
    ref = ray.put(drop)

    def strip(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, counts, hashes = _split_lines(text)
        h = hashes.view(np.int64)
        if len(d) and len(h):
            idx = np.minimum(np.searchsorted(d, h), len(d) - 1)
            keep = d[idx] != h
        else:
            keep = np.ones(len(h), dtype=bool)
        doc_of = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        kept_per_doc = (
            np.bincount(doc_of[keep], minlength=len(counts)).astype(np.int64)
            if len(doc_of)
            else np.zeros(len(counts), np.int64)
        )
        kept_flat = flat.filter(pa.array(keep))
        offs = np.concatenate([[0], np.cumsum(kept_per_doc)]).astype(np.int32)
        kept_lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kept_flat)
        joined = pc.binary_join(kept_lists, "\n")
        return pa.table({id_col: batch.column(id_col), text_col: joined})

    return docs.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)
