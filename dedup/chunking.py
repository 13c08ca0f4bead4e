"""Context-window document chunking (training-sequence preparation).

Splits each document's token stream into fixed-size windows with a
stride (overlapping when ``stride < window``) — the standard prep step
that turns a cleaned web corpus into model-context-sized training
sequences. No reference analogue (the reference ends at duplicate
groups); tokenization is shared with ``textstats._tokenize`` so the
DuckDB oracle reproduces chunks exactly from the same TOKENS_SQL.

Fully vectorized: one Arrow regex split per batch, then pure-numpy
index arithmetic builds ALL chunk token spans at once (a take + one
``binary_join`` emits every chunk string) — no per-document Python
loop. Streaming: each batch expands independently by ~window/stride×,
so block sizes stay bounded and nothing materializes the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .textstats import _tokenize


def _chunk_batch(
    batch: pa.Table, window: int, stride: int, id_col: str = "doc_id"
) -> pa.Table:
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    flat, counts = _tokenize(text)
    base = np.cumsum(counts) - counts  # doc start in flat token array
    nc = np.where(counts > 0, -(-counts // stride), 0)  # ceil-div; 0-token docs → none
    total_chunks = int(nc.sum())
    empty = pa.table(
        {
            id_col: pa.array([], batch.column(id_col).type),
            "chunk_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )
    if total_chunks == 0:
        return empty
    doc_row = np.repeat(np.arange(len(counts)), nc)
    chunk_id = np.arange(total_chunks) - np.repeat(np.cumsum(nc) - nc, nc)
    start = chunk_id * stride
    lens_out = np.minimum(start + window, counts[doc_row]) - start
    total_toks = int(lens_out.sum())
    # global flat-token index of every chunk member, in one shot
    tok_pos = np.arange(total_toks) - np.repeat(np.cumsum(lens_out) - lens_out, lens_out)
    idx = np.repeat(base[doc_row] + start, lens_out) + tok_pos
    taken = flat.take(pa.array(idx, pa.int64()))
    offsets = np.concatenate([[0], np.cumsum(lens_out)])
    la = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), taken)
    return pa.table(
        {
            id_col: batch.column(id_col).take(pa.array(doc_row, pa.int64())),
            "chunk_id": pa.array(chunk_id, pa.int64()),
            "n_tokens": pa.array(lens_out, pa.int64()),
            "chunk_text": pc.binary_join(la, " "),
        }
    )


def chunk_documents(
    docs: Dataset, window: int, stride: int | None = None, id_col: str = "doc_id"
) -> Dataset:
    """(id_col, text) rows → (id_col, chunk_id, n_tokens, chunk_text).

    Chunk ``c`` of a document covers tokens ``[c*stride, c*stride+window)``
    (clamped at the end); chunks are emitted while ``c*stride`` is inside
    the document, so every token appears in ≥1 chunk and consecutive
    chunks overlap by ``window - stride`` tokens. Token-less documents
    produce no chunks.
    """
    stride = stride or window
    if window < 1 or stride < 1:
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        raise ValueError("stride > window would drop tokens")
    return docs.map_batches(
        lambda b: _chunk_batch(b, window, stride, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
