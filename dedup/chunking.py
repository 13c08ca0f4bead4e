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
    if stride is None:
        stride = window
    if window < 1 or stride < 1:
        # validate BEFORE any defaulting: an explicit stride=0 must be
        # rejected, not silently become non-overlapping chunking
        raise ValueError("window and stride must be >= 1")
    if stride > window:
        raise ValueError("stride > window would drop tokens")
    return docs.map_batches(
        lambda b: _chunk_batch(b, window, stride, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )


def pack_sequences(
    docs: Dataset,
    capacity: int,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
) -> Dataset:
    """Greedy sequence packing: docs in ``id_col`` order stream into
    fixed-``capacity`` token sequences; each doc is stamped with the
    sequence holding its FIRST token and its offset inside it.

    ``offset(d) = Σ n_tokens of docs with id < d`` (a GLOBAL prefix
    sum), ``seq_id = offset // capacity``, ``seq_offset = offset %
    capacity`` — the deterministic packing rule a training-export
    shard writer needs, reproducible in SQL as a window cumsum.

    Distributed prefix sum, no corpus materialization: ids range-bucket
    (order-preserving, ``(id-lo) >> shift`` with the shift sized so at
    most ``n_buckets`` buckets exist — overflow-free for ids spanning
    the full int64 range, unlike a ``(id-lo)*nb // span`` multiply,
    which wraps for hash-derived ids); per-bucket token totals
    (ONE combiner row per bucket) prefix on the driver; a per-bucket
    Arrow sort + cumsum adds the bucket base. Only the narrow
    (id, n_tokens) projection shuffles. Precondition: ``id_col`` int64,
    unique. Output: (id_col, n_tokens, seq_id, seq_offset).
    """
    if capacity < 1:
        raise ValueError("capacity must be >= 1")
    from ray.data.aggregate import Max, Min, Sum

    def narrow(batch: pa.Table) -> pa.Table:
        _, counts = _tokenize(batch.column(text_col))
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(counts, pa.int64()),
            }
        )

    nt = docs.map_batches(
        narrow, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    stats = nt.aggregate(Min(id_col), Max(id_col))
    lo, hi = stats[f"min({id_col})"], stats[f"max({id_col})"]
    if lo is None:
        import ray.data as rd

        return rd.from_arrow(
            pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "seq_id": pa.array([], pa.int64()),
                    "seq_offset": pa.array([], pa.int64()),
                }
            )
        )
    lo_i = int(lo)
    span = int(hi) - lo_i + 1  # Python int: exact even past int64
    # bucket = (id - lo) >> shift, computed in wrapping uint64 (the true
    # difference is always in [0, 2^64), so modular subtract is exact).
    # shift is sized so bucket < 2^k <= n_buckets; a multiply-divide
    # formula overflows int64 when ids span > 2^63/n_buckets.
    k = max(1, int(n_buckets)).bit_length() - 1
    shift_i = max(0, span.bit_length() - k)
    # delta is always < 2^64, so a shift of >= 64 maps every id to bucket
    # 0 — but numpy's uint64 >> 64 is formally undefined (C shift UB; it
    # happens to return 0 on this build, not guaranteed elsewhere). The
    # degenerate case is reachable: n_buckets=1 gives k=0, and ids
    # spanning >= 2^63 give span.bit_length() >= 64. Emit the zeros
    # explicitly instead of shifting.
    degenerate = shift_i >= 64
    shift = np.uint64(min(shift_i, 63))
    lo_u = np.uint64(lo_i % (1 << 64))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        if degenerate:
            b = np.zeros(len(ids), np.int32)
        else:
            delta = ids.astype(np.uint64) - lo_u  # wraps to the true diff
            b = (delta >> shift).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    bucketed = nt.map_batches(add_bucket, batch_format="pyarrow").materialize()

    # one 12-byte combiner row per (block, bucket) → driver sees ≤ n_buckets
    def bucket_partials(batch: pa.Table) -> pa.Table:
        b = batch.column("__bucket").to_numpy(zero_copy_only=False)
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        s = np.zeros(n_buckets, np.int64)
        np.add.at(s, b, n)  # exact int64 segment sum, one pass
        u = np.flatnonzero(s)
        return pa.table(
            {
                "__bucket": pa.array(u.astype(np.int32), pa.int32()),
                "ps": pa.array(s[u], pa.int64()),
            }
        )

    totals = (
        bucketed.map_batches(bucket_partials, batch_format="pyarrow")
        .groupby("__bucket")
        .aggregate(Sum("ps", alias_name="tok"))
        .to_pandas()
    )
    bases = np.zeros(n_buckets + 1, np.int64)
    bases[np.asarray(totals["__bucket"], np.int64) + 1] = np.asarray(
        totals["tok"], np.int64
    )
    bases = np.cumsum(bases)  # bases[b] = tokens in buckets < b

    def pack_bucket(g: pa.Table) -> pa.Table:
        t = g.sort_by([(id_col, "ascending")])
        bno = int(t.column("__bucket")[0].as_py())
        n = t.column("n_tokens").to_numpy(zero_copy_only=False)
        off = bases[bno] + np.cumsum(n) - n
        return pa.table(
            {
                id_col: t.column(id_col),
                "n_tokens": t.column("n_tokens"),
                "seq_id": pa.array(off // capacity, pa.int64()),
                "seq_offset": pa.array(off % capacity, pa.int64()),
            }
        )

    return bucketed.groupby("__bucket").map_groups(
        pack_bucket, batch_format="pyarrow"
    )
