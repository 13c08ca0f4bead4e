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

Size guard: while the boilerplate set fits ``max_broadcast_rows`` it
broadcasts (the pure-streaming fast path above); past the bound — a
web-scale corpus can hold billions of distinct boilerplate lines — the
set stays a Dataset and the filter pass becomes explode → bucketed
left join on line hash → per-bucket sort-segment reassembly. Text
lines shuffle once in that regime (the price of a membership set that
fits no single worker); output is identical (branch-pinned in
tests/test_lines.py).

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


def _boilerplate_counts(
    docs: Dataset, min_docs: int = 2, text_col: str = "text"
) -> Dataset:
    """Dataset of (lh) rows for lines appearing in ≥ ``min_docs`` docs."""

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

    def threshold(batch: pa.Table) -> pa.Table:
        n = batch.column("n_docs").to_numpy(zero_copy_only=False)
        return pa.table({"lh": batch.column("lh").filter(pa.array(n >= min_docs))})

    return agg.map_batches(threshold, batch_format="pyarrow")


def boilerplate_line_hashes(
    docs: Dataset, min_docs: int = 2, text_col: str = "text"
) -> np.ndarray:
    """Sorted int64 hashes of lines appearing in ≥ ``min_docs`` docs."""
    from .exchange import collect_table

    t = collect_table(_boilerplate_counts(docs, min_docs, text_col))
    return np.sort(t.column("lh").to_numpy(zero_copy_only=False))


def line_dedup(
    docs: Dataset,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_broadcast_rows: int | None = None,
) -> Dataset:
    """→ Dataset(id, text) with boilerplate lines removed.

    A doc whose every line is boilerplate keeps an empty text (the row
    is not dropped — pair with the ingest size gate to discard it).
    Precondition: ``id_col`` values are unique per row.

    Size-guarded (module docstring): boilerplate sets above the cap
    switch to the join + reassembly path instead of broadcasting.
    """
    from .exchange import BROADCAST_MAX_ROWS, collect_table

    dropd = _boilerplate_counts(docs, min_docs=min_docs, text_col=text_col)
    dropd = dropd.materialize()
    cap = BROADCAST_MAX_ROWS if max_broadcast_rows is None else max_broadcast_rows
    n_drop = dropd.count()
    if n_drop > cap:
        # scale reassembly buckets with the drop-set size (the only
        # corpus-size signal already in hand): ~500k boilerplate hashes
        # per bucket keeps each sort-segment group far from Arrow's
        # 2 GiB / int32 limits at the scale that triggers this path
        n_buckets = max(64, min(4096, n_drop // 500_000))
        return _line_dedup_join(docs, dropd, id_col, text_col, n_buckets=n_buckets)
    drop = np.sort(
        collect_table(dropd).column("lh").to_numpy(zero_copy_only=False)
    )
    from .exchange import member_probe, member_table

    ref = ray.put((drop, member_table(drop)))

    def strip(batch: pa.Table) -> pa.Table:
        d, tbl = ray.get(ref)
        text = batch.column(text_col)
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, counts, hashes = _split_lines(text)
        h = hashes.view(np.int64)
        keep = ~member_probe(d, tbl, h)
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


def _line_dedup_join(
    docs: Dataset, dropd: Dataset, id_col: str, text_col: str,
    n_buckets: int = 64,
) -> Dataset:
    """Boilerplate-set-too-big-to-broadcast path: explode docs into
    (id, line_no, line_hash, line) rows, mark boilerplate lines with a
    bucketed LEFT join against the drop-set Dataset, and reassemble each
    doc from its kept lines with a per-bucket sort-segment pass. Fully
    boilerplate docs survive as empty text (rows are marked, never
    dropped, so every doc keeps ≥1 line row).

    ``n_buckets`` sizes the reassembly groups — the caller scales it
    with the drop-set size. Reassembly uses int64 list offsets and
    large_string line buffers so a big bucket fails loudly at the final
    string cast rather than silently wrapping int32 offsets."""
    from .exchange import bucketed_join
    from .hashing import fmix64, xxh64_arrow

    def explode(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        flat, counts, hashes = _split_lines(batch.column(text_col))
        ridx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
        offs = np.cumsum(counts) - counts
        ln = np.arange(int(counts.sum()), dtype=np.int64) - np.repeat(offs, counts)
        return pa.table(
            {
                "__did": ids.take(pa.array(ridx, pa.int64())),
                "__ln": pa.array(ln, pa.int64()),
                "lh": pa.array(hashes.view(np.int64), pa.int64()),
                "__line": flat,
            }
        )

    lines = docs.map_batches(explode, batch_format="pyarrow", zero_copy_batch=True)
    dropt = dropd.map_batches(
        lambda t: t.rename_columns(["__dlh"]), batch_format="pyarrow"
    )
    joined = bucketed_join(lines, dropt, "lh", "__dlh", n_buckets=n_buckets, how="left")

    def mark(batch: pa.Table) -> pa.Table:
        did = batch.column("__did")
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        if pa.types.is_integer(did.type):
            h = fmix64(did.to_numpy(zero_copy_only=False).astype(np.uint64))
        else:
            h = xxh64_arrow(did)
        b = (h % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "__did": did,
                "__ln": batch.column("__ln"),
                "__line": batch.column("__line"),
                "__keep": pc.is_null(batch.column("__dlh")),
                "__bucket": pa.array(b, pa.int32()),
            }
        )

    marked = joined.map_batches(mark, batch_format="pyarrow")

    def reassemble(g: pa.Table) -> pa.Table:
        t = g.sort_by([("__did", "ascending"), ("__ln", "ascending")])
        did = t.column("__did")
        if isinstance(did, pa.ChunkedArray):
            did = did.combine_chunks()
        codes = pc.dictionary_encode(did).indices.to_numpy(zero_copy_only=False)
        first = np.ones(len(codes), dtype=bool)
        first[1:] = codes[1:] != codes[:-1]
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.append(starts, len(codes)))
        keep = t.column("__keep").to_numpy(zero_copy_only=False).astype(bool)
        doc_of = np.repeat(np.arange(len(starts), dtype=np.int64), seg_len)
        kept_per_doc = np.bincount(doc_of[keep], minlength=len(starts)).astype(np.int64)
        # large_string + int64 offsets: a bucket past 2 GiB of line text
        # must not wrap int32 offsets; the final cast back to string is
        # the one loud capacity check left (per-doc text is far smaller
        # than the bucket's line total)
        flat = t.column("__line").cast(pa.large_string())
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        kept_flat = flat.filter(pa.array(keep))
        if isinstance(kept_flat, pa.ChunkedArray):
            kept_flat = kept_flat.combine_chunks()
        offs = np.concatenate([[0], np.cumsum(kept_per_doc)])
        kept_lists = pa.LargeListArray.from_arrays(
            pa.array(offs, pa.int64()), kept_flat
        )
        return pa.table(
            {
                id_col: did.take(pa.array(starts, pa.int64())),
                text_col: pc.binary_join(
                    kept_lists, pa.scalar("\n", pa.large_string())
                ).cast(pa.string()),
            }
        )

    return marked.groupby("__bucket").map_groups(reassemble, batch_format="pyarrow")
