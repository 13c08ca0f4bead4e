"""Gopher-style within-document repetition statistics.

The canonical webtext quality heuristics (Rae et al. 2021, "Scaling
Language Models: ... Gopher", table A1): documents dominated by a few
repeated tokens or duplicated n-grams are boilerplate/spam and are
filtered before training. Per document this module reports, as exact
integers (SQL-reproducible — no float ratios):

    n_tokens, n_distinct_tokens, top_token_cnt,
    n_2grams, n_distinct_2grams, top_2gram_cnt,
    n_3grams, n_distinct_3grams, top_3gram_cnt,
    is_repetitive  (0/1 under Gopher-like integer-threshold rules)

Tokenization is shared with ``textstats._tokenize``; n-gram identity is
a 64-bit mix of the member token hashes (collision odds ~1e-13 per doc
at web page sizes — far below the oracle's value-hash resolution).

Vectorized shape: ONE lexsort of (doc, gram-hash) per batch per n; runs
of equal keys give per-doc distinct and top counts via reduceat — no
per-document Python, no shuffle (a pure per-batch kernel).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .hashing import fmix64, xxh64_arrow
from .textstats import _tokenize

# is_repetitive iff top_token_cnt * DEN > n_tokens * TOP_NUM (token
# dominance > 30%) or dup-2gram mass (n_2g - distinct) > 20% or
# dup-3gram mass > 18% — integer cross-multiplication, no floats
_DEN = 100
_TOP_TOKEN_NUM = 30
_DUP_2G_NUM = 20
_DUP_3G_NUM = 18


def _per_doc_gram_stats(
    doc_of: np.ndarray, gram: np.ndarray, n_docs: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(total, distinct, top-count) per doc for gram keys tagged with
    their doc index. One lexsort + run-length pass, fully vectorized."""
    total = np.bincount(doc_of, minlength=n_docs)
    if not len(gram):
        z = np.zeros(n_docs, np.int64)
        return total, z, z
    order = np.lexsort((gram, doc_of))
    d, g = doc_of[order], gram[order]
    new_run = np.ones(len(g), bool)
    new_run[1:] = (g[1:] != g[:-1]) | (d[1:] != d[:-1])
    run_starts = np.flatnonzero(new_run)
    run_lens = np.diff(np.append(run_starts, len(g)))
    run_doc = d[run_starts]
    distinct = np.bincount(run_doc, minlength=n_docs)
    # max run length per doc: runs are grouped by doc (sorted), so one
    # reduceat over the doc-boundary positions in run space
    doc_run_starts = np.flatnonzero(
        np.concatenate([[True], run_doc[1:] != run_doc[:-1]])
    )
    top = np.zeros(n_docs, np.int64)
    top[run_doc[doc_run_starts]] = np.maximum.reduceat(run_lens, doc_run_starts)
    return total, distinct, top


def _rep_batch(batch: pa.Table, id_col: str) -> pa.Table:
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    flat, counts = _tokenize(text)
    n_docs = len(counts)
    th = xxh64_arrow(flat)  # uint64 token hashes
    doc_of = np.repeat(np.arange(n_docs), counts)
    cols: dict[str, np.ndarray] = {}
    tot, dis, top = _per_doc_gram_stats(doc_of, th.view(np.int64), n_docs)
    cols["n_tokens"], cols["n_distinct_tokens"], cols["top_token_cnt"] = tot, dis, top
    base = np.cumsum(counts) - counts
    for n, tag in ((2, "2gram"), (3, "3gram")):
        # gram i of a doc spans tokens [i, i+n); valid while i+n <= len
        g_counts = np.maximum(counts - (n - 1), 0)
        g_doc = np.repeat(np.arange(n_docs), g_counts)
        g_start = (
            np.arange(len(g_doc))
            - np.repeat(np.cumsum(g_counts) - g_counts, g_counts)
            + base[g_doc]
        )
        acc = th[g_start].copy()
        for k in range(1, n):
            acc = fmix64(acc * np.uint64(0x9E3779B97F4A7C15) + th[g_start + k])
        tot, dis, top = _per_doc_gram_stats(g_doc, acc.view(np.int64), n_docs)
        cols[f"n_{tag}s"], cols[f"n_distinct_{tag}s"], cols[f"top_{tag}_cnt"] = (
            tot, dis, top,
        )
    rep = (
        (cols["top_token_cnt"] * _DEN > cols["n_tokens"] * _TOP_TOKEN_NUM)
        | ((cols["n_2grams"] - cols["n_distinct_2grams"]) * _DEN
           > cols["n_2grams"] * _DUP_2G_NUM)
        | ((cols["n_3grams"] - cols["n_distinct_3grams"]) * _DEN
           > cols["n_3grams"] * _DUP_3G_NUM)
    )
    out = {id_col: batch.column(id_col)}
    out.update({k: pa.array(v, pa.int64()) for k, v in cols.items()})
    out["is_repetitive"] = pa.array(rep.astype(np.int64), pa.int64())
    return pa.table(out)


def repetition_stats(docs: Dataset, id_col: str = "doc_id") -> Dataset:
    """(id_col, text) rows → per-doc repetition statistics (see module doc)."""
    return docs.map_batches(
        lambda b: _rep_batch(b, id_col),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
