"""Cross-document exact-substring deduplication (ExactSubstr-style).

The corpus-level counterpart of ``suffix.py``'s per-pair span pass and
the north star's suffix-array substring stage: find every K-token
window whose exact content occurs in >= ``min_docs`` DISTINCT documents
anywhere in the corpus, merge overlapping duplicated windows into
maximal spans per document, and emit both span statistics and the
document with those spans cut out — the "remove any long substring
repeated across the training set" operation of Lee et al. 2021
(Deduplicating Training Data Makes Language Models Better), expressed
as two streaming Ray Data passes instead of a monolithic suffix array.

Reference anchor: generalizes the reference's whole-file checksum
grouping (process_matches.rs:267-288) down to sub-document granularity,
the same way minhash.py generalizes its partial-checksum stage.

Two passes, no wide shuffle of text (same shape as lines.py):

1. count pass — per batch: tokenize (textstats._tokenize, the
   SQL-mirrored tokenizer), compute the XXH64-polynomial hash of every
   K-token window (stride 1), de-duplicate (doc, window) locally (a doc
   is one row, so batch-local distinct == per-doc distinct), emit
   (win_hash, partial_doc_count) 16 B combiner rows; a narrow groupby
   sums them; window hashes hit by >= ``min_docs`` docs — bounded by
   shared boilerplate volume, not corpus size — are collected sorted.
2. strip pass — per batch: recompute window hashes, mark starts in the
   broadcast set (one ``searchsorted``), merge [i, i+K) intervals per
   doc with pure index arithmetic, overlay a coverage mask on the flat
   token array, and reassemble each doc from its uncovered tokens
   (one Arrow take + ``binary_join``; no per-doc Python).

Scale knobs:

- O(total tokens) narrow 8-byte keys leave pass 1 before combining —
  the same order of work as MinHash shingling, which already runs over
  every token. Past that, ``sample_mod`` applies CONTENT-DEFINED
  window sampling: only starts whose window hash satisfies
  ``h % sample_mod == 0`` are emitted/checked. Because the predicate
  depends on window content alone, two documents sharing a span keep
  emitting the SAME sampled windows (alignment-free, the winnowing
  trick — fingerprint.py), so a shared span of L tokens is detected
  with probability ~1-(1-1/m)^(L-K+1); only the emitted-key volume
  drops by m. ``sample_mod=1`` is exact and oracle-checkable.
- The duplicated-window set is broadcast once via ``ray.put``
  (zero-copy per node); it is bounded by cross-doc repeated content,
  the thing the pipeline exists to remove. ``min_docs`` and
  ``sample_mod`` are the pressure valves if a pathological corpus
  blows it up (same bound/valve story as lines.py's drop set).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
from ray.data import Dataset

from .hashing import U64, fmix64
from .minhash import DEFAULT_TOKEN_HASH, _hash_tokens
from .minhash import _POLY
from .textstats import _tokenize


def _window_hashes(
    th: np.ndarray, counts: np.ndarray, k: int
) -> tuple[np.ndarray, np.ndarray]:
    """Flat K-token window hashes + windows-per-doc.

    Unlike ``minhash.shingle_hashes`` there is NO short-doc fallback:
    a doc with fewer than ``k`` tokens has no K-token substring and
    contributes zero windows (substring semantics, not set-identity
    semantics).
    """
    counts = counts.astype(np.int64)
    n_win = np.maximum(counts - k + 1, 0)
    total = int(n_win.sum())
    if total == 0:
        return np.empty(0, U64), n_win
    T = len(th)
    with np.errstate(over="ignore"):
        acc = np.zeros(T - k + 1, dtype=U64)
        for j in range(k):
            acc = acc * _POLY + th[j : T - k + 1 + j]
        acc = fmix64(acc)
    doc_start = np.cumsum(counts) - counts
    has = n_win > 0
    m = n_win[has]
    row_of = np.repeat(np.arange(len(m)), m)
    pos = np.arange(total, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    src = doc_start[has][row_of] + pos
    return acc[src], n_win


def _win_layout(batch: pa.Table, k: int, sample_mod: int, text_col: str):
    """Shared per-batch prep: tokens, window hashes and index geometry."""
    text = batch.column(text_col)
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    flat, counts = _tokenize(text)
    th = _hash_tokens(flat, DEFAULT_TOKEN_HASH) if len(flat) else np.empty(0, U64)
    wh, n_win = _window_hashes(th, counts, k)
    if sample_mod > 1 and len(wh):
        keep = wh % np.uint64(sample_mod) == 0
    else:
        keep = None
    return flat, counts, wh, n_win, keep


def dup_window_hashes(
    docs: Dataset,
    k: int = 8,
    min_docs: int = 2,
    sample_mod: int = 1,
    text_col: str = "text",
) -> np.ndarray:
    """Sorted int64 hashes of K-token windows in >= ``min_docs`` docs."""

    def partial(batch: pa.Table) -> pa.Table:
        _, _, wh, n_win, keep = _win_layout(batch, k, sample_mod, text_col)
        doc_of = np.repeat(np.arange(len(n_win), dtype=np.int64), n_win)
        if keep is not None:
            wh, doc_of = wh[keep], doc_of[keep]
        if len(wh):
            # one lexsort (wh primary, doc secondary) gives both the
            # per-doc window dedup AND the per-wh distinct-doc counts as
            # run-length scans — avoids np.unique(axis=0)'s slow
            # void-row path on tens of millions of rows
            h = wh.view(np.int64)
            order = np.lexsort((doc_of, h))
            h_s, d_s = h[order], doc_of[order]
            first = np.ones(len(h_s), dtype=bool)
            first[1:] = (h_s[1:] != h_s[:-1]) | (d_s[1:] != d_s[:-1])
            h_u = h_s[first]  # distinct (wh, doc), sorted by wh
            run = np.ones(len(h_u), dtype=bool)
            run[1:] = h_u[1:] != h_u[:-1]
            idx = np.flatnonzero(run)
            key = h_u[idx]
            cnt = np.diff(np.append(idx, len(h_u))).astype(np.int64)
        else:
            key = np.empty(0, np.int64)
            cnt = np.empty(0, np.int64)
        return pa.table(
            {"wh": pa.array(key, pa.int64()), "pd": pa.array(cnt, pa.int64())}
        )

    # materialized: the merge policy below may consume the stream twice
    # (probe + groupby fallback), and THIS combiner's map stage — the
    # O(total-tokens) tokenize + window-hash pass — is the dominant cost
    # of pass 1; re-executing it would double the pipeline's hot work
    partials = docs.map_batches(
        partial, batch_format="pyarrow", batch_size=4096, zero_copy_batch=True
    ).materialize()

    # merge the 16 B (wh, pd) combiner rows with the shared
    # driver-argsort / groupby split policy (exchange.merged_threshold_keys)
    from .exchange import merged_threshold_keys

    return merged_threshold_keys(partials, "wh", "pd", min_docs)


def strip_dup_spans(
    docs: Dataset,
    dup_sorted: np.ndarray,
    k: int = 8,
    sample_mod: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Per doc: duplicated-window/span/token stats + span-stripped text.

    Output columns: ``id_col, n_tokens, dup_windows, dup_spans,
    dup_tokens, kept_tokens, kept_text`` where spans are the merged
    union of all duplicated [start, start+k) windows and ``kept_text``
    is the uncovered tokens rejoined with single spaces (token-level
    surgery — original whitespace inside removed spans is gone by
    definition, and the normalized join is the documented output form,
    shared with the SQL oracle).
    """
    ref = ray.put(dup_sorted)

    def strip(batch: pa.Table) -> pa.Table:
        d = ray.get(ref)
        flat, counts, wh, n_win, keep = _win_layout(batch, k, sample_mod, text_col)
        nd = len(counts)
        doc_of_win = np.repeat(np.arange(nd, dtype=np.int64), n_win)
        start_in_doc = np.arange(len(wh), dtype=np.int64) - np.repeat(
            np.cumsum(n_win) - n_win, n_win
        )
        h = wh.view(np.int64)
        if len(d) and len(h):
            idx = np.minimum(np.searchsorted(d, h), len(d) - 1)
            dup = d[idx] == h
        else:
            dup = np.zeros(len(h), dtype=bool)
        if keep is not None:
            dup &= keep
        docw = doc_of_win[dup]
        starts = start_in_doc[dup]  # sorted within each doc by construction

        dup_windows = np.bincount(docw, minlength=nd).astype(np.int64)
        if len(starts):
            new_span = np.ones(len(starts), dtype=bool)
            gap = starts[1:] - starts[:-1]
            new_span[1:] = (docw[1:] != docw[:-1]) | (gap > k)
            dup_spans = np.bincount(docw[new_span], minlength=nd).astype(np.int64)
            contrib = np.where(new_span, k, 0).astype(np.int64)
            cont = ~new_span
            contrib[cont] = np.minimum(gap[cont[1:]], k)
            # bincount-with-weights beats np.add.at's scatter by ~10×
            # on millions of dup windows; k ≤ 2^20 keeps the float64
            # accumulation exact far past any real batch
            dup_tokens = np.bincount(
                docw, weights=contrib, minlength=nd
            ).astype(np.int64)
        else:
            dup_spans = np.zeros(nd, np.int64)
            dup_tokens = np.zeros(nd, np.int64)

        # coverage overlay on the flat token array
        total_toks = int(counts.sum())
        base = np.cumsum(counts) - counts
        covered = np.zeros(total_toks, dtype=bool)
        if len(starts):
            g = base[docw] + starts
            delta = np.bincount(g, minlength=total_toks + 1).astype(np.int64)
            # starts <= count-k, so g+k <= doc end
            delta -= np.bincount(g + k, minlength=total_toks + 1)
            covered = np.cumsum(delta[:-1]) > 0
        keep_tok = ~covered
        doc_of_tok = np.repeat(np.arange(nd, dtype=np.int64), counts)
        kept_per_doc = (
            np.bincount(doc_of_tok[keep_tok], minlength=nd).astype(np.int64)
            if total_toks
            else np.zeros(nd, np.int64)
        )
        kept_flat = flat.filter(pa.array(keep_tok)) if total_toks else flat
        offs = np.concatenate([[0], np.cumsum(kept_per_doc)])
        lists = pa.ListArray.from_arrays(pa.array(offs, pa.int32()), kept_flat)
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_tokens": pa.array(counts, pa.int64()),
                "dup_windows": pa.array(dup_windows, pa.int64()),
                "dup_spans": pa.array(dup_spans, pa.int64()),
                "dup_tokens": pa.array(dup_tokens, pa.int64()),
                "kept_tokens": pa.array(kept_per_doc, pa.int64()),
                "kept_text": pc.binary_join(lists, " "),
            }
        )

    return docs.map_batches(strip, batch_format="pyarrow", zero_copy_batch=True)


def exact_substr_dedup(
    docs: Dataset,
    k: int = 8,
    min_docs: int = 2,
    sample_mod: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> Dataset:
    """Full two-pass corpus-level substring dedup (stats + stripped text)."""
    dup = dup_window_hashes(
        docs, k=k, min_docs=min_docs, sample_mod=sample_mod, text_col=text_col
    )
    return strip_dup_spans(
        docs, dup, k=k, sample_mod=sample_mod, id_col=id_col, text_col=text_col
    )
