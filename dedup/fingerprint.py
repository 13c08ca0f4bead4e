"""Document fingerprinting via winnowing (Schleimer/Wilkerson/Aiken,
SIGMOD 2003 — public algorithm): per document, the set of minimum
shingle hashes over a sliding window of ``w`` consecutive shingles.
Robust partial-overlap fingerprints: two documents sharing a run of
≥ w+k-1 tokens share at least one fingerprint.

Vectorized per batch: the flat shingle-hash array (same rolling k-gram
combine as MinHash) → sliding-window minimum via ``np.minimum`` over
``w`` shifted slices, masked at document boundaries → per-doc distinct
fingerprints.

Output rows (doc id, fingerprint) feed the same groupby/pair machinery
as LSH bands; ``fingerprint_stats`` summarizes per doc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .hashing import U64, xxh64_arrow
from .minhash import shingle_hashes
from .textstats import _tokenize


def _doc_fingerprints(
    batch: pa.Table, id_col: str, k: int, w: int
) -> tuple[np.ndarray, np.ndarray]:
    """→ (flat distinct fingerprints, fingerprints-per-doc)."""
    text = batch.column("text")
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    flat, counts = _tokenize(text)
    th = xxh64_arrow(flat) if len(flat) else np.empty(0, U64)
    sh, n_sh = shingle_hashes(th, counts, k)
    n_docs = len(counts)
    n_out = np.zeros(n_docs, dtype=np.int64)
    if not len(sh):
        return np.empty(0, U64), n_out
    ends = np.cumsum(n_sh)
    starts = ends - n_sh
    T = len(sh)

    # global sliding min over w shifted slices (vectorized once for the
    # whole flat array), then keep only windows fully inside one doc
    nwin = max(T - w + 1, 0)
    win_doc = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
    cand_doc_list = []
    cand_fp_list = []
    if nwin > 0:
        m = sh[:nwin].copy()
        for j in range(1, w):
            np.minimum(m, sh[j : nwin + j], out=m)
        d0 = win_doc[:nwin]
        valid = (np.arange(nwin, dtype=np.int64) + w - 1) < ends[d0]
        cand_doc_list.append(d0[valid])
        cand_fp_list.append(m[valid])
    # short docs (n_sh in 1..w): single fingerprint = min of whole segment.
    # reduceat runs over ALL nonzero segments (their starts are adjacent in
    # the flat array, so each reduction stops at the next segment) and then
    # selects the short ones — reducing over starts[short] alone would span
    # any long docs lying between two short docs (batch-composition bug).
    short = (n_sh > 0) & (n_sh < w)
    if short.any():
        nz = n_sh > 0
        mins_nz = np.minimum.reduceat(sh, starts[nz])
        short_in_nz = n_sh[nz] < w
        cand_doc_list.append(np.nonzero(nz)[0][short_in_nz])
        cand_fp_list.append(mins_nz[short_in_nz])
    cand_doc = np.concatenate(cand_doc_list) if cand_doc_list else np.empty(0, np.int64)
    cand_fp = np.concatenate(cand_fp_list) if cand_fp_list else np.empty(0, U64)
    if not len(cand_doc):
        return np.empty(0, U64), n_out

    # distinct per doc: one lexsort + boundary mask
    order = np.lexsort((cand_fp, cand_doc))
    d_s, f_s = cand_doc[order], cand_fp[order]
    new = np.ones(len(d_s), dtype=bool)
    new[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
    d_u, f_u = d_s[new], f_s[new]
    np.add.at(n_out, d_u, 1)
    return f_u, n_out


class Winnower:
    """map_batches callable → (id, fingerprint) rows."""

    def __init__(self, id_col: str = "doc_id", k: int = 5, w: int = 4):
        self.id_col, self.k, self.w = id_col, k, w

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        fps, n_out = _doc_fingerprints(batch, self.id_col, self.k, self.w)
        return pa.table(
            {
                self.id_col: pa.array(np.repeat(ids, n_out), pa.int64()),
                "fingerprint": pa.array(fps.view(np.int64), pa.int64()),
            }
        )


def fingerprint_rows(ds: Dataset, id_col: str = "doc_id", k: int = 5, w: int = 4) -> Dataset:
    return ds.map_batches(
        Winnower(id_col, k, w), batch_format="pyarrow", zero_copy_batch=True
    )


def fingerprint_stats(ds: Dataset, id_col: str = "doc_id", k: int = 5, w: int = 4) -> Dataset:
    """Per-doc fingerprint count + min fingerprint (deterministic ints)."""

    class Stats(Winnower):
        def __call__(self, batch: pa.Table) -> pa.Table:
            ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
            fps, n_out = _doc_fingerprints(batch, self.id_col, self.k, self.w)
            ends = np.cumsum(n_out)
            starts = ends - n_out
            mins = np.zeros(len(ids), dtype=np.int64)
            nz = n_out > 0
            if nz.any():
                mins[nz] = np.minimum.reduceat(fps.view(np.int64), starts[nz])
            return pa.table(
                {
                    self.id_col: batch.column(self.id_col),
                    "n_fingerprints": pa.array(n_out, pa.int64()),
                    "min_fingerprint": pa.array(mins, pa.int64()),
                }
            )

    return ds.map_batches(Stats(id_col, k, w), batch_format="pyarrow", zero_copy_batch=True)


def text_fingerprint_stats(
    ds: Dataset, id_col: str = "doc_id", k: int = 5, w: int = 4
) -> Dataset:
    """Winnowing over shingle STRINGS under lexicographic order →
    (id, n_fingerprints, min_fingerprint:string).

    Same window logic as the hash path but the total order is the shingle
    string itself, so a DuckDB oracle (window MIN over the shingle
    sequence) can reproduce it bit-for-bit — the hash path's XXH64/poly
    combine is not SQL-computable. Shingle convention mirrors
    ``minhash.shingle_hashes``: k-grams for docs with ≥k tokens, one
    whole-sequence shingle for 1..k-1 tokens, none for empty docs.

    Vectorization: k-gram strings via one ``binary_join_element_wise``
    over k shifted token slices; lexicographic winnowing runs on integer
    ranks (``np.unique`` inverse codes are sorted-order ranks, so a
    sliding MIN over codes equals a sliding MIN over strings).
    """
    import pyarrow.compute as pc

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        flat, counts = _tokenize(text)
        n_docs = len(counts)
        doc_end = np.cumsum(counts)
        doc_start = doc_end - counts
        n_sh = np.where(
            counts >= k, counts - k + 1, np.where(counts > 0, 1, 0)
        ).astype(np.int64)
        out_end = np.cumsum(n_sh)
        out_start = out_end - n_sh
        total = int(n_sh.sum())
        shingles = np.empty(total, dtype=object)
        T = len(flat)
        big = counts >= k
        if big.any() and T >= k:
            joined = pc.binary_join_element_wise(
                *[flat.slice(j, T - k + 1) for j in range(k)], " "
            ).to_numpy(zero_copy_only=False)
            m = (counts - k + 1)[big]
            row_of = np.repeat(np.nonzero(big)[0], m)
            pos = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
            src = np.repeat(doc_start[big], m) + pos
            shingles[np.repeat(out_start[big], m) + pos] = joined[src]
        short = (counts > 0) & (counts < k)
        if short.any():
            toks = flat.to_numpy(zero_copy_only=False)
            for i in np.nonzero(short)[0]:
                shingles[out_start[i]] = " ".join(toks[doc_start[i] : doc_end[i]])
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        n_out = np.zeros(n_docs, dtype=np.int64)
        mins = np.full(n_docs, "", dtype=object)
        if total:
            uniq, codes = np.unique(shingles.astype(str), return_inverse=True)
            codes = codes.astype(np.int64)
            sends = out_end
            cand_doc, cand_fp = [], []
            nwin = max(total - w + 1, 0)
            win_doc = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
            if nwin > 0:
                mm = codes[:nwin].copy()
                for j in range(1, w):
                    np.minimum(mm, codes[j : nwin + j], out=mm)
                d0 = win_doc[:nwin]
                valid = (np.arange(nwin, dtype=np.int64) + w - 1) < sends[d0]
                cand_doc.append(d0[valid])
                cand_fp.append(mm[valid])
            sh_mask = (n_sh > 0) & (n_sh < w)
            if sh_mask.any():
                nz = n_sh > 0
                mins_nz = np.minimum.reduceat(codes, out_start[nz])
                sel = n_sh[nz] < w
                cand_doc.append(np.nonzero(nz)[0][sel])
                cand_fp.append(mins_nz[sel])
            d = np.concatenate(cand_doc) if cand_doc else np.empty(0, np.int64)
            f = np.concatenate(cand_fp) if cand_fp else np.empty(0, np.int64)
            if len(d):
                order = np.lexsort((f, d))
                d_s, f_s = d[order], f[order]
                new = np.ones(len(d_s), dtype=bool)
                new[1:] = (d_s[1:] != d_s[:-1]) | (f_s[1:] != f_s[:-1])
                d_u, f_u = d_s[new], f_s[new]
                np.add.at(n_out, d_u, 1)
                firsts = np.ones(len(d_u), dtype=bool)
                firsts[1:] = d_u[1:] != d_u[:-1]
                mins[d_u[firsts]] = uniq[f_u[firsts]]
        return pa.table(
            {
                id_col: batch.column(id_col),
                "n_fingerprints": pa.array(n_out, pa.int64()),
                "min_fingerprint": pa.array([str(x) for x in mins], pa.string()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
