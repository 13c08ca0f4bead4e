"""Candidate-pair verification by signature agreement.

Fraction of agreeing MinHash slots is an unbiased estimator of Jaccard
similarity (E[agree] = J, Var = J(1-J)/num_perm → σ≈0.04 at 128 perms);
pairs below ``cfg.verify_threshold`` are dropped. This keeps the banding
config (b=32, r=4 — tuned for recall ≥0.99 at J ≥ 0.7) from admitting
low-similarity bucket collisions into components.

Driver path (default here): the candidate-involved doc set is a small
fraction of the corpus (bounded by duplicate docs); their signatures are
semi-filtered (broadcast id set) and streamed to the driver where all
pairs verify in one vectorized pass. Scale path: ``verify_distributed``
re-attaches signatures by two bucketed hash joins and verifies inside
``map_batches`` — no driver materialization.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .config import DedupConfig
from .exchange import bucketed_join, collect_table, semi_filter
from .hashing import U64


def _sig_matrix(sig_tbl: pa.Table, num_perm: int) -> tuple[np.ndarray, np.ndarray]:
    ids = sig_tbl.column("doc_hash").to_numpy(zero_copy_only=False)
    col = sig_tbl.column("sig")
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False)
    return ids, flat.reshape(len(ids), num_perm)


def verify_pairs(
    pairs: Dataset, sigs: Dataset, cfg: DedupConfig
) -> pa.Table:
    """→ Arrow table (a, b, sim) of pairs with sim ≥ threshold (driver path)."""
    pt = collect_table(pairs)
    if len(pt) == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    a = pt.column("a").to_numpy(zero_copy_only=False)
    b = pt.column("b").to_numpy(zero_copy_only=False)
    # canonicalize (a<b in uint64 order), drop self-pairs, global dedup —
    # the same pair arrives once per shared band. lexsort+boundary mask
    # beats np.unique(axis=0) ~3x (no void-dtype comparisons)
    au, bu = a.view(np.uint64), b.view(np.uint64)
    lo, hi = np.minimum(au, bu), np.maximum(au, bu)
    keepm = lo != hi
    lo, hi = lo[keepm], hi[keepm]
    order = np.lexsort((hi, lo))
    lo, hi = lo[order], hi[order]
    first = np.ones(len(lo), dtype=bool)
    if len(lo) > 1:
        first[1:] = (lo[1:] != lo[:-1]) | (hi[1:] != hi[:-1])
    a = lo[first].view(np.int64)
    b = hi[first].view(np.int64)
    pt = pa.table({"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())})
    if len(pt) == 0:
        return pa.table(
            {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
             "sim": pa.array([], pa.float64())}
        )
    if cfg.verify_threshold <= 0:
        return pa.table({"a": pt.column("a"), "b": pt.column("b"),
                         "sim": pa.array(np.ones(len(a)), pa.float64())})
    cand = np.sort(np.unique(np.concatenate([a, b])))
    sub = semi_filter(sigs.select_columns(["doc_hash", "sig"]), "doc_hash", cand)
    st = collect_table(sub)
    ids, mat = _sig_matrix(st, cfg.num_perm)
    order = np.argsort(ids)
    ids_s, mat_s = ids[order], mat[order]
    ia = np.searchsorted(ids_s, a)
    ib = np.searchsorted(ids_s, b)
    ok = (ia < len(ids_s)) & (ib < len(ids_s))
    ia = np.minimum(ia, len(ids_s) - 1)
    ib = np.minimum(ib, len(ids_s) - 1)
    ok &= (ids_s[ia] == a) & (ids_s[ib] == b)
    sim = np.zeros(len(a))
    # chunked gather+compare with reused scratch buffers: fresh (n,128)
    # temporaries pay first-touch page faults far exceeding the compute
    from .hashing import _scratch

    ia_ok, ib_ok = ia[ok], ib[ok]
    sim_ok = np.empty(len(ia_ok))
    CH = 16384
    np_ = cfg.num_perm
    ga = _scratch("verify_ga", CH * np_, np.int64).reshape(CH, np_)
    gb = _scratch("verify_gb", CH * np_, np.int64).reshape(CH, np_)
    for s in range(0, len(ia_ok), CH):
        e = min(s + CH, len(ia_ok))
        np.take(mat_s, ia_ok[s:e], axis=0, out=ga[: e - s])
        np.take(mat_s, ib_ok[s:e], axis=0, out=gb[: e - s])
        sim_ok[s:e] = np.count_nonzero(ga[: e - s] == gb[: e - s], axis=1) / np_
    sim[ok] = sim_ok
    keep = sim >= cfg.verify_threshold
    return pa.table(
        {
            "a": pa.array(a[keep], pa.int64()),
            "b": pa.array(b[keep], pa.int64()),
            "sim": pa.array(sim[keep], pa.float64()),
        }
    )


def verify_distributed(pairs: Dataset, sigs: Dataset, cfg: DedupConfig) -> Dataset:
    """Scale path: signatures re-attached via bucketed hash joins (signature
    transported as a fixed-width binary blob so it survives the pandas
    merge), agreement computed per batch. Returns Dataset(a, b, sim)."""

    def pack(batch: pa.Table, key_out: str, sig_out: str) -> pa.Table:
        col = batch.column("sig")
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten().to_numpy(zero_copy_only=False)
        blob = flat.reshape(len(batch), cfg.num_perm).view(np.uint8).reshape(len(batch), -1)
        width = blob.shape[1]
        arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(width), len(batch), [None, pa.py_buffer(np.ascontiguousarray(blob).tobytes())]
        )
        return pa.table({key_out: batch.column("doc_hash"), sig_out: arr})

    sa = sigs.map_batches(lambda t: pack(t, "__ka", "__sa"), batch_format="pyarrow")
    sb = sigs.map_batches(lambda t: pack(t, "__kb", "__sb"), batch_format="pyarrow")
    j1 = bucketed_join(pairs, sa, "a", "__ka", n_buckets=cfg.join_buckets)
    j2 = bucketed_join(j1, sb, "b", "__kb", n_buckets=cfg.join_buckets)

    def agree(batch: pa.Table) -> pa.Table:
        n = len(batch)
        if n == 0:
            return pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                             "sim": pa.array([], pa.float64())})

        def mat(colname):
            col = batch.column(colname)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            buf = np.frombuffer(b"".join(col.to_pylist()), dtype=U64)
            return buf.reshape(n, cfg.num_perm)

        ma, mb = mat("__sa"), mat("__sb")
        sim = (ma == mb).mean(axis=1)
        keep = sim >= cfg.verify_threshold
        return pa.table(
            {
                "a": batch.column("a").filter(pa.array(keep)),
                "b": batch.column("b").filter(pa.array(keep)),
                "sim": pa.array(sim[keep], pa.float64()),
            }
        )

    return j2.map_batches(agree, batch_format="pyarrow")
