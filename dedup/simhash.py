"""SimHash near-duplicate detection.

A 64-bit SimHash per distinct document (sign of the per-bit sum of ±1
contributions from each distinct shingle hash), then candidate pairs via
the 4×16-bit chunk trick (two fingerprints within Hamming distance ≤ 3
must agree on at least one of 4 chunks — pigeonhole), verified by exact
Hamming distance, clustered with union-find.

Reuses the LSH machinery end-to-end: chunk keys feed
``lsh.candidate_pairs`` (sort-based star emission with boundary
chaining — the skew-proof pair generator), and verification mirrors
``verify.verify_pairs`` (candidate-involved fingerprints are a small
set, semi-filtered via broadcast and checked on the driver).

Complementary to MinHash: SimHash Hamming distance tracks cosine/token
-frequency similarity rather than set Jaccard; 8 bytes per doc instead
of 1 KiB of signature.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from .config import DedupConfig
from .exchange import (
    broadcast_map_i64,
    collect_table,
    dup_key_counts,
    semi_filter,
)
from .hashing import U64, fmix64
from .lsh import candidate_pairs
from .minhash import _token_lists, shingle_hashes

_CHUNKC = np.uint64(0x165667B19E3779F9)


class SimHasher:
    """map_batches callable: (doc_hash, text) → (doc_hash, simhash, n_shingles)."""

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        th, counts = _token_lists(text, self.cfg.token_hash)
        sh, n_sh = shingle_hashes(th, counts, self.cfg.shingle_k)
        n_docs = len(counts)
        out = np.zeros(n_docs, dtype=U64)
        nz = n_sh > 0
        if nz.any():
            # per-bit popcount-sum with a reused scratch column instead of
            # an unpacked (S,64) matrix — fresh multi-MB temporaries pay
            # first-touch page faults far exceeding the arithmetic
            from .hashing import _scratch

            starts = (np.cumsum(n_sh) - n_sh)[nz].astype(np.int64)
            seg_n = n_sh[nz].astype(np.int64)
            col = _scratch("simhash_col", len(sh), U64)
            fp = np.zeros(int(nz.sum()), dtype=U64)
            one = np.uint64(1)
            with np.errstate(over="ignore"):
                for j in range(64):
                    np.right_shift(sh, np.uint64(j), out=col)
                    col &= one
                    ones = np.add.reduceat(col, starts)
                    # bit j set ⇔ ones > zeros ⇔ 2*ones > n_shingles
                    fp |= ((2 * ones > seg_n.view(U64)).astype(U64) << np.uint64(j))
            out[nz] = fp
        # 64-bit shingle-MULTISET hash (wrapping sum of mixed shingle
        # hashes over ALL occurrences — commutative). Powers the
        # exact_multiset mode: hamming-0 alone is only a probabilistic
        # proxy for multiset equality (near-identical docs can vote every
        # bit the same way).
        mset = np.zeros(len(counts), dtype=U64)
        if nz.any():
            with np.errstate(over="ignore"):
                # shingles are doc-contiguous → segment sum via reduceat
                # (np.add.at's unbuffered scatter is ~10× slower here)
                contrib = fmix64(sh ^ np.uint64(0xD6E8FEB86659FD93))
                mset[nz] = np.add.reduceat(contrib, starts)
        return pa.table(
            {
                "doc_hash": batch.column("doc_hash"),
                "simhash": pa.array(out.view(np.int64), pa.int64()),
                "n_shingles": pa.array(n_sh, pa.int64()),
                "mset_hash": pa.array(mset.view(np.int64), pa.int64()),
            }
        )


def simhash_fingerprints(reps: Dataset, cfg: DedupConfig) -> Dataset:
    return reps.map_batches(
        SimHasher(cfg), batch_format="pyarrow",
        batch_size=cfg.batch_size, zero_copy_batch=True,
    )


def _chunk_rows(fps: Dataset, n_chunks: int = 4) -> Dataset:
    """fingerprints → (doc_hash, bkey) rows, one per 16-bit chunk."""

    def fn(batch: pa.Table) -> pa.Table:
        dh = batch.column("doc_hash").to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).view(U64)
        has = batch.column("n_shingles").to_numpy(zero_copy_only=False) > 0
        dh, sh = dh[has], sh[has]
        keys = []
        width = np.uint64(64 // n_chunks)
        mask = (np.uint64(1) << width) - np.uint64(1)
        with np.errstate(over="ignore"):
            for c in range(n_chunks):
                chunk = (sh >> (width * np.uint64(c))) & mask
                keys.append(fmix64(chunk ^ ((U64(c) + U64(1)) * _CHUNKC)))
        return pa.table(
            {
                "doc_hash": pa.array(np.tile(dh, n_chunks), pa.int64()),
                "bkey": pa.array(np.concatenate(keys).view(np.int64), pa.int64()),
            }
        )

    return fps.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _hamming(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    x = (a.view(U64) ^ b.view(U64)).view(np.uint8).reshape(len(a), 8)
    return np.unpackbits(x, axis=1).sum(axis=1).astype(np.int64)


def simhash_clusters(
    pages: Dataset,
    cfg: DedupConfig | None = None,
    hamming_max: int = 3,
    exact_multiset: bool = False,
) -> Dataset:
    """pages → clusters table (url, doc_hash, cluster_id, cluster_size)
    of docs whose SimHashes are within ``hamming_max`` (plus exact dups).

    ``exact_multiset=True``: candidate pairs must additionally have equal
    shingle-MULTISET hashes — a deterministic, SQL-mirrorable partition
    (group docs by shingle multiset) used by the oracle-checked
    ``simhash_exact_mode`` query.
    """
    from .ingest import ingest
    from .pipeline import distinct_reps

    cfg = cfg or DedupConfig()
    ing = ingest(pages, cfg).materialize()  # consumed by reps + assignment
    # reps has exactly one consumer (the fingerprint pass, pinned next
    # line): leave it lazy so rep texts stream straight into the
    # fingerprinter without an extra full-text object-store round-trip
    reps = distinct_reps(ing)
    fps = simhash_fingerprints(reps, cfg).materialize()
    chunks = _chunk_rows(fps)
    pairs, chain = candidate_pairs(chunks, cfg)
    if len(chain):
        pairs = pairs.union(rd.from_arrow(chain))

    # verify candidate pairs by exact Hamming distance (driver path — the
    # candidate-involved set is small; mirror of verify.verify_pairs)
    pt = collect_table(pairs)
    edges_a = np.empty(0, np.int64)
    edges_b = np.empty(0, np.int64)
    if len(pt):
        a = pt.column("a").to_numpy(zero_copy_only=False)
        b = pt.column("b").to_numpy(zero_copy_only=False)
        au, bu = a.view(U64), b.view(U64)
        lo, hi = np.minimum(au, bu), np.maximum(au, bu)
        keep = lo != hi
        packed = np.unique(np.stack([lo[keep], hi[keep]], axis=1), axis=0)
        a, b = packed[:, 0].view(np.int64), packed[:, 1].view(np.int64)
        cand = np.sort(np.unique(np.concatenate([a, b])))
        sub = collect_table(
            semi_filter(
                fps.select_columns(["doc_hash", "simhash", "mset_hash"]),
                "doc_hash", cand,
            )
        )
        ids = sub.column("doc_hash").to_numpy(zero_copy_only=False)
        vals = sub.column("simhash").to_numpy(zero_copy_only=False)
        msets = sub.column("mset_hash").to_numpy(zero_copy_only=False)
        o = np.argsort(ids)
        ids, vals, msets = ids[o], vals[o], msets[o]
        ia = np.minimum(np.searchsorted(ids, a), len(ids) - 1)
        ib = np.minimum(np.searchsorted(ids, b), len(ids) - 1)
        ok = (ids[ia] == a) & (ids[ib] == b)
        d = np.full(len(a), 64, np.int64)
        d[ok] = _hamming(vals[ia[ok]], vals[ib[ok]])
        keep = d <= hamming_max
        if exact_multiset:
            keep &= ok & (msets[ia] == msets[ib])
        edges_a, edges_b = a[keep], b[keep]

    from .unionfind import components_np

    keys, cids = components_np(edges_a, edges_b)

    assigned = broadcast_map_i64(
        ing.select_columns(["url", "doc_hash"]),
        "doc_hash", keys, cids, "cluster_id", default_identity=True,
    )
    # cluster sizes: only ids occurring >1 matter (singletons are dropped
    # below), so the size map is dup-bounded — never the corpus-cardinality
    # full count table — and ships through the guarded broadcast helper.
    dk, dc = dup_key_counts(assigned.select_columns(["cluster_id"]), "cluster_id")
    sized = broadcast_map_i64(
        assigned, "cluster_id", dk, dc, "cluster_size", default_identity=False
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("cluster_size").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n > 1))

    return sized.map_batches(finish, batch_format="pyarrow")
