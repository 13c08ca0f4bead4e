"""SimHash near-duplicate detection.

A 64-bit SimHash per distinct document (sign of the per-bit sum of ±1
contributions from each distinct shingle hash), then candidate pairs via
block-combination bucketing (Manku et al., WWW'07): the 64 bits split
into ``ham_max + choose`` near-equal blocks; ≤ ham_max differing bits
dirty ≤ ham_max blocks, so SOME combination of ``choose`` clean blocks
matches between any pair inside the Hamming ball — recall 1.0 by
pigeonhole at every rung of the ladder. The rung is picked per corpus
(``_block_scheme``): more blocks-per-key = wider keys = lower bucket
occupancy, because what scale actually breaks is occupancy — a 16-bit
key space (the classic 4×16 chunk trick, this module's previous
default) collapses past ~4M docs: mean bucket size exceeds
``allpairs_bucket_max``, buckets degrade to star edges, and
member-pair recall silently dies. Verified by exact Hamming distance,
clustered with union-find.

Reuses the LSH machinery end-to-end: combination keys feed
``lsh.candidate_pairs`` (sort-based star emission with boundary
chaining — the skew-proof pair generator). Verification is
size-guarded: candidate pairs deduplicate in a narrow exchange; a
driver-sized set (≤ cfg.driver_verify_max) collects and checks
locally, a larger one takes two bucketed fingerprint joins and checks
Hamming inside the exchange — the driver never holds a
corpus-shaped pair stream.

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


def _block_scheme(n_docs: int, ham_max: int, cap: int) -> tuple[int, int]:
    """→ (n_blocks, choose): cheapest block-combination rung whose
    EXPECTED bucket occupancy keeps the all-pairs guarantee effective.

    Recall inside the Hamming-``ham_max`` ball is 1.0 at every rung
    (pigeonhole, module docstring); the rungs trade band-row volume
    (C(n_blocks, choose) rows/doc) against key width
    (~choose·64/n_blocks bits). Mean occupancy n_docs/2^bits must stay
    well under ``allpairs_bucket_max`` or buckets degrade to star edges
    and member-pair recall collapses — the ladder picks the first rung
    with occupancy ≤ cap/4 (ham_max=3: 4 rows/doc+16-bit keys to ~1M
    docs, 10 rows+~24-bit to ~250M, 20 rows+~30-bit past that, good to
    ~10^10 at the default cap)."""
    for choose in (1, 2, 3):
        n_blocks = ham_max + choose
        bits = min(62, (64 // n_blocks) * choose)
        if n_docs / float(1 << bits) <= cap / 4:
            return n_blocks, choose
    return ham_max + 3, 3


def _chunk_rows(fps: Dataset, n_blocks: int = 4, choose: int = 1) -> Dataset:
    """fingerprints → (doc_hash, bkey) rows, one per block combination
    (``choose`` blocks of ``ham_max + choose`` concatenated per key)."""
    from itertools import combinations

    combos = list(combinations(range(n_blocks), choose))
    base, extra = divmod(64, n_blocks)
    widths = [base + (1 if i < extra else 0) for i in range(n_blocks)]
    offs = np.cumsum([0] + widths[:-1]).astype(np.uint64)

    def fn(batch: pa.Table) -> pa.Table:
        dh = batch.column("doc_hash").to_numpy(zero_copy_only=False)
        sh = batch.column("simhash").to_numpy(zero_copy_only=False).view(U64)
        has = batch.column("n_shingles").to_numpy(zero_copy_only=False) > 0
        dh, sh = dh[has], sh[has]
        keys = []
        with np.errstate(over="ignore"):
            blocks = [
                (sh >> offs[i]) & ((np.uint64(1) << np.uint64(widths[i])) - np.uint64(1))
                for i in range(n_blocks)
            ]
            for ci, combo in enumerate(combos):
                acc = np.zeros(len(sh), dtype=U64)
                for i in combo:
                    acc = acc * _CHUNKC + blocks[i]
                keys.append(fmix64(acc ^ ((U64(ci) + U64(1)) * _CHUNKC)))
        return pa.table(
            {
                "doc_hash": pa.array(np.tile(dh, len(combos)), pa.int64()),
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
    n_fp = fps.count()
    chunks = _chunk_rows(
        fps, *_block_scheme(n_fp, hamming_max, cfg.allpairs_bucket_max)
    )
    pairs, chain = candidate_pairs(chunks, cfg)
    if len(chain):
        pairs = pairs.union(rd.from_arrow(chain))

    # size-guarded verification: deduplicate the (band-repeated) pair
    # stream in a narrow exchange first, then pick the tier by count —
    # the driver path was previously unconditional, a corpus-shaped
    # driver collect at scale
    from .verify import dedup_pairs

    deduped = dedup_pairs(pairs, n_buckets=cfg.join_buckets).materialize()
    n_pairs = deduped.count()
    edges_a = np.empty(0, np.int64)
    edges_b = np.empty(0, np.int64)
    if n_pairs and n_pairs <= cfg.driver_verify_max:
        pt = collect_table(deduped)
        a = pt.column("a").to_numpy(zero_copy_only=False)
        b = pt.column("b").to_numpy(zero_copy_only=False)
        cand = np.sort(np.unique(np.concatenate([a, b])))
        sub = collect_table(
            semi_filter(
                fps.select_columns(["doc_hash", "simhash", "mset_hash"]),
                "doc_hash", cand,
                max_broadcast_rows=cfg.broadcast_max_rows,
                n_buckets=cfg.join_buckets,
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
    elif n_pairs:
        # distributed tier: fingerprints attach through two bucketed
        # joins; Hamming checks run inside the exchange and only the
        # (dup-bounded) verified edges ever reach the driver
        from .exchange import bucketed_join

        fa = fps.map_batches(
            lambda t: pa.table(
                {"__fa": t.column("doc_hash"), "__sa": t.column("simhash"),
                 "__ma": t.column("mset_hash")}
            ),
            batch_format="pyarrow",
        )
        fb = fps.map_batches(
            lambda t: pa.table(
                {"__fb": t.column("doc_hash"), "__sb": t.column("simhash"),
                 "__mb": t.column("mset_hash")}
            ),
            batch_format="pyarrow",
        )
        j = bucketed_join(
            bucketed_join(deduped, fa, "a", "__fa", how="left",
                          n_buckets=cfg.join_buckets),
            fb, "b", "__fb", how="left", n_buckets=cfg.join_buckets,
        )

        def check(t: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            ok_m = pc.and_(
                pc.is_valid(t.column("__sa")), pc.is_valid(t.column("__sb"))
            )
            t = t.filter(ok_m)
            sa = t.column("__sa").to_numpy(zero_copy_only=False)
            sb = t.column("__sb").to_numpy(zero_copy_only=False)
            keep = _hamming(sa, sb) <= hamming_max
            if exact_multiset:
                ma = t.column("__ma").to_numpy(zero_copy_only=False)
                mb = t.column("__mb").to_numpy(zero_copy_only=False)
                keep &= ma == mb
            t = t.filter(pa.array(keep))
            return pa.table({"a": t.column("a"), "b": t.column("b")})

        et = collect_table(j.map_batches(check, batch_format="pyarrow"))
        if len(et):
            edges_a = et.column("a").to_numpy(zero_copy_only=False)
            edges_b = et.column("b").to_numpy(zero_copy_only=False)

    from .unionfind import components_np

    keys, cids = components_np(edges_a, edges_b)

    assigned = broadcast_map_i64(
        ing.select_columns(["url", "doc_hash"]),
        "doc_hash", keys, cids, "cluster_id", default_identity=True,
        max_broadcast_rows=cfg.broadcast_max_rows, n_buckets=cfg.join_buckets,
    )
    # cluster sizes: only ids occurring >1 matter (singletons are dropped
    # below), so the size map is dup-bounded — never the corpus-cardinality
    # full count table — and ships through the guarded broadcast helper.
    dk, dc = dup_key_counts(assigned.select_columns(["cluster_id"]), "cluster_id")
    sized = broadcast_map_i64(
        assigned, "cluster_id", dk, dc, "cluster_size", default_identity=False,
        max_broadcast_rows=cfg.broadcast_max_rows, n_buckets=cfg.join_buckets,
    )

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("cluster_size").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(n > 1))

    return sized.map_batches(finish, batch_format="pyarrow")
