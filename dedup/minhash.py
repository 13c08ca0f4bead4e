"""Shingling + MinHash signatures (stage 2 generalization per north rule).

The reference's stage-2 partial fingerprint (first-4096-bytes blake3,
process_matches.rs:243-265) generalizes to a 5-gram shingled
128-permutation MinHash signature computed per distinct content identity.

Vectorization strategy (no Python in the per-token hot path):

1. tokenize the whole batch in Arrow: utf8_lower → split_pattern_regex on
   ``\\W+`` → flatten to one token array (token counts from list offsets)
2. hash every token (identity proxy only): polars' vectorized Rust
   xxhash by default (cfg.token_hash="polars-xxh64", measured 61× the
   numpy kernel single-threaded), or the in-repo XXH64 kernel
   (cfg.token_hash="xxh64")
3. shingle hashes = degree-(k-1) polynomial combine of k consecutive token
   hashes (shifted-slice loop, k numpy ops), masked at document boundaries
4. per-permutation hash h_i(s) = xorshift-mix(s * a_i) with 128 seeded odd
   multipliers (multiply-shift family); per-doc minimum via
   ``np.minimum.reduceat`` over the flat shingle array

Docs with fewer than k tokens fall back to a single whole-token-sequence
shingle; docs with zero tokens get an all-sentinel signature and never
enter LSH (they can only be exact dups, which the cascade already catches).

This is a stateful stage: the multiplier table and compiled patterns are
built once per actor (``__init__``), work happens per batch (``__call__``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .config import DedupConfig
from .hashing import U64, fmix64, xxh64_arrow

try:  # vectorized Rust xxhash for token hashing (baked into the env;
    # gated anyway so token_hash="xxh64" keeps working without it)
    import polars as _pl
except ImportError:  # pragma: no cover
    _pl = None

SENTINEL = np.uint64(0xFFFFFFFFFFFFFFFF)
_POLY = np.uint64(0x9E3779B185EBCA87)  # odd combine constant

# default for equality-only internal hashing in modules without a config
# in scope (jaccard shingles, line dedup): fast path when polars exists,
# in-repo kernel otherwise — semantics identical either way (identity
# proxy, never persisted, never compared across processes with different
# availability within one run)
DEFAULT_TOKEN_HASH = "polars-xxh64" if _pl is not None else "xxh64"


def _hash_tokens(flat: pa.Array, algo: str) -> np.ndarray:
    """Flat token array → uint64 identity hashes.

    The token hash is an internal identity proxy only (equal tokens ⟺
    equal hashes up to 2⁻⁶⁴); nothing persisted or oracle-checked depends
    on the specific function, but signatures DO change with it, so the
    choice lives in the config fingerprint (config.token_hash)."""
    if algo == "xxh64":
        return xxh64_arrow(flat)
    if _pl is None:  # pragma: no cover
        raise RuntimeError(
            "token_hash='polars-xxh64' requires polars; use token_hash='xxh64'"
        )
    h = _pl.from_arrow(flat).hash(seed=0).to_numpy()
    return np.ascontiguousarray(h, dtype=U64)


def _token_lists(
    text: pa.Array, token_hash: str = "polars-xxh64"
) -> tuple[np.ndarray, np.ndarray]:
    """text column → (flat token hashes, tokens-per-doc counts).

    Tokenization IS ``textstats._tokenize`` — ONE definitional tokenizer
    for the whole engine. The signer historically kept its own ``\\W+``
    regex fallback under a claimed Unicode divergence, but none exists:
    RE2's ``\\w`` is ASCII-only, and every non-ASCII code point
    (including utf8_lower outputs) is a separator under both ``\\W+``
    and textstats' ``[^a-z0-9_]+`` on lowered text — verified
    empirically on Unicode inputs, so signatures are bit-unchanged and
    the duplicate tokenizer body (which had already drifted on
    fill_null) is gone."""
    from .textstats import _tokenize

    flat_kept, counts = _tokenize(text)
    th = _hash_tokens(flat_kept, token_hash) if len(flat_kept) else np.empty(0, U64)
    return th, counts


def shingle_hashes(th: np.ndarray, counts: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """Flat shingle-hash array + shingles-per-doc.

    k-gram rolling combine; docs with 1..k-1 tokens contribute one shingle
    over all their tokens; docs with 0 tokens contribute none.
    """
    n_docs = len(counts)
    doc_end = np.cumsum(counts)
    doc_start = doc_end - counts
    n_sh = np.where(counts >= k, counts - k + 1, np.where(counts > 0, 1, 0)).astype(np.int64)
    total = int(n_sh.sum())
    out = np.empty(total, dtype=U64)
    out_end = np.cumsum(n_sh)
    out_start = out_end - n_sh

    with np.errstate(over="ignore"):
        # full k-gram shingles, vectorized over the whole flat array
        big = counts >= k
        if big.any():
            T = len(th)
            if T >= k:
                acc = np.zeros(T - k + 1, dtype=U64)
                for j in range(k):
                    acc = acc * _POLY + th[j : T - k + 1 + j]
                acc = fmix64(acc)
                # valid shingle start positions: doc_start..doc_start+cnt-k
                starts_b = doc_start[big]
                counts_b = counts[big]
                m = counts_b - k + 1
                row_of = np.repeat(np.arange(len(starts_b)), m)
                pos = np.arange(int(m.sum()), dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
                src = starts_b[row_of] + pos
                dst = out_start[big][row_of] + pos
                out[dst] = acc[src]
        # short docs: one shingle over all tokens
        short = (counts > 0) & (counts < k)
        if short.any():
            idxs = np.nonzero(short)[0]
            for i in idxs:  # few rows; cheap
                seg = th[doc_start[i] : doc_end[i]]
                a = np.uint64(0)
                for v in seg:
                    a = a * _POLY + v
                out[out_start[i]] = fmix64(np.array([a], dtype=U64))[0]
    return out, n_sh


class MinHashSigner:
    """Actor-pool callable: distinct-content rows → signatures.

    Input batch columns: doc_hash (int64), text (string).
    Output: doc_hash, sig (fixed_size_list<int64>[num_perm]), n_shingles.
    """

    def __init__(self, cfg: DedupConfig):
        self.cfg = cfg
        rng = np.random.default_rng(cfg.minhash_seed)
        a = rng.integers(1, 1 << 63, size=cfg.num_perm, dtype=np.uint64)
        self.mult = (a << np.uint64(1)) | np.uint64(1)  # odd multipliers
        self.shift = np.uint64(31)

    def signatures_full(
        self, text: pa.Array
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(n_docs, num_perm) uint64 signatures + shingle counts + a
        64-bit **shingle-set hash** per doc (wrapping sum of mixed
        distinct shingle hashes — commutative, so order-free; equal sets
        ⟺ equal hash up to 2⁻⁶⁴ collisions). The set hash powers
        ``exact_set_verify``: signature equality alone is only a
        probabilistic proxy for set equality (a Jaccard-0.99 pair passes
        all 128 slots with probability ≈ 0.99¹²⁸ ≈ 0.28)."""
        cfg = self.cfg
        th, counts = _token_lists(text, self.cfg.token_hash)
        sh, n_sh = shingle_hashes(th, counts, cfg.shingle_k)
        n_docs = len(counts)
        sig = np.full((n_docs, cfg.num_perm), SENTINEL, dtype=U64)
        set_hash = np.zeros(n_docs, dtype=U64)
        nz = n_sh > 0
        if nz.any():
            from .hashing import _scratch

            nz_idx = np.nonzero(nz)[0]
            starts = (np.cumsum(n_sh) - n_sh)[nz].astype(np.int64)
            ends = starts + n_sh[nz]
            with np.errstate(over="ignore"):
                # chunk doc-runs to ~32k shingles and run all 128 perms
                # over the cache-resident slice — the full-array variant
                # streams the whole shingle array from RAM once per perm
                # (128× the memory traffic; measured 5.6× slower)
                CHUNK = 1 << 15
                i = 0
                n_nz = len(starts)
                while i < n_nz:
                    j = i + 1
                    while j < n_nz and ends[j] - starts[i] <= CHUNK:
                        j += 1
                    a, b = int(starts[i]), int(ends[j - 1])
                    sub = sh[a:b]
                    st = starts[i:j] - a
                    rows = nz_idx[i:j]
                    v = _scratch("minhash_chunk", b - a, U64)[: b - a]
                    for p in range(cfg.num_perm):
                        np.multiply(sub, self.mult[p], out=v)
                        v ^= v >> self.shift
                        sig[rows, p] = np.minimum.reduceat(v, st)
                    i = j
                # set_hash needs a per-doc shingle dedup (a lexsort over
                # every shingle in the batch) — pay it only when the
                # exact-set mode will actually verify with it; the
                # default flagship leaves the column zero
                if self.cfg.exact_set_verify:
                    doc_of = np.repeat(np.arange(n_docs, dtype=np.int64), n_sh)
                    order = np.lexsort((sh, doc_of))
                    d_s, s_s = doc_of[order], sh[order]
                    first = np.ones(len(s_s), dtype=bool)
                    first[1:] = (d_s[1:] != d_s[:-1]) | (s_s[1:] != s_s[:-1])
                    d_u, s_u = d_s[first], s_s[first]
                    contrib = fmix64(s_u ^ np.uint64(0xA24BAED4963EE407))
                    # distinct shingles stay doc-contiguous after the sort
                    # → segment sum via reduceat, not np.add.at scatter
                    seg = np.ones(len(d_u), dtype=bool)
                    seg[1:] = d_u[1:] != d_u[:-1]
                    starts_u = np.flatnonzero(seg)
                    if len(starts_u):
                        set_hash[d_u[starts_u]] = np.add.reduceat(contrib, starts_u)
        return sig, n_sh, set_hash

    def signatures(self, text: pa.Array) -> tuple[np.ndarray, np.ndarray]:
        """(n_docs, num_perm) uint64 signature matrix + shingle counts."""
        sig, n_sh, _ = self.signatures_full(text)
        return sig, n_sh

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        sig, n_sh, set_hash = self.signatures_full(text)
        # storage truncation (cfg.sig_bytes=4): keep the low 32 bits of
        # each 64-bit min. Slots are uniform post-mix, so truncation only
        # adds a 2^-32 per-slot false-equal — invisible next to the
        # 1/num_perm estimator step — and halves every signature byte
        # that crosses the object store or lands in a checkpoint.
        if self.cfg.sig_bytes == 4:
            flat = pa.array(
                sig.reshape(-1).astype(np.uint32).view(np.int32), pa.int32()
            )
        else:
            flat = pa.array(sig.reshape(-1).view(np.int64), pa.int64())
        sig_col = pa.FixedSizeListArray.from_arrays(flat, self.cfg.num_perm)
        return pa.table(
            {
                "doc_hash": batch.column("doc_hash"),
                "sig": sig_col,
                "n_shingles": pa.array(n_sh, pa.int64()),
                "set_hash": pa.array(set_hash.view(np.int64), pa.int64()),
            }
        )


def sign(reps: Dataset, cfg: DedupConfig) -> Dataset:
    """Distinct-content representatives → signature table (P3).

    Runs as STATELESS tasks on warm workers, not an actor pool: the
    "state" (128 seeded odd multipliers) costs microseconds to rebuild,
    while spawning fresh actor processes costs seconds each (interpreter
    + numpy import page faults) and serializes the stage ramp-up. The
    actor-pool shape (``map_batches(MinHashSigner, concurrency=(a,b))``)
    remains correct for genuinely heavy state — models, big lookup
    tables — and ``media.media_featurize`` demonstrates it.
    """
    return reps.map_batches(
        MinHashSigner(cfg),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
