"""Long repeated-span detection between candidate duplicate pairs.

The north star's "optional suffix-array substring pass for long repeated
spans": for each verified near-dup pair, the length of the longest common
byte substring. Instead of building literal suffix arrays per pair, we
binary-search the span length with vectorized rolling polynomial hashes
(mod 2^64) — O((|a|+|b|)·log min(|a|,|b|)) per pair, all numpy. Hash
collisions can overestimate a span with probability ~2^-64 per probe
(documented tradeoff; a verify pass would re-check bytes).

Runs as an actor-pool ``map_batches`` stage over pair batches carrying
both texts (``SpanFinder``); ``long_span_pairs`` wires it to the
near-dup pipeline's verified edges, attaching texts by broadcast from
the (small) candidate-involved representative set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .config import DedupConfig
from .hashing import U64

_B = np.uint64(1000003)  # odd polynomial base (mod 2^64 wraparound)


def _prefix_hash(data: bytes) -> np.ndarray:
    """H[i] = hash of data[:i] under the rolling polynomial (uint64)."""
    b = np.frombuffer(data, dtype=np.uint8).astype(U64)
    H = np.empty(len(b) + 1, dtype=U64)
    H[0] = 0
    with np.errstate(over="ignore"):
        # Horner prefix scan: H[i+1] = H[i]*B + b[i]; no vector scan for
        # multiply-accumulate, so do it blockwise via cumulative powers
        n = len(b)
        if n:
            pw = np.empty(n, dtype=U64)
            pw[0] = 1
            np.multiply.accumulate(np.full(n, _B, dtype=U64), out=pw[0:])
            pw = np.concatenate([[U64(1)], pw[:-1]])  # B^0..B^(n-1)
            # H[i] = sum_{j<i} b[j] * B^(i-1-j); compute via scaled cumsum:
            # S[i] = sum_{j<i} b[j] * B^{-j} needs inverses — instead use
            # S[i] = sum_{j<i} b[j] * B^{n-1-j}, then H[i] = S[i] / B^{n-i}.
            # Division mod 2^64 needs odd-B inverse: B is odd → invertible.
            scaled = b * pw[::-1]  # b[j] * B^(n-1-j)
            S = np.concatenate([[U64(0)], np.cumsum(scaled, dtype=U64)])
            inv = _pow_inv(_B, n)  # inv[i] = B^-(i) — precomputed powers of B^-1
            H = S * inv[n - np.arange(n + 1)]
    return H


_INV_CACHE: dict[int, np.ndarray] = {}


def _pow_inv(base: np.uint64, n: int) -> np.ndarray:
    """[B^0, B^-1, …, B^-n] mod 2^64 (odd base ⇒ invertible)."""
    key = int(n)
    cached = _INV_CACHE.get(-1)
    # modular inverse of odd base via Newton iteration over 2^64
    inv = np.uint64(1)
    with np.errstate(over="ignore"):
        x = base
        invb = np.uint64(1)
        # Newton: inv_{k+1} = inv_k * (2 - b*inv_k)
        for _ in range(6):
            invb = invb * (np.uint64(2) - base * invb)
        out = np.empty(n + 1, dtype=U64)
        out[0] = 1
        if n:
            np.multiply.accumulate(np.full(n, invb, dtype=U64), out=out[1:])
    return out


def _gram_hashes(H: np.ndarray, powL: np.uint64, L: int) -> np.ndarray:
    """Hashes of all L-grams from a prefix-hash array."""
    with np.errstate(over="ignore"):
        return H[L:] - H[:-L] * powL


def lcs_length(a: bytes, b: bytes) -> int:
    """Longest common substring length (byte-level) via hash binsearch."""
    if not a or not b:
        return 0
    Ha, Hb = _prefix_hash(a), _prefix_hash(b)
    lo, hi = 0, min(len(a), len(b))
    with np.errstate(over="ignore"):
        while lo < hi:
            L = (lo + hi + 1) // 2
            powL = np.uint64(1)
            e = L
            base = _B
            while e:
                if e & 1:
                    powL = powL * base
                base = base * base
                e >>= 1
            ga = _gram_hashes(Ha, powL, L)
            gb = _gram_hashes(Hb, powL, L)
            if len(np.intersect1d(ga, gb, assume_unique=False)):
                lo = L
            else:
                hi = L - 1
    return lo


class SpanFinder:
    """Actor-pool stage: batches of (a, b, text_a, text_b) → + lcs_len."""

    def __init__(self, min_span: int = 0):
        self.min_span = min_span

    def __call__(self, batch: pa.Table) -> pa.Table:
        ta = batch.column("text_a").to_pylist()
        tb = batch.column("text_b").to_pylist()
        # per-pair loop is over PAIRS (already heavily pruned), not rows
        # of the corpus; inner work is vectorized numpy
        spans = np.fromiter(
            (lcs_length((x or "").encode(), (y or "").encode()) for x, y in zip(ta, tb)),
            dtype=np.int64,
            count=len(ta),
        )
        out = pa.table(
            {
                "a": batch.column("a"),
                "b": batch.column("b"),
                "lcs_len": pa.array(spans, pa.int64()),
            }
        )
        if self.min_span:
            out = out.filter(pa.array(spans >= self.min_span))
        return out


def long_span_pairs(
    pages: Dataset, cfg: DedupConfig | None = None, min_span: int = 64
) -> Dataset:
    """pages → (a, b, lcs_len) for verified near-dup pairs with a common
    substring of ≥ ``min_span`` bytes. a/b are doc_hash identities."""
    from .exchange import semi_filter
    from .ingest import ingest
    from .lsh import band_rows, candidate_pairs
    from .minhash import sign
    from .pipeline import distinct_reps
    from .verify import verify_pairs
    import ray.data as rd

    cfg = cfg or DedupConfig()
    ing = ingest(pages, cfg).materialize()  # distinct_reps makes 3 passes
    reps = distinct_reps(ing).materialize()  # consumed by sign + text attach
    sigs = sign(reps, cfg).materialize()  # consumed by band_rows + verify
    bands = band_rows(sigs, cfg)
    pairs, chain = candidate_pairs(bands, cfg)
    if len(chain):
        pairs = pairs.union(rd.from_arrow(chain))
    edges = verify_pairs(pairs, sigs, cfg)  # (a, b, sim) arrow table
    if len(edges) == 0:
        return rd.from_arrow(
            pa.table({"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64()),
                      "lcs_len": pa.array([], pa.int64())})
        )

    # attach texts from the candidate-involved reps (small set, broadcast)
    ids = np.sort(
        np.unique(
            np.concatenate(
                [
                    edges.column("a").to_numpy(zero_copy_only=False),
                    edges.column("b").to_numpy(zero_copy_only=False),
                ]
            )
        )
    )
    sub = semi_filter(reps.select_columns(["doc_hash", "text"]), "doc_hash", ids)
    st = pa.concat_tables(
        list(sub.iter_batches(batch_size=1 << 18, batch_format="pyarrow"))
    )
    skeys = st.column("doc_hash").to_numpy(zero_copy_only=False)
    stexts = st.column("text").to_pylist()
    o = np.argsort(skeys)
    skeys = skeys[o]
    stexts = [stexts[i] for i in o]
    a = edges.column("a").to_numpy(zero_copy_only=False)
    b = edges.column("b").to_numpy(zero_copy_only=False)
    ia = np.searchsorted(skeys, a)
    ib = np.searchsorted(skeys, b)
    pair_tbl = pa.table(
        {
            "a": pa.array(a, pa.int64()),
            "b": pa.array(b, pa.int64()),
            "text_a": pa.array([stexts[i] for i in ia], pa.string()),
            "text_b": pa.array([stexts[i] for i in ib], pa.string()),
        }
    )
    return rd.from_arrow(pair_tbl).map_batches(
        SpanFinder,
        fn_constructor_kwargs={"min_span": min_span},
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
    )
