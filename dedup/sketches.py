"""Streaming sketches for the 100-TB regime.

Two classic sketches re-expressed Ray-Data-first — both avoid the
full-cardinality shuffle that `groupby(key)` implies at web scale:

- **Misra–Gries 2-pass exact top-k** (`topk_exact_2pass`): pass 1
  reduces each block's exact value counts to at most ``counters``
  (item, lower-bound) rows — the mergeable-summaries reduction
  (Misra & Gries 1982; Agarwal et al., "Mergeable Summaries", PODS
  2012): subtract the (counters+1)-th largest count, drop non-positive.
  Summed across blocks, ``lb_total(x) ∈ [f(x) − E, f(x)]`` where E is
  the sum of subtracted thresholds (≤ N/(counters+1)). Any item whose
  ``lb_total + E`` falls below the k-th largest lb_total provably
  cannot be in the true top-k, so pass 2 exact-counts ONLY the
  surviving candidate set (broadcast once) — the result is the EXACT
  top-k, not an approximation, while only O(counters) rows per block
  and one candidate-sized groupby ever shuffle.
- **HyperLogLog distinct count** (`hll_distinct`): per-block 2^p
  uint8 register arrays (Flajolet et al. 2007; 64-bit-hash variant so
  no large-range correction), max-merged. Each block contributes ONE
  16 KiB row at p=14 — the driver fold streams a few MiB even at
  10^5 blocks (cf. the sharded Bloom build, which ships m/S-bit blobs:
  HLL registers are 6 orders smaller, so a driver fold is fine).
  Relative error ≈ 1.04/√(2^p) (0.8 % at p=14).

Generalizes the reference's group-by-key counting stages
(≅ process_matches.rs:100,224 group-by-size; :395-401 group-by-checksum)
to the regime where the key cardinality itself is too large to shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd
from ray.data import Dataset
from ray.data.aggregate import Sum

from .hashing import xxh64_arrow
from .textstats import _tokenize

# hard cap on the pass-2 candidate set: exceeding it means ``counters``
# is far too small for the distribution — fail loud, never silently
# degrade to an approximate answer
CANDIDATE_CAP = 1 << 17


def _mg_partial(col: str, counters: int, tokenize: bool):
    """Per-block Misra–Gries summary: ≤ ``counters`` (token, lb) rows
    plus the block's subtracted threshold in the ``err`` column (on the
    first row only — zero elsewhere)."""

    def fn(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if tokenize:
            arr, _ = _tokenize(arr)
        empty = pa.table(
            {
                "token": pa.array([], pa.string()),
                "lb": pa.array([], pa.int64()),
                "err": pa.array([], pa.int64()),
            }
        )
        if len(arr) == 0:
            return empty
        vc = pc.value_counts(arr)
        vals = vc.field("values")
        cnts = vc.field("counts").to_numpy(zero_copy_only=False).astype(np.int64)
        if len(cnts) > counters:
            # threshold = the (counters+1)-th largest count; keeping
            # top-``counters`` residuals cnt − thr bounds this block's
            # contribution to any item's undercount by exactly thr
            part = np.partition(cnts, len(cnts) - counters)
            thr = part[len(cnts) - counters - 1]
            lb = cnts - thr
            keep = lb > 0
            vals = vals.filter(pa.array(keep))
            lb = lb[keep]
        else:
            thr = 0
            lb = cnts
        if len(lb) == 0:
            # every count ≤ thr (heavy ties): still record the error
            return pa.table(
                {
                    "token": pa.array([None], pa.string()),
                    "lb": pa.array([0], pa.int64()),
                    "err": pa.array([int(thr)], pa.int64()),
                }
            )
        err = np.zeros(len(lb), np.int64)
        err[0] = thr
        return pa.table({"token": vals, "lb": pa.array(lb), "err": pa.array(err)})

    return fn


def topk_exact_2pass(
    ds: Dataset,
    col: str = "text",
    k: int = 20,
    counters: int = 4096,
    tokenize: bool = True,
) -> Dataset:
    """EXACT global top-k by count via a Misra–Gries candidate pass.

    → Dataset(token, cnt) — identical to the full-shuffle
    ``textstats.token_frequencies`` result (ties broken token-asc), but
    only ≤ ``counters`` rows per block shuffle in pass 1 and only the
    candidate set is counted in pass 2. Raises if the candidate set
    exceeds CANDIDATE_CAP (counters too small for the distribution).
    """
    # pass 1: per-block MG summaries (narrow — pin for the two consumers)
    part = ds.map_batches(
        _mg_partial(col, counters, tokenize),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    E = int(part.sum("err") or 0)
    def drop_null(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column("token")))

    lb_ds = (
        part.map_batches(drop_null, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("lb", alias_name="lb_total"))
    )
    # T = k-th largest lower bound (k scalars to the driver — tiny).
    # Fewer than k survivors means the k-th lower bound is effectively 0.
    top = lb_ds.sort("lb_total", descending=True).limit(k).take_all()
    T = min(r["lb_total"] for r in top) if len(top) >= k else 0
    if E > 0 and T <= E:
        # Tokens absent from EVERY block summary have lb_total = 0 but
        # true frequency up to E; when T <= E such a token could still
        # belong to the true top-k, and it is not in lb_ds to be
        # recovered — pruning would be silently unsound. Fail loud,
        # same contract as the CANDIDATE_CAP below.
        raise RuntimeError(
            f"topk_exact_2pass: k-th lower bound T={T} does not exceed "
            f"total summary error E={E}; a token dropped from every "
            f"block summary (frequency <= E) could still reach the "
            f"top-k — raise `counters` (= {counters}) for this "
            f"distribution"
        )
    if not top:
        # reachable only with E == 0: lb_ds is the exact histogram and
        # it is empty, i.e. the corpus has no tokens at all
        return rd.from_arrow(
            pa.table({"token": pa.array([], pa.string()), "cnt": pa.array([], pa.int64())})
        )
    # candidates: everything that could still reach T given total error E
    cand_ds = lb_ds.filter(expr=f"lb_total >= {T - E}")
    n_cand = cand_ds.count()
    if n_cand > CANDIDATE_CAP:
        raise RuntimeError(
            f"top-k candidate set {n_cand} exceeds cap {CANDIDATE_CAP}; "
            f"raise `counters` (= {counters}) for this distribution"
        )
    cand = pa.concat_tables(
        list(cand_ds.iter_batches(batch_size=CANDIDATE_CAP, batch_format="pyarrow"))
    ).column("token")
    if isinstance(cand, pa.ChunkedArray):
        cand = cand.combine_chunks()
    import ray

    cref = ray.put(cand)

    # pass 2: exact counts of the candidate set only
    def exact_partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        if tokenize:
            arr, _ = _tokenize(arr)
        m = pc.is_in(arr, value_set=ray.get(cref))
        arr = arr.filter(m)
        if len(arr) == 0:
            return pa.table(
                {"token": pa.array([], pa.string()), "partial": pa.array([], pa.int64())}
            )
        vc = pc.value_counts(arr)
        return pa.table(
            {
                "token": vc.field("values"),
                "partial": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    agg = (
        ds.map_batches(exact_partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("token")
        .aggregate(Sum("partial", alias_name="cnt"))
    )
    return agg.sort(["cnt", "token"], descending=[True, False]).limit(k)


# ---------------------------------------------------------------- HLL


def _clz64(x: np.ndarray) -> np.ndarray:
    """Vectorized count-leading-zeros for uint64 (exact — no float log)."""
    x = x.copy()
    r = np.zeros(x.shape, np.uint64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x < (np.uint64(1) << np.uint64(64 - s))
        r[m] += np.uint64(s)
        x[m] <<= np.uint64(s)
    r[r == np.uint64(63)] = np.where(
        x[r == np.uint64(63)] == 0, np.uint64(64), np.uint64(63)
    )
    return r


def hll_registers(ds: Dataset, col: str, p: int = 14, seed: int = 0) -> np.ndarray:
    """Fold a Dataset column into 2^p HLL registers.

    Per block: hash (xxh64), top p bits route to a register, rho =
    leading-zero count of the remaining 64−p bits + 1, registers take
    the max. Each block emits ONE (2^p)-byte row; the driver fold
    streams those rows (16 KiB each at p=14).
    """
    m = 1 << p

    def partial(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        reg = np.zeros(m, np.uint8)
        if len(arr):
            h = xxh64_arrow(arr, seed=seed).view(np.uint64)
            idx = (h >> np.uint64(64 - p)).astype(np.int64)
            w = h << np.uint64(p)
            rho = np.minimum(_clz64(w), np.uint64(64 - p)).astype(np.uint8) + np.uint8(1)
            np.maximum.at(reg, idx, rho)
        return pa.table({"regs": pa.array([reg.tobytes()], pa.binary())})

    reg = np.zeros(m, np.uint8)
    for b in ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).iter_batches(batch_size=256, batch_format="pyarrow"):
        for blob in b.column("regs"):
            np.maximum(reg, np.frombuffer(blob.as_py(), np.uint8), out=reg)
    return reg


def hll_estimate(reg: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction; 64-bit hash → no large-range correction needed."""
    m = len(reg)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    if est <= 2.5 * m:
        v = int(np.count_nonzero(reg == 0))
        if v:
            est = m * np.log(m / v)
    return float(est)


def hll_distinct(ds: Dataset, col: str, p: int = 14, seed: int = 0) -> float:
    """Approximate COUNT(DISTINCT col) — one streaming pass, no shuffle."""
    return hll_estimate(hll_registers(ds, col, p=p, seed=seed))


def distinct_count_exact(ds: Dataset, col: str) -> int:
    """Exact distinct count: per-block unique → one distinct-key groupby.

    Shuffles only the distinct values — the verifier twin for
    ``hll_distinct`` at gate scale (at 10^10+ cardinality use the HLL)."""

    def u(batch: pa.Table) -> pa.Table:
        arr = batch.column(col)
        if isinstance(arr, pa.ChunkedArray):
            arr = arr.combine_chunks()
        return pa.table({col: arr.unique()})

    return (
        ds.map_batches(u, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(col)
        .count()
        .count()
    )


# hard cap on the collected histogram: a column whose distinct-VALUE
# cardinality exceeds this isn't histogram-shaped (use a sampling
# sketch instead) — fail loud, never silently truncate the histogram
QUANTILE_VALUE_CAP = 1 << 20


def exact_quantiles_hist(
    ds: Dataset, col: str, pcts: list[int], value_cap: int = QUANTILE_VALUE_CAP
) -> pa.Table:
    """EXACT percentiles of an integer column via a mergeable value
    histogram — the distributed quantile for columns whose distinct
    VALUE cardinality is bounded (doc lengths, token counts, cluster
    sizes: ≤ max-value distinct values no matter how many rows).

    Pass 1 reduces each block to exact ``(val, cnt)`` rows; the only
    shuffle is a groupby over distinct VALUES, and only the merged
    histogram (≤ ``value_cap`` rows, loud error past it) ever reaches
    the driver — rows themselves never move, so a 10^12-row length
    distribution shuffles a few MiB. Quantile definition is the lower
    nearest rank: value at 0-based sorted index ``pct*(n-1)//100``
    (matches the oracle SQL's row_number() formulation verbatim).

    → Arrow table (pct:int64, value:int64) sorted by pct.
    Generalizes the reference's size-keyed statistics (≅
    process_matches.rs:100,224 group-by-size) to full distribution
    summaries that never sort the corpus.
    """

    def local_hist(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False)
        vals, cnts = np.unique(v, return_counts=True)
        return pa.table(
            {"val": pa.array(vals.astype(np.int64)),
             "cnt": pa.array(cnts.astype(np.int64))}
        )

    from .exchange import collect_table

    merged = (
        ds.map_batches(local_hist, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("val")
        .aggregate(Sum("cnt", alias_name="cnt"))
    )
    t = collect_table(merged, limit_rows=value_cap + 1)
    empty = pa.table(
        {"pct": pa.array([], pa.int64()), "value": pa.array([], pa.int64())}
    )
    if len(t) == 0:
        return empty
    if len(t) > value_cap:
        raise ValueError(
            f"exact_quantiles_hist: >{value_cap} distinct values in {col!r}; "
            "this column is not histogram-shaped — raise value_cap or use a "
            "sampling-based quantile sketch"
        )
    vals = t.column("val").to_numpy(zero_copy_only=False)
    cnts = t.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(vals)
    vals, cum = vals[order], np.cumsum(cnts[order])
    n = int(cum[-1])
    ranks = [(p * (n - 1)) // 100 for p in pcts]
    idx = np.searchsorted(cum, ranks, side="right")
    return pa.table(
        {"pct": pa.array(list(pcts), pa.int64()),
         "value": pa.array(vals[idx], pa.int64())}
    )
