"""Sketch operators: Misra–Gries 2-pass exact top-k + HyperLogLog."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dedup.sketches import (
    _clz64,
    distinct_count_exact,
    hll_distinct,
    hll_estimate,
    hll_registers,
    topk_exact_2pass,
)
from dedup.textstats import token_frequencies


def _zipf_ds(n_docs=1500, n_words=1500, seed=0, parts=12):
    rng = np.random.default_rng(seed)
    words = [f"w{i}" for i in range(n_words)]
    probs = np.array([1.0 / (i + 1) ** 1.2 for i in range(n_words)])
    probs /= probs.sum()
    docs = [" ".join(rng.choice(words, size=40, p=probs)) for _ in range(n_docs)]
    return rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(parts)


def test_clz64_exact():
    rng = np.random.default_rng(1)
    xs = rng.integers(0, 2**63, 2000, dtype=np.uint64)
    xs[:4] = [0, 1, 2**63, 2**32]
    ref = np.array([64 - len(bin(int(v))[2:]) if v else 64 for v in xs], np.uint64)
    assert (_clz64(xs) == ref).all()


def test_topk_sketch_equals_full_shuffle():
    # counters=48 ≪ 1500 distinct words → every block truncates; the
    # 2-pass result must still be bit-identical to the exact groupby
    ds = _zipf_ds()
    exact = token_frequencies(ds, top_k=20).to_pandas().reset_index(drop=True)
    sk = (
        topk_exact_2pass(ds, col="text", k=20, counters=48)
        .to_pandas()
        .reset_index(drop=True)
    )
    assert exact.equals(sk)


def test_topk_candidate_cap_raises_loud(monkeypatch):
    import dedup.sketches as S

    monkeypatch.setattr(S, "CANDIDATE_CAP", 5)
    # counters=48 keeps T > E (the sound-prune regime — same config the
    # exactness test uses) so the failure exercised is the cap, not the
    # T<=E unsound-prune guard
    with pytest.raises(RuntimeError, match="candidate set"):
        topk_exact_2pass(_zipf_ds(n_docs=300), col="text", k=20, counters=48)


def test_topk_unsound_prune_raises_loud():
    # flat distribution: every token appears once, far more distinct
    # tokens per block than counters → every block's summary drops
    # everything (lb=0), so NO token survives pass 1 while the true
    # top-k is non-empty. The old code silently returned an empty (or
    # wrong) result; the T<=E guard must refuse instead.
    docs = [f"u{i}" for i in range(400)]
    ds = rd.from_arrow(pa.table({"text": pa.array(docs)})).repartition(8)
    with pytest.raises(RuntimeError, match="does not exceed"):
        topk_exact_2pass(ds, col="text", k=20, counters=8)


def test_topk_empty_corpus_is_empty_not_error():
    ds = rd.from_arrow(pa.table({"text": pa.array([], pa.string())}))
    out = topk_exact_2pass(ds, col="text", k=5, counters=16)
    assert out.count() == 0


def test_hll_batch_split_invariant_and_mergeable():
    vals = pa.table({"v": pa.array([f"item-{i}" for i in range(20000)])})
    r1 = hll_registers(rd.from_arrow(vals).repartition(2), "v", p=11)
    r2 = hll_registers(rd.from_arrow(vals).repartition(17), "v", p=11)
    assert (r1 == r2).all()
    # merge = elementwise max of part registers
    a = hll_registers(rd.from_arrow(vals.slice(0, 8000)), "v", p=11)
    b = hll_registers(rd.from_arrow(vals.slice(8000)), "v", p=11)
    assert (np.maximum(a, b) == r1).all()


def test_hll_accuracy_and_exact_twin():
    for n in (100, 5000, 60000):
        t = pa.table({"v": pa.array([f"x{i}" for i in range(n)] * 3)})
        ds = rd.from_arrow(t).repartition(8)
        est = hll_distinct(ds, "v", p=13)
        assert abs(est - n) / n < 0.05, (n, est)
        assert distinct_count_exact(ds, "v") == n


def test_hll_empty():
    ds = rd.from_arrow(pa.table({"v": pa.array([], pa.string())}))
    assert hll_estimate(hll_registers(ds, "v", p=10)) == 0.0


def _int_ds(vals, parts=8):
    return rd.from_arrow(
        pa.table({"x": pa.array(np.asarray(vals, np.int64))})
    ).repartition(parts)


def _nearest_rank(vals, pcts):
    s = np.sort(np.asarray(vals, np.int64))
    return [int(s[(p * (len(s) - 1)) // 100]) for p in pcts]


def test_exact_quantiles_matches_nearest_rank():
    from dedup.sketches import exact_quantiles_hist

    rng = np.random.default_rng(7)
    # heavy duplication (lognormal-ish lengths) + a few outliers
    vals = np.concatenate(
        [rng.integers(50, 400, 5000), rng.integers(5000, 6000, 17)]
    )
    pcts = [0, 25, 50, 75, 90, 99, 100]
    t = exact_quantiles_hist(_int_ds(vals), "x", pcts)
    assert t.column("pct").to_pylist() == pcts
    assert t.column("value").to_pylist() == _nearest_rank(vals, pcts)


def test_exact_quantiles_block_split_invariant():
    from dedup.sketches import exact_quantiles_hist

    rng = np.random.default_rng(8)
    vals = rng.integers(0, 90, 999)
    a = exact_quantiles_hist(_int_ds(vals, parts=1), "x", [50, 90])
    b = exact_quantiles_hist(_int_ds(vals, parts=13), "x", [50, 90])
    assert a.equals(b)


def test_exact_quantiles_loud_cap_and_empty():
    from dedup.sketches import exact_quantiles_hist

    with pytest.raises(ValueError, match="not histogram-shaped"):
        exact_quantiles_hist(_int_ds(np.arange(500)), "x", [50], value_cap=100)
    out = exact_quantiles_hist(_int_ds([], parts=1), "x", [50])
    assert len(out) == 0
