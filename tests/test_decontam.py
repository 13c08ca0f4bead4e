"""Benchmark n-gram decontamination (dedup/decontam.py)."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from dedup.decontam import _gram_hashes, benchmark_grams, decontaminate


def _ds(texts, ids=None):
    ids = ids if ids is not None else list(range(len(texts)))
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})
    )


BENCH = "the quick brown fox jumps over the lazy dog today"


def test_gram_count_per_doc():
    # 10 tokens, n=8 → 3 windows; fewer than n tokens → 0 windows
    h, d = _gram_hashes(pa.array([BENCH, "only three tokens", ""]), 8)
    assert len(h) == 3
    assert d.tolist() == [0, 0, 0]


def test_gram_hashing_is_position_independent():
    # same token window embedded at different positions hashes identically
    h1, _ = _gram_hashes(pa.array(["aa bb cc dd ee ff gg hh"]), 8)
    h2, _ = _gram_hashes(pa.array(["zz aa bb cc dd ee ff gg hh"]), 8)
    assert h1[0] in h2


def test_tokenization_matches_shared_definition():
    # punctuation and case fold away exactly like textstats tokens
    a, _ = _gram_hashes(pa.array(["The, QUICK... brown FOX: jumps over the lazy"]), 8)
    b, _ = _gram_hashes(pa.array(["the quick brown fox jumps over the lazy"]), 8)
    assert a.tolist() == b.tolist()


def test_decontaminate_flags_overlap_only():
    corpus = _ds(
        [
            BENCH,  # the benchmark doc itself
            "totally unrelated content with many distinct words in this row",
            "prefix noise " + BENCH + " suffix words",  # contains bench grams
            "the quick brown fox jumps over a lazy dog today",  # 'a' breaks all 8-grams? no: differs mid-window
        ]
    )
    bench = _ds([BENCH])
    bh = benchmark_grams(bench, n=8)
    assert len(bh) == 3
    out = pa.concat_tables(
        list(
            decontaminate(corpus, bh, n=8).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    ).sort_by("doc_id")
    df = out.to_pandas().set_index("doc_id")
    assert bool(df.loc[0, "contaminated"]) and df.loc[0, "n_bench_grams"] == 3
    assert not bool(df.loc[1, "contaminated"])
    assert bool(df.loc[2, "contaminated"]) and df.loc[2, "n_bench_grams"] == 3
    # doc 3 shares no full 8-token window ('over a lazy' != 'over the lazy')
    assert not bool(df.loc[3, "contaminated"])


def test_distinct_gram_counting():
    # a doc repeating one bench gram twice counts it once
    corpus = _ds(["x " + BENCH + " y " + BENCH])
    bh = benchmark_grams(_ds([BENCH]), n=8)
    out = pa.concat_tables(
        list(
            decontaminate(corpus, bh, n=8).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    assert out.column("n_bench_grams").to_pylist() == [3]


def test_empty_bench_set():
    corpus = _ds([BENCH, "other words"])
    out = pa.concat_tables(
        list(
            decontaminate(corpus, np.empty(0, np.uint64), n=8).iter_batches(
                batch_size=1 << 20, batch_format="pyarrow"
            )
        )
    )
    assert out.column("contaminated").to_pylist() == [False, False]
