"""Deterministic source mixing: exact rates semantics, reproducibility."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dedup.mixing import KNUTH, _MOD, mix_sources, thresholds_from_rates


def _docs(n=1000, sources=("a", "b", "c")):
    ids = np.arange(n, dtype=np.int64)
    src = [sources[i % len(sources)] for i in range(n)]
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(ids), "source": pa.array(src)})
    )


def test_exact_coin_semantics():
    rates = {"a": 0.25, "b": 1.0, "c": 0.0}
    out = mix_sources(_docs(), rates).to_pandas()
    thr = thresholds_from_rates(rates)
    for _, row in out.iterrows():
        coin = (np.uint64(row.doc_id) * KNUTH) % _MOD
        assert coin < np.uint64(thr[row.source])
    # every surviving-eligible row is present: recompute the full keep set
    ids = np.arange(1000, dtype=np.uint64)
    coin = (ids * KNUTH) % _MOD
    srcs = np.array([("a", "b", "c")[i % 3] for i in range(1000)])
    cut = np.array([thr[s] for s in srcs], np.uint64)
    assert sorted(out.doc_id) == sorted(ids[coin < cut].tolist())
    assert set(out.source) == {"a", "b"}  # rate-0 source fully dropped
    assert (out.source == "b").sum() == (srcs == "b").sum()  # rate-1 keeps all


def test_default_rate_and_reproducibility():
    out1 = mix_sources(_docs(), {"a": 0.5}, default_rate=0.1).to_pandas()
    out2 = mix_sources(_docs(), {"a": 0.5}, default_rate=0.1).to_pandas()
    assert sorted(out1.doc_id) == sorted(out2.doc_id)
    n_b = (out1.source == "b").sum()
    assert 0 < n_b < 334 * 0.3  # ~10% of b's 334 rows

def test_rate_validation():
    with pytest.raises(ValueError):
        thresholds_from_rates({"a": 1.5})


def test_chunking_id_col_generalizes():
    from dedup.chunking import chunk_documents

    ds = rd.from_arrow(
        pa.table({"url": pa.array(["u://1", "u://2"]),
                  "text": pa.array(["a b c d e", "f g"])})
    )
    df = chunk_documents(ds, window=3, stride=2, id_col="url").to_pandas()
    assert set(df.columns) == {"url", "chunk_id", "n_tokens", "chunk_text"}
    assert df[df.url == "u://1"].chunk_text.tolist() == ["a b c", "c d e", "e"]
