"""Context-window chunking: coverage, overlap, edge docs, vectorized ≡ naive."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dedup.chunking import chunk_documents


def _docs(texts):
    return rd.from_arrow(
        pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    )


def _naive(texts, window, stride):
    """Reference: python loop over docs, same tokenizer semantics."""
    import re

    out = []
    for did, t in enumerate(texts):
        toks = [x for x in re.split(r"[^a-z0-9_]+", t.lower()) if x]
        c = 0
        while c * stride < len(toks):
            piece = toks[c * stride : c * stride + window]
            out.append((did, c, len(piece), " ".join(piece)))
            c += 1
    return out


@pytest.mark.parametrize("window,stride", [(4, 4), (8, 5), (3, 1)])
def test_matches_naive_reference(window, stride):
    rng = np.random.default_rng(5)
    words = ["alpha", "beta", "gamma", "delta", "x9", "under_score"]
    texts = [
        " ".join(rng.choice(words, size=int(n)).tolist())
        for n in rng.integers(1, 30, size=20)
    ] + ["", "   ", "!!!", "one"]
    got = sorted(
        chunk_documents(_docs(texts), window, stride)
        .to_pandas()
        .itertuples(index=False, name=None)
    )
    assert got == sorted(_naive(texts, window, stride))


def test_every_token_covered_and_overlap():
    text = " ".join(f"t{i}" for i in range(10))
    df = chunk_documents(_docs([text]), window=4, stride=3).to_pandas()
    assert df["chunk_id"].tolist() == [0, 1, 2, 3]
    chunks = df["chunk_text"].tolist()
    assert chunks[0] == "t0 t1 t2 t3"
    assert chunks[1] == "t3 t4 t5 t6"  # 1-token overlap (window - stride)
    assert chunks[3] == "t9"  # final partial chunk clamped
    covered = {t for c in chunks for t in c.split()}
    assert covered == {f"t{i}" for i in range(10)}


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        chunk_documents(_docs(["a"]), window=4, stride=5)
    with pytest.raises(ValueError):
        chunk_documents(_docs(["a"]), window=0)
