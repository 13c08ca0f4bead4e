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


# ------------------------------------------------------- pack_sequences
def _pack_ref(ids, texts, capacity):
    from dedup.textstats import _tokenize as tk

    counts = tk(pa.array(texts))[1]
    order = np.argsort(ids)
    off = np.zeros(len(ids), np.int64)
    run = 0
    for i in order:
        off[i] = run
        run += int(counts[i])
    return counts, off // capacity, off % capacity


def test_pack_sequences_matches_reference():
    from dedup.chunking import pack_sequences

    rng = np.random.default_rng(5)
    # non-contiguous, shuffled ids — order is by id value, not row order
    ids = rng.permutation(np.arange(0, 900, 7, dtype=np.int64))
    texts = [" ".join(f"w{j}" for j in range(rng.integers(0, 40))) for _ in ids]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}))
    out = (
        pack_sequences(ds, capacity=64, n_buckets=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    counts, seq_id, seq_off = _pack_ref(ids, texts, 64)
    o = np.argsort(ids)
    assert out["doc_id"].tolist() == ids[o].tolist()
    assert out["n_tokens"].tolist() == counts[o].tolist()
    assert out["seq_id"].tolist() == seq_id[o].tolist()
    assert out["seq_offset"].tolist() == seq_off[o].tolist()


def test_pack_sequences_capacity_one_and_empty():
    from dedup.chunking import pack_sequences

    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([3, 1], pa.int64()),
                  "text": pa.array(["a b", "c"])})
    )
    out = pack_sequences(ds, capacity=1).to_pandas().sort_values("doc_id")
    # doc 1 (1 token) → offset 0; doc 3 (2 tokens) → offset 1
    assert out["seq_id"].tolist() == [0, 1]
    assert out["seq_offset"].tolist() == [0, 0]
    empty = rd.from_arrow(
        pa.table({"doc_id": pa.array([], pa.int64()), "text": pa.array([], pa.string())})
    )
    eds = pack_sequences(empty, capacity=8)
    # to_pandas() drops columns on 0-row datasets (Ray quirk) — check
    # the Dataset-level schema instead
    assert eds.schema().names == ["doc_id", "n_tokens", "seq_id", "seq_offset"]
    assert eds.count() == 0
    with pytest.raises(ValueError):
        pack_sequences(ds, capacity=0)


def test_pack_sequences_full_range_int64_ids():
    """Hash-derived ids spanning nearly the whole int64 range must not
    overflow the bucket formula (regression: (id-lo)*nb//span wrapped)."""
    from dedup.chunking import pack_sequences

    rng = np.random.default_rng(11)
    ids = np.concatenate([
        np.array([-(2**62), -(2**61), -1, 0, 1, 2**61, 2**62], np.int64),
        rng.integers(-(2**62), 2**62, 25, dtype=np.int64),
    ])
    ids = np.unique(ids)
    texts = [" ".join(f"w{j}" for j in range(rng.integers(1, 20))) for _ in ids]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}))
    out = (
        pack_sequences(ds, capacity=16, n_buckets=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    counts, seq_id, seq_off = _pack_ref(ids, texts, 16)
    o = np.argsort(ids)
    assert out["doc_id"].tolist() == ids[o].tolist()
    assert out["seq_id"].tolist() == seq_id[o].tolist()
    assert out["seq_offset"].tolist() == seq_off[o].tolist()


def test_pack_sequences_degenerate_shift_n_buckets_one():
    """n_buckets=1 with ids spanning >= 2^63 sizes the range-bucket shift
    to 64-65 — numpy uint64 >> 64 is C-undefined, so the implementation
    must special-case the all-zero-bucket path (ADVICE r4)."""
    from dedup.chunking import pack_sequences

    ids = np.array(
        [-(2**63), -(2**61), -7, 0, 3, 2**61, 2**63 - 1], np.int64
    )
    texts = [" ".join(f"w{j}" for j in range(3 + i)) for i in range(len(ids))]
    ds = rd.from_arrow(pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)}))
    out = (
        pack_sequences(ds, capacity=8, n_buckets=1)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    counts, seq_id, seq_off = _pack_ref(ids, texts, 8)
    o = np.argsort(ids)
    assert out["doc_id"].tolist() == ids[o].tolist()
    assert out["seq_id"].tolist() == seq_id[o].tolist()
    assert out["seq_offset"].tolist() == seq_off[o].tolist()
