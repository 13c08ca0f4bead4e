"""Gopher-style repetition stats — pinned against hand-computed values
and a brute-force Python recount (Rae et al. 2021 table-A1 heuristics)."""

from collections import Counter

import pyarrow as pa
import ray.data as rd

from dedup.repetition import repetition_stats
from dedup.textstats import _tokenize


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(rows))), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def _brute(text):
    toks = _tokenize(pa.array([text]))[0].to_pylist()
    out = {}
    for n, tag in ((1, "token"), (2, "2gram"), (3, "3gram")):
        grams = [tuple(toks[i : i + n]) for i in range(len(toks) - n + 1)]
        c = Counter(grams)
        key = "n_tokens" if n == 1 else f"n_{tag}s"
        out[key] = len(grams)
        out[f"n_distinct_{tag}s"] = len(c)
        out[f"top_{tag}_cnt"] = max(c.values()) if c else 0
    out["n_distinct_tokens"] = out.pop("n_distinct_tokens")
    return out


def test_hand_computed():
    # "a a a b" → 4 tokens, 2 distinct, top=3; 2grams: aa,aa,ab → 3/2/2
    out = repetition_stats(_ds(["a a a b"])).to_pandas().iloc[0]
    assert out["n_tokens"] == 4
    assert out["n_distinct_tokens"] == 2
    assert out["top_token_cnt"] == 3
    assert out["n_2grams"] == 3
    assert out["n_distinct_2grams"] == 2
    assert out["top_2gram_cnt"] == 2
    assert out["n_3grams"] == 2
    assert out["n_distinct_3grams"] == 2
    # top token 3/4 = 75% > 30% → repetitive
    assert out["is_repetitive"] == 1


def test_matches_bruteforce():
    rows = [
        "the quick brown fox jumps over the lazy dog near the brown fox",
        "spam spam spam spam buy now spam spam",
        "one two three four five six seven eight nine ten",
        "",
        "x",
        "ab ab",
    ]
    got = repetition_stats(_ds(rows)).to_pandas().sort_values("doc_id")
    for i, text in enumerate(rows):
        exp = _brute(text)
        row = got.iloc[i]
        for k, v in exp.items():
            assert row[k] == v, (i, k, row[k], v)


def test_gate_boundaries():
    clean = " ".join(f"w{i}" for i in range(100))  # all distinct
    dup2g = "a b " * 50  # massive duplicate 2-gram mass
    got = repetition_stats(_ds([clean, dup2g])).to_pandas().sort_values("doc_id")
    assert got["is_repetitive"].tolist() == [0, 1]


def test_batch_split_invariance():
    rows = [f"tok{i % 7} tok{i % 3} filler{i} " * (i % 5 + 1) for i in range(40)]
    one = repetition_stats(_ds(rows)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    many = (
        repetition_stats(_ds(rows).repartition(8))
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert one.equals(many)
