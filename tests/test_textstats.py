"""Text-analysis operator tests (token counts, lang-ID, quality,
frequencies) — semantics pinned against hand-computed values."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dedup.textstats import (
    LANGS,
    TextStatser,
    _tokenize,
    text_stats,
    token_frequencies,
)


def _ds(rows):
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(rows))), pa.int64()),
                "text": pa.array(rows, pa.string()),
            }
        )
    )


def test_tokenize_basic():
    flat, counts = _tokenize(pa.array(["Hello, World! foo_bar", "", "  a  b "]))
    assert counts.tolist() == [3, 0, 2]
    assert flat.to_pylist() == ["hello", "world", "foo_bar", "a", "b"]


def test_stats_counts():
    out = text_stats(_ds(["one two three four five six", "a a a a a", "", "x"])).to_pandas()
    out = out.sort_values("doc_id")
    assert out["n_tokens"].tolist() == [6, 5, 0, 1]
    # k=5 shingles: 6 tokens → 2; 5 → 1; 0 → 0; 1 (<k) → 1 (fallback)
    assert out["n_shingles"].tolist() == [2, 1, 0, 1]
    assert out["n_distinct_tokens"].tolist() == [6, 1, 0, 1]
    assert out["n_bytes"].tolist() == [27, 9, 0, 1]


def test_langid_and_quality():
    en = "the cat is in the hat and the dog is of it " * 3  # stopword-rich EN
    de = "der hund und die katze ist ein tier mit fell " * 3
    none = "zzz qqq www"
    out = text_stats(_ds([en, de, none])).to_pandas().sort_values("doc_id")
    assert out["pred_lang"].tolist()[:2] == ["en", "de"]
    assert out["pred_lang"].tolist()[2] == "unknown"
    assert out["is_quality"].tolist() == [1, 1, 0]


def test_langid_tiebreak_alphabetical():
    # 'es' list contains 'en' and 'de' words? construct exact tie: one
    # stopword from each of two langs → first alphabetical wins
    t = "und le"  # und→de(1), le→fr(1), tie → 'de'
    out = text_stats(_ds([t])).to_pandas()
    assert out["n_stop_de"][0] == 1 and out["n_stop_fr"][0] == 1
    assert out["pred_lang"][0] == "de"


def test_token_frequencies_topk():
    ds = _ds(["a b a", "b a c", "d"])
    out = token_frequencies(ds, top_k=3).to_pandas()
    assert out["token"].tolist() == ["a", "b", "c"]  # counts 3,2,1 (c<d tie? no: c=1,d=1 → token asc)
    assert out["cnt"].tolist() == [3, 2, 1]


def test_tokenize_fast_path_matches_regex():
    """The byte-scan fast path must agree with the definitional regex
    tokenizer (the DuckDB-mirrored form) on everything it accepts, and
    non-ASCII batches must take the regex fallback (Unicode folding)."""
    from dedup.textstats import _tokenize_regex

    cases = [
        pa.array(["abc def", "", None, "  x ", "a_b9", "!!!", "end", "start"]),
        pa.array([], pa.string()),
        pa.array([None, None], pa.string()),
        pa.array(["aXbC", "ABC def_GHI", "1a2B3c"]),
        pa.array(["tail", "head"]),  # abutting token bytes across docs
        pa.array(["héllo wörld", "ascii part"]),  # fallback branch
        pa.array(["Kelvin"]),  # KELVIN SIGN lowers to 'k' — regex only
        pa.chunked_array([["a b"], ["c d", "e"]]),
        pa.array(["one two", "three!four", "Ümlaut"]).slice(1, 2),
        pa.array(["large offsets"] * 3).cast(pa.large_string()),
    ]
    for c in cases:
        f1, c1 = _tokenize_regex(c)
        f2, c2 = _tokenize(c)
        assert np.array_equal(np.asarray(c1), np.asarray(c2)), c
        assert f1.cast(pa.string()).equals(f2.cast(pa.string())), c


def test_tokenize_fast_path_random_ascii():
    import random

    rng = random.Random(7)
    alphabet = " \t\n.,;!?-_abcXYZ019#"
    docs = [
        "".join(rng.choice(alphabet) for _ in range(rng.randrange(0, 60)))
        for _ in range(200)
    ]
    from dedup.textstats import _tokenize_regex

    f1, c1 = _tokenize_regex(pa.array(docs))
    f2, c2 = _tokenize(pa.array(docs))
    assert np.array_equal(np.asarray(c1), np.asarray(c2))
    assert f1.equals(f2)


def test_tokenize_fast_path_property():
    """Property: fast path ≡ regex path on arbitrary text batches —
    mixed ASCII/Unicode, empties, nulls, any boundary shape."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from dedup.textstats import _tokenize_regex

    doc = st.text(
        alphabet=st.characters(min_codepoint=1, max_codepoint=0x2FF),
        max_size=40,
    )
    batch = st.lists(st.one_of(st.none(), doc), min_size=0, max_size=12)

    @settings(max_examples=150, deadline=None)
    @given(batch)
    def check(docs):
        arr = pa.array(docs, pa.string())
        f1, c1 = _tokenize_regex(arr)
        f2, c2 = _tokenize(arr)
        assert np.array_equal(np.asarray(c1), np.asarray(c2))
        assert f1.cast(pa.string()).equals(f2.cast(pa.string()))

    check()
