"""MinHash/shingling unit tests: determinism, Jaccard estimation."""

import numpy as np
import pyarrow as pa

from dedup.config import DedupConfig
from dedup.minhash import MinHashSigner, SENTINEL, _token_lists, shingle_hashes


def _signer(**kw):
    return MinHashSigner(DedupConfig(**kw))


def test_tokenization_counts():
    th, counts = _token_lists(pa.array(["a b c", "", "  x  ", "Hello, World!"]))
    assert counts.tolist() == [3, 0, 1, 2]
    assert len(th) == 6


def test_token_case_insensitive():
    s = _signer()
    sig1, _ = s.signatures(pa.array(["Hello World Foo Bar Baz Qux"]))
    sig2, _ = s.signatures(pa.array(["hello world foo bar baz qux"]))
    assert np.array_equal(sig1, sig2)


def test_shingle_positions():
    # 2 docs: 6 tokens (2 shingles at k=5), 3 tokens (1 fallback shingle)
    th = np.arange(9, dtype=np.uint64)
    counts = np.array([6, 3])
    sh, n_sh = shingle_hashes(th, counts, 5)
    assert n_sh.tolist() == [2, 1]
    assert len(sh) == 3
    assert len(set(sh.tolist())) == 3


def test_signature_determinism_across_instances():
    texts = pa.array(["the quick brown fox jumps over the lazy dog " * 5])
    a, _ = _signer().signatures(texts)
    b, _ = _signer().signatures(texts)
    assert np.array_equal(a, b)


def test_identical_texts_identical_signatures():
    t = "alpha beta gamma delta epsilon zeta eta theta " * 10
    sig, n = _signer().signatures(pa.array([t, t, "something else entirely here now"]))
    assert np.array_equal(sig[0], sig[1])
    assert not np.array_equal(sig[0], sig[2])


def test_empty_text_sentinel():
    sig, n_sh = _signer().signatures(pa.array(["", "   ", "real text with words here"]))
    assert n_sh[0] == 0 and n_sh[1] == 0 and n_sh[2] > 0
    assert (sig[0] == SENTINEL).all() and (sig[1] == SENTINEL).all()


def test_jaccard_estimate_accuracy():
    rng = np.random.default_rng(0)
    vocab = [f"w{i}" for i in range(2000)]
    base = [vocab[i] for i in rng.integers(0, 2000, size=600)]
    # ~2% token substitutions
    var = list(base)
    for p in rng.choice(len(var), size=12, replace=False):
        var[p] = vocab[int(rng.integers(0, 2000))]
    s = _signer()
    sig, _ = s.signatures(pa.array([" ".join(base), " ".join(var)]))
    est = (sig[0] == sig[1]).mean()

    # true 5-gram shingle Jaccard
    def sh(toks):
        return {tuple(toks[i : i + 5]) for i in range(len(toks) - 4)}

    A, B = sh(base), sh(var)
    true_j = len(A & B) / len(A | B)
    assert abs(est - true_j) < 0.12  # 128 perms → σ ≈ 0.044
    assert est > 0.6  # clearly above verify threshold


def test_disjoint_texts_low_estimate():
    rng = np.random.default_rng(1)
    va = " ".join(f"aa{i}" for i in rng.integers(0, 1000, size=400))
    vb = " ".join(f"bb{i}" for i in rng.integers(0, 1000, size=400))
    s = _signer()
    sig, _ = s.signatures(pa.array([va, vb]))
    assert (sig[0] == sig[1]).mean() < 0.1


def test_token_lists_fast_path_matches_regex():
    """ASCII batches must produce bit-identical token hashes through the
    byte-scan path and the definitional \\W+ regex path (signature
    stability: the fast path must never change signatures)."""
    import pyarrow.compute as pc

    from dedup.minhash import _hash_tokens, _token_lists
    from dedup.hashing import U64

    docs = pa.array(
        ["Hello, World! foo_bar", "", "  a  b ", "a_b9 X", "tail", "head"]
    )
    th_fast, c_fast = _token_lists(docs)
    # force the regex path by the definitional computation
    lowered = pc.utf8_lower(docs)
    toks = pc.split_pattern_regex(lowered, r"\W+")
    flat = toks.flatten()
    lens = pc.binary_length(flat).to_numpy(zero_copy_only=False)
    flat = flat.filter(pa.array(lens > 0))
    th_re = _hash_tokens(flat, "polars-xxh64")
    assert np.array_equal(th_fast, th_re)
    offsets = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    cs = np.concatenate([[0], np.cumsum(lens > 0, dtype=np.int64)])
    assert np.array_equal(c_fast, cs[offsets[1:]] - cs[offsets[:-1]])
    # non-ASCII falls back to \W+: ü is a word char there, not a split
    th_u, c_u = _token_lists(pa.array(["über maß", "ok"]))
    assert c_u.tolist() == [2, 1] and len(th_u) == 3
