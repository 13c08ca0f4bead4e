"""Winnowing fingerprints, LCS span pass, consolidation planning."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from dedup.config import DedupConfig
from dedup.consolidate import consolidation_plan, total_reclaimed
from dedup.fingerprint import fingerprint_rows, fingerprint_stats
from dedup.suffix import lcs_length, long_span_pairs
from dedup.synth import make_pages


def test_lcs_basic():
    assert lcs_length(b"", b"abc") == 0
    assert lcs_length(b"abc", b"abc") == 3
    assert lcs_length(b"xxabcyy", b"zzabcqq") == 3
    assert lcs_length(b"abcd", b"efgh") == 0


def test_lcs_long_shared_run():
    rng = np.random.default_rng(3)
    base = bytes(rng.integers(65, 91, size=500).astype(np.uint8))
    a = b"AAA" + base + b"BBB"
    b = b"CCCC" + base + b"D"
    assert lcs_length(a, b) == 500


def test_winnowing_shared_run_shares_fingerprint():
    base = " ".join(f"w{i}" for i in range(100))
    docs = [base + " tailone extra", "prefix other " + base]
    ds = rd.from_arrow(
        pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": pa.array(docs)})
    )
    rows = fingerprint_rows(ds, k=5, w=4).to_pandas()
    f1 = set(rows[rows.doc_id == 1]["fingerprint"])
    f2 = set(rows[rows.doc_id == 2]["fingerprint"])
    assert f1 & f2  # long shared token run → shared fingerprint
    stats = fingerprint_stats(ds, k=5, w=4).to_pandas().sort_values("doc_id")
    assert (stats["n_fingerprints"] > 0).all()
    # stats and rows agree
    assert stats["n_fingerprints"].tolist() == [len(f1), len(f2)]
    assert stats["min_fingerprint"].tolist() == [min(f1), min(f2)]


def test_winnowing_disjoint_docs_share_nothing():
    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2], pa.int64()),
                "text": pa.array(
                    [" ".join(f"a{i}" for i in range(50)), " ".join(f"b{i}" for i in range(50))]
                ),
            }
        )
    )
    rows = fingerprint_rows(ds).to_pandas()
    f1 = set(rows[rows.doc_id == 1]["fingerprint"])
    f2 = set(rows[rows.doc_id == 2]["fingerprint"])
    assert not (f1 & f2)


def test_long_span_pairs_on_fixture():
    pages_tbl, exp = make_pages(
        n_exact_groups=2, n_near_groups=6, n_singletons=30,
        n_negative_pairs=3, n_short_split_pairs=0,
    )
    out = long_span_pairs(rd.from_arrow(pages_tbl), DedupConfig(), min_span=32)
    df = out.to_pandas()
    # near-dup variants share long verbatim runs → spans found
    assert len(df) > 0
    assert (df["lcs_len"] >= 32).all()


def test_consolidation_plan_exact_groups():
    pages_tbl, exp = make_pages(
        n_exact_groups=6, n_near_groups=0, n_singletons=20,
        n_negative_pairs=0, n_short_split_pairs=0,
    )
    plan = consolidation_plan(rd.from_arrow(pages_tbl), DedupConfig())
    df = plan.to_pandas()
    # every exact group: one keep + (n-1) links to the min url
    for g in exp.exact_groups:
        sub = df[df.url.isin(g)].sort_values("url")
        assert len(sub) == len(g)
        rep = min(g)
        assert (sub["target_url"] == rep).all()
        assert sub[sub.url == rep]["action"].tolist() == ["keep"]
        assert (sub[sub.url != rep]["action"] == "link").all()
        assert (sub[sub.url != rep]["reclaimed_bytes"] > 0).all()
    # singletons never appear
    assert not df.url.isin(exp.singleton_urls).any()
    assert total_reclaimed(plan) == df["reclaimed_bytes"].sum()


def test_consolidation_max_size_policy():
    t = pa.table(
        {
            "url": pa.array(["u/a", "u/b", "u/c"]),
            "warc_ts": pa.array([0, 1, 2], pa.timestamp("us")),
            "html": pa.array([b"x", b"y", b"z"], pa.binary()),
            "text": pa.array(["same same", "same same", "same same"]),
            "lang": pa.array(["en"] * 3),
        }
    )
    plan = consolidation_plan(rd.from_arrow(t), DedupConfig(), policy="max_size").to_pandas()
    # equal sizes → min-url tie-break
    assert (plan["target_url"] == "u/a").all()


def test_winnowing_batch_split_invariant():
    """A doc's fingerprints must not depend on batch composition.

    Regression: the short-doc fallback reduced from each SHORT doc's start
    to the NEXT SHORT doc's start, spanning any long docs between them —
    a 2-shingle doc got a different fingerprint when followed by a long
    doc in the same batch vs alone."""
    short_doc = "alpha beta gamma delta epsilon zeta"  # 6 tokens → 2 shingles (k=5)
    long_doc = " ".join(f"w{i}" for i in range(60))
    t_both = pa.table(
        {"doc_id": pa.array([1, 2], pa.int64()),
         "text": pa.array([short_doc, long_doc])}
    )
    t_alone = pa.table(
        {"doc_id": pa.array([1], pa.int64()), "text": pa.array([short_doc])}
    )
    fp_both = fingerprint_rows(rd.from_arrow(t_both), k=5, w=4).to_pandas()
    fp_alone = fingerprint_rows(rd.from_arrow(t_alone), k=5, w=4).to_pandas()
    got_both = sorted(fp_both[fp_both.doc_id == 1]["fingerprint"])
    got_alone = sorted(fp_alone["fingerprint"])
    assert got_both == got_alone
    # interleaved short/long/short: every doc identical to its solo run
    short2 = "one two three four five six seven"  # 7 tokens → 3 shingles
    t_mix = pa.table(
        {"doc_id": pa.array([1, 2, 3], pa.int64()),
         "text": pa.array([short_doc, long_doc, short2])}
    )
    mix = fingerprint_rows(rd.from_arrow(t_mix), k=5, w=4).to_pandas()
    solo3 = fingerprint_rows(
        rd.from_arrow(pa.table({"doc_id": pa.array([3], pa.int64()),
                                "text": pa.array([short2])})),
        k=5, w=4,
    ).to_pandas()
    assert sorted(mix[mix.doc_id == 3]["fingerprint"]) == sorted(solo3["fingerprint"])


def test_text_fingerprint_stats_matches_bruteforce():
    """String winnowing (lexicographic order) vs a per-doc brute force."""
    from dedup.fingerprint import text_fingerprint_stats
    import re as _re

    docs = [
        " ".join(f"w{i % 7}" for i in range(30)),   # repeats → duplicate shingles
        "one two three",                             # short: single shingle
        "",                                          # empty
        " ".join(f"q{i}" for i in range(12)),
    ]
    k, w = 5, 4
    t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = (
        text_fingerprint_stats(rd.from_arrow(t), k=k, w=w)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    for i, d in enumerate(docs):
        toks = [x for x in _re.split(r"[^a-z0-9_]+", d.lower()) if x]
        if len(toks) >= k:
            sh = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
        elif toks:
            sh = [" ".join(toks)]
        else:
            sh = []
        if len(sh) >= w:
            fps = {min(sh[j : j + w]) for j in range(len(sh) - w + 1)}
        elif sh:
            fps = {min(sh)}
        else:
            fps = set()
        assert got.loc[i, "n_fingerprints"] == len(fps)
        assert got.loc[i, "min_fingerprint"] == (min(fps) if fps else "")


def test_exact_set_mode_splits_near_identical_docs():
    """Exact-set verification must NOT merge high-Jaccard near-dups that
    pass the all-128-slots prefilter, and must merge set-equal docs with
    different raw text (token order/whitespace)."""
    from dedup.config import DedupConfig
    from dedup.pipeline import near_dup_pipeline

    base = [f"tok{i}" for i in range(300)]
    near = base[:-1] + ["changed"]          # Jaccard ≈ 0.98 vs base
    shuffled = base[5:] + base[:5]          # same token set, rotated
    texts = {
        "u/a": " ".join(base),
        "u/b": " ".join(base),              # exact dup of a
        "u/near": " ".join(near),           # near-dup: must NOT join
        "u/rot": " ".join(shuffled),        # different shingle set (rotation
                                            # changes 5-grams): must NOT join
        "u/ws": "  ".join(base) + " ",      # same shingle set, diff text: JOIN
    }
    t = pa.table(
        {
            "url": pa.array(list(texts)),
            "warc_ts": pa.array([0] * len(texts), pa.timestamp("us")),
            "html": pa.array([b""] * len(texts), pa.binary()),
            "text": pa.array(list(texts.values())),
            "lang": pa.array(["en"] * len(texts)),
        }
    )
    cfg = DedupConfig(verify_threshold=1.0, exact_set_verify=True)
    df = near_dup_pipeline(rd.from_arrow(t), cfg).clusters.to_pandas()
    part = {u: cid for u, cid in zip(df["url"], df["cluster_id"])}
    assert part["u/a"] == part["u/b"] == part["u/ws"]
    assert "u/near" not in part or part["u/near"] != part["u/a"]
    assert "u/rot" not in part or part["u/rot"] != part["u/a"]


def test_text_fingerprint_stats_property():
    """Hypothesis: string winnowing matches per-doc brute force for
    arbitrary token corpora (incl. repeats, shorts, empties)."""
    from hypothesis import given, settings, strategies as st
    from dedup.fingerprint import text_fingerprint_stats

    token = st.text(alphabet="ab1_", min_size=1, max_size=3)
    doc = st.lists(token, min_size=0, max_size=30).map(" ".join)

    @settings(max_examples=25, deadline=None)
    @given(st.lists(doc, min_size=1, max_size=8))
    def check(docs):
        k, w = 5, 4
        t = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs)})
        got = (
            text_fingerprint_stats(rd.from_arrow(t), k=k, w=w)
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        )
        import re as _re
        for i, d in enumerate(docs):
            toks = [x for x in _re.split(r"[^a-z0-9_]+", d.lower()) if x]
            if len(toks) >= k:
                sh = [" ".join(toks[j : j + k]) for j in range(len(toks) - k + 1)]
            elif toks:
                sh = [" ".join(toks)]
            else:
                sh = []
            if len(sh) >= w:
                fps = {min(sh[j : j + w]) for j in range(len(sh) - w + 1)}
            elif sh:
                fps = {min(sh)}
            else:
                fps = set()
            assert got.loc[i, "n_fingerprints"] == len(fps)
            assert got.loc[i, "min_fingerprint"] == (min(fps) if fps else "")

    check()


def test_long_spans_planted_matches_formula(sf_dir):
    """Planted page-pairs: the LSH->verify->LCS path must find exactly one
    pair per doc with lcs_len == shared-prefix length (+1 separator)."""
    import duckdb

    from dedup.queries import _lsp_texts, q_long_spans_planted

    n_docs = duckdb.sql(
        f"SELECT count(*) FROM '{sf_dir}/documents.parquet'"
    ).fetchone()[0]
    out = q_long_spans_planted(sf_dir).to_pandas().sort_values("url_a")
    assert len(out) == n_docs
    assert out.url_a.str.startswith("a/").all()
    assert out.url_b.str.startswith("b/").all()
    # spot-check the span length formula on a few ids
    for i in (0, 5, 17):
        a, b = _lsp_texts(i)
        n = 0
        while n < min(len(a), len(b)) and a[n] == b[n]:
            n += 1
        assert out[out.url_a == f"a/{i}"].lcs_len.iloc[0] == n


def test_apply_consolidation_output_and_resume(tmp_path):
    """Executor semantics + the reference's crash-safe ordering
    (consolidation.rs:79-173): keep rows carry text, link rows carry NULL
    text + the keeper's url, non-duplicates pass through; a second run is
    all checkpoint hits; a lost partition is recomputed alone; a rebuilt
    plan invalidates every applied partition."""
    import json
    import os
    import shutil

    from dedup.checkpoint import CheckpointManager
    from dedup.consolidate import apply_consolidation

    pages_tbl, exp = make_pages(
        n_exact_groups=4, n_near_groups=0, n_singletons=10,
        n_negative_pairs=0, n_short_split_pairs=0,
    )
    pages = rd.from_arrow(pages_tbl)
    cfg = DedupConfig()
    root = str(tmp_path / "apply")

    out = apply_consolidation(pages, root, cfg).to_pandas()
    assert len(out) == len(pages_tbl)
    by_url = out.set_index("url")
    texts = {
        u: t for u, t in zip(pages_tbl["url"].to_pylist(),
                             pages_tbl["text"].to_pylist())
    }
    for g in exp.exact_groups:
        rep = min(g)
        assert by_url.loc[rep, "action"] == "keep"
        assert by_url.loc[rep, "text"] == texts[rep]
        for u in g:
            assert by_url.loc[u, "target_url"] == rep
            if u != rep:
                assert by_url.loc[u, "action"] == "link"
                assert by_url.loc[u, "text"] is None
    for u in exp.singleton_urls:
        assert by_url.loc[u, "action"] == "keep"
        assert by_url.loc[u, "target_url"] == u
        assert by_url.loc[u, "text"] == texts[u]

    # warm resume: both stages hit, byte-identical content
    ck = CheckpointManager(root, cfg)
    out2 = apply_consolidation(pages, root, cfg)
    assert out2.count() == len(out)

    # partial resume: lose one partition → exactly that part recomputes.
    # The applied stage's name carries (policy, P, plan content hash).
    import glob

    applied_dir = glob.glob(os.path.join(root, "c2_applied.*"))[0]
    mpath = os.path.join(applied_dir, "manifest.json")
    m = json.load(open(mpath))
    victim = next(k for k, v in m["parts"].items() if v["rows"] > 0)
    shutil.rmtree(os.path.join(applied_dir, "data", f"part-{victim}"))
    out3 = apply_consolidation(pages, root, cfg)
    assert out3.to_pandas().sort_values("url")["url"].tolist() == sorted(
        out["url"].tolist()
    )

    # plan rebuild: the rebuilt (identical-content) plan hashes the
    # same, so the applied parts stay valid and resume
    shutil.rmtree(glob.glob(os.path.join(root, "c1_plan.*"))[0])
    out4 = apply_consolidation(pages, root, cfg)
    assert out4.count() == len(out)
    m4 = json.load(open(mpath))
    assert m4["completed"] and m4["rows"] == len(out)

    # a DIFFERENT plan (changed policy) must not resume the old parts:
    # its stage name differs, so the old manifest is untouched and a
    # fresh stage is built
    out5 = apply_consolidation(pages, root, cfg, policy="max_size")
    assert out5.count() == len(out)
    assert len(glob.glob(os.path.join(root, "c2_applied.*"))) == 2
