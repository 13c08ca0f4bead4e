"""Windowed aggregation, sessionization, IVF search, quarantine."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup.config import DedupConfig
from dedup.embed import ivf_search, knn_cosine
from dedup.ingest import gate_rejects, ingest
from dedup.windows import sessionize, tumbling_aggregate

US = 1_000_000


def _events(ts_list, types=None, values=None, users=None):
    n = len(ts_list)
    return rd.from_arrow(
        pa.table(
            {
                "ts": pa.array(ts_list, pa.timestamp("us")),
                "event_type": pa.array(types or ["click"] * n, pa.string()),
                "value": pa.array(values or [1.0] * n, pa.float64()),
                "user_id": pa.array(users or [1] * n, pa.int64()),
            }
        )
    )


def test_tumbling_window_boundaries():
    H = 3600 * US
    ev = _events(
        [0, H - 1, H, H + 1, 3 * H],
        types=["a", "a", "a", "b", "a"],
        values=[1.25, 2.50, 3.0, 4.0, 5.0],
    )
    out = tumbling_aggregate(ev, window_sec=3600).to_pandas()
    out = out.sort_values(["window_start", "event_type"]).reset_index(drop=True)
    got = [
        (int(r.window_start.value // 1000) if hasattr(r.window_start, "value") else r.window_start,
         r.event_type, r.n_events, r.sum_cents)
        for r in out.itertuples()
    ]
    # window 0: two 'a' events (1.25+2.50 = 375 cents); window H: one of
    # each; window 3H: one 'a'
    assert out["n_events"].tolist() == [2, 1, 1, 1]
    assert out["sum_cents"].tolist() == [375, 300, 400, 500]


def test_sessionize_gap():
    G = 1800 * US
    # user 1: 3 events within gap, then a jump → 2 sessions; user 2: one
    ev = _events(
        [0, 100 * US, G, 3 * G, 0],
        users=[1, 1, 1, 1, 2],
    )
    out = sessionize(ev, gap_sec=1800).to_pandas().sort_values(["user_id", "session_id"])
    u1 = out[out.user_id == 1]
    assert u1["n_events"].tolist() == [3, 1]
    assert u1["session_start"].tolist() == [0, 3 * G]
    assert out[out.user_id == 2]["n_events"].tolist() == [1]


def test_ivf_finds_exact_neighbors_mostly():
    rng = np.random.default_rng(5)
    M = rng.standard_normal((500, 32))
    from tests.test_similarity import _emb_ds

    ds = _emb_ds(M)
    exact = knn_cosine(ds, query_ids=[0, 1, 2, 3, 4], k=5)
    approx = ivf_search(ds, query_ids=[0, 1, 2, 3, 4], k=5, n_centroids=8, n_probe=8)
    # n_probe == n_centroids → exhaustive → identical to exact
    pd.testing.assert_frame_equal(
        exact.reset_index(drop=True), approx.reset_index(drop=True)
    )
    # fewer probes → recall may drop but stays useful
    approx2 = ivf_search(ds, query_ids=[0, 1, 2, 3, 4], k=5, n_centroids=8, n_probe=4)
    ex = set(map(tuple, exact[["query_id", "neighbor_id"]].values))
    ap = set(map(tuple, approx2[["query_id", "neighbor_id"]].values))
    assert len(ex & ap) / len(ex) >= 0.5


def test_ivf_topk_planted_full_ordering(sf_dir):
    # graded twins (eps 0.05..0.25) must come back as exactly ranks 1..5
    # per query, in eps order — pins the IVF path's complete top-k
    # ordering, not just rank 1
    from dedup.queries import PLANT_OFFSET, TOPK_EPS, TOPK_STEP, q_ann_ivf_topk_planted

    out = q_ann_ivf_topk_planted(sf_dir)
    assert len(out) == 10 * len(TOPK_EPS)
    for qid, grp in out.groupby("query_id"):
        assert grp["rank"].tolist() == list(range(1, len(TOPK_EPS) + 1))
        assert grp["neighbor_id"].tolist() == [
            PLANT_OFFSET + r * TOPK_STEP + qid
            for r in range(1, len(TOPK_EPS) + 1)
        ]


def test_gate_rejects_reasons():
    t = pa.table(
        {
            "url": pa.array(["u/short", "u/long", "u/fr", "u/ok"]),
            "warc_ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
            "html": pa.array([b""] * 4, pa.binary()),
            "text": pa.array(["ab", "x" * 500, "c" * 100, "d" * 100]),
            "lang": pa.array(["en", "en", "fr", "en"]),
        }
    )
    cfg = DedupConfig(min_size=10, max_size=200, lang_filter=("en",))
    rej = gate_rejects(rd.from_arrow(t), cfg).to_pandas().set_index("url")["reason"]
    assert rej.to_dict() == {"u/short": "too_short", "u/long": "too_long", "u/fr": "lang"}
    kept = ingest(rd.from_arrow(t), cfg).to_pandas()
    assert kept["url"].tolist() == ["u/ok"]


def test_sessionize_many_users_matches_pandas_reference():
    """Bucketed vectorized sessionize ≡ per-user reference on a random mix."""
    rng = np.random.default_rng(11)
    n = 5000
    users = rng.integers(0, 200, size=n)
    ts = np.sort(rng.integers(0, 10**10, size=n))
    rng.shuffle(ts)  # arrival order is not time order
    ev = _events(ts.tolist(), users=users.tolist())
    G = 1800 * US
    out = (
        sessionize(ev, gap_sec=1800)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    # reference: per-user python
    df = pd.DataFrame({"u": users, "t": ts}).sort_values(["u", "t"])
    rows = []
    for u, g in df.groupby("u"):
        tv = g["t"].to_numpy()
        sid = 0
        start = prev = tv[0]
        cnt = 1
        for x in tv[1:]:
            if x - prev > G:
                rows.append((u, sid, cnt, start, prev))
                sid += 1
                start = x
                cnt = 0
            cnt += 1
            prev = x
        rows.append((u, sid, cnt, start, prev))
    ref = pd.DataFrame(
        rows, columns=["user_id", "session_id", "n_events", "session_start", "session_end"]
    ).sort_values(["user_id", "session_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(out.astype("int64"), ref.astype("int64"))


def test_sessionize_string_user_ids_and_odd_bucket_count():
    """String user ids hash through xxh64 (no int cast), and a non-64
    bucket count actually uses all buckets (ADVICE round 2)."""
    G = 1800 * US
    ev = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array([0, 100 * US, 3 * G, 0, 50 * US], pa.timestamp("us")),
                "user_id": pa.array(["alice", "alice", "alice", "bob", "bob"]),
            }
        )
    )
    out = (
        sessionize(ev, gap_sec=1800, n_buckets=7)
        .to_pandas()
        .sort_values(["user_id", "session_id"])
        .reset_index(drop=True)
    )
    assert out["user_id"].tolist() == ["alice", "alice", "bob"]
    assert out["n_events"].tolist() == [2, 1, 2]
    assert out["session_start"].tolist() == [0, 3 * G, 0]


def test_tumbling_null_keys_grouped_not_corrupted():
    """Null event_type must form its own group (sentinel code path), not
    corrupt the int cast (ADVICE round 2)."""
    H = 3600 * US
    ev = rd.from_arrow(
        pa.table(
            {
                "ts": pa.array([0, 1, H], pa.timestamp("us")),
                "event_type": pa.array(["a", None, None], pa.string()),
                "value": pa.array([1.0, 2.0, 3.0], pa.float64()),
            }
        )
    )
    out = tumbling_aggregate(ev, window_sec=3600).to_pandas()
    nullg = out[out.event_type.isna()].sort_values("window_start")
    assert nullg["n_events"].tolist() == [1, 1]
    assert nullg["sum_cents"].tolist() == [200, 300]
    assert out[out.event_type == "a"]["sum_cents"].tolist() == [100]


def test_exclude_url_regex_validated_at_construction():
    """Python-only regex syntax (lookahead) compiles under re but not RE2;
    the Ingester must fail fast with a clear error, not mid-pipeline."""
    import pytest

    from dedup.ingest import Ingester

    with pytest.raises(ValueError, match="RE2"):
        Ingester(DedupConfig(exclude_url_regex=r"foo(?=bar)"))


def test_exclude_url_regex_re2_only_syntax_accepted():
    """RE2-valid syntax that PYTHON re rejects (\\pL Unicode class) must
    work end-to-end: the matcher is Arrow RE2, so Python re must never
    gate pattern acceptance."""
    t = pa.table(
        {
            "url": pa.array(["u/abc", "u/123"]),
            "warc_ts": pa.array([0, 1], pa.timestamp("us")),
            "html": pa.array([b""] * 2, pa.binary()),
            "text": pa.array(["x" * 50] * 2),
            "lang": pa.array(["en"] * 2),
        }
    )
    cfg = DedupConfig(min_size=1, exclude_url_regex=r"/\pL+$")
    kept = ingest(rd.from_arrow(t), cfg).to_pandas()
    assert kept["url"].tolist() == ["u/123"]


def test_lang_filter_without_lang_column_fails_loud():
    """A configured lang_filter over an input lacking the lang column
    must raise, not silently pass every language through."""
    import pytest

    from dedup.ingest import Ingester

    t = pa.table({"url": pa.array(["u"]), "text": pa.array(["x" * 50])})
    ing = Ingester(DedupConfig(min_size=1, lang_filter=("en",)))
    with pytest.raises(ValueError, match="lang"):
        ing(t)


def test_url_exclude_regex_gate():
    """Vectorized RE2 url filter: matching urls are rejected with reason
    'url'; non-matching pass (mirrors re.search substring semantics)."""
    t = pa.table(
        {
            "url": pa.array(["u/keep", "u/drop9", "u/also-drop9", "u/keep2"]),
            "warc_ts": pa.array([0, 1, 2, 3], pa.timestamp("us")),
            "html": pa.array([b""] * 4, pa.binary()),
            "text": pa.array(["x" * 50] * 4),
            "lang": pa.array(["en"] * 4),
        }
    )
    cfg = DedupConfig(min_size=1, exclude_url_regex=r"9$")
    kept = ingest(rd.from_arrow(t), cfg).to_pandas()
    assert sorted(kept["url"]) == ["u/keep", "u/keep2"]
    rej = gate_rejects(rd.from_arrow(t), cfg).to_pandas()
    assert rej.set_index("url")["reason"].to_dict() == {
        "u/drop9": "url", "u/also-drop9": "url",
    }


def test_tumbling_null_value_and_ms_timestamps():
    """NULL values contribute 0 cents while the row still counts
    (SQL SUM/COUNT(*) semantics — the NaN int64 cast injected INT64_MIN
    before); ms-unit timestamps normalize to µs before windowing."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from dedup.windows import tumbling_aggregate

    base_ms = 3_600_000 * 500
    t = pa.table(
        {
            "ts": pa.array([base_ms, base_ms + 1000, base_ms + 2000],
                           pa.timestamp("ms")),
            "event_type": pa.array(["a", "a", "a"]),
            "value": pa.array([1.25, None, 2.5], pa.float64()),
        }
    )
    out = tumbling_aggregate(
        rd.from_arrow(t), window_sec=3600, key_col="event_type"
    ).to_pandas()
    assert len(out) == 1
    assert int(out["n_events"][0]) == 3
    assert int(out["sum_cents"][0]) == 125 + 0 + 250
