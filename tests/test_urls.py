"""URL canonicalization + snapshot revisit dedup — pinned rules and a
brute-force latest-per-url reference."""

import pyarrow as pa
import ray.data as rd

from dedup.urls import canonicalize_array, canonicalize_urls, latest_snapshot


def test_canonical_pinned():
    cases = {
        "HTTP://WWW.Example.COM:80/Path/X": "http://www.example.com/Path/X",
        "https://Host.org:443/a/?utm_source=x&utm_campaign=y": "https://host.org/a",
        "http://h/p?id=1&utm_medium=m#frag": "http://h/p?id=1",
        "http://h/p/": "http://h/p",
        "http://h/": "http://h",
        "http://h/p?utm_source=a&b=2": "http://h/p?b=2",
        "http://h/p#only-frag": "http://h/p",
        "https://h:8443/keep-port": "https://h:8443/keep-port",
        "not a url": "not a url",
        "http://h/CaSe/Kept?Q=UPPER": "http://h/CaSe/Kept?Q=UPPER",
    }
    got = canonicalize_array(pa.array(list(cases))).to_pylist()
    for (src, want), g in zip(cases.items(), got):
        assert g == want, (src, g, want)


def test_canonicalize_ds():
    ds = rd.from_arrow(pa.table({"url": pa.array(["HTTP://A.B:80/x#f"])}))
    out = canonicalize_urls(ds).to_pandas()
    assert list(out.columns) == ["url", "canonical_url"]
    assert out["canonical_url"][0] == "http://a.b/x"


def _snaps():
    rows = [
        ("u1", 100, "a"),
        ("u1", 300, "c"),
        ("u1", 200, "b"),
        ("u2", 50, "only"),
        ("u3", 10, "x"),
        ("u3", 20, "y"),
    ]
    return pa.table(
        {
            "url": pa.array([r[0] for r in rows]),
            "ts_us": pa.array([r[1] for r in rows], pa.int64()),
            "text": pa.array([r[2] for r in rows]),
        }
    )


def test_latest_snapshot():
    out = (
        latest_snapshot(rd.from_arrow(_snaps()), "url", "ts_us")
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    assert out["url"].tolist() == ["u1", "u2", "u3"]
    assert out["ts_us"].tolist() == [300, 50, 20]
    assert out["text"].tolist() == ["c", "only", "y"]
    assert out["n_snapshots"].tolist() == [3, 1, 2]


def test_latest_snapshot_all_unique():
    t = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(20)]),
            "ts_us": pa.array(list(range(20)), pa.int64()),
            "text": pa.array(["t"] * 20),
        }
    )
    out = latest_snapshot(rd.from_arrow(t), "url", "ts_us").to_pandas()
    assert len(out) == 20
    assert (out["n_snapshots"] == 1).all()


def test_latest_snapshot_split_invariance():
    ds = rd.from_arrow(_snaps()).repartition(4)
    out = latest_snapshot(ds, "url", "ts_us").to_pandas().sort_values("url")
    assert out["ts_us"].tolist() == [300, 50, 20]
    assert out["n_snapshots"].tolist() == [3, 1, 2]


def test_latest_snapshot_timestamp_type():
    t = pa.table(
        {
            "url": pa.array(["u", "u"]),
            "warc_ts": pa.array([1_700_000_000_000_000, 1_700_000_003_600_000], pa.timestamp("us")),
            "text": pa.array(["old", "new"]),
        }
    )
    out = latest_snapshot(rd.from_arrow(t), "url", "warc_ts").to_pandas()
    assert len(out) == 1 and out["text"][0] == "new" and out["n_snapshots"][0] == 2


def test_slash_query_rule_only_at_boundary():
    """'/?' inside a query VALUE is data, not a boundary — the bare
    /\\? rule rewrote it and collapsed distinct urls."""
    import pyarrow as pa

    from dedup.urls import canonicalize_array

    got = canonicalize_array(
        pa.array([
            "https://e.com/p/?x=1",            # boundary: / dropped
            "https://e.com/p?next=/foo/?bar",  # value: untouched
        ])
    ).to_pylist()
    assert got[0] == "https://e.com/p?x=1"
    assert got[1] == "https://e.com/p?next=/foo/?bar"
