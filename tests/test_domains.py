"""Per-domain operators: host extraction, stats, frequency capping."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from dedup.config import DedupConfig
from dedup.domains import _host_array, domain_cap, domain_stats


def _pages(rows):
    urls, texts = zip(*rows)
    return rd.from_arrow(
        pa.table({"url": pa.array(urls, pa.string()), "text": pa.array(texts)})
    )


def _fixture():
    rows = []
    for i in range(10):
        rows.append((f"https://big.example.com/p{i:02d}", f"text big {i} " * 30))
    for i in range(3):
        rows.append((f"https://small.org/q{i}", f"text small {i} " * 30))
    rows.append(("https://dupes.net/a", "same content " * 30))
    rows.append(("https://dupes.net/b", "same content " * 30))
    rows.append(("no-scheme-url", "weird " * 30))
    return rows


def test_host_extraction_shapes():
    urls = pa.array(
        [
            "https://a.example.com/x/y",
            "http://b.org",
            "doc://src3/17#dup1",
            "ftp+ssh://h-y.phen/z",
            "no-scheme",
            "",
        ]
    )
    assert _host_array(urls).to_pylist() == [
        "a.example.com", "b.org", "src3", "h-y.phen", "", ""
    ]


def test_domain_stats_counts_pages_docs_bytes():
    st = (
        domain_stats(_pages(_fixture()), DedupConfig())
        .to_pandas()
        .set_index("host")
        .sort_index()
    )
    assert st.loc["big.example.com", "n_pages"] == 10
    assert st.loc["big.example.com", "n_docs"] == 10
    assert st.loc["dupes.net", "n_pages"] == 2
    assert st.loc["dupes.net", "n_docs"] == 1  # exact dups collapse
    assert st.loc["small.org", "n_pages"] == 3
    assert st.loc["", "n_pages"] == 1  # schemeless url → empty host
    assert (st["total_bytes"] > 0).all()


def test_domain_cap_keeps_min_urls_per_host():
    rows = _fixture()
    out = sorted(
        domain_cap(_pages(rows), DedupConfig(), cap=4).to_pandas()["url"].tolist()
    )
    expect = sorted(
        [f"https://big.example.com/p{i:02d}" for i in range(4)]
        + [f"https://small.org/q{i}" for i in range(3)]
        + ["https://dupes.net/a", "https://dupes.net/b", "no-scheme-url"]
    )
    assert out == expect


def test_domain_cap_batch_split_invariance():
    """The partial-top-k combiner must be correct however Ray batches
    rows: a 1-row-per-block layout gives the same survivors."""
    rows = _fixture()
    cfg = DedupConfig()
    whole = sorted(domain_cap(_pages(rows), cfg, cap=2).to_pandas()["url"])
    urls, texts = zip(*rows)
    shredded = rd.from_arrow(
        [pa.table({"url": pa.array([u]), "text": pa.array([t])}) for u, t in rows]
    )
    split = sorted(domain_cap(shredded, cfg, cap=2).to_pandas()["url"])
    assert whole == split
