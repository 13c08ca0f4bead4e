"""Composed input_hint-shaped pipeline (canonicalize → extract →
latest-snapshot → gates → exact dedup) and the Ingester column
passthrough it relies on."""

import numpy as np
import pyarrow as pa
import ray.data as rd

from dedup.config import DedupConfig
from dedup.ingest import ingest
from dedup.queries import q_warc_pipeline


def test_ingester_extra_cols_passthrough_and_projection():
    t = pa.table(
        {
            "url": pa.array(["a", "b"]),
            "text": pa.array(["x" * 60, "y" * 60]),
            "lang": pa.array(["en", "en"]),
            "n_snapshots": pa.array([3, 1], pa.int64()),
            "html": pa.array([b"<x>", b"<y>"], pa.binary()),
        }
    )
    out = ingest(
        rd.from_arrow(t), DedupConfig(min_size=1), extra_cols=("n_snapshots",)
    ).to_pandas()
    assert "n_snapshots" in out.columns and out["n_snapshots"].tolist() == [3, 1]
    assert "html" not in out.columns  # wide binary still projected away
    # default call unchanged
    out2 = ingest(rd.from_arrow(t), DedupConfig(min_size=1)).to_pandas()
    assert "n_snapshots" not in out2.columns


def test_warc_pipeline_planted_structure(sf_dir):
    out = q_warc_pipeline(sf_dir).to_pandas()
    # exactly one row per surviving content identity: rep urls unique
    assert out.url.is_unique
    # planted cross-url copies (doc_id % 10 == 5): neither side is ever
    # gated ('…/5' never matches '9$'; same text ⇒ same size gate) and
    # '/copy/' < '/p/' lexicographically, so the copy IS the min-url rep
    # of a cluster of >= 2
    copies = out[out.url.str.contains("/copy/")]
    assert len(copies) > 0
    assert (copies.cluster_size >= 2).all()
    # and no /p/ twin of a copy survives as its own row
    twin_ids = copies.url.str.extract(r"/copy/(\d+)$")[0]
    twins = set("/p/" + twin_ids)
    assert not any(any(u.endswith(t) for t in twins) for u in out.url)
    # revisited urls (doc_id % 4 == 0, ends not with 9) carry n_snapshots 2
    revisited = out[out.n_snapshots > 1]
    assert len(revisited) > 0
    assert (revisited.n_snapshots == 2).all()
    # revisit losers are gone: v2 text won, so the rep text size is the
    # v2 size — spot-check via size_bytes > 0 and gates
    assert (out.size_bytes >= 50).all()
