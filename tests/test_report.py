"""Report sink: nested group shape + JSON parity with the reference's
DuplicateGroup serialization (duplicate_group.rs:123-149 golden shape)."""

import json

import pyarrow as pa
import ray.data as rd

from dedup.cascade import exact_clusters
from dedup.config import DedupConfig
from dedup.report import nested_groups, write_report
from dedup.synth import cascade_equiv_table


def test_nested_groups_reference_corpus(tmp_path):
    table, expected = cascade_equiv_table()
    clusters = exact_clusters(rd.from_arrow(table), DedupConfig(min_size=1))
    nested = nested_groups(clusters).to_pandas()
    # 3 content groups; each cluster has ONE content identity (exact dups)
    assert len(nested) == 3
    assert (nested["n_identities"] == 1).all()
    got = sorted(g[0] for g in nested["duplicates"])
    assert got == sorted(sorted(x) for x in expected)

    summary = write_report(clusters, str(tmp_path / "out"))
    assert summary["n_groups"] == 3
    assert summary["n_member_urls"] == 10
    # redundant bytes: ("first\n": 3 urls ×6B → 12), ("next\n": 4×5 → 15),
    # ("third\n": 3×6 → 12)  [(n-1)×size each]
    assert summary["redundant_bytes"] == 12 + 15 + 12
    with open(summary["json"]) as f:
        arr = json.load(f)
    assert len(arr) == 3
    assert all(set(r) == {"duplicates", "redundant_bytes"} for r in arr)
