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
    got = sorted(list(g[0]) for g in nested["duplicates"])
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


def test_nested_groups_multi_identity_cluster():
    """A near-dup cluster with several content identities nests correctly
    (outer list ordered lexicographically, inner lists url-sorted)."""
    t = pa.table(
        {
            "url": pa.array(["u/b", "u/a", "u/c", "u/d", "u/z"]),
            "doc_hash": pa.array([10, 10, 20, 20, 30], pa.int64()),
            "cluster_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "size_bytes": pa.array([5, 5, 7, 7, 9], pa.int64()),
        }
    )
    out = nested_groups(rd.from_arrow(t)).to_pandas().sort_values("cluster_id")
    c1 = out[out.cluster_id == 1].iloc[0]
    assert c1["n_members"] == 4 and c1["n_identities"] == 2
    assert [list(x) for x in c1["duplicates"]] == [["u/a", "u/b"], ["u/c", "u/d"]]
    # redundant = sum - max = (5+5+7+7) - 7 = 17
    assert c1["redundant_bytes"] == 17
    c2 = out[out.cluster_id == 2].iloc[0]
    assert c2["n_members"] == 1 and [list(x) for x in c2["duplicates"]] == [["u/z"]]
