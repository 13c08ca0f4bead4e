"""Report sinks: the reference's output shapes over the clusters table.

≅ PrintMatches (process_matches.rs:604-705): the reference emits, per
duplicate group, the member paths grouped by inode (hard-linked paths
together) plus redundant_bytes, streamed to stdout / a JSON array file.
Here:

- ``nested_groups``: clusters → one row per cluster with
  ``duplicates`` = list<list<url>> (outer = distinct content identity
  ``doc_hash`` ≅ inode, inner = urls sharing it ≅ hard links) and
  ``redundant_bytes`` = (n_identities − 1) × size... generalized for
  near-dup clusters as Σ sizes − max size (bytes beyond one kept copy).
  Shape-parity with DuplicateGroup JSON (duplicate_group.rs:21-25,
  74-85).
- ``write_report``: clusters → partitioned parquet + a JSON array file
  (incremental writer ≅ the reference's serde_json seq writer) + a
  stdout-style summary dict.
"""

from __future__ import annotations

import json
import os

import pandas as pd
import pyarrow as pa
from ray.data import Dataset


def _group_row(g: pd.DataFrame) -> pd.DataFrame:
    by_hash: dict[int, list[str]] = {}
    for u, h in zip(g["url"], g["doc_hash"]):
        by_hash.setdefault(int(h), []).append(u)
    inner = [sorted(v) for v in by_hash.values()]
    inner.sort()
    sizes = g.groupby("doc_hash")["size_bytes"].first() if "size_bytes" in g else None
    if sizes is not None and len(sizes):
        redundant = int(g["size_bytes"].sum() - g["size_bytes"].max())
    else:
        redundant = 0
    return pd.DataFrame(
        {
            "cluster_id": [int(g["cluster_id"].iloc[0])],
            "n_members": [len(g)],
            "n_identities": [len(inner)],
            "duplicates": [inner],
            "redundant_bytes": [redundant],
        }
    )


def nested_groups(clusters: Dataset) -> Dataset:
    """clusters(url, doc_hash, cluster_id[, size_bytes]) → nested rows.

    map_groups over cluster_id — cardinality is duplicate groups only.
    """
    return clusters.groupby("cluster_id").map_groups(
        _group_row, batch_format="pandas"
    )


def write_report(clusters: Dataset, out_dir: str) -> dict:
    """Partitioned parquet + JSON array + summary (the K1 sink trio)."""
    os.makedirs(out_dir, exist_ok=True)
    clusters = clusters.materialize()
    clusters.write_parquet(os.path.join(out_dir, "clusters"))
    nested = nested_groups(clusters)
    n_groups = 0
    n_members = 0
    redundant = 0
    json_path = os.path.join(out_dir, "duplicates.json")
    with open(json_path, "w") as f:
        f.write("[")
        first = True
        for batch in nested.iter_batches(batch_size=4096, batch_format="pandas"):
            for _, row in batch.iterrows():
                rec = {
                    "duplicates": row["duplicates"],
                    "redundant_bytes": int(row["redundant_bytes"]),
                }
                if not first:
                    f.write(",")
                json.dump(rec, f)
                first = False
                n_groups += 1
                n_members += int(row["n_members"])
                redundant += int(row["redundant_bytes"])
        f.write("]")
    summary = {
        "n_groups": n_groups,
        "n_member_urls": n_members,
        "redundant_bytes": redundant,
        "json": json_path,
    }
    with open(os.path.join(out_dir, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    return summary
