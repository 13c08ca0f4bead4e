"""Consolidation planning: pick one representative per duplicate cluster
and emit an action table.

≅ the reference's consolidation sink (consolidate_groups /
choose_group_to_preserve, /root/reference/src/consolidation.rs:25-173):
it re-links duplicate files to one inode; the web-text analogue is a
keep/drop projection — which url survives, which urls point at it. The
destructive filesystem mutation has no web analogue (and the reference
itself gates it behind --dry-run); our plan table IS the dry-run output.

Policies (deterministic, ≅ choose_group_to_preserve's
largest-subgroup-else-first rule with our stable tie-breaks):
  - "min_url":  lexicographic-min url (stable, reproducible)
  - "max_size": largest text wins, ties → min url

The plan is computed inside ``map_groups`` over already-pruned survivor
rows (cluster cardinality = duplicate groups only, never the corpus).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .cascade import exact_survivors
from .config import DedupConfig
from .ingest import ingest


def _plan_group(g: pd.DataFrame, policy: str) -> pd.DataFrame:
    n = len(g)
    if n < 2:
        return pd.DataFrame(
            {
                "url": pd.Series([], dtype=object),
                "action": pd.Series([], dtype=object),
                "target_url": pd.Series([], dtype=object),
                "reclaimed_bytes": pd.Series([], dtype="int64"),
            }
        )
    if policy == "max_size":
        gi = g.sort_values(["size_bytes", "url"], ascending=[False, True])
        rep = gi["url"].iloc[0]
    else:
        rep = g["url"].min()
    is_rep = g["url"] == rep
    return pd.DataFrame(
        {
            "url": g["url"],
            "action": np.where(is_rep, "keep", "link"),
            "target_url": rep,
            "reclaimed_bytes": np.where(is_rep, 0, g["size_bytes"]).astype("int64"),
        }
    )


def consolidation_plan(
    pages: Dataset, cfg: DedupConfig | None = None, policy: str = "min_url"
) -> Dataset:
    """pages → (url, action, target_url, reclaimed_bytes) for every member
    of an exact-duplicate cluster. Non-duplicates are absent (nothing to
    reclaim — the fully-hardlinked-group filter F5 analogue)."""
    cfg = cfg or DedupConfig()
    surv = exact_survivors(ingest(pages, cfg), cfg)
    return (
        surv.select_columns(["url", "doc_hash", "size_bytes"])
        .groupby("doc_hash")
        .map_groups(lambda g: _plan_group(g, policy), batch_format="pandas")
        .map_batches(lambda t: t, batch_format="pyarrow")
    )


def total_reclaimed(plan: Dataset) -> int:
    """Σ reclaimed_bytes (≅ the reference's end-of-run total,
    process_matches.rs:674-675)."""
    return int(plan.sum("reclaimed_bytes") or 0)
