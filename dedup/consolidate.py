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

The plan is computed in one vectorized pass per hash bucket over
already-pruned survivor rows (groups co-located by bucket; no per-group
Python).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset

from .cascade import exact_survivors
from .config import DedupConfig
from .ingest import ingest


def consolidation_plan(
    pages: Dataset, cfg: DedupConfig | None = None, policy: str = "min_url"
) -> Dataset:
    """pages → (url, action, target_url, reclaimed_bytes) for every member
    of an exact-duplicate cluster. Non-duplicates are absent (nothing to
    reclaim — the fully-hardlinked-group filter F5 analogue)."""
    cfg = cfg or DedupConfig()
    surv = exact_survivors(ingest(pages, cfg), cfg)
    n_buckets = cfg.join_buckets  # scale-derived fan-out (one bucket / worker)

    def bucketize(batch: pa.Table) -> pa.Table:
        from .hashing import fmix64

        dh = batch.column("doc_hash").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            b = (fmix64(dh.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    def plan_bucket(batch: pa.Table) -> pa.Table:
        # one vectorized pass over co-located whole groups — never one
        # Python call per duplicate group (row-cardinality at web scale)
        if len(batch) == 0:
            return pa.table(
                {"url": pa.array([], pa.string()),
                 "action": pa.array([], pa.string()),
                 "target_url": pa.array([], pa.string()),
                 "reclaimed_bytes": pa.array([], pa.int64())}
            )
        if policy == "max_size":
            t = batch.sort_by(
                [("doc_hash", "ascending"), ("size_bytes", "descending"),
                 ("url", "ascending")]
            )
        else:
            t = batch.sort_by([("doc_hash", "ascending"), ("url", "ascending")])
        dh = t.column("doc_hash").to_numpy(zero_copy_only=False)
        sz = t.column("size_bytes").to_numpy(zero_copy_only=False)
        urls = t.column("url")
        if isinstance(urls, pa.ChunkedArray):
            urls = urls.combine_chunks()
        n = len(dh)
        first = np.ones(n, dtype=bool)
        first[1:] = dh[1:] != dh[:-1]
        starts = np.flatnonzero(first)
        sizes = np.diff(np.append(starts, n))
        seg_id = np.cumsum(first) - 1
        # group representative = its first row under the policy sort
        rep_urls = urls.take(pa.array(starts[seg_id], pa.int64()))
        is_rep = np.zeros(n, dtype=bool)
        is_rep[starts] = True
        keep = sizes[seg_id] > 1  # singletons emit nothing
        out = pa.table(
            {
                "url": urls,
                "action": pa.array(np.where(is_rep, "keep", "link"), pa.string()),
                "target_url": rep_urls,
                "reclaimed_bytes": pa.array(
                    np.where(is_rep, 0, sz).astype(np.int64), pa.int64()
                ),
            }
        )
        return out.filter(pa.array(keep))

    return (
        surv.select_columns(["url", "doc_hash", "size_bytes"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(plan_bucket, batch_format="pyarrow")
    )


def total_reclaimed(plan: Dataset) -> int:
    """Σ reclaimed_bytes (≅ the reference's end-of-run total,
    process_matches.rs:674-675)."""
    return int(plan.sum("reclaimed_bytes") or 0)
