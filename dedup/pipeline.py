"""Flagship near-duplicate pipeline (north rule end-to-end).

    pages ─ingest→ P1(url,text,identity cols)
          ─distinct-content reps→ sign (MinHash actor pool) → P3 signatures
          ─band→ P4 band rows ─groupby→ candidate pairs (skew-salted stars)
          ─verify (signature agreement)→ edges
          ─union-find→ cluster map (doc_hash → cluster_id)
          ─broadcast assign + count→ clusters table

Stage boundaries are Dataset handoffs; ray-native restatement of the
reference lifecycle (src/main.rs:122-166 — walk → short-checksum →
full-checksum → print/consolidate) per SURVEY.md §3.4.

Exact duplicates are collapsed **before** MinHash (one signature per
distinct text ≅ the reference hashing each inode once no matter how many
hard links point at it, process_matches.rs:420-433) and fanned back out at
assignment time.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from .config import DedupConfig
from .exchange import broadcast_map_i64, dup_keys, key_counts, semi_filter
from .ingest import ingest
from .lsh import band_rows, candidate_pairs
from .minhash import sign
from .unionfind import UnionFind, components_from_pairs
from .verify import verify_pairs


def distinct_reps(ingested: Dataset) -> Dataset:
    """One row per distinct doc_hash, keeping (doc_hash, text).

    Unique-content rows (the overwhelming majority) pass through with **no
    shuffle**; only rows whose doc_hash is duplicated (small set, found via
    the narrow combiner) go through a groupby to pick one representative.
    """
    narrow = ingested.select_columns(["doc_hash", "text"])
    dups = dup_keys(ingested, "doc_hash")
    uniq = semi_filter(narrow, "doc_hash", dups, keep=False)
    if len(dups) == 0:
        return uniq

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    rep_dups = (
        semi_filter(narrow, "doc_hash", dups)
        .groupby("doc_hash")
        .map_groups(first, batch_format="pandas")
        # normalize to Arrow blocks — union of pandas+arrow blocks breaks
        # downstream batching
        .map_batches(lambda t: t, batch_format="pyarrow")
    )
    return uniq.union(rep_dups)


@dataclass
class NearDupResult:
    clusters: Dataset  # CLUSTERS schema (+ redundant not included here)
    edges: pa.Table  # verified pairs (a, b, sim)
    n_candidate_docs: int = 0


def near_dup_pipeline(
    pages: Dataset, cfg: DedupConfig | None = None, checkpoint=None
) -> NearDupResult:
    """pages → clusters of exact+near duplicate urls.

    ``checkpoint``: optional checkpoint.CheckpointManager — stages P1/P3
    are written as partitioned parquet and reused on resume.
    """
    cfg = cfg or DedupConfig()

    def stage(name, fn):
        if checkpoint is not None:
            return checkpoint.load_or_run(name, fn)
        return fn()

    ing = stage("p1_ingested", lambda: ingest(pages, cfg))
    reps = distinct_reps(ing)
    sigs = stage("p3_signatures", lambda: sign(reps, cfg))
    bands = band_rows(sigs, cfg)
    pairs, chain = candidate_pairs(bands, cfg)
    if len(chain):
        pairs = pairs.union(rd.from_arrow(chain))
    edges = verify_pairs(pairs, sigs, cfg)

    # driver union-find over verified edges (see unionfind.py for the
    # distributed label-propagation alternative)
    uf = UnionFind()
    for x, y in zip(
        edges.column("a").to_numpy(zero_copy_only=False).tolist(),
        edges.column("b").to_numpy(zero_copy_only=False).tolist(),
    ):
        uf.union(x, y)
    keys, cids = uf.component_map()

    assigned = broadcast_map_i64(
        ing.select_columns(["url", "doc_hash", "size_bytes"]),
        "doc_hash", keys, cids, "cluster_id", default_identity=True,
    )

    # cluster sizes via narrow aggregate + broadcast; keep clusters with ≥2 urls
    counts = key_counts(assigned, "cluster_id")
    ct = pa.concat_tables(
        list(counts.iter_batches(batch_size=1 << 20, batch_format="pyarrow"))
        or [pa.table({"cluster_id": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})]
    )
    ckeys = ct.column("cluster_id").to_numpy(zero_copy_only=False)
    ccnts = ct.column("cnt").to_numpy(zero_copy_only=False)
    order = np.argsort(ckeys)
    import ray as _ray

    ref = _ray.put((ckeys[order], ccnts[order]))

    def finish(batch: pa.Table) -> pa.Table:
        ks, cs = _ray.get(ref)
        cid = batch.column("cluster_id").to_numpy(zero_copy_only=False)
        idx = np.minimum(np.searchsorted(ks, cid), max(len(ks) - 1, 0))
        n = cs[idx] if len(ks) else np.zeros(len(cid), np.int64)
        out = pa.table(
            {
                "url": batch.column("url"),
                "doc_hash": batch.column("doc_hash"),
                "cluster_id": batch.column("cluster_id"),
                "cluster_size": pa.array(n, pa.int64()),
                "size_bytes": batch.column("size_bytes"),
            }
        )
        return out.filter(pa.array(n > 1))

    clusters = assigned.map_batches(finish, batch_format="pyarrow")
    return NearDupResult(clusters=clusters, edges=edges)


def cluster_partition(clusters: Dataset) -> list[list[str]]:
    """clusters table → sorted list of sorted url lists (order-insensitive
    golden compare; reference group order is HashMap-nondeterministic)."""
    df = clusters.to_pandas()
    if df.empty:
        return []
    return sorted(df.groupby("cluster_id")["url"].apply(lambda s: sorted(s)).tolist())
