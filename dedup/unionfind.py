"""Connected components over verified candidate pairs.

Two implementations:

- ``UnionFind`` + ``components_from_pairs``: driver-side streaming
  union-find (path compression + union by size). Edges stream in batches
  from the (already heavily pruned) verified-pair dataset; memory is
  O(nodes touched by an edge) — duplicate-involved docs only, not the
  corpus. Mirrors the reference's single-process final grouping
  (process_matches.rs:395-401); right tool up to ~10^8 edges.

- ``label_propagation``: distributed min-label propagation over Ray Data
  for the 10^12-doc scale path. Each round: labels join onto edges (two
  bucketed hash joins on narrow 16-byte rows), every node takes the min
  label among itself and its neighbors, repeat to fixpoint. Round count is
  O(component diameter); star-shaped LSH edges keep diameters small. A
  BTS-style balanced union-find actor fleet (PAPERS.md) is the next
  refinement if rounds ever dominate.

Cluster ids are the uint64-min member of each component in both paths, so
they agree bit-for-bit (asserted in tests/test_unionfind.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .exchange import bucketed_join, min_by_key
from .hashing import fmix64

_SIGN = np.uint64(1 << 63)


def _enc_np(x: np.ndarray) -> np.ndarray:
    """int64 bit-pattern of u64 → order-preserving int64 (for Min aggs)."""
    return (x.view(np.uint64) ^ _SIGN).view(np.int64)


def _dec_np(x: np.ndarray) -> np.ndarray:
    return (x.view(np.uint64) ^ _SIGN).view(np.int64)


class UnionFind:
    __slots__ = ("parent", "size")

    def __init__(self):
        self.parent: dict[int, int] = {}
        self.size: dict[int, int] = {}

    def find(self, x: int) -> int:
        p = self.parent
        if x not in p:
            p[x] = x
            self.size[x] = 1
            return x
        root = x
        while p[root] != root:
            root = p[root]
        while p[x] != root:  # path compression
            p[x], x = root, p[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.size[ra] < self.size[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        self.size[ra] += self.size[rb]

    def component_map(self) -> tuple[np.ndarray, np.ndarray]:
        """(keys, cluster_ids); cluster id = uint64-min member —
        deterministic regardless of edge order."""
        if not self.parent:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        keys = np.fromiter(self.parent.keys(), dtype=np.int64, count=len(self.parent))
        roots = np.fromiter(
            (self.find(int(k)) for k in keys), dtype=np.int64, count=len(keys)
        )
        min_of_root: dict[int, int] = {}
        order = np.argsort(keys.view(np.uint64), kind="stable")
        for k, r in zip(keys[order].tolist(), roots[order].tolist()):
            if r not in min_of_root:
                min_of_root[r] = k
        cids = np.fromiter(
            (min_of_root[int(r)] for r in roots), dtype=np.int64, count=len(roots)
        )
        return keys, cids


def components_np(a: np.ndarray, b: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized connected components over edge arrays (int64 node ids).

    Min-(uint64)-label propagation with pointer jumping — O(E) numpy work
    per round, O(log n) rounds; produces the same (keys, cluster_ids) as
    ``UnionFind.component_map`` (cluster id = uint64-min member), without
    the per-edge Python dict loop (~10x faster past ~10^5 edges).
    """
    if not len(a):
        return np.empty(0, np.int64), np.empty(0, np.int64)
    nodes = np.unique(np.concatenate([a, b]))  # sorted int64
    n = len(nodes)
    ia = np.searchsorted(nodes, a)
    ib = np.searchsorted(nodes, b)
    # ranks in uint64 order so "min rank" == "min uint64 member"
    uorder = np.argsort(nodes.view(np.uint64), kind="stable")
    rank = np.empty(n, np.int64)
    rank[uorder] = np.arange(n, dtype=np.int64)
    ra, rb = rank[ia], rank[ib]
    lab = np.arange(n, dtype=np.int64)
    while True:
        lab = lab[lab]  # pointer halving
        prev = lab.copy()
        np.minimum.at(lab, ra, lab[rb])
        np.minimum.at(lab, rb, lab[ra])
        if np.array_equal(lab, prev):
            break
    while True:  # full compression
        nxt = lab[lab]
        if np.array_equal(nxt, lab):
            break
        lab = nxt
    nodes_by_rank = nodes[uorder]
    return nodes, nodes_by_rank[lab[rank]]


def components_from_pairs(pairs: Dataset) -> tuple[np.ndarray, np.ndarray]:
    """Stream (a, b) edges into a driver union-find → (keys, cluster_ids)."""
    uf = UnionFind()
    for batch in pairs.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        for x, y in zip(a.tolist(), b.tolist()):
            uf.union(x, y)
    return uf.component_map()


@ray.remote
class UnionFindShard:
    """One shard of the distributed union-find actor fleet.

    Receives edge batches (routed by hash of the edge's min node — a
    node's edges may land on several shards), maintains a local forest,
    and emits a (node → local uint64-min component member) map. The
    driver then merges the per-shard maps: that merge graph has one edge
    per (node, shard) pair — O(V·shards), independent of E, so the O(E)
    union work stays sharded. The actor holds mutable cross-batch state,
    the one thing a Dataset op can't express (SURVEY §7.3).
    """

    def __init__(self):
        self._a: list[np.ndarray] = []
        self._b: list[np.ndarray] = []

    def add_edges(self, a: np.ndarray, b: np.ndarray) -> int:
        # accumulate; the O(E) component work runs vectorized at
        # component_map time (a per-edge Python union loop here was the
        # shard hot path — ~10× slower past 10^5 edges)
        self._a.append(np.asarray(a, np.int64))
        self._b.append(np.asarray(b, np.int64))
        return len(a)

    def component_map(self) -> tuple[np.ndarray, np.ndarray]:
        if not self._a:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return components_np(np.concatenate(self._a), np.concatenate(self._b))


def components_sharded(
    pairs: Dataset, n_shards: int = 4
) -> tuple[np.ndarray, np.ndarray]:
    """Distributed union-find over an actor fleet → (keys, cluster_ids).

    Identical output to ``components_np`` / ``UnionFind`` (uint64-min
    member rule), asserted in tests.
    """
    shards = [UnionFindShard.remote() for _ in range(n_shards)]
    pending = []
    for batch in pairs.iter_batches(batch_size=1 << 18, batch_format="pyarrow"):
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            route = (
                fmix64(np.minimum(a.view(np.uint64), b.view(np.uint64)))
                % np.uint64(n_shards)
            ).astype(np.int64)
        for s in range(n_shards):
            m = route == s
            if m.any():
                pending.append(shards[s].add_edges.remote(a[m], b[m]))
    ray.get(pending)
    maps = ray.get([s.component_map.remote() for s in shards])
    # merge: treat each shard's (node → local_min) as edges of a small graph
    mk = np.concatenate([k for k, _ in maps]) if maps else np.empty(0, np.int64)
    mv = np.concatenate([c for _, c in maps]) if maps else np.empty(0, np.int64)
    for s in shards:
        ray.kill(s)
    return components_np(mk, mv)


def label_propagation(
    pairs: Dataset, n_buckets: int = 32, max_iter: int = 30
) -> Dataset:
    """Distributed connected components → Dataset(node, label) where label
    is the uint64-min member of the node's component (int64 bit-pattern)."""

    def init_labels(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        lo = _enc_np(np.minimum(a.view(np.uint64), b.view(np.uint64)).view(np.int64))
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "label": pa.array(np.concatenate([lo, lo]), pa.int64()),
            }
        )

    labels = (
        min_by_key(
            pairs.map_batches(init_labels, batch_format="pyarrow"),
            "node", "label", n_buckets=n_buckets,
        )
        .repartition(n_buckets)
        .materialize()
    )
    # Block count drives per-iteration cost: checkpoint-loaded edge
    # tables arrive as hundreds of tiny parquet blocks (observed at 2M
    # docs: 800 × ~170 KB for 5.7M edges), and every iteration pays
    # per-block driver scheduling across TWO bucketed joins — the driver
    # pegs one core while workers idle. Repartition once so all
    # iterations run over n_buckets well-sized blocks.
    edges = pairs.repartition(n_buckets).materialize()

    def checksum(lds: Dataset) -> int:
        """Order-insensitive fixpoint detector: XOR of mixed (node, label)
        rows. The XOR fold runs inside map_batches — one 8-byte partial per
        batch reaches the driver, never the label rows themselves."""

        def part(b: pa.Table) -> pa.Table:
            n = b.column("node").to_numpy(zero_copy_only=False).view(np.uint64)
            l = b.column("label").to_numpy(zero_copy_only=False).view(np.uint64)
            with np.errstate(over="ignore"):
                x = int(np.bitwise_xor.reduce(fmix64(n ^ l), initial=np.uint64(0)))
            return pa.table({"x": pa.array([x - (1 << 63)], pa.int64())})

        tot = 0
        for b in lds.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            for v in b.column("x").to_numpy(zero_copy_only=False):
                tot ^= int(v) + (1 << 63)
        return tot

    import os as _os
    import sys as _sys
    import time as _time

    _timing = bool(_os.environ.get("DEDUP_TIMING"))
    _t0 = _time.monotonic()
    prev = checksum(labels)
    for _it in range(max_iter):
        if _timing:
            print(
                f"[label_propagation] iter {_it} start "
                f"(+{_time.monotonic() - _t0:.1f}s)",
                file=_sys.stderr,
                flush=True,
            )
        msgs = []
        for end, other in (("a", "b"), ("b", "a")):
            j = bucketed_join(
                edges,
                labels.map_batches(
                    lambda t, e=end: pa.table(
                        {f"__n_{e}": t.column("node"), f"__l_{e}": t.column("label")}
                    ),
                    batch_format="pyarrow",
                ),
                left_on=end,
                right_on=f"__n_{end}",
                n_buckets=n_buckets,
            )
            msgs.append(
                j.map_batches(
                    lambda t, e=end, o=other: pa.table(
                        {"node": t.column(o), "label": t.column(f"__l_{e}")}
                    ),
                    batch_format="pyarrow",
                )
            )
        labels = (
            min_by_key(labels.union(*msgs), "node", "label", n_buckets=n_buckets)
            .repartition(n_buckets)
            .materialize()
        )
        cur = checksum(labels)
        if cur == prev:
            break
        prev = cur

    def dec(batch: pa.Table) -> pa.Table:
        lab = _dec_np(batch.column("label").to_numpy(zero_copy_only=False))
        return pa.table({"node": batch.column("node"), "label": pa.array(lab, pa.int64())})

    return labels.map_batches(dec, batch_format="pyarrow")
