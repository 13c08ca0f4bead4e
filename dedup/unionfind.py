"""Connected components over verified candidate pairs.

Two implementations:

- ``UnionFind`` + ``components_from_pairs``: driver-side streaming
  union-find (path compression + union by size). Edges stream in batches
  from the (already heavily pruned) verified-pair dataset; memory is
  O(nodes touched by an edge) — duplicate-involved docs only, not the
  corpus. Mirrors the reference's single-process final grouping
  (process_matches.rs:395-401); right tool up to ~10^8 edges.

- ``label_propagation``: distributed min-label propagation over Ray Data
  for the 10^12-doc scale path. One fused bucketed exchange per round over
  17-byte (k, v, kind) rows; static edges live in per-bucket plasma
  blocks (never re-shuffled), only label CHANGES are broadcast to
  neighbors (delta propagation), and pointer-jump request/reply rows keep
  the round count O(log component-diameter). Star-shaped LSH edge sets
  converge in a handful of rounds.

Cluster ids are the uint64-min member of each component in both paths, so
they agree bit-for-bit (asserted in tests/test_unionfind.py).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
from ray.data import Dataset

from .hashing import fmix64

_SIGN = np.uint64(1 << 63)


def _enc_np(x: np.ndarray) -> np.ndarray:
    """int64 bit-pattern of u64 → order-preserving int64 (for Min aggs)."""
    return (x.view(np.uint64) ^ _SIGN).view(np.int64)


# the sign-bit XOR is an involution, so decode IS encode; the second name
# only marks direction at call sites
_dec_np = _enc_np


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
    # one argsort over all endpoints yields nodes AND both endpoint
    # inverses. The old shape — np.unique + per-endpoint searchsorted —
    # paid ~700 ns/lookup of cache-missing binary search on random
    # probes (5.5 s at 5.7M edges, 4/5 of this function's cost);
    # np.unique(return_inverse=True) is no better (7.4 s measured, its
    # internal argsort + extras). This is 1.7 s on the same input.
    cat = np.concatenate([a, b])
    m = len(a)
    order = np.argsort(cat, kind="stable")
    s = cat[order]
    newgrp = np.empty(len(s), dtype=bool)
    newgrp[0] = True
    newgrp[1:] = s[1:] != s[:-1]
    nodes = s[newgrp]  # sorted int64
    n = len(nodes)
    gid = np.cumsum(newgrp) - 1
    inv = np.empty(len(s), np.int64)
    inv[order] = gid
    ia = inv[:m]
    ib = inv[m:]
    # ranks in uint64 order so "min rank" == "min uint64 member". nodes
    # is sorted int64, so uint64-ascending order is just the rotation
    # [non-negatives..., negatives...] — index arithmetic, no argsort.
    k = int(np.searchsorted(nodes, 0))
    idx = np.arange(n, dtype=np.int64)
    rank = np.where(idx >= k, idx - k, idx + (n - k))
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
    nodes_by_rank = np.concatenate([nodes[k:], nodes[:k]])
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

    Receives edge batches (routed by a hash of BOTH endpoints — see
    ``components_sharded`` — so a star component's edges spread across
    shards and its hub becomes a boundary node on several of them),
    maintains a local forest, and emits a (node → local uint64-min
    component member) map. The
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
            # route by a hash of BOTH endpoints: verified edges are
            # canonical (a = uint64-min), so hashing the min endpoint
            # would send a star component's entire edge set to ONE shard
            # (the jumbo-cluster case sharding exists for). Spreading by
            # pair leaves the hub as a boundary node on several shards;
            # the merge below resolves those for free.
            route = (
                fmix64(
                    a.view(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                    ^ b.view(np.uint64)
                )
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


# row kinds flowing through the label-propagation exchanges
_LP_LAB = 0  # (k=node, v=encoded label)
_LP_MSG = 1  # (k=node, v=encoded label candidate)
# kind 2 was the in-exchange edge row of the two-exchange design; edges
# now live in the static per-bucket plasma store and never shuffle
_LP_REQ = 3  # (k=target node, v=requesting node) — pointer-jump request

_LP_SCHEMA = pa.schema([("k", pa.int64()), ("v", pa.int64()), ("kind", pa.int8())])


def _lp_rows(k: np.ndarray, v: np.ndarray, kind: int) -> pa.Table:
    return pa.table(
        {
            "k": pa.array(k, pa.int64()),
            "v": pa.array(v, pa.int64()),
            "kind": pa.array(np.full(len(k), kind, np.int8), pa.int8()),
        }
    )


def _lp_exchange(ds: Dataset, step, n_buckets: int) -> Dataset:
    """Bucket rows by fmix(k) and run ``step`` per co-located bucket —
    the one shuffle primitive both halves of a propagation round use.
    Rows are 17 bytes; nothing wider ever enters the exchange."""

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch.column("k").to_numpy(zero_copy_only=False)
        with np.errstate(over="ignore"):
            b = (fmix64(k.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    return (
        ds.map_batches(bucket, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(step, batch_format="pyarrow")
    )


def _edge_store(
    pairs: Dataset, n_buckets: int
) -> tuple["object", list, dict[int, list[tuple[int, int, int]]]]:
    """Bucket the undirected pairs ONCE into per-bucket directed-edge
    blocks: → (pinned MaterializedDataset, block refs, layout) where
    ``layout[bucket] = [(block_idx, start, len), ...]`` names the row
    slices holding that bucket's edges (sorted by src within a bucket).

    The edge bytes flow task → plasma block; only this slice metadata
    (O(blocks × buckets-per-block)) ever reaches the driver. Per-round
    steps then ``ray.get`` their bucket's blocks (node-cached plasma
    reads) and slice, instead of re-shuffling 2E 17-byte edge rows
    through every exchange — on a multi-round propagation that re-sort
    was the dominant per-round byte cost. The returned dataset handle
    must stay referenced for the blocks' lifetime."""

    def to_edges(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        src = np.concatenate([a, b])
        dst = np.concatenate([b, a])
        with np.errstate(over="ignore"):
            bk = (fmix64(src.view(np.uint64)) % np.uint64(n_buckets)).astype(
                np.int32
            )
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "__bucket": pa.array(bk, pa.int32()),
            }
        )

    def per_bucket(g: pa.Table) -> pa.Table:
        src = g.column("src").to_numpy(zero_copy_only=False)
        o = np.argsort(src, kind="stable")
        return g.take(pa.array(o, pa.int64()))

    bucketed = (
        pairs.map_batches(to_edges, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .materialize()
    )
    try:  # Ray >= 2.10 bundle API; fall back to the legacy accessor
        refs = [
            r
            for bd in bucketed.iter_internal_ref_bundles()
            for r in bd.block_refs
        ]
    except AttributeError:  # pragma: no cover - older Ray
        refs = bucketed.get_internal_block_refs()

    @ray.remote(num_cpus=0)
    def _block_layout(block: pa.Table):
        empty = np.empty(0, np.int64)
        # zero-row upstreams pass through as empty blocks that still carry
        # the INPUT schema (no __bucket column) — no edges, no layout
        if len(block) == 0 or "__bucket" not in block.column_names:
            return empty, empty, empty
        bk = block.column("__bucket").to_numpy(zero_copy_only=False)
        starts = np.concatenate([[0], np.flatnonzero(bk[1:] != bk[:-1]) + 1])
        lens = np.diff(np.append(starts, len(bk)))
        return bk[starts], starts, lens

    layout: dict[int, list[tuple[int, int, int]]] = {}
    for bi, (bks, sts, lns) in enumerate(
        ray.get([_block_layout.remote(r) for r in refs])
    ):
        for b, s, ln in zip(bks.tolist(), sts.tolist(), lns.tolist()):
            layout.setdefault(int(b), []).append((bi, int(s), int(ln)))
    return bucketed, refs, layout


def label_propagation(
    pairs: Dataset, n_buckets: int = 32, max_iter: int = 60,
    stats: dict | None = None,
) -> Dataset:
    """Distributed connected components → Dataset(node, label) where label
    is the uint64-min member of the node's component (int64 bit-pattern).

    Min-label propagation with pointer jumping, ONE fused bucketed
    exchange per round (the previous design paid two — an *answer*
    exchange that also re-shuffled every static edge row each round, and
    a *reduce* exchange):

    - static edges never enter the exchange: they are bucketed ONCE into
      plasma blocks (``_edge_store``) and each step slices its bucket's
      edges out of node-cached blocks;
    - the per-bucket step reduces labels+messages to
      ``new = min(own, neighbors', label(label))``, then — *delta
      propagation* — only nodes whose label CHANGED this step emit
      neighbor messages ``(dst, new_label)``; answers to the previous
      round's jump requests and the next round's requests
      ``(label, node)`` are generated in the same step from the
      post-reduce labels.

    Per-round shuffle bytes are labels + in-flight messages/requests
    (V-bounded + delta-bounded), not 2E + V as before. Convergence is a
    full-state checksum over ALL row kinds: label rows alone would be
    unsound here because replies generated this round are consumed next
    round (a quiet round can precede a reply-driven change). Round count
    stays O(log component-diameter); each fused round is half the old
    round's exchanges, so the count roughly doubles while total exchange
    work drops. Raises RuntimeError if ``max_iter`` rounds pass without
    convergence — a silent un-converged exit would under-merge clusters."""

    def init_rows(batch: pa.Table) -> pa.Table:
        # Reads the DIRECTED edge-store rows (src, dst) — each undirected
        # pair appears once per direction, so one label + one seed
        # message per row reproduces the per-endpoint seeding. Seeding
        # from the materialized store (not a second execution of the
        # caller's pairs lineage) makes store/seed divergence impossible
        # by construction: a lazy, nondeterministically re-executed
        # pairs Dataset could otherwise leave an edge in the store with
        # no seed label (RuntimeError mid-run) or a seeded node with no
        # edge (silent under-merge).
        if len(batch) == 0 or "src" not in batch.column_names:
            return _LP_SCHEMA.empty_table()
        src = batch.column("src").to_numpy(zero_copy_only=False)
        dst = batch.column("dst").to_numpy(zero_copy_only=False)
        lo = _enc_np(
            np.minimum(src.view(np.uint64), dst.view(np.uint64)).view(np.int64)
        )
        return pa.concat_tables(
            [
                # identity labels (deduped by the first fused reduce)
                _lp_rows(src, _enc_np(src), _LP_LAB),
                # seed messages: each endpoint hears the edge's min —
                # the kick-start the delta regime needs (afterwards only
                # label CHANGES are broadcast)
                _lp_rows(src, lo, _LP_MSG),
            ]
        )

    def _min_per_key(k: np.ndarray, v: np.ndarray):
        order = np.lexsort((v, k))
        ks, vs = k[order], v[order]
        first = np.ones(len(ks), dtype=bool)
        if len(ks) > 1:
            first[1:] = ks[1:] != ks[:-1]
        return ks[first], vs[first]  # v sorted within key → first is min

    # built before the closure so fused_step captures refs + layout only
    store_ds, store_refs, store_layout = _edge_store(pairs, n_buckets)

    def fused_step(group: pa.Table) -> pa.Table:
        """One propagation step for one node bucket: reduce incoming
        labels+messages, emit delta neighbor messages from this bucket's
        static edge slice, answer jump requests, issue next requests."""
        kind = group.column("kind").to_numpy(zero_copy_only=False)
        k = group.column("k").to_numpy(zero_copy_only=False)
        v = group.column("v").to_numpy(zero_copy_only=False)
        labm = kind == _LP_LAB
        msgm = kind == _LP_MSG
        reqm = kind == _LP_REQ

        nodes, newlab = _min_per_key(
            np.concatenate([k[labm], k[msgm]]),
            np.concatenate([v[labm], v[msgm]]),
        )
        onodes, oldlab = _min_per_key(k[labm], v[labm])
        if not np.array_equal(nodes, onodes):
            # every message targets an edge endpoint and every endpoint
            # is seeded with a label row in its own bucket — a mismatch
            # means rows were mis-routed; merging would corrupt labels
            raise RuntimeError("label_propagation: message to unlabeled node")
        changed = newlab < oldlab

        out = [_lp_rows(nodes, newlab, _LP_LAB)]

        # delta edge messages: only changed nodes notify their neighbors
        if changed.any():
            # the group carries its bucket id (appended by _lp_exchange
            # before the groupby); reading it — instead of re-hashing a
            # key — cannot desynchronize from the exchange's routing if
            # the bucket formula ever changes (_edge_store uses the same
            # fmix(src) % n_buckets, asserted by the store lookup below)
            bk = int(group.column("__bucket")[0].as_py())
            pieces = store_layout.get(bk)
            if pieces:
                parts = [
                    ray.get(store_refs[bi]).slice(s, ln)
                    for bi, s, ln in pieces
                ]
                et = parts[0] if len(parts) == 1 else pa.concat_tables(parts)
                src = et.column("src").to_numpy(zero_copy_only=False)
                dstc = et.column("dst").to_numpy(zero_copy_only=False)
                cn, cl = nodes[changed], newlab[changed]
                lo = np.searchsorted(src, cn, "left")
                hi = np.searchsorted(src, cn, "right")
                lens = hi - lo
                total = int(lens.sum())
                if total:
                    base = np.repeat(lo, lens)
                    off = np.arange(total) - np.repeat(
                        np.cumsum(lens) - lens, lens
                    )
                    dst = dstc[base + off]
                    lab = np.repeat(cl, lens)
                    # telling dst its own id is a no-op (labels only
                    # decrease); dedupe identical (dst, label) messages
                    useful = lab != _enc_np(dst)
                    dst, lab = dst[useful], lab[useful]
                    if len(dst):
                        order = np.lexsort((lab, dst))
                        dst, lab = dst[order], lab[order]
                        first = np.ones(len(dst), dtype=bool)
                        if len(dst) > 1:
                            first[1:] = (dst[1:] != dst[:-1]) | (
                                lab[1:] != lab[:-1]
                            )
                        out.append(_lp_rows(dst[first], lab[first], _LP_MSG))

        # answer the previous round's jump requests from POST-reduce labels
        if reqm.any():
            tgt = k[reqm]
            i = np.minimum(np.searchsorted(nodes, tgt), len(nodes) - 1)
            ok = nodes[i] == tgt
            req = v[reqm][ok]
            lab = newlab[i][ok]
            useful = lab != _enc_np(req)
            if useful.any():
                out.append(_lp_rows(req[useful], lab[useful], _LP_MSG))

        # next round's requests: every non-root asks for label(label)
        nonroot = newlab != _enc_np(nodes)
        if nonroot.any():
            out.append(
                _lp_rows(_dec_np(newlab[nonroot]), nodes[nonroot], _LP_REQ)
            )
        return pa.concat_tables(out)

    def checksum(state: Dataset) -> int:
        """Order-insensitive FULL-state fixpoint detector: XOR of mixed
        (k, v, kind) over every row kind. Label rows alone are not
        enough — replies emitted this round land next round, so a state
        with identical labels but different in-flight messages is not a
        fixpoint. One 8-byte partial per batch reaches the driver."""

        def part(b: pa.Table) -> pa.Table:
            n = b.column("k").to_numpy(zero_copy_only=False).view(np.uint64)
            l = b.column("v").to_numpy(zero_copy_only=False).view(np.uint64)
            kd = b.column("kind").to_numpy(zero_copy_only=False).astype(np.uint64)
            with np.errstate(over="ignore"):
                x = int(
                    np.bitwise_xor.reduce(
                        fmix64(fmix64(n ^ (kd * np.uint64(0x9E3779B97F4A7C15))) ^ l),
                        initial=np.uint64(0),
                    )
                )
            return pa.table({"x": pa.array([x - (1 << 63)], pa.int64())})

        tot = 0
        for b in state.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"
        ):
            for val in b.column("x").to_numpy(zero_copy_only=False):
                tot ^= int(val) + (1 << 63)
        return tot

    import os as _os
    import sys as _sys
    import time as _time

    _timing = bool(_os.environ.get("DEDUP_TIMING"))
    _t0 = _time.monotonic()

    from .exchange import ensure_schema

    # round 0: the fused step over the seed rows — dedupes identity
    # labels, applies seed messages, emits the first delta messages and
    # jump requests
    state = _lp_exchange(
        ensure_schema(
            store_ds.map_batches(init_rows, batch_format="pyarrow"), _LP_SCHEMA
        ),
        fused_step,
        n_buckets,
    ).materialize()
    prev = checksum(state)
    converged = False
    rounds = 1
    for _it in range(max_iter):
        rounds += 1
        if _timing:
            print(
                f"[label_propagation] round {_it} start "
                f"(+{_time.monotonic() - _t0:.1f}s)",
                file=_sys.stderr,
                flush=True,
            )
        state = _lp_exchange(state, fused_step, n_buckets).materialize()
        cur = checksum(state)
        if cur == prev:
            converged = True
            break
        prev = cur
    if stats is not None:
        stats["rounds"] = rounds
    if not converged:
        raise RuntimeError(
            f"label_propagation did not converge in {max_iter} rounds; "
            "with pointer jumping this needs ~2·log2(component size) "
            "fused rounds — raise max_iter or inspect the edge set for "
            "anomalies"
        )

    def dec(batch: pa.Table) -> pa.Table:
        kind = batch.column("kind").to_numpy(zero_copy_only=False)
        m = pa.array(kind == _LP_LAB)
        t = batch.filter(m)
        lab = _dec_np(t.column("v").to_numpy(zero_copy_only=False))
        return pa.table(
            {"node": t.column("k"), "label": pa.array(lab, pa.int64())}
        )

    return state.map_batches(dec, batch_format="pyarrow")
