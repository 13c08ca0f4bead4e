"""Semantic deduplication (SemDeDup-style): k-means cells → within-cell
cosine near-dup components → one representative kept per component.

Public-knowledge design (Abbas et al., "SemDeDup: Data-efficient learning
at web-scale through semantic deduplication", arXiv:2303.09540): embed the
corpus, coarse-cluster the embeddings with k-means, and consider duplicate
candidates only WITHIN a cluster — the pairwise O(n²) cost collapses to
Σ O(|cell|²), and each cell is independently parallelizable. The reference
analogue is the cascade's group-then-refine shape (size group → checksum
group, src/process_matches.rs:243-288): a cheap coarse key bounds where the
expensive comparison ever runs.

Ray-Data restatement:
  assign   map_batches(batch → argmax(X @ Cᵀ)) with the centroid matrix
           broadcast once via ray.put (never re-shipped per batch)
  cells    groupby("__cell").map_groups — low-cardinality key (n_cells ≪ n,
           the paper's regime is ~√n cells so |cell| ~ √n per worker),
           which is exactly the regime where map_groups is safe
           (see lsh.py's rule of thumb)
  reduce   per cell: tiled pairwise cosine (row tiles × cell — never an
           unbounded n² allocation), threshold edges, vectorized connected
           components (unionfind.components_np), keep-policy per component

Scale assumption (documented per the north rule): one cell must fit one
worker's memory. At 10^9+ vectors raise n_cells so |cell| stays ~10^4-10^5;
the assignment pass is embarrassingly parallel and the per-cell reduce is
O(|cell|² / tile) FLOPs on a worker, no shuffle beyond the single
groupby("__cell") exchange of (vec_id, cell, embedding) rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
from ray.data import Dataset

from .embed import _emb_matrix, _normalize, ivf_build
from .unionfind import components_np

_OUT_SCHEMA = pa.schema(
    [
        ("vec_id", pa.int64()),
        ("cell", pa.int32()),
        ("rep_id", pa.int64()),
        ("kept", pa.bool_()),
    ]
)


def _empty_out() -> pa.Table:
    return _OUT_SCHEMA.empty_table()


def semantic_dedup(
    embeddings: Dataset,
    threshold: float = 0.95,
    n_cells: int = 16,
    keep: str = "min_id",
    exact_verify: bool = False,
    id_col: str = "vec_id",
    emb_col: str = "embedding",
    tile: int = 2048,
) -> Dataset:
    """SemDeDup over an embedding Dataset → Dataset(vec_id, cell, rep_id,
    kept) — one row per input vector, streamed out of the per-cell
    reduce. The output is NEVER materialized on the driver here (at
    10^10 vectors it is a whole-corpus table); consumers that need a
    sorted Arrow table at sandbox scale use ``semantic_dedup_table``.
    ≅ the reference's streaming sink handoff (src/main.rs:143-166).

    Every input row appears exactly once. ``rep_id`` is the representative
    of the row's within-cell duplicate component (its own id when the row
    has no duplicates); ``kept`` marks the representative. Keep policies:

    - ``min_id``: deterministic smallest vec_id (oracle-friendly).
    - ``centroid_far``: the member with the LOWEST cosine similarity to the
      cell centroid (the SemDeDup paper's choice — keeps the least
      prototypical example); ties broken by min vec_id.

    ``exact_verify=True`` additionally requires candidate pairs to be
    bit-identical raw vectors (exact-duplicate mode). Because the cell
    assignment is a deterministic function of the vector, identical vectors
    always share a cell and the within-cell comparison is exhaustive, so
    exact mode partitions the corpus by identical embedding — the
    SQL-expressible contract `semantic_dedup_exact_mode` pins.
    """
    if keep not in ("min_id", "centroid_far"):
        # an unknown policy must not fall through to components_np's
        # uint64-min labels (plausible-looking but undocumented reps)
        raise ValueError(f"unknown keep policy {keep!r}")
    C = ivf_build(embeddings, n_centroids=n_cells, emb_col=emb_col, id_col=id_col)
    cref = ray.put(C)

    def assign(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    emb_col: batch.column(emb_col),
                    "__cell": pa.array([], pa.int32()),
                }
            )
        Cm = ray.get(cref)
        X = _normalize(_emb_matrix(batch, emb_col))
        cell = np.argmax(X @ Cm.T, axis=1).astype(np.int32)
        return pa.table(
            {
                id_col: batch.column(id_col).cast(pa.int64()),
                emb_col: batch.column(emb_col),
                "__cell": pa.array(cell, pa.int32()),
            }
        )

    def per_cell(group: pa.Table) -> pa.Table:
        m = len(group)
        if m == 0:
            return _empty_out()
        ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        cell = int(group.column("__cell")[0].as_py())
        raw = _emb_matrix(group, emb_col)
        X = _normalize(raw)
        cvec = ray.get(cref)[cell]
        # tiled upper-triangular pairwise cosine: rows [t, t+tile) × all
        # later rows — memory per tile is O(tile × m), never O(m²)
        ea, eb = [], []
        for t0 in range(0, m, tile):
            t1 = min(t0 + tile, m)
            sims = X[t0:t1] @ X.T  # (tile, m)
            ii, jj = np.nonzero(sims >= threshold)
            gi = ii + t0
            mask = gi < jj  # strict upper triangle only
            gi, jj = gi[mask], jj[mask]
            if exact_verify and len(gi):
                eq = np.all(raw[gi] == raw[jj], axis=1)
                gi, jj = gi[eq], jj[eq]
            ea.append(ids[gi])
            eb.append(ids[jj])
        if exact_verify:
            # all-zero embeddings are bit-identical yet score cosine 0
            # (the normalize clamp), so the threshold gate alone would
            # never pair them — chain them here so the documented
            # "partitions by identical embedding" contract (and the
            # exact-mode SQL oracle's PARTITION BY e) holds for
            # zero/padding vectors too
            zn = np.flatnonzero(~np.any(raw, axis=1))
            if len(zn) > 1:
                ea.append(ids[zn[:-1]])
                eb.append(ids[zn[1:]])
        a = np.concatenate(ea) if ea else np.empty(0, np.int64)
        b = np.concatenate(eb) if eb else np.empty(0, np.int64)
        rep = ids.copy()  # default: every row its own representative
        if len(a):
            keys, comp = components_np(a, b)  # comp label = uint64-min member
            if keep == "min_id":
                # the documented contract (and the oracle SQL's MIN(vec_id))
                # is the SIGNED smallest id — components_np's uint64-min
                # label diverges for negative int64 ids, so re-pick the
                # representative per component in int64 order. comp stays
                # a valid group label either way.
                o = np.lexsort((keys, comp))
                c_s, k_s = comp[o], keys[o]
                starts = np.concatenate([[True], c_s[1:] != c_s[:-1]])
                rep_sorted = k_s[starts][np.cumsum(starts) - 1]
                new = np.empty_like(keys)
                new[o] = rep_sorted
                comp = new
            if keep == "centroid_far":
                # re-pick the representative per component: least-prototypical
                # member (min cosine to centroid), tie-break min vec_id
                pos = np.searchsorted(np.sort(ids), keys)
                order = np.argsort(ids, kind="stable")
                kidx = order[pos]  # row index of each component member
                csim = X[kidx] @ cvec
                df = pd.DataFrame({"comp": comp, "id": keys, "csim": csim})
                winners = (
                    df.sort_values(["comp", "csim", "id"])
                    .groupby("comp", sort=False)
                    .first()["id"]
                )
                comp = winners.loc[df["comp"]].to_numpy()
            pos = np.searchsorted(keys, ids)
            pos_c = np.clip(pos, 0, len(keys) - 1)
            hit = keys[pos_c] == ids
            rep[hit] = np.asarray(comp)[pos_c[hit]]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cell": pa.array(np.full(m, cell, dtype=np.int32), pa.int32()),
                "rep_id": pa.array(rep, pa.int64()),
                "kept": pa.array(rep == ids),
            }
        )

    from .exchange import ensure_schema

    out = (
        embeddings.map_batches(assign, batch_format="pyarrow")
        .groupby("__cell")
        .map_groups(per_cell, batch_format="pyarrow")
    )
    # empty-input safety: a zero-row embeddings Dataset yields zero groups
    # and a schema-less Dataset; the typed empty union costs nothing
    return ensure_schema(out, _OUT_SCHEMA)


def semantic_dedup_table(embeddings: Dataset, **kwargs) -> pa.Table:
    """Sandbox-scale convenience: run ``semantic_dedup`` and collect the
    result to one Arrow table sorted by vec_id. Driver-side by design —
    use only where the corpus fits driver memory (tests, oracles)."""
    from .exchange import collect_table

    tbl = collect_table(semantic_dedup(embeddings, **kwargs))
    if len(tbl) == 0:
        return _empty_out()
    return tbl.select(_OUT_SCHEMA.names).sort_by("vec_id")
