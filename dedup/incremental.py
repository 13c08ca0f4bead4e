"""Incremental dedup against a persisted corpus index.

The between-crawl-snapshots operator a training-data pipeline needs:
dedup a NEW batch of pages against an already-deduplicated corpus
WITHOUT re-processing the corpus. The index is partitioned parquet on
shared storage — the signature table (one row per distinct content
identity: doc_hash, MinHash sig, set_hash), stamped with the config
fingerprint — and a batch run streams the index exactly once with
size-guarded membership tests: nothing corpus-sized is ever collected
on the driver or re-signed.

Reference analogue: the SQLite checksum DB the reference resumes from
(``file_db.rs:353-454`` ``get_with_checksum`` — previously hashed files
are never re-hashed), generalized to near-dup signatures and a
multi-snapshot corpus lifecycle (build → dedup batch → append).

Semantics (append-only corpus — history is never rewritten):

- a new page whose ``doc_hash`` already exists in the index is an exact
  duplicate of the corpus → dropped (``exact_corpus``);
- a new page whose connected component (over verified near-dup edges,
  which may pass through other new docs) reaches ANY index doc →
  dropped (``near_corpus``) — the corpus representative stays even when
  the new url would sort lower, because append-only corpora do not
  replace already-published representatives;
- the remaining new pages dedup among themselves with the
  ``near_dup_corpus`` policy: each cluster (near-dup component ∪ exact
  doc_hash group) keeps its lexicographic-min-url page
  (``near_batch`` / ``exact_batch`` drops);
- ``update_index`` appends the kept pages' signature rows as NEW
  parquet files in the same directory (no rewrite of existing parts)
  and bumps the manifest.

Data movement at scale (new batch ≪ corpus, the normal regime): each
batch run scans only the index's NARROW tables — the 8 B/doc hash
column for exact membership and the persisted 16 B/row ``bands`` table
(precomputed at build/update time) for LSH probing; the 1 KB/doc
signature rows are fetched only for band-bucket-sharing candidates,
with the membership filter pushed into the parquet scan. Membership
tests are size-guarded via ``semi_filter_auto``: broadcast while the
batch's key set fits ``cfg.broadcast_max_rows``, bucketed hash join
past it. Candidate pairs, verified edges and the drop report are
bounded by duplicate-INVOLVED docs, not by the corpus or the batch.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from .config import DedupConfig
from .exchange import (
    collect_table,
    dup_keys,
    member_probe,
    semi_filter,
    semi_filter_auto,
)
from .hashing import xxh64_arrow
from .ingest import ingest
from .lsh import band_rows, candidate_pairs
from .minhash import sign
from .pipeline import _filter_edges_by_set_hash, distinct_reps
from .unionfind import components_np
from .verify import verify_auto

INDEX_SCHEMA_VERSION = 1


def _paths(index_dir: str) -> tuple[str, str, str]:
    return (
        os.path.join(index_dir, "sigs"),
        os.path.join(index_dir, "bands"),
        os.path.join(index_dir, "manifest.json"),
    )


def _manifest(index_dir: str) -> dict | None:
    _, _, mpath = _paths(index_dir)
    if not os.path.exists(mpath):
        return None
    with open(mpath) as f:
        return json.load(f)


def _write_manifest(index_dir: str, cfg: DedupConfig, n_docs: int) -> None:
    _, _, mpath = _paths(index_dir)
    tmp = mpath + ".tmp"
    with open(tmp, "w") as f:
        json.dump(
            {
                "schema_version": INDEX_SCHEMA_VERSION,
                "config_fingerprint": cfg.fingerprint(),
                # persisted slot width: the fingerprint excludes sig_bytes
                # at its default, so the layout must be stamped explicitly
                # (an old 8-byte index probed under sig_bytes=4 would
                # otherwise fail deep inside a union with an opaque error)
                "sig_bytes": cfg.sig_bytes,
                "n_docs": int(n_docs),
            },
            f,
        )
    os.replace(tmp, mpath)  # atomic: a killed run leaves the old manifest


def _check_manifest(index_dir: str, cfg: DedupConfig) -> dict:
    mf = _manifest(index_dir)
    if mf is None:
        raise FileNotFoundError(f"no index manifest under {index_dir}")
    # sig_bytes is normalized out of the comparison: the explicit
    # ``sig_bytes`` manifest stamp below is the authority on slot-width
    # comparability, and a pre-v6 index's stored fingerprint was computed
    # by code with no sig_bytes field at all — so following the width
    # error's own advice ("set sig_bytes=8") must not then trip the
    # fingerprint gate (the normalized form, sig_bytes at default, is
    # byte-identical to the pre-v6 fingerprint).
    from dataclasses import replace

    from .config import DEFAULT

    # Width first: when the only disagreement is the slot width, the user
    # must see the actionable "set sig_bytes=N" message, not a generic
    # fingerprint error (a v6 8-byte index opened under the 4-byte default
    # would otherwise trip the fingerprint gate — sig_bytes=8 is
    # fingerprinted off-default — before ever reaching this check).
    stored_width = mf.get("sig_bytes", 8)  # pre-stamp indexes are 8-byte
    if stored_width != cfg.sig_bytes:
        raise ValueError(
            f"index stores {stored_width}-byte signature slots but the "
            f"config expects sig_bytes={cfg.sig_bytes}; rebuild the index "
            f"or set sig_bytes={stored_width}"
        )
    acceptable = {cfg.fingerprint(),
                  replace(cfg, sig_bytes=DEFAULT.sig_bytes).fingerprint()}
    if mf.get("config_fingerprint") not in acceptable:
        # ≅ the reference invalidating checksums when hash params change
        # (file_db.rs:311-342): signatures under a different shingle/perm
        # config are not comparable — refuse instead of silently missing dups
        raise ValueError(
            "index was built with a different config fingerprint; "
            "rebuild the index or use the original config"
        )
    return mf


def build_index(pages: Dataset, cfg: DedupConfig, index_dir: str) -> dict:
    """Corpus pages → persisted signature index (the corpus is assumed
    already deduplicated; if not, run ``near_dup_corpus`` first).

    Writes to ``<index_dir>.tmp`` then renames, so a killed build never
    leaves a half-index behind a valid manifest."""
    tmp = index_dir.rstrip("/") + ".tmp"
    sigs_dir, bands_dir, _ = _paths(tmp)
    if os.path.exists(tmp):
        import shutil

        shutil.rmtree(tmp)
    os.makedirs(sigs_dir, exist_ok=True)
    os.makedirs(bands_dir, exist_ok=True)
    ing = ingest(pages, cfg)
    reps = distinct_reps(
        ing, n_buckets=cfg.join_buckets, max_broadcast_rows=cfg.broadcast_max_rows
    )
    sigs = sign(reps, cfg)
    sigs.write_parquet(sigs_dir)
    # precomputed band table: each batch run probes (doc_hash, bkey) rows
    # (16 B/row) instead of re-reading + re-banding every 1 KB signature —
    # the per-batch index scan a 100-TB corpus actually pays
    band_rows(
        rd.read_parquet(sigs_dir, columns=["doc_hash", "sig", "n_shingles"]), cfg
    ).write_parquet(bands_dir)
    n = rd.read_parquet(sigs_dir, columns=["doc_hash"]).count()
    from .bloom import write_bloom_sidecar

    write_bloom_sidecar(tmp)
    _write_manifest(tmp, cfg, n)
    if os.path.exists(index_dir):
        import shutil

        shutil.rmtree(index_dir)
    os.replace(tmp, index_dir)
    return _manifest(index_dir)  # type: ignore[return-value]


@dataclass
class IncrementalResult:
    kept: Dataset  # surviving batch pages (url, size_bytes) — streams
    # drop report (url, doc_hash, reason, matched): bounded by
    # duplicate-involved batch pages. reason ∈ {exact_corpus, near_corpus,
    # exact_batch, near_batch}; matched = corpus doc_hash / batch rep hash
    report: pa.Table
    # signature rows of the KEPT batch docs — feed to update_index
    kept_sigs: Dataset


_REPORT_EMPTY = pa.table(
    {
        "url": pa.array([], pa.string()),
        "doc_hash": pa.array([], pa.int64()),
        "reason": pa.array([], pa.string()),
        "matched": pa.array([], pa.int64()),
    }
)


def incremental_dedup(
    new_pages: Dataset, index_dir: str, cfg: DedupConfig | None = None
) -> IncrementalResult:
    """Dedup a new batch against the persisted index (see module doc)."""
    cfg = cfg or DedupConfig()
    _check_manifest(index_dir, cfg)
    sigs_dir, bands_dir, _ = _paths(index_dir)
    # column-pruned index scans: membership needs doc_hash only; banding
    # needs (doc_hash, sig); verification adds set_hash in exact mode
    old_docs = rd.read_parquet(sigs_dir, columns=["doc_hash"])

    ing = ingest(new_pages, cfg).materialize()
    if ing.count() == 0:
        empty_kept = pa.table(
            {
                "url": pa.array([], pa.string()),
                "size_bytes": pa.array([], pa.int64()),
                "doc_hash": pa.array([], pa.int64()),
            }
        )
        return IncrementalResult(
            kept=rd.from_arrow(empty_kept),
            report=_REPORT_EMPTY,
            kept_sigs=rd.from_arrow(empty_kept.select(["doc_hash"])),
        )
    dups = dup_keys(ing, "doc_hash")  # batch-internal exact-dup hashes
    reps = distinct_reps(
        ing, dups=dups, n_buckets=cfg.join_buckets,
        max_broadcast_rows=cfg.broadcast_max_rows,
    )
    new_sigs = sign(reps, cfg).materialize()

    # ---- 1. exact vs corpus: index hashes that occur in the batch.
    # The batch's hash set is batch-bounded; the membership filter over
    # the corpus-sized index is size-guarded (broadcast | bucketed join).
    new_hashes = np.sort(
        collect_table(new_sigs.select_columns(["doc_hash"]))
        .column("doc_hash")
        .to_numpy(zero_copy_only=False)
    )
    # Bloom prescreen (sidecar written at build/update time): keys the
    # filter rejects are DEFINITELY not in the corpus — no false
    # negatives — so the exact probe below only pays for the maybe-set
    # (true dups + fpp·batch). Output is identical with or without the
    # sidecar (tests/test_bloom.py::test_incremental_bloom_identical).
    probe_hashes = new_hashes
    from .bloom import has_bloom_sidecar

    if has_bloom_sidecar(index_dir):
        from .bloom import read_bloom_sidecar

        _bf = read_bloom_sidecar(index_dir)
        probe_hashes = new_hashes[
            _bf.contains_many(new_hashes.view(np.uint64))
        ]
    if len(probe_hashes) == 0:
        # Bloom has no false negatives: an empty maybe-set proves no
        # batch key is in the corpus, so the corpus-sized index scan is
        # skipped entirely — the all-new-content case the sidecar
        # exists for pays zero corpus I/O
        exact_old = np.empty(0, np.int64)
    else:
        exact_old = np.unique(
            collect_table(
                semi_filter_auto(
                    old_docs, "doc_hash", probe_hashes,
                    max_broadcast_rows=cfg.broadcast_max_rows,
                    n_buckets=cfg.join_buckets,
                )
            )
            .column("doc_hash")
            .to_numpy(zero_copy_only=False)
        )

    # ---- 2. near-dup candidates: batch bands ∪ (index bands that share a
    # band key with the batch). The exact drop removed old∩new hashes from
    # the NEW side, but the index's band rows still carry them — endpoint
    # classification below treats any hash in ``exact_old`` as corpus.
    active_sigs = semi_filter(new_sigs, "doc_hash", exact_old, keep=False)
    bands_new = band_rows(active_sigs, cfg).materialize()
    nb_keys = np.unique(
        collect_table(bands_new.select_columns(["bkey"]))
        .column("bkey")
        .to_numpy(zero_copy_only=False)
    )
    sig_cols = ["doc_hash", "sig", "n_shingles"] + (
        ["set_hash"] if cfg.exact_set_verify else []
    )
    if os.path.isdir(bands_dir):
        bands_idx = rd.read_parquet(bands_dir, columns=["doc_hash", "bkey"])
    else:  # index built before band persistence: band the sig table once
        bands_idx = band_rows(
            rd.read_parquet(sigs_dir, columns=["doc_hash", "sig", "n_shingles"]), cfg
        )
    # materialize: consumed twice (candidate generation below + the
    # old_cand collect) — without this the corpus-sized index bands scan
    # and its size-guarded membership filter would re-execute per
    # consumer. The hit set itself is bounded by band-key collisions
    # with the batch, not by the corpus.
    bands_old_hit = semi_filter_auto(
        bands_idx.select_columns(["doc_hash", "bkey"]), "bkey", nb_keys,
        max_broadcast_rows=cfg.broadcast_max_rows, n_buckets=cfg.join_buckets,
    ).materialize()
    pairs, chain = candidate_pairs(bands_new.union(bands_old_hit), cfg)
    if len(chain):
        pairs = pairs.union(rd.from_arrow(chain))
    # drop old–old pairs before verification: the corpus is already
    # deduplicated; only pairs touching the batch matter
    nh_sorted = new_hashes

    def _touches_new(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        return batch.filter(
            pa.array(
                member_probe(nh_sorted, None, a) | member_probe(nh_sorted, None, b)
            )
        )

    pairs = pairs.map_batches(_touches_new, batch_format="pyarrow")

    # signatures for verification: new + the old docs that hit a shared
    # band bucket (bounded by candidate-involved docs, not the corpus)
    old_cand = np.unique(
        collect_table(bands_old_hit.select_columns(["doc_hash"]))
        .column("doc_hash")
        .to_numpy(zero_copy_only=False)
    )
    # fetch the candidate docs' signatures. When the candidate set is
    # modest, push the membership filter into the parquet scan itself so
    # non-candidate signature rows (the 1 KB/doc bulk of the index) never
    # enter the object store; past that, stream the scan through the
    # size-guarded membership filter.
    import pyarrow.compute as pc

    if len(old_cand) <= (1 << 17):
        old_sig_rows = rd.read_parquet(
            sigs_dir,
            columns=sig_cols,
            filter=pc.field("doc_hash").isin(pa.array(old_cand, pa.int64())),
        )
    else:
        old_sig_rows = semi_filter_auto(
            rd.read_parquet(sigs_dir, columns=sig_cols), "doc_hash", old_cand,
            max_broadcast_rows=cfg.broadcast_max_rows, n_buckets=cfg.join_buckets,
        )
    sigs_union = active_sigs.select_columns(sig_cols).union(old_sig_rows).materialize()
    edges = verify_auto(pairs, sigs_union, cfg)
    if cfg.exact_set_verify and len(edges):
        edges = _filter_edges_by_set_hash(edges, sigs_union, cfg)

    # ---- 3. classify batch pages (driver work bounded by dup-involved)
    ea = edges.column("a").to_numpy(zero_copy_only=False)
    eb = edges.column("b").to_numpy(zero_copy_only=False)
    nodes, labels = components_np(ea, eb)

    # the shared sorted-membership kernel (exchange.member_probe without
    # a prefilter table) replaces two private copies of the clipped
    # searchsorted that had to track its semantics by hand
    def _member(sorted_keys: np.ndarray, x: np.ndarray) -> np.ndarray:
        return member_probe(sorted_keys, None, x)

    # a node is NEW only if it's a batch hash that is NOT also in the index:
    # exact-dropped hashes were removed from the new side before banding,
    # but the index's band rows still carry them — such an endpoint IS the
    # corpus, so its component must drop as near_corpus
    node_new = _member(nh_sorted, nodes) & ~_member(exact_old, nodes)
    # component → contains-an-old-doc?  (old endpoints are bounded by
    # verified-edge-involved docs)
    old_labels = np.unique(labels[~node_new])
    in_old_comp = np.isin(labels, old_labels)
    # for near_corpus reporting: one old member per tainted component
    rep_old: dict[int, int] = {}
    for lab, nd in zip(labels[~node_new].tolist(), nodes[~node_new].tolist()):
        rep_old.setdefault(lab, nd)

    # involved batch hashes: in a component, exact-dup within batch, or
    # exact corpus dup — everything else streams through untouched
    involved = np.unique(
        np.concatenate([nodes[node_new], dups, exact_old])
    ) if (len(nodes) or len(dups) or len(exact_old)) else np.empty(0, np.int64)

    if len(involved):
        inv_pages = collect_table(
            semi_filter(ing.select_columns(["url", "doc_hash"]), "doc_hash", involved)
        )
        urls = np.asarray(inv_pages.column("url").to_pylist(), dtype=object)
        hashes = inv_pages.column("doc_hash").to_numpy(zero_copy_only=False)
        # group key: component label where the hash is a component member,
        # else the hash itself (pure exact-dup group)
        gk = hashes.copy()
        if len(nodes):
            i = np.minimum(np.searchsorted(nodes, hashes), len(nodes) - 1)
            hit = nodes[i] == hashes
            gk[hit] = labels[i[hit]]
        e_old = np.zeros(len(hashes), bool)
        if len(exact_old):
            j = np.minimum(np.searchsorted(exact_old, hashes), len(exact_old) - 1)
            e_old = exact_old[j] == hashes
        n_old_comp = np.zeros(len(hashes), bool)
        if len(old_labels):
            k = np.minimum(np.searchsorted(old_labels, gk), len(old_labels) - 1)
            n_old_comp = (old_labels[k] == gk) & ~e_old
        # min-url representative per surviving group
        free = ~(e_old | n_old_comp)
        keep_mask = np.zeros(len(hashes), bool)
        if free.any():
            order = np.lexsort((urls[free], gk[free]))
            gks, idxs = gk[free][order], np.flatnonzero(free)[order]
            first = np.ones(len(gks), bool)
            first[1:] = gks[1:] != gks[:-1]
            keep_mask[idxs[first]] = True
        reasons = np.empty(len(hashes), object)
        matched = np.zeros(len(hashes), np.int64)
        reasons[e_old] = "exact_corpus"
        matched[e_old] = hashes[e_old]  # the corpus holds this same hash
        reasons[n_old_comp] = "near_corpus"
        if len(old_labels):
            for t in np.flatnonzero(n_old_comp).tolist():
                matched[t] = rep_old.get(int(gk[t]), 0)
        batch_drop = free & ~keep_mask
        # exact_batch: dropped page whose doc_hash equals its group's kept
        # page's hash (same content); near_batch otherwise
        kept_hash_per_gk: dict[int, int] = {
            int(gk[t]): int(hashes[t]) for t in np.flatnonzero(keep_mask).tolist()
        }
        for t in np.flatnonzero(batch_drop).tolist():
            m = kept_hash_per_gk[int(gk[t])]
            matched[t] = m
            reasons[t] = "exact_batch" if m == int(hashes[t]) else "near_batch"
        drop_mask = ~keep_mask & ~free | batch_drop
        report = pa.table(
            {
                "url": pa.array(urls[drop_mask].tolist(), pa.string()),
                "doc_hash": pa.array(hashes[drop_mask], pa.int64()),
                "reason": pa.array(reasons[drop_mask].tolist(), pa.string()),
                "matched": pa.array(matched[drop_mask], pa.int64()),
            }
        )
        drop_urls = urls[drop_mask]
        kept_hash_drop = np.setdiff1d(
            np.unique(hashes), np.unique(hashes[keep_mask])
        )
    else:
        report = _REPORT_EMPTY
        drop_urls = np.empty(0, object)
        kept_hash_drop = np.empty(0, np.int64)

    # ---- 4. kept pages stream out via a hashed url anti-filter (the
    # same dup-bounded pattern as near_dup_corpus — the batch itself
    # never collects)
    drop_url_hashes = (
        np.sort(xxh64_arrow(pa.array(drop_urls.tolist(), pa.string())).view(np.int64))
        if len(drop_urls)
        else np.empty(0, np.int64)
    )

    def add_url_hash(batch: pa.Table) -> pa.Table:
        u = batch.column("url")
        if isinstance(u, pa.ChunkedArray):
            u = u.combine_chunks()
        h = xxh64_arrow(u)
        return batch.append_column("url_hash", pa.array(h.view(np.int64), pa.int64()))

    kept = (
        semi_filter_auto(
            ing.select_columns(["url", "size_bytes", "doc_hash"]).map_batches(
                add_url_hash, batch_format="pyarrow"
            ),
            "url_hash",
            drop_url_hashes,
            keep=False,
            max_broadcast_rows=cfg.broadcast_max_rows,
            n_buckets=cfg.join_buckets,
        )
        .select_columns(["url", "size_bytes", "doc_hash"])
    )

    # kept signature rows = new sigs minus fully-dropped doc_hashes. The
    # drop set is derived from the involved arrays already in hand
    # (re-running the kept pipeline and collecting every kept hash would
    # re-execute the batch ingest and put a BATCH-sized array on the
    # driver; this stays bounded by duplicate-involved docs). A hash
    # outside `involved` always has a kept page, so only involved hashes
    # with zero kept rows drop.
    kept_sigs = semi_filter(new_sigs, "doc_hash", kept_hash_drop, keep=False)
    return IncrementalResult(kept=kept, report=report, kept_sigs=kept_sigs)


def update_index(index_dir: str, kept_sigs: Dataset, cfg: DedupConfig) -> dict:
    """Append the kept batch docs' signature rows to the index (new
    parquet files only — existing parts are never rewritten) and bump
    the manifest. Crash-ordering rule — every earlier artifact must be a
    SUPERSET of what later artifacts imply, so a crash between any two
    steps degrades toward extra work, never silent false negatives:

    1. Bloom sidecar first: extra bits for rows that never landed are a
       false "maybe" that just triggers the exact probe; the reverse
       order would leave false NEGATIVES and silently keep duplicates.
    2. Band rows BEFORE sig rows: orphaned band rows (bands written,
       crash before sigs) only generate candidates whose signatures are
       absent, so their pairs drop at verification, and the next batch
       re-adds the docs wholesale — self-healing. The reverse order
       left docs in sigs with no band rows: PERMANENTLY invisible to
       near-dup candidate generation (no later update repairs them).
    3. Crash between the sig write and the manifest bump leaves extra
       sig rows with a stale count — harmless for membership (the rows
       are genuine) and fixed by the next successful update."""
    mf = _check_manifest(index_dir, cfg)
    sigs_dir, bands_dir, _ = _paths(index_dir)
    n_add = kept_sigs.count()
    if n_add:
        kept_sigs = kept_sigs.materialize()
        # sidecar FIRST (superset-safe ordering, see docstring): OR the
        # new keys into the existing filter — no rebuild, bits only ever
        # set. Capacity overrun past the built-for n only raises fpp,
        # never breaks correctness (the exact probe confirms every maybe).
        from .bloom import _write_sidecar_obj, has_bloom_sidecar, read_bloom_sidecar

        if has_bloom_sidecar(index_dir):
            bf = read_bloom_sidecar(index_dir)
            for b in kept_sigs.select_columns(["doc_hash"]).iter_batches(
                batch_size=1 << 18, batch_format="pyarrow"
            ):
                bf.add_many(
                    b.column("doc_hash").to_numpy(zero_copy_only=False)
                )
            _write_sidecar_obj(index_dir, bf)
        if os.path.isdir(bands_dir):
            band_rows(kept_sigs, cfg).write_parquet(bands_dir)
        kept_sigs.write_parquet(sigs_dir)
    _write_manifest(index_dir, cfg, mf["n_docs"] + n_add)
    return _manifest(index_dir)  # type: ignore[return-value]
