"""Per-domain (host) operators over the pages corpus.

Web-scale training pipelines budget per registered domain: boilerplate
farms and SEO mirrors concentrate in a few hosts, so corpora are
routinely *frequency-capped* per domain (RefinedWeb/FineWeb-style
"keep at most N pages per host") and audited with per-domain stats.
No reference analogue (the reference walks one filesystem); the
grouping machinery mirrors its size/checksum group engine
(process_matches.rs:293-407) keyed on host instead of size.

Scale notes:

- host extraction is one Arrow RE2 ``extract_regex`` per batch — no
  per-row Python;
- ``domain_stats`` shuffles only 24-byte partial-count rows (host key,
  count, bytes), never pages; distinct-doc counting dedups
  ``(host, doc_hash)`` pairs with the same unique-rows-pass /
  duplicated-rows-bucket split as ``pipeline.distinct_reps``;
- ``domain_cap`` is skew-proof: pages of hosts at-or-under the cap
  stream through untouched (the long tail — most of the corpus); for
  over-cap hosts each batch forwards at most ``cap`` candidate rows
  per host (a partial top-k combiner), so the shuffle is bounded by
  ``cap × hosts × batches`` regardless of how large a boilerplate
  domain is. No stage collects page rows on the driver.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .config import DedupConfig
from .exchange import dup_key_counts, dup_keys, semi_filter
from .hashing import fmix64, xxh64_arrow
from .ingest import ingest

# scheme://host — host is everything up to the first '/' after '://'
HOST_RE = r"^[a-z][a-z0-9+.\-]*://(?P<host>[^/]+)"


def _host_array(url: pa.Array | pa.ChunkedArray) -> pa.Array:
    if isinstance(url, pa.ChunkedArray):
        url = url.combine_chunks()
    m = pc.extract_regex(url, HOST_RE)
    return pc.fill_null(pc.struct_field(m, "host"), "")


def add_host(batch: pa.Table, with_hash: bool = True) -> pa.Table:
    """Append ``host`` (and ``host_hash``) columns extracted from url."""
    host = _host_array(batch.column("url"))
    out = batch.append_column("host", host)
    if with_hash:
        hh = xxh64_arrow(host).view(np.int64)
        out = out.append_column("host_hash", pa.array(hh, pa.int64()))
    return out


def domain_stats(pages: Dataset, cfg: DedupConfig) -> Dataset:
    """Per-host audit table: (host, n_pages, n_docs, total_bytes).

    ``n_docs`` counts distinct content (doc_hash) per host — the
    pages-vs-docs gap is a host's internal duplication, the signal
    domain capping acts on.
    """
    from ray.data.aggregate import Sum

    ing = ingest(pages, cfg).select_columns(["url", "doc_hash", "size_bytes"])
    wh = ing.map_batches(
        lambda b: add_host(b, with_hash=False).select(
            ["host", "doc_hash", "size_bytes"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()

    # pages + bytes: per-batch combiner rows (pd_=0 pad so both partial
    # streams union into ONE narrow groupby — no host-keyed join stage)
    def part_counts(batch: pa.Table) -> pa.Table:
        enc = batch.column("host").dictionary_encode().combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        sz = batch.column("size_bytes").to_numpy(zero_copy_only=False)
        n = len(enc.dictionary)
        return pa.table(
            {
                "host": enc.dictionary,
                "pn": pa.array(np.bincount(idx, minlength=n), pa.int64()),
                "pb": pa.array(
                    np.bincount(idx, weights=sz, minlength=n).astype(np.int64),
                    pa.int64(),
                ),
                "pd_": pa.array(np.zeros(n, np.int64), pa.int64()),
            }
        )

    counts = wh.map_batches(part_counts, batch_format="pyarrow")

    # distinct (host, doc_hash) pairs: unique fused keys stream through,
    # duplicated ones dedupe per hash bucket (distinct_reps split)
    def fuse(batch: pa.Table) -> pa.Table:
        hh = xxh64_arrow(batch.column("host").combine_chunks()
                         if isinstance(batch.column("host"), pa.ChunkedArray)
                         else batch.column("host"))
        dh = batch.column("doc_hash").to_numpy(zero_copy_only=False)
        fk = fmix64(hh ^ dh.view(np.uint64)).view(np.int64)
        t = pa.table({"host": batch.column("host"), "fk": pa.array(fk, pa.int64())})
        # per-batch distinct
        _, first = np.unique(fk, return_index=True)
        return t.take(pa.array(np.sort(first)))

    pairs = wh.map_batches(fuse, batch_format="pyarrow").materialize()
    dups = dup_keys(pairs, "fk")
    uniq = semi_filter(pairs, "fk", dups, keep=False)
    if len(dups):

        def bucket(batch: pa.Table) -> pa.Table:
            fk = batch.column("fk").to_numpy(zero_copy_only=False)
            bk = fmix64(fk.view(np.uint64)).view(np.int64) % cfg.join_buckets
            return batch.append_column("bkt", pa.array(bk, pa.int64()))

        def first_per_key(g: pa.Table) -> pa.Table:
            # Arrow-native distinct-per-fk: the host strings never
            # become Python objects
            fk = g.column("fk").to_numpy(zero_copy_only=False)
            _, first = np.unique(fk, return_index=True)
            return g.select(["host", "fk"]).take(pa.array(np.sort(first), pa.int64()))

        deduped = (
            semi_filter(pairs, "fk", dups, keep=True)
            .map_batches(bucket, batch_format="pyarrow")
            .groupby("bkt")
            .map_groups(first_per_key, batch_format="pyarrow")
        )
        pairs = uniq.union(deduped)
    else:
        pairs = uniq

    def part_doc_counts(batch: pa.Table) -> pa.Table:
        enc = batch.column("host").dictionary_encode().combine_chunks()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        n = len(enc.dictionary)
        return pa.table(
            {
                "host": enc.dictionary,
                "pn": pa.array(np.zeros(n, np.int64), pa.int64()),
                "pb": pa.array(np.zeros(n, np.int64), pa.int64()),
                "pd_": pa.array(np.bincount(idx, minlength=n), pa.int64()),
            }
        )

    docs = pairs.map_batches(part_doc_counts, batch_format="pyarrow")
    return counts.union(docs).groupby("host").aggregate(
        Sum("pn", alias_name="n_pages"),
        Sum("pb", alias_name="total_bytes"),
        Sum("pd_", alias_name="n_docs"),
    )


def domain_cap(pages: Dataset, cfg: DedupConfig, cap: int) -> Dataset:
    """Frequency-capped corpus: at most ``cap`` pages per host, keeping
    the lexicographically smallest urls. Output (url, size_bytes)."""
    if cap < 1:
        raise ValueError("cap must be >= 1")
    ing = ingest(pages, cfg).select_columns(["url", "size_bytes"])
    wh = ing.map_batches(
        lambda b: add_host(b, with_hash=True).select(
            ["url", "size_bytes", "host_hash"]
        ),
        batch_format="pyarrow",
        zero_copy_batch=True,
    ).materialize()
    keys, counts = dup_key_counts(wh, "host_hash")
    hot = keys[counts > cap]  # hosts over the cap — everything else streams
    cold = semi_filter(wh, "host_hash", hot, keep=False).select_columns(
        ["url", "size_bytes"]
    )
    if not len(hot):
        return cold

    def partial_topk(batch: pa.Table) -> pa.Table:
        # Arrow C++ multi-key sort + boundary ranks (same kernel shape
        # as final_topk below): this combiner runs on the over-cap HOT
        # hosts — the highest-row-count slice of the corpus — so urls
        # must never materialize as Python objects here
        t = batch.sort_by([("host_hash", "ascending"), ("url", "ascending")])
        hh = t.column("host_hash").to_numpy(zero_copy_only=False)
        first = np.ones(len(hh), dtype=bool)
        first[1:] = hh[1:] != hh[:-1]
        starts = np.flatnonzero(first)
        rank = np.arange(len(hh)) - np.repeat(
            starts, np.diff(np.append(starts, len(hh)))
        )
        return t.filter(pa.array(rank < cap))

    def bucket(batch: pa.Table) -> pa.Table:
        hh = batch.column("host_hash").to_numpy(zero_copy_only=False)
        bk = fmix64(hh.view(np.uint64)).view(np.int64) % cfg.join_buckets
        return batch.append_column("bkt", pa.array(bk, pa.int64()))

    def final_topk(g: pa.Table) -> pa.Table:
        # Arrow C++ sort + vectorized per-host rank via boundary offsets
        # (urls stay Arrow strings end-to-end)
        t = g.sort_by([("host_hash", "ascending"), ("url", "ascending")])
        hh = t.column("host_hash").to_numpy(zero_copy_only=False)
        first = np.ones(len(hh), dtype=bool)
        first[1:] = hh[1:] != hh[:-1]
        starts = np.flatnonzero(first)
        rank = np.arange(len(hh)) - np.repeat(starts, np.diff(np.append(starts, len(hh))))
        return t.select(["url", "size_bytes"]).filter(pa.array(rank < cap))

    hot_kept = (
        semi_filter(wh, "host_hash", hot, keep=True)
        .map_batches(partial_topk, batch_format="pyarrow")
        .map_batches(bucket, batch_format="pyarrow")
        .groupby("bkt")
        .map_groups(final_topk, batch_format="pyarrow")
    )
    return cold.union(hot_kept)
