"""Component-localized candidate-pair generation (flagship fast path).

The classic LSH pair emission (``lsh.candidate_pairs``) writes each
candidate pair once per band it collides in. True duplicates collide in
nearly EVERY band — that is what makes them duplicates — so on dup-heavy
web data the raw pair stream carries a ~``cfg.bands``-fold duplication
that must then be removed by a corpus-wide shuffle (measured on the
500k-page bench corpus: 51M raw pair rows ≈ 820 MB sorted down to 1.6M
unique pairs). This module produces the SAME pair set from shuffles that
are an order of magnitude smaller:

1. **Star pass** — one band-row sort (the same sort the classic path
   does), but emitting only bucket-min → member star edges + boundary
   chains (``candidate_pairs(star_only=True)``): linear in bucket size.
2. **Components** — the star edges are deduplicated (tiny: ≈ one row
   per duplicate-involved doc) and labeled with connected components:
   driver ``components_np`` while the edge set fits the broadcast
   guard, ``label_propagation`` (pure-Dataset) past it or when the
   caller wants no driver transit.
3. **Regen** — only candidate docs (star-graph nodes — bounded by
   duplicate-involved docs, not the corpus) are re-banded; each
   component's band rows are co-located in one hash-bucket group, and
   ``lsh.segment_pairs`` regenerates the exact per-bucket pair set
   locally (all-pairs ≤ ``cfg.allpairs_bucket_max``, bucket-min stars
   beyond). A bucket's members are star-connected by construction, so a
   bucket never spans two components and the per-component bucket
   structure equals the global one; a pair's cross-band repeats all
   land in the same group, so the in-group ``unique`` IS the global
   exact dedup — no pair shuffle at all.

vs the classic path the regenerated set differs only in two documented
corner cases, both strictly cleaner: pairs split across sorted-block
fragments of one bucket are no longer dropped (the classic path chains
fragments for connectivity but skips their cross-fragment pairs), and
jumbo buckets anchor their stars at the true bucket min instead of
per-fragment mins. Reference anchor: this is the same "group, then work
only inside groups" shape as the reference's size→checksum cascade
(process_matches.rs:293-407), pushed one level further (bucket →
component).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data as rd
from ray.data import Dataset

from .config import DedupConfig
from .exchange import (
    broadcast_map_i64,
    bucketed_join,
    collect_table,
    ensure_schema,
    semi_filter_auto,
)
from .hashing import fmix64
from .lsh import band_rows, candidate_pairs, segment_pairs

PAIRS_SCHEMA = pa.schema([("a", pa.int64()), ("b", pa.int64())])

_EMPTY_PAIRS = pa.table(
    {"a": pa.array([], pa.int64()), "b": pa.array([], pa.int64())}
)


def _grouped_pairs(tagged: Dataset, cfg: DedupConfig) -> Dataset:
    """(doc_hash, bkey, __comp) rows → exactly-unique canonical pairs,
    via the bucketed-groupby idiom (``distinct_reps`` shape): route whole
    components to ``join_buckets`` groups, regenerate vectorized per
    group. Per-group Python cost is ``join_buckets`` calls, not
    per-component calls."""
    cap = cfg.allpairs_bucket_max
    n_buckets = cfg.join_buckets

    def bucket(batch: pa.Table) -> pa.Table:
        comp = batch.column("__comp").to_numpy(zero_copy_only=False)
        b = (fmix64(comp.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int32)
        return pa.table(
            {
                "doc_hash": batch.column("doc_hash"),
                "bkey": batch.column("bkey"),
                "__cbucket": pa.array(b, pa.int32()),
            }
        )

    def gen(g: pa.Table) -> pa.Table:
        a, b = segment_pairs(
            g.column("bkey").to_numpy(zero_copy_only=False),
            g.column("doc_hash").to_numpy(zero_copy_only=False),
            cap,
        )
        return pa.table(
            {"a": pa.array(a, pa.int64()), "b": pa.array(b, pa.int64())}
        )

    return (
        tagged.map_batches(bucket, batch_format="pyarrow")
        .groupby("__cbucket")
        .map_groups(gen, batch_format="pyarrow")
    )


def component_candidate_pairs(
    sigs: Dataset, cfg: DedupConfig, dataset_labels: bool = False
) -> tuple[Dataset, np.ndarray | None]:
    """signatures → (exactly-unique canonical candidate-pair Dataset,
    sorted candidate-doc array or None).

    The candidate array comes back non-None only on the driver-components
    tier (star edges fit ``cfg.broadcast_max_rows``); callers use it to
    skip their own candidate-ids pass. ``dataset_labels`` forces the
    pure-Dataset tier (``label_propagation`` + bucketed joins — nothing
    transits the driver), used by the distributed backend and by the
    guard's fallback.
    """
    from .verify import dedup_pairs_sorted

    bands = band_rows(sigs, cfg)
    stars, chain = candidate_pairs(bands, cfg, star_only=True)
    if len(chain):
        stars = stars.union(rd.from_arrow(chain))
    # the star stream still repeats an edge once per band (dup factor ≈
    # bands); the sort-dedup is over ~25x fewer rows than the classic
    # path's pair stream
    stars_d = ensure_schema(dedup_pairs_sorted(stars), PAIRS_SCHEMA).materialize()
    if stars_d.count() == 0:
        return rd.from_arrow(_EMPTY_PAIRS), (None if dataset_labels else np.empty(0, np.int64))

    keys = cids = None
    if not dataset_labels:
        st = collect_table(stars_d, limit_rows=cfg.broadcast_max_rows + 1)
        if len(st) <= cfg.broadcast_max_rows:
            from .unionfind import components_np

            keys, cids = components_np(
                st.column("a").to_numpy(zero_copy_only=False),
                st.column("b").to_numpy(zero_copy_only=False),
            )

    sig_cols = sigs.select_columns(["doc_hash", "sig", "n_shingles"])
    if keys is not None:
        # driver tier: keys (sorted) are the candidate set; membership +
        # component tag both ride size-guarded broadcasts
        sub = semi_filter_auto(
            sig_cols, "doc_hash", keys,
            max_broadcast_rows=cfg.broadcast_max_rows, n_buckets=cfg.join_buckets,
        )
        tagged = broadcast_map_i64(
            band_rows(sub, cfg), "doc_hash", keys, cids, "__comp",
            max_broadcast_rows=cfg.broadcast_max_rows, n_buckets=cfg.join_buckets,
        )
        cand = keys
    else:
        # Dataset tier: component labels never leave the cluster; the
        # inner join is simultaneously the candidate-membership filter
        from .unionfind import label_propagation

        labels = label_propagation(stars_d, n_buckets=cfg.join_buckets)
        joined = bucketed_join(
            band_rows(sig_cols, cfg), labels, "doc_hash", "node",
            n_buckets=cfg.join_buckets, how="inner",
        )

        def rename(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "doc_hash": batch.column("doc_hash"),
                    "bkey": batch.column("bkey"),
                    "__comp": batch.column("label"),
                }
            )

        tagged = joined.map_batches(rename, batch_format="pyarrow")
        cand = None

    return ensure_schema(_grouped_pairs(tagged, cfg), PAIRS_SCHEMA), cand
