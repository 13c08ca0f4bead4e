"""Arrow schemas for every stage table.

All 64-bit hash values travel as **int64 bit-patterns** (Ray Data groupby
keys round-trip through Python ints and overflow on uint64 > 2^63).

Input per BASELINE.json input_hint; intermediate/output tables per
SURVEY.md §1.4 (file record ↔ page row, FileIdent ↔ doc_hash,
DuplicateGroup ↔ clusters table).
"""

from __future__ import annotations

import pyarrow as pa

# v2: signatures carry set_hash (≅ reference SCHEMA_VERSION=3, file_db.rs:26)
# v3: candidate generation emits within-bucket all-pairs for buckets ≤
#     allpairs_bucket_max (star edges only beyond the cap) — p4_edges
#     results change; upstream stage layouts do not
# v4: config fingerprint excludes pure execution knobs (driver_verify_max
#     picks a verify code path, never changes edges) — no stage data or
#     layout changes; the v3→v4 migration restamps manifests whose v3
#     fingerprint matches the current config
# v5: candidate generation default moved to the component-localized path
#     (candidates.py): same per-bucket pair semantics, but fragment
#     cross-pairs are no longer dropped and jumbo stars anchor at the
#     true bucket min — p4_edges results can change; upstream stage
#     layouts do not
# v6: signature slots stored truncated to cfg.sig_bytes (default 4 —
#     list<int32> u32 bit-patterns; 8 keeps the pre-v6 list<int64>
#     layout): p3_signatures and the sig-derived p4_edges recompute;
#     ingest and narrow stage layouts are untouched
SCHEMA_VERSION = 6

PAGES = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

# ingest output (P1): pages + identity columns (html projected away — wide
# binary payloads must not ride through the shuffle stages)
INGESTED = pa.schema(
    [
        ("url", pa.string()),
        ("text", pa.string()),
        ("lang", pa.string()),
        ("size_bytes", pa.int64()),
        ("doc_hash", pa.int64()),
        ("short_hash", pa.int64()),
    ]
)

# MinHash signatures (P3): one row per distinct doc_hash. Slot type
# follows cfg.sig_bytes: int32 (u32 bit-patterns, the default) or int64.
SIGNATURES = pa.schema(
    [
        ("doc_hash", pa.int64()),
        ("sig", pa.list_(pa.int32())),  # len == num_perm
        ("n_shingles", pa.int64()),
        ("set_hash", pa.int64()),  # 64-bit distinct-shingle-set hash
    ]
)

# LSH band rows (P4 input)
BANDS = pa.schema(
    [
        ("doc_hash", pa.int64()),
        ("band_idx", pa.int32()),
        ("band_hash", pa.int64()),
    ]
)

# candidate / verified pairs
PAIRS = pa.schema(
    [
        ("a", pa.int64()),  # doc_hash, a < b
        ("b", pa.int64()),
    ]
)

VERIFIED_PAIRS = pa.schema(
    [
        ("a", pa.int64()),
        ("b", pa.int64()),
        ("sim", pa.float64()),  # estimated Jaccard (signature agreement)
    ]
)

# final output (≅ DuplicateGroup, duplicate_group.rs:21-25):
CLUSTERS = pa.schema(
    [
        ("url", pa.string()),
        ("doc_hash", pa.int64()),
        ("cluster_id", pa.int64()),  # UINT64-min member of the component
        # (int64 bit-pattern; NOT signed min — unionfind.py anchor rule)
        ("cluster_size", pa.int64()),  # urls in cluster
        ("size_bytes", pa.int64()),
    ]
)
