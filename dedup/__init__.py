"""dedup — a Ray-Data-native near-duplicate detection & clustering engine.

Re-expresses the capabilities of the reference (lefth/duplicate-finder, a
Rust CLI that finds duplicate files via a size → partial-checksum →
full-checksum cascade; see /root/reference/src/process_matches.rs) as
streaming Ray Data pipelines over Common-Crawl-style web-page tables:

- exact content dedup (xxhash64 prefilter; ≅ full-blake3 stage 3)
- the reference-equivalent staged cascade (size → first-4096-bytes hash →
  full hash) for semantics-parity tests
- 5-gram shingled 128-permutation MinHash + b×r LSH banding for near-dups
- distributed candidate-pair generation + union-find connected components
- per-stage partitioned Parquet checkpoints with manifest lineage (≅ the
  reference's SQLite resume, src/main.rs:114-119)

Everything is built on ray.data.Dataset pipelines of map_batches over
zero-copy Arrow batches; stateful stages (MinHash permutation tables) are
actor pools; wide steps are groupby shuffles with explicit skew handling.
"""

__version__ = "0.1.0"

# polars (used for vectorized token hashing in minhash/simhash) sizes its
# global thread pool at first import. Inside a Ray worker each map task is
# accounted 1 CPU — an unbounded per-worker pool would oversubscribe the
# node 32x. Must run before polars is first imported anywhere in the
# process; users can still override via the environment.
import os as _os

_os.environ.setdefault("POLARS_MAX_THREADS", "1")
