"""Hot-band skew: a boilerplate bucket with thousands of members must
stay LINEAR in pair emission (sort-based star edges), never O(n²)."""

import time

import numpy as np
import ray.data as rd

from dedup.config import DedupConfig
from dedup.ingest import ingest
from dedup.lsh import band_rows, candidate_pairs
from dedup.minhash import sign
from dedup.pipeline import distinct_reps, near_dup_pipeline
from dedup.synth import skew_table


def test_hot_band_pair_count_linear():
    n = 6000
    hot_frac = 0.5
    pages = rd.from_arrow(skew_table(n=n, hot_frac=hot_frac))
    cfg = DedupConfig(min_size=1)
    ing = ingest(pages, cfg).materialize()
    reps = distinct_reps(ing).materialize()
    sigs = sign(reps, cfg).materialize()
    bands = band_rows(sigs, cfg)
    pairs, chain = candidate_pairs(bands, cfg)
    n_pairs = pairs.count() + len(chain)
    n_hot = int(n * hot_frac)
    # jumbo-bucket emission: ≤ (members−1) star edges per bucket per band;
    # small buckets (and ≤cap tail fragments of the hot bucket at sorted-
    # block boundaries) add all-pairs bounded by cap²/2 per fragment — a
    # constant per block, still O(n_hot × bands), NOT O(n_hot²). Assert
    # well below the quadratic count (which would be ~bands × 4.5M here).
    quadratic = n_hot * (n_hot - 1) // 2  # 4.5M for 3000 hot docs
    linear_bound = 2 * cfg.bands * n  # 384k — quadratic would be >100M
    assert n_pairs <= linear_bound, (n_pairs, linear_bound)
    assert n_pairs < quadratic / 10


def test_hot_band_clusters_correct():
    n = 4000
    pages = rd.from_arrow(skew_table(n=n, hot_frac=0.4))
    res = near_dup_pipeline(pages, DedupConfig(min_size=1))
    df = res.clusters.to_pandas()
    hot = df[df.url.str.startswith("https://hot.example.com/")]
    # the boilerplate pages form one dominant cluster
    assert len(hot) >= 0.95 * (n * 0.4)
    assert hot["cluster_id"].nunique() <= 3
    # cold pages never join the hot cluster
    cold = df[~df.url.str.startswith("https://hot.example.com/")]
    assert not set(cold["cluster_id"]) & set(hot["cluster_id"])


def test_embed_lsh_hot_bucket_stays_linear():
    """All-identical vectors: every LSH table hashes all n vectors to ONE
    bucket. Star emission must keep candidates O(n), not O(n²)."""
    import numpy as np
    from dedup.embed import lsh_bucketed_pairs
    from tests.test_similarity import _emb_ds

    n = 4000
    v = np.random.default_rng(3).standard_normal(32)
    M = np.tile(v, (n, 1)) + 1e-6 * np.random.default_rng(4).standard_normal((n, 32))
    out = lsh_bucketed_pairs(_emb_ds(M), threshold=0.99, n_planes=8, n_tables=4)
    # connectivity-equivalent star pairs: O(n) edges, all verified ≥ 0.99
    assert n - 1 <= len(out) <= 4 * n
    import pyarrow.compute as pc

    assert pc.min(out.column("sim")).as_py() >= 0.99
    # all n vectors connected through the emitted pairs
    from dedup.unionfind import components_np

    keys, cids = components_np(
        out.column("a").to_numpy(zero_copy_only=False),
        out.column("b").to_numpy(zero_copy_only=False),
    )
    assert len(keys) == n and len(set(cids.tolist())) == 1
