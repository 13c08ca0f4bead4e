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
    # star emission: ≤ (members−1) edges per bucket per band; the hot
    # template occupies ≤ bands buckets → raw edges O(n_hot × bands),
    # NOT O(n_hot²). Assert well below the quadratic count.
    quadratic = n_hot * (n_hot - 1) // 2  # 4.5M for 3000 hot docs
    linear_bound = cfg.bands * n  # 192k
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
