"""Resume semantics (≅ --resume-stage3/4, main.rs:114-119)."""

import os

import ray.data as rd

from dedup.checkpoint import CheckpointManager
from dedup.config import DedupConfig
from dedup.pipeline import cluster_partition, near_dup_pipeline
from dedup.synth import make_pages


def _run(tmpdir, cfg, table):
    ckpt = CheckpointManager(str(tmpdir), cfg)
    res = near_dup_pipeline(rd.from_arrow(table), cfg, checkpoint=ckpt)
    return cluster_partition(res.clusters), ckpt


def test_resume_identical_clusters(tmp_path):
    table, _ = make_pages(n_exact_groups=5, n_near_groups=5, n_singletons=30)
    cfg = DedupConfig(min_size=1)
    first, ck1 = _run(tmp_path, cfg, table)
    assert ck1.events == ["write:p1_ingested", "write:p3_signatures", "write:p4_edges"]
    # mtime of stage-1 parquet must not change on resume
    p1_dir = os.path.join(str(tmp_path), "p1_ingested", "data")
    mtimes = {f: os.path.getmtime(os.path.join(p1_dir, f)) for f in os.listdir(p1_dir)}

    second, ck2 = _run(tmp_path, cfg, table)
    assert ck2.events == ["hit:p1_ingested", "hit:p3_signatures", "hit:p4_edges"]
    assert second == first
    for f, m in mtimes.items():
        assert os.path.getmtime(os.path.join(p1_dir, f)) == m, "stage recomputed"


def test_partial_checkpoint_resumes_later_stage_only(tmp_path):
    table, _ = make_pages(n_exact_groups=5, n_near_groups=5, n_singletons=30)
    cfg = DedupConfig(min_size=1)
    first, ck1 = _run(tmp_path, cfg, table)
    # kill after stage 1: delete the signatures checkpoint
    ck1.invalidate("p3_signatures")
    second, ck2 = _run(tmp_path, cfg, table)
    # p4 was derived from the rebuilt p3 → must also rebuild (lineage)
    assert ck2.events == ["hit:p1_ingested", "write:p3_signatures", "write:p4_edges"]
    assert second == first


def test_config_change_invalidates(tmp_path):
    table, _ = make_pages(n_exact_groups=3, n_near_groups=2, n_singletons=10)
    _run(tmp_path, DedupConfig(min_size=1), table)
    _, ck2 = _run(tmp_path, DedupConfig(min_size=2), table)
    assert ck2.events == ["write:p1_ingested", "write:p3_signatures", "write:p4_edges"]
