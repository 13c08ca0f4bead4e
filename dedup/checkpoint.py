"""Per-stage partitioned Parquet checkpoints with manifest lineage.

≅ the reference's SQLite store as the durable mirror between stages
(file_db.rs:28-39) and its resume entry points --resume-stage3/4
(main.rs:114-119). A stage checkpoint is:

    <root>/<stage>/data/*.parquet      (partitioned; written atomically via
                                        a temp dir + rename)
    <root>/<stage>/manifest.json       (stage name, rows, wall seconds,
                                        config fingerprint, schema_version,
                                        completed flag)

``load_or_run(name, fn)`` returns the checkpointed Dataset when a valid
manifest exists — valid means completed=True, matching config fingerprint
(≅ invalidate-checksums-on-size-change, file_db.rs:311-342) and matching
schema_version (≅ migrate_db gate, file_db.rs:41-107). Otherwise it runs
``fn``, writes the checkpoint, and returns a Dataset reading it back (so
downstream stages consume the persisted blocks, exactly what a resumed run
would see).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import ray.data as rd
from ray.data import Dataset

from .config import DedupConfig
from .schema import SCHEMA_VERSION


class CheckpointManager:
    def __init__(self, root: str, cfg: DedupConfig):
        self.root = root
        self.cfg = cfg
        os.makedirs(root, exist_ok=True)
        self.events: list[str] = []  # "hit:<stage>" / "write:<stage>" lineage

    def _paths(self, name: str) -> tuple[str, str, str]:
        d = os.path.join(self.root, name)
        return d, os.path.join(d, "data"), os.path.join(d, "manifest.json")

    def manifest(self, name: str) -> dict | None:
        _, _, mpath = self._paths(name)
        if not os.path.exists(mpath):
            return None
        try:
            with open(mpath) as f:
                return json.load(f)
        except (json.JSONDecodeError, OSError):
            return None

    def is_valid(self, name: str) -> bool:
        m = self.manifest(name)
        return bool(
            m
            and m.get("completed")
            and m.get("config_fingerprint") == self.cfg.fingerprint()
            and m.get("schema_version") == SCHEMA_VERSION
        )

    def load_or_run(self, name: str, fn) -> Dataset:
        stage_dir, data_dir, mpath = self._paths(name)
        if self.is_valid(name):
            self.events.append(f"hit:{name}")
            return rd.read_parquet(data_dir)
        # stale/partial checkpoint → rebuild from scratch
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)
        os.makedirs(stage_dir, exist_ok=True)
        t0 = time.monotonic()
        ds = fn()
        tmp = data_dir + ".tmp"
        ds.write_parquet(tmp)
        os.rename(tmp, data_dir)
        out = rd.read_parquet(data_dir)
        manifest = {
            "stage": name,
            "completed": True,
            "rows": out.count(),
            "wall_sec": round(time.monotonic() - t0, 3),
            "config_fingerprint": self.cfg.fingerprint(),
            "schema_version": SCHEMA_VERSION,
        }
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
        os.rename(mpath + ".tmp", mpath)
        self.events.append(f"write:{name}")
        return out

    def invalidate(self, name: str) -> None:
        stage_dir, _, _ = self._paths(name)
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)
