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


def _fsync_dir(path: str) -> None:
    fd = os.open(path or ".", os.O_RDONLY)
    try:
        os.fsync(fd)
    finally:
        os.close(fd)


def _fsync_tree(path: str) -> None:
    """fsync every file's contents and every directory entry under
    ``path`` BEFORE it is renamed into place. The module's whole claim
    is manifest-after-durable (the reference's link→fsync→db ordering,
    consolidation.rs:79-90); a bare rename on ext4 with delayed
    allocation can survive a power cut while the just-written parquet
    bytes do not — leaving a manifest that says completed=True over
    zero-length part files."""
    for root, _dirs, files in os.walk(path):
        for f in files:
            fd = os.open(os.path.join(root, f), os.O_RDONLY)
            try:
                os.fsync(fd)
            finally:
                os.close(fd)
        _fsync_dir(root)


def _ensure_parquet_dir(tmp: str, ds: Dataset) -> None:
    """``write_parquet`` on an empty dataset writes nothing at all (not
    even the directory); the durable form of an empty stage is one
    zero-row parquet file carrying the stage schema, so resume-time
    ``read_parquet`` keeps working."""
    os.makedirs(tmp, exist_ok=True)
    if any(f.endswith(".parquet") for f in os.listdir(tmp)):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    try:
        sch = ds.schema(fetch_if_missing=True)
        arrow_schema = sch.base_schema if sch is not None else pa.schema([])
    except Exception:
        arrow_schema = pa.schema([])
    pq.write_table(
        arrow_schema.empty_table(), os.path.join(tmp, "empty.parquet")
    )


# Schema upgrade hooks (≅ reference migrate_db, file_db.rs:457-511): maps
# (from_version → fn(stage_name, manifest, stage_dir) → manifest | None).
# Returning an upgraded manifest keeps the checkpoint DATA in place (the
# bump didn't change that stage's layout); returning None means the stage
# cannot be upgraded and must recompute. Chains run until current.
MIGRATIONS: dict[int, object] = {}


def register_migration(from_version: int):
    def deco(fn):
        MIGRATIONS[from_version] = fn
        return fn

    return deco


@register_migration(1)
def _migrate_v1_to_v2(name: str, manifest: dict, stage_dir: str) -> dict | None:
    """v2 added ``set_hash`` to the signatures schema. Signature
    checkpoints must recompute (the column derives from text, which the
    stage no longer has); every other stage's layout is untouched, so the
    manifest is stamped forward in place — no recompute."""
    if name == "p3_signatures":
        return None
    manifest = dict(manifest)
    manifest["schema_version"] = 2
    return manifest


@register_migration(2)
def _migrate_v2_to_v3(name: str, manifest: dict, stage_dir: str) -> dict | None:
    """v3 changed candidate generation (within-bucket all-pairs up to
    allpairs_bucket_max): verified-edge checkpoints are stale and must
    recompute; ingest and signature layouts are untouched."""
    if name == "p4_edges":
        return None
    manifest = dict(manifest)
    manifest["schema_version"] = 3
    return manifest


@register_migration(3)
def _migrate_v3_to_v4(
    name: str, manifest: dict, stage_dir: str, cfg: DedupConfig | None = None
) -> dict | None:
    """v4 dropped pure execution knobs (driver_verify_max) from the
    config fingerprint — they pick a code path, never change stage data.
    A v3 manifest is genuine for the current config iff its stored
    fingerprint equals the current config's fingerprint under the v3
    rules (exec knobs at their historical default); such manifests are
    restamped in place with the v4 fingerprint, anything else
    recomputes."""
    if cfg is None or manifest.get("config_fingerprint") != cfg.fingerprint_v3():
        return None
    manifest = dict(manifest)
    manifest["schema_version"] = 4
    manifest["config_fingerprint"] = cfg.fingerprint()
    return manifest


@register_migration(4)
def _migrate_v4_to_v5(name: str, manifest: dict, stage_dir: str) -> dict | None:
    """v5 moved candidate generation to the component-localized path
    (candidates.py): verified-edge checkpoints can be stale (fragment
    cross-pairs, jumbo-star anchors) and must recompute; ingest and
    signature layouts are untouched."""
    if name == "p4_edges":
        return None
    manifest = dict(manifest)
    manifest["schema_version"] = 5
    return manifest


@register_migration(5)
def _migrate_v5_to_v6(name: str, manifest: dict, stage_dir: str) -> dict | None:
    """v6 truncated stored signature slots to cfg.sig_bytes (default 4):
    signature checkpoints carry the old 8-byte layout and the verified
    edges derive from them, so both recompute; every narrow stage's
    layout is untouched and stamps forward in place."""
    if name in ("p3_signatures", "p4_edges"):
        return None
    manifest = dict(manifest)
    manifest["schema_version"] = 6
    return manifest


class CheckpointManager:
    def __init__(self, root: str, cfg: DedupConfig):
        self.root = root
        self.cfg = cfg
        os.makedirs(root, exist_ok=True)
        # lineage: "hit:<stage>[/part-K]" / "write:<stage>[/part-K]" /
        # "migrate:<stage>:vA->vB"
        self.events: list[str] = []

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

    def _write_manifest(self, name: str, manifest: dict) -> None:
        _, _, mpath = self._paths(name)
        with open(mpath + ".tmp", "w") as f:
            json.dump(manifest, f, indent=2)
            f.flush()
            os.fsync(f.fileno())
        os.rename(mpath + ".tmp", mpath)
        _fsync_dir(os.path.dirname(mpath))

    def _maybe_migrate(self, name: str) -> dict | None:
        """Apply the registered upgrade chain in place; → current manifest
        (or None if absent / not upgradeable, meaning: recompute)."""
        m = self.manifest(name)
        if not m:
            return None
        stage_dir, _, _ = self._paths(name)
        while (v := m.get("schema_version")) is not None and v < SCHEMA_VERSION:
            mig = MIGRATIONS.get(v)
            if mig is None:
                return None
            import inspect

            if len(inspect.signature(mig).parameters) >= 4:
                m2 = mig(name, m, stage_dir, self.cfg)
            else:
                m2 = mig(name, m, stage_dir)
            if m2 is None or m2.get("schema_version", v) <= v:
                return None
            self._write_manifest(name, m2)
            self.events.append(f"migrate:{name}:v{v}->v{m2['schema_version']}")
            m = m2
        return m

    def is_valid(self, name: str) -> bool:
        m = self._maybe_migrate(name)
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
        _ensure_parquet_dir(tmp, ds)
        _fsync_tree(tmp)
        os.rename(tmp, data_dir)
        _fsync_dir(os.path.dirname(data_dir))
        out = rd.read_parquet(data_dir)
        manifest = {
            "stage": name,
            "completed": True,
            "rows": out.count(),
            "wall_sec": round(time.monotonic() - t0, 3),
            "config_fingerprint": self.cfg.fingerprint(),
            "schema_version": SCHEMA_VERSION,
        }
        self._write_manifest(name, manifest)
        self.events.append(f"write:{name}")
        return out

    def load_or_run_parts(self, name: str, part_ids: list, fn_for_part) -> Dataset:
        """Per-PARTITION checkpointed stage (north rule: per-partition
        signature/band state with lineage + metrics). ≅ the reference's
        per-file checksum memoization, process_matches.rs:435-452: a
        killed stage resumes from completed partitions, recomputing only
        the rest.

        ``fn_for_part(part_id) -> Dataset``; each part's parquet dir is
        written atomically (tmp + rename) and the manifest is rewritten
        after EVERY part, so the manifest always reflects exactly the
        parts that durably exist. Returns a Dataset over all parts.
        """
        stage_dir, data_dir, _ = self._paths(name)
        m = self._maybe_migrate(name)
        stage_ok = bool(
            m
            and m.get("partitioned")
            and m.get("config_fingerprint") == self.cfg.fingerprint()
            and m.get("schema_version") == SCHEMA_VERSION
        )
        parts: dict = dict(m.get("parts", {})) if stage_ok else {}
        if not stage_ok and os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)
        os.makedirs(data_dir, exist_ok=True)
        for pid in part_ids:
            key = str(pid)
            pdir = os.path.join(data_dir, f"part-{pid}")
            if parts.get(key, {}).get("completed") and os.path.exists(pdir):
                self.events.append(f"hit:{name}/part-{pid}")
                continue
            t0 = time.monotonic()
            ds = fn_for_part(pid)
            tmp = pdir + ".tmp"
            if os.path.exists(tmp):
                shutil.rmtree(tmp)
            ds.write_parquet(tmp)
            _ensure_parquet_dir(tmp, ds)
            _fsync_tree(tmp)
            if os.path.exists(pdir):
                shutil.rmtree(pdir)
            os.rename(tmp, pdir)
            _fsync_dir(os.path.dirname(pdir))
            parts[key] = {
                "completed": True,
                "rows": rd.read_parquet(pdir).count(),
                "wall_sec": round(time.monotonic() - t0, 3),
            }
            done = all(
                parts.get(str(p), {}).get("completed") for p in part_ids
            )
            self._write_manifest(
                name,
                {
                    "stage": name,
                    "partitioned": True,
                    "parts": parts,
                    "completed": done,
                    "rows": sum(p["rows"] for p in parts.values()),
                    "config_fingerprint": self.cfg.fingerprint(),
                    "schema_version": SCHEMA_VERSION,
                },
            )
            self.events.append(f"write:{name}/part-{pid}")
        files = [
            os.path.join(data_dir, f"part-{pid}", f)
            for pid in part_ids
            for f in sorted(os.listdir(os.path.join(data_dir, f"part-{pid}")))
            if f.endswith(".parquet")
        ]
        if not files:  # every part empty
            return rd.from_items([])
        return rd.read_parquet(files)

    def invalidate(self, name: str) -> None:
        stage_dir, _, _ = self._paths(name)
        if os.path.exists(stage_dir):
            shutil.rmtree(stage_dir)

    def stage_stats(self) -> list[dict]:
        """Per-stage rows / bytes / wall from the manifests — the G7
        progress-counter analogue (reference interrupt-time progress,
        src/main.rs:51-80 / process_matches.rs:85-96), surfaced as one
        JSON-able block by ``cli --stats``."""
        out = []
        for name in sorted(os.listdir(self.root)):
            m = self.manifest(name)
            if not m:
                continue
            _, data_dir, _ = self._paths(name)
            nbytes = 0
            for dirpath, _dirs, files in os.walk(data_dir):
                nbytes += sum(
                    os.path.getsize(os.path.join(dirpath, f))
                    for f in files
                    if f.endswith(".parquet")
                )
            parts = m.get("parts") if m.get("partitioned") else None
            wall = (
                round(sum(p.get("wall_sec", 0.0) for p in parts.values()), 3)
                if parts
                else m.get("wall_sec", 0.0)
            )
            out.append(
                {
                    "stage": m.get("stage", name),
                    "rows": int(m.get("rows", 0)),
                    "bytes": nbytes,
                    "wall_sec": wall,
                    "parts": len(parts) if parts else 1,
                    "completed": bool(m.get("completed")),
                }
            )
        return out
