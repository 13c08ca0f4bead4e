"""Stage 1 — ingest (≅ GetFiles walk+stat, process_matches.rs:65-241).

Parquet fragment discovery plays the directory walk; this stage adds the
identity columns and applies the per-record gates:

- ``size_bytes`` = utf8 byte length of ``text`` (≅ file Size cheap key)
- ``doc_hash``   = xxhash64(text)            (≅ full checksum identity)
- ``short_hash`` = xxhash64(text[:4096 bytes]) (≅ SHORT_CHUNK_SIZE partial
  checksum, process_matches.rs:35) mixed with size so stage-2 groups refine
  stage-1 groups exactly as the reference refines within size groups
- min/max size gate (≅ --min-size/--max-size, options.rs:38-45)
- url exclude regex (≅ exclude globs, options.rs:186-204) — applied ONCE
  here; the reference re-applies at every read only because its DB can be
  stale
- lang filter (row-validity analogue of the irregular-file skip,
  process_matches.rs:183-187)

``html`` (wide binary) is projected away immediately — identity columns are
all later stages need; the invariant "byte-identical extracted text per
url" holds because ``text`` is never rewritten anywhere downstream.
"""

from __future__ import annotations


import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
from ray.data import Dataset

from .config import DedupConfig
from .hashing import fmix64, xxh64_arrow, utf8_lengths

_KEEP = ["url", "text", "lang"]


class Ingester:
    """Callable for ``map_batches`` (stateless-cheap, but compiled regex is
    per-actor state → actor pool friendly)."""

    def __init__(self, cfg: DedupConfig, extra_cols: tuple[str, ...] = ()):
        self.cfg = cfg
        self.extra_cols = tuple(extra_cols)
        # the pattern string, NOT a Python re.compile: the batch-time
        # matcher is Arrow RE2, and Python re rejects RE2-valid syntax
        # (e.g. \pL Unicode classes) that Arrow accepts — the probe below
        # is the authoritative fail-fast validation
        self.url_pattern = cfg.exclude_url_regex or None
        if cfg.exclude_url_regex:
            # probe so a bad pattern fails at construction with a clear
            # error, not mid-pipeline inside a Ray task
            try:
                # one-element probe: Arrow skips regex compilation entirely
                # on an empty array
                pc.match_substring_regex(
                    pa.array([""], pa.string()), cfg.exclude_url_regex
                )
            except pa.lib.ArrowException as e:
                raise ValueError(
                    f"exclude_url_regex {cfg.exclude_url_regex!r} is not "
                    f"RE2-compatible (Arrow match_substring_regex): {e}"
                ) from e
        self.langs = set(cfg.lang_filter) if cfg.lang_filter else None

    def reject_masks(
        self, t: pa.Table, size: np.ndarray
    ) -> list[tuple[np.ndarray, str]]:
        """Per-gate reject masks in fixed priority order (too_short →
        too_long → lang → url) — the ONE definition of the gates, shared
        by ``__call__`` (keeps = complement) and ``gate_rejects``
        (labels), so the rejects table can never desynchronize from what
        ingest actually drops."""
        cfg = self.cfg
        out = [(size < cfg.min_size, "too_short")]
        if cfg.max_size:
            out.append((size > cfg.max_size, "too_long"))
        if self.langs is not None:
            if "lang" not in t.column_names:
                # a silently-inactive filter is worse than a crash: the
                # user asked for language gating they would not be getting
                raise ValueError(
                    "cfg.lang_filter is set but the input has no 'lang' column"
                )
            lang_ok = pc.is_in(
                pc.fill_null(t.column("lang"), ""),
                value_set=pa.array(sorted(self.langs)),
            ).to_numpy(zero_copy_only=False).astype(bool)
            out.append((~lang_ok, "lang"))
        if self.url_pattern is not None:
            # Arrow RE2 regex — vectorized, no per-row Python. Matches
            # re.search semantics (unanchored substring match).
            bad = pc.match_substring_regex(
                pc.fill_null(t.column("url"), ""), self.url_pattern
            ).to_numpy(zero_copy_only=False).astype(bool)
            out.append((bad, "url"))
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        keep = list(_KEEP) + [c for c in self.extra_cols if c not in _KEEP]
        cols = {n: batch.column(n) for n in keep if n in batch.column_names}
        t = pa.table(cols)
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        size = utf8_lengths(text)
        mask = np.ones(len(t), dtype=bool)
        for rej, _label in self.reject_masks(t, size):
            mask &= ~rej
        t = t.filter(pa.array(mask))
        text = t.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        size = size[mask]
        doc_hash = xxh64_arrow(text, seed=cfg.hash_seed)
        # short_hash = xxh64 of the first `short_prefix` BYTES — for rows
        # not exceeding the prefix that IS the full-content hash, so only
        # the long tail pays a second hashing pass (most web docs don't)
        short = doc_hash.copy()
        long_rows = size > cfg.short_prefix
        if long_rows.any():
            sub = text.filter(pa.array(long_rows))
            short[long_rows] = xxh64_arrow(
                sub, seed=cfg.hash_seed, prefix=cfg.short_prefix
            )
        with np.errstate(over="ignore"):
            short_key = fmix64(short ^ size.astype(np.uint64))
        # hashes travel as int64 bit-patterns: Ray's groupby key path round-
        # trips through Python ints and breaks on uint64 > int64 max.
        return pa.table(
            {
                "url": t.column("url"),
                "text": t.column("text"),
                "lang": t.column("lang") if "lang" in t.column_names else pa.nulls(len(t), pa.string()),
                "size_bytes": pa.array(size, pa.int64()),
                "doc_hash": pa.array(doc_hash.view(np.int64), pa.int64()),
                "short_hash": pa.array(short_key.view(np.int64), pa.int64()),
                **{
                    c: t.column(c)
                    for c in self.extra_cols
                    if c in t.column_names and c not in _KEEP
                },
            }
        )


def gate_rejects(pages: Dataset, cfg: DedupConfig) -> Dataset:
    """Poison-row quarantine: rows the ingest gates drop, with a reason.

    ≅ the reference's warn-and-skip on unreadable/irregular files
    (process_matches.rs:119,133,143,165,178,496-499) made queryable:
    rejects are a first-class table, not a log line. Reason priority is
    fixed (too_short → too_long → lang → url) so the label is
    deterministic and SQL-mirrorable.
    """
    gate = Ingester(cfg)

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        if isinstance(text, pa.ChunkedArray):
            text = text.combine_chunks()
        size = utf8_lengths(text)
        n = len(batch)
        reason = np.array([""] * n, dtype=object)
        ok = np.ones(n, dtype=bool)
        for mask, label in gate.reject_masks(batch, size):
            hit = mask & ok
            reason[hit] = label
            ok &= ~mask
        rej = ~ok
        return pa.table(
            {
                "url": batch.column("url").filter(pa.array(rej)),
                "reason": pa.array([str(r) for r in reason[rej]], pa.string()),
            }
        )

    return pages.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def ingest(
    pages: Dataset, cfg: DedupConfig, extra_cols: tuple[str, ...] = ()
) -> Dataset:
    # an Ingester INSTANCE is a plain callable → stateless tasks (elastic,
    # no reserved pool); regex compile cost is trivial per task
    return pages.map_batches(
        Ingester(cfg, extra_cols=extra_cols),
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        zero_copy_batch=True,
    )
