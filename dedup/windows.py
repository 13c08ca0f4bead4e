"""Windowed aggregation over event streams.

The reference has no streaming/window features (SURVEY.md §2.7); this
is part of the training-data-pipeline surface the brief requires (a
windowed aggregate is the canonical op Ray Data lacks natively). A
tumbling window is a derived column + a narrow groupby:

    window = epoch_us(ts) // width  →  per-batch partial aggregates
    (combiner) → groupby(window, key) → merge partials

Only (window, key, partial) rows shuffle — the combiner collapses each
batch to one row per (window, key) before the exchange, so a 10^12-row
stream with daily windows shuffles a few thousand rows per batch.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Sum

US = 1_000_000


def tumbling_aggregate(
    events: Dataset,
    window_sec: int,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> Dataset:
    """→ Dataset(window_start (timestamp us), key, n_events, sum_value).

    Deterministic float handling: sums are computed on int64 micro-units
    is NOT done — sum_value stays float64; the oracle compares with
    tolerance via rounded cents (``sum_cents`` int64) instead.
    """
    width_us = window_sec * US

    def partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        tcol = batch.column(ts_col)
        # explicit µs normalization BEFORE the int cast (same hazard
        # note as sessionize): a timestamp[ms]/[ns] column cast
        # straight to int64 yields raw ms/ns and silently wrong windows
        if pa.types.is_timestamp(tcol.type):
            tcol = tcol.cast(pa.timestamp("us"))
        ts = tcol.cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // width_us) * width_us
        keyc = batch.column(key_col)
        if isinstance(keyc, pa.ChunkedArray):
            keyc = keyc.combine_chunks()
        # dictionary-encode the key: the combiner groups on small int
        # codes, never materializing per-row Python strings. Null keys
        # get sentinel code -1 (a null index would surface as NaN in
        # to_numpy and corrupt the int cast) and re-emerge as null.
        enc = pc.dictionary_encode(keyc)
        codes = (
            pc.fill_null(enc.indices, -1)
            .cast(pa.int64())
            .to_numpy(zero_copy_only=False)
        )
        # cents as int64 → associative integer sums, oracle-exact
        # (floor, not round: np.round is banker's, SQL ROUND is
        # half-away — floor(x*100) is bit-identical on both sides).
        # NULL values: SQL SUM skips them while COUNT(*) keeps the row —
        # contribute 0 cents (the NaN→int64 cast would otherwise inject
        # INT64_MIN into the whole group's sum)
        cents_f = np.floor(
            batch.column(value_col).to_numpy(zero_copy_only=False) * 100
        )
        cents = np.where(np.isnan(cents_f), 0, cents_f).astype(np.int64)
        uw, inv = np.unique(np.stack([win, codes], axis=1), axis=0, return_inverse=True)
        pn = np.bincount(inv, minlength=len(uw)).astype(np.int64)
        # exact int64 segment sums (a float64 bincount is exact only below
        # 2^53): group rows by inv, then one reduceat per group
        order = np.argsort(inv, kind="stable")
        starts = np.searchsorted(inv[order], np.arange(len(uw)))
        psum = np.add.reduceat(cents[order], starts)
        kidx = uw[:, 1]
        if (kidx >= 0).all():
            keys = enc.dictionary.take(pa.array(kidx, pa.int64()))
        else:
            take = np.where(kidx < 0, 0, kidx)
            keys = (
                pc.if_else(
                    pa.array(kidx >= 0),
                    enc.dictionary.take(pa.array(take, pa.int64())),
                    pa.scalar(None, type=enc.dictionary.type),
                )
                if len(enc.dictionary)
                else pa.nulls(len(kidx), keyc.type)
            )
        return pa.table(
            {
                "w": pa.array(uw[:, 0], pa.int64()),
                key_col: keys,
                "pn": pa.array(pn, pa.int64()),
                "pc": pa.array(psum, pa.int64()),
            }
        )

    agg = (
        events.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["w", key_col])
        .aggregate(Sum("pn", alias_name="n_events"), Sum("pc", alias_name="sum_cents"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "window_start": batch.column("w").cast(pa.timestamp("us")),
                key_col: batch.column(key_col),
                "n_events": batch.column("n_events"),
                "sum_cents": batch.column("sum_cents"),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow")


def sessionize(
    events: Dataset,
    gap_sec: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    n_buckets: int = 64,
) -> Dataset:
    """Session windows per user: events within ``gap_sec`` of the previous
    event share a session. → (user_id, session_id, n_events,
    session_start, session_end) with epoch-microsecond int64 bounds.

    Distribution: users are hash-bucketed into ``n_buckets`` groups (all
    of a user's events land in one bucket), then each bucket is ONE
    vectorized pass — sort by (user, ts), detect session breaks, and
    aggregate sessions with numpy segment ops. ``map_groups`` runs on the
    low-cardinality bucket key, never per user (millions of tiny pandas
    calls — the anti-pattern lsh.py documents). Same bucketing pattern
    as ``joins.asof_join``.
    """
    gap_us = gap_sec * US

    def bucketize(batch: pa.Table) -> pa.Table:
        from .hashing import fmix64, xxh64_arrow

        uid = batch.column(user_col)
        ts = batch.column(ts_col)
        # explicit µs conversion: pandas astype('int64') on a non-µs
        # timestamp silently changes the unit; Arrow cast is exact
        if pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"))
        ts = ts.cast(pa.int64())
        if pa.types.is_integer(uid.type):
            u = uid.cast(pa.int64()).to_numpy(zero_copy_only=False)
            with np.errstate(over="ignore"):
                h = fmix64(u.view(np.uint64))
        else:
            # string (or other) user ids hash through xxh64 — same
            # pattern as near_dup_corpus's url hashing
            col = uid.combine_chunks() if isinstance(uid, pa.ChunkedArray) else uid
            h = xxh64_arrow(col.cast(pa.string()))
        return pa.table(
            {
                user_col: uid,
                "__ts_us": ts,
                "__bucket": pa.array(
                    (h % np.uint64(n_buckets)).astype(np.int32), pa.int32()
                ),
            }
        )

    def per_bucket(batch: pa.Table) -> pa.Table:
        uid_type = batch.column(user_col).type
        uid = batch.column(user_col).to_numpy(zero_copy_only=False)
        ts = batch.column("__ts_us").to_numpy(zero_copy_only=False)
        n = len(uid)
        if n == 0:
            return pa.table(
                {
                    user_col: pa.array([], uid_type),
                    "session_id": pa.array([], pa.int64()),
                    "n_events": pa.array([], pa.int64()),
                    "session_start": pa.array([], pa.int64()),
                    "session_end": pa.array([], pa.int64()),
                }
            )
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        new_user = np.ones(n, dtype=bool)
        new_user[1:] = uid[1:] != uid[:-1]
        seg_start = new_user.copy()
        if n > 1:
            seg_start[1:] |= (ts[1:] - ts[:-1]) > gap_us
        starts = np.flatnonzero(seg_start)
        nseg = len(starts)
        bounds = np.append(starts, n)
        n_events = np.diff(bounds)
        s_start = ts[starts]
        s_end = ts[bounds[1:] - 1]
        seg_uid = uid[starts]
        # per-user session ordinal: segment index − index of the user's
        # first segment (segments are sorted by user, then time)
        first_of_user = np.where(new_user[starts], np.arange(nseg), 0)
        sid = np.arange(nseg) - np.maximum.accumulate(first_of_user)
        return pa.table(
            {
                user_col: (
                    pa.array(seg_uid, pa.int64())
                    if seg_uid.dtype == np.int64
                    else pa.array(seg_uid.tolist(), uid_type)
                ),
                "session_id": pa.array(sid, pa.int64()),
                "n_events": pa.array(n_events, pa.int64()),
                "session_start": pa.array(s_start, pa.int64()),
                "session_end": pa.array(s_end, pa.int64()),
            }
        )

    return (
        events.select_columns([user_col, ts_col])
        .map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )
