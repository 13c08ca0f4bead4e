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
import pandas as pd
import pyarrow as pa
from ray.data import Dataset
from ray.data.aggregate import Max, Min, Sum

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
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
        win = (ts // width_us) * width_us
        df = pd.DataFrame(
            {
                "w": win,
                "k": batch.column(key_col).to_pylist(),
                # cents as int64 → associative integer sums, oracle-exact
                # (floor, not round: np.round is banker's, SQL ROUND is
                # half-away — floor(x*100) is bit-identical on both sides)
                "cents": np.floor(
                    batch.column(value_col).to_numpy(zero_copy_only=False) * 100
                ).astype(np.int64),
            }
        )
        g = df.groupby(["w", "k"], as_index=False).agg(
            pn=("cents", "size"), pc=("cents", "sum")
        )
        return pa.table(
            {
                "w": pa.array(g["w"], pa.int64()),
                key_col: pa.array(g["k"], pa.string()),
                "pn": pa.array(g["pn"].astype("int64"), pa.int64()),
                "pc": pa.array(g["pc"].astype("int64"), pa.int64()),
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
) -> Dataset:
    """Session windows per user: events within ``gap_sec`` of the previous
    event share a session. → (user_id, session_id, n_events,
    session_start, session_end).

    groupby(user) + per-group vectorized gap detection — the partition
    key is the user, so skew follows user activity (cap heavy users
    upstream if needed).
    """
    gap_us = gap_sec * US

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        ts = g[ts_col].astype("int64").to_numpy()
        order = np.argsort(ts, kind="stable")
        ts = ts[order]
        new = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            new[1:] = (ts[1:] - ts[:-1]) > gap_us
        sid = np.cumsum(new) - 1
        df = pd.DataFrame({"ts": ts, "sid": sid})
        out = df.groupby("sid").agg(
            n_events=("ts", "size"), session_start=("ts", "min"), session_end=("ts", "max")
        )
        out = out.reset_index()
        out[user_col] = g[user_col].iloc[0]
        return out[[user_col, "sid", "n_events", "session_start", "session_end"]].rename(
            columns={"sid": "session_id"}
        )

    return events.select_columns([user_col, ts_col]).groupby(user_col).map_groups(
        per_user, batch_format="pandas"
    )
