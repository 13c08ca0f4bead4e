"""Temporal joins Ray Data lacks natively.

``asof_join``: for every left row, the most recent right row with
``right_ts <= left_ts`` sharing the join key (backward as-of). Built as
(a) hash-bucket both sides on the key (narrow shuffle), (b) one
``groupby(bucket)`` co-locating whole key groups, (c) a vectorized
``pandas.merge_asof`` per bucket (global sort by time within the
bucket — merge_asof's requirement). Skew note: one bucket holds ~1/B of
the KEYS, not of one key's rows; a single pathological key still lands
in one bucket and is bounded by that key's row count.

Matches DuckDB's native ``ASOF JOIN`` semantics (the oracle for
``queries()['events_last_order']``); on ties in ``right_ts`` the
matched *timestamp* is identical though the matched row is ambiguous —
callers should project columns that are functions of (key, right_ts).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
from ray.data import Dataset

from .hashing import fmix64


def asof_join(
    left: Dataset,
    right: Dataset,
    by: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str] | None = None,
    n_buckets: int = 32,
    direction: str = "backward",
) -> Dataset:
    """Backward as-of join → left columns + selected right columns."""
    right_cols = right_cols or []

    def bucketize(batch: pa.Table) -> pa.Table:
        k = batch.column(by).to_numpy(zero_copy_only=False).astype(np.int64)
        b = (fmix64(k.view(np.uint64)) % np.uint64(n_buckets)).astype(np.int32)
        return batch.append_column("__bucket", pa.array(b, pa.int32()))

    lschema = left.schema().base_schema
    rschema = right.schema().base_schema
    lcols = list(lschema.names)
    rkeep = [by, right_ts] + [c for c in right_cols if c not in (by, right_ts)]
    rnames = {c: c if c not in lcols or c == by else f"r_{c}" for c in rkeep}

    lb = left.map_batches(bucketize, batch_format="pyarrow")
    rb = right.select_columns(rkeep).map_batches(bucketize, batch_format="pyarrow")

    fields = list(lschema) + [
        pa.field(rnames[c], rschema.field(c).type) for c in rkeep if c != by
    ]

    def tag(side: str, src_cols, rename=None):
        def fn(batch: pa.Table) -> pa.Table:
            n = len(batch)
            cols = {}
            for f in fields:
                src = f.name
                if rename:
                    inv = {v: k for k, v in rename.items()}
                    src = inv.get(f.name, f.name)
                if src in batch.column_names and (
                    (side == "l" and f.name in lcols)
                    or (side == "r" and f.name not in lcols)
                    or f.name == by
                ):
                    cols[f.name] = batch.column(src)
                else:
                    cols[f.name] = pa.nulls(n, f.type)
            if side == "l":  # key always from own side
                cols[by] = batch.column(by)
            cols["__bucket"] = batch.column("__bucket")
            cols["__side"] = pa.array([side] * n)
            return pa.table(cols)

        return fn

    both = lb.map_batches(tag("l", lcols), batch_format="pyarrow").union(
        rb.map_batches(tag("r", rkeep, rnames), batch_format="pyarrow")
    )

    out_r = [rnames[c] for c in rkeep if c != by]

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("__side").to_numpy(zero_copy_only=False)
        lmask = pa.array(side == "l")
        l = group.filter(lmask).select(lcols).to_pandas()
        r = group.filter(pa.compute.invert(lmask)).select([by] + out_r).to_pandas()
        if l.empty:
            return pa.Table.from_pandas(
                l.assign(**{c: pd.Series(dtype=r[c].dtype) for c in out_r}),
                preserve_index=False,
            )
        l = l.sort_values(left_ts, kind="stable")
        rts = rnames[right_ts]
        r = r.sort_values(rts, kind="stable")
        m = pd.merge_asof(
            l, r, left_on=left_ts, right_on=rts, by=by, direction=direction
        )
        return pa.Table.from_pandas(m, preserve_index=False)

    return both.groupby("__bucket").map_groups(merge, batch_format="pyarrow")
