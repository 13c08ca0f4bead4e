"""Size-guarded broadcast fallback: ``small_join`` / ``semi_filter_auto``
must produce identical output whether the small side is broadcast
(``ray.put`` + searchsorted lookup) or joined (bucketed hash join) —
the guard only changes the execution plan, never the rows."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup.exchange import semi_filter_auto, small_join


def _mk():
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=500)
    ds = rd.from_arrow(
        pa.table(
            {
                "k": pa.array(np.concatenate([keys, keys[:100]]), pa.int64()),
                "payload": pa.array(range(600), pa.int64()),
            }
        )
    )
    sub = np.sort(keys[::3])
    right = pa.table(
        {
            "rk": pa.array(sub, pa.int64()),
            "name": pa.array([f"n{i}" for i in range(len(sub))], pa.string()),
            "val": pa.array(np.arange(len(sub)), pa.int64()),
        }
    )
    return ds, right, sub


def _norm(ds):
    df = ds.to_pandas().sort_values(["k", "payload"]).reset_index(drop=True)
    return df[sorted(df.columns)]


def test_small_join_branches_identical_inner_and_left():
    ds, right, _ = _mk()
    for how in ("inner", "left"):
        a = _norm(small_join(ds, "k", right, "rk", how=how, max_broadcast_rows=10**9))
        b = _norm(small_join(ds, "k", right, "rk", how=how, max_broadcast_rows=1))
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0
    # left keeps every input row; inner only the matched ones
    n_left = len(_norm(small_join(ds, "k", right, "rk", how="left", max_broadcast_rows=1)))
    n_inner = len(_norm(small_join(ds, "k", right, "rk", how="inner", max_broadcast_rows=1)))
    assert n_left == 600 and 0 < n_inner < n_left


def test_small_join_same_key_name():
    ds, right, _ = _mk()
    right = right.rename_columns(["k", "name", "val"])
    a = _norm(small_join(ds, "k", right, "k", max_broadcast_rows=10**9))
    b = _norm(small_join(ds, "k", right, "k", max_broadcast_rows=1))
    pd.testing.assert_frame_equal(a, b)


def test_semi_filter_auto_branches_identical():
    ds, _, sub = _mk()
    for keep in (True, False):
        a = _norm(semi_filter_auto(ds, "k", sub, keep=keep, max_broadcast_rows=10**9))
        b = _norm(semi_filter_auto(ds, "k", sub, keep=keep, max_broadcast_rows=0))
        pd.testing.assert_frame_equal(a, b)
        assert len(a) > 0
