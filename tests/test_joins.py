"""As-of join semantics: backward match, unmatched lefts, key isolation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from dedup.joins import asof_join

US = 1_000_000


def _ds(d):
    return rd.from_arrow(pa.table(d))


def test_asof_backward_basic():
    left = _ds(
        {
            "id": pa.array([1, 2, 3, 4], pa.int64()),
            "k": pa.array([10, 10, 10, 20], pa.int64()),
            "t": pa.array([5, 15, 25, 5], pa.timestamp("us")),
        }
    )
    right = _ds(
        {
            "k": pa.array([10, 10, 20], pa.int64()),
            "rt": pa.array([10, 20, 100], pa.timestamp("us")),
            "val": pa.array([100, 200, 300], pa.int64()),
        }
    )
    out = (
        asof_join(left, right, by="k", left_ts="t", right_ts="rt", right_cols=["val"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # id=1 (t=5): no right <= 5 → unmatched (NaT/NaN)
    assert pd.isna(out.loc[0, "val"])
    # id=2 (t=15): matches rt=10
    assert out.loc[1, "val"] == 100
    # id=3 (t=25): matches rt=20
    assert out.loc[2, "val"] == 200
    # id=4 (k=20, t=5): right rt=100 > 5 → unmatched (no cross-key bleed)
    assert pd.isna(out.loc[3, "val"])


def test_asof_matches_pandas_reference():
    rng = np.random.default_rng(9)
    nl, nr = 2000, 500
    lk = rng.integers(0, 50, nl)
    lt = rng.integers(0, 10_000, nl)
    rk = rng.integers(0, 50, nr)
    rt = rng.integers(0, 10_000, nr)
    rv = rng.integers(0, 1_000_000, nr)
    left = _ds({"id": pa.array(range(nl), pa.int64()),
                "k": pa.array(lk, pa.int64()),
                "t": pa.array(lt, pa.timestamp("us"))})
    right = _ds({"k": pa.array(rk, pa.int64()),
                 "rt": pa.array(rt, pa.timestamp("us")),
                 "val": pa.array(rv, pa.int64())})
    out = (
        asof_join(left, right, by="k", left_ts="t", right_ts="rt", right_cols=["val"])
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    ldf = pd.DataFrame({"id": range(nl), "k": lk,
                        "t": pd.to_datetime(lt, unit="us")}).sort_values("t", kind="stable")
    rdf = pd.DataFrame({"k": rk, "rt": pd.to_datetime(rt, unit="us"),
                        "val": rv}).sort_values("rt", kind="stable")
    want = pd.merge_asof(ldf, rdf, left_on="t", right_on="rt", by="k").sort_values(
        "id"
    ).reset_index(drop=True)
    # compare matched rt (deterministic even under right-ts ties)
    got_rt = out["rt"].fillna(pd.Timestamp(0)).tolist()
    want_rt = want["rt"].fillna(pd.Timestamp(0)).tolist()
    assert got_rt == want_rt


def test_asof_join_schema_stable_with_nulls_and_unmatched():
    """Every per-group block must carry the DECLARED schema: merge_asof
    float-promotes int right columns in groups with an unmatched left
    row (mixed-schema blocks crashed concat/write), null-ts right rows
    never match, and null-ts left rows keep their row with null right
    columns instead of raising inside merge_asof."""
    import pyarrow as pa
    import ray.data as rd

    from dedup.joins import asof_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 1, 2, 2], pa.int64()),
        "lts": pa.array([100, 5, 300, None], pa.int64()),
    }))
    right = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2], pa.int64()),
        "rts": pa.array([50, 250, None], pa.int64()),
        "val": pa.array([7, 9, 11], pa.int64()),
    }))
    out = asof_join(left, right, by="k", left_ts="lts", right_ts="rts",
                    right_cols=["val"], n_buckets=4)
    schemas = {
        str(b.schema)
        for b in out.iter_batches(batch_size=16, batch_format="pyarrow")
        if len(b)
    }
    assert len(schemas) == 1
    rows = {
        (r["k"], r["lts"]): (r["rts"], r["val"])
        for b in out.iter_batches(batch_size=16, batch_format="pyarrow")
        for r in b.to_pylist()
    }
    assert rows[(1, 100)] == (50, 7)
    assert rows[(1, 5)] == (None, None)     # unmatched: kept, nulls
    assert rows[(2, 300)] == (250, 9)       # null-ts right row skipped
    assert rows[(2, None)] == (None, None)  # null-ts left row kept
