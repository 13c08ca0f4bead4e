"""Local stand-in for the driver's correctness gate: run every Ray query
and its DuckDB oracle at a given sf, compare row count, schema (column
names) and order-insensitive value content.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data as rd

    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main():
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    ray.init(address="local", num_cpus=8, include_dashboard=False, ignore_reinit_error=True)

    import __ray_entry__ as e

    qs, os_ = e.queries(), e.oracle_sql()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.monotonic()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            continue
        dt = time.monotonic() - t0
        if name not in os_:
            print(f"ok   {name}: rows-only ({len(mine)} rows, {dt:.1f}s)")
            continue
        try:
            theirs = canon(con.execute(os_[name]).df())
        except Exception as ex:
            failures.append(name)
            print(f"FAIL {name}: oracle raised {type(ex).__name__}: {ex}")
            continue
        if list(mine.columns) != list(theirs.columns):
            failures.append(name)
            print(f"FAIL {name}: columns {list(mine.columns)} vs {list(theirs.columns)}")
            continue
        if len(mine) != len(theirs):
            failures.append(name)
            print(f"FAIL {name}: rows {len(mine)} vs {len(theirs)}")
            continue
        eq = True
        for c in mine.columns:
            a, b = mine[c], theirs[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                import numpy as np

                if not np.allclose(a.astype(float), b.astype(float), rtol=1e-9, atol=1e-12):
                    eq = False
            else:
                if not (a.astype(str).values == b.astype(str).values).all():
                    eq = False
            if not eq:
                print(f"FAIL {name}: column {c} differs")
                print("  mine:", a.head(5).tolist())
                print("  theirs:", b.head(5).tolist())
                failures.append(name)
                break
        if eq:
            print(f"PASS {name} ({len(mine)} rows, {dt:.1f}s)")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checked queries pass")


if __name__ == "__main__":
    main()
