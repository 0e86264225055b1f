"""Local replica of the driver's correctness gate: run every queries()
entry and its oracle_sql() twin at a given sf, compare row count, column
names, and order-insensitive values. Usage:

    python scripts/check_oracle.py [sf_dir] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = pd.to_datetime(df[c]).astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as E

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = normalize(to_pandas(fn(sf_dir)))
        except Exception as exc:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows, {len(got.columns)} cols ({dt:.1f}s) [no oracle]")
            continue
        exp = normalize(con.execute(oracles[name]).fetchdf())
        status = "OK   "
        if list(got.columns) != list(exp.columns):
            status = "FAIL "
            print(f"{status}{name}: columns {list(got.columns)} != {list(exp.columns)}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            status = "FAIL "
            print(f"{status}{name}: rows {len(got)} != {len(exp)}")
            failures.append(name)
            continue
        try:
            pd.testing.assert_frame_equal(got, exp, check_dtype=False,
                                          check_exact=False, rtol=0, atol=1e-9)
            print(f"OK    {name}: {len(got)} rows ({dt:.1f}s)")
        except AssertionError as exc:
            print(f"FAIL  {name}: values differ: {str(exc).splitlines()[-1]}")
            failures.append(name)
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        return 1
    print("all checked queries OK")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
