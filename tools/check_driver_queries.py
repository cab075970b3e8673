"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB over the same sf dir, then
compare row count, column names, and order-insensitive values.

Usage: python tools/check_driver_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time as _time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from vectrain_spark.driver_queries import ORACLES, QUERIES  # noqa: E402
from vectrain_spark.session import get_spark  # noqa: E402

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].round(9)
        elif str(df[c].dtype).startswith("int") or str(df[c].dtype).startswith("uint"):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="driver_check", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    failures = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        _t0 = _time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as e:
            print(f"[FAIL] {name}: spark error: {e}")
            failures += 1
            continue
        if name not in ORACLES:
            print(f"[rows-only] {name}: {len(got)} rows (no SQL oracle)")
            continue
        try:
            want = con.sql(ORACLES[name]).df()
        except Exception as e:
            print(f"[FAIL] {name}: duckdb error: {str(e)[:300]}")
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"[FAIL] {name}: columns {list(g.columns)} vs {list(w.columns)}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"[FAIL] {name}: rows {len(g)} vs {len(w)}")
            failures += 1
            continue
        if not g.equals(w):
            neq = (g != w) & ~(g.isna() & w.isna())
            bad_rows = neq.any(axis=1)
            print(f"[FAIL] {name}: {int(bad_rows.sum())} mismatched rows of {len(g)}")
            print("spark:", g[bad_rows].head(3).to_dict("records"))
            print("duck :", w[bad_rows].head(3).to_dict("records"))
            failures += 1
            continue
        # dtype parity (schema check approximation)
        dt_g, dt_w = list(map(str, g.dtypes)), list(map(str, w.dtypes))
        flag = "" if dt_g == dt_w else f"  [dtype drift: {dt_g} vs {dt_w}]"
        print(f"[ OK ] {name}: {len(g)} rows  ({_time.time() - _t0:.1f}s){flag}")
    spark.stop()
    return failures


if __name__ == "__main__":
    sys.exit(main())
