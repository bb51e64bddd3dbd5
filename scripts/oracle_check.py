"""Driver-style correctness self-check: run every `queries()` entry in
__spark_entry__ against its `oracle_sql()` DuckDB equivalent on the same
parquet tables and compare columns, row counts, and values — the same
contract the round driver records in CORRECTNESS_r{N}.json.

Queries with no oracle_sql entry (non-SQL-expressible, e.g. approximate
ANN) get the driver's weaker rows-only check: runs and returns >= 0 rows
with a stable schema.

Usage: python scripts/oracle_check.py [sf_dir] [query ...]
       (defaults: /root/testdata/sf0.01, all queries)
"""

from __future__ import annotations

import sys

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, ".")
import __spark_entry__ as em  # noqa: E402

from maestro_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            if len(df) and type(df[c].iloc[0]).__name__ == "Decimal":
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main() -> int:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(master="local[16]", app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, osql = em.queries(), em.oracle_sql()
    bad = []
    for name in sorted(qs):
        if only and name not in only:
            continue
        try:
            got_df = qs[name](spark, sf)
            if name not in osql:
                n = got_df.count()
                print(f"{name} ROWS-ONLY rows={n} schema={[f.name for f in got_df.schema]}",
                      flush=True)
                continue
            got = norm(got_df.toPandas())
            want = norm(con.sql(osql[name]).df())
            ok = (list(got.columns) == list(want.columns)
                  and len(got) == len(want)
                  and all((np.array_equal(got[c].to_numpy(), want[c].to_numpy())
                           if got[c].dtype == np.float64
                           else got[c].tolist() == want[c].tolist())
                          for c in got.columns))
        except Exception as ex:  # noqa: BLE001 — report and continue
            ok = False
            print(f"{name} EXC {str(ex)[:200]}", flush=True)
        if not ok:
            bad.append(name)
        print(name, "OK" if ok else "FAIL", flush=True)
    print("TOTAL", len(qs), "BAD", bad, flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
