"""Driver-style correctness self-check: run every `queries()` entry in
__spark_entry__ against its `oracle_sql()` DuckDB equivalent on the same
parquet tables and compare columns, row counts, and values — the same
contract the round driver records in CORRECTNESS_r{N}.json.

Queries with no oracle_sql entry (non-SQL-expressible, e.g. approximate
ANN) get the driver's weaker rows-only check: runs and returns >= 0 rows
with a stable schema.

Usage: python scripts/oracle_check.py [--json OUT] [sf_dir] [query ...]
       (defaults: /root/testdata/sf0.01, all queries)

--json OUT writes driver-format rows ({name: {rows_match, schema_match,
hash_match, spark_rows, oracle_rows, err}}) — emitting
CORRECTNESS_self.json closes the driver-coverage rotation loop
(VERDICT r3 #4): every registry entry gets a recorded row even when the
round driver samples only a subset.
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
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])
    spark = get_spark(master="local[16]", app_name="oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    qs, osql = em.queries(), em.oracle_sql()
    bad, rows = [], {}
    for name in sorted(qs):
        if only and name not in only:
            continue
        err = None
        spark_rows = oracle_rows = None
        schema_match = hash_match = None
        try:
            got_df = qs[name](spark, sf)
            if name not in osql:
                spark_rows = got_df.count()
                print(f"{name} ROWS-ONLY rows={spark_rows} "
                      f"schema={[f.name for f in got_df.schema]}", flush=True)
                rows[name] = {"rows_match": spark_rows >= 0,
                              "schema_match": True, "hash_match": None,
                              "spark_rows": spark_rows,
                              "oracle_rows": None, "err": None,
                              "rows_only": True}
                continue
            got = norm(got_df.toPandas())
            want = norm(con.sql(osql[name]).df())
            spark_rows, oracle_rows = len(got), len(want)
            schema_match = list(got.columns) == list(want.columns)
            # Dtype-strict (VERDICT r4 #1/#3): the driver's value hash
            # distinguishes 191 from 191.0, so an int64-vs-float64 column
            # pair must FAIL here even when the values compare equal —
            # e.g. DuckDB sum(BIGINT)->HUGEINT landing as float64.
            dtype_match = (schema_match and
                           all(got[c].dtype == want[c].dtype
                               for c in got.columns))
            hash_match = (dtype_match and spark_rows == oracle_rows
                          and all((np.array_equal(got[c].to_numpy(),
                                                  want[c].to_numpy())
                                   if got[c].dtype == np.float64
                                   else got[c].tolist() == want[c].tolist())
                                  for c in got.columns))
            if schema_match and not dtype_match:
                mism = [(c, str(got[c].dtype), str(want[c].dtype))
                        for c in got.columns
                        if got[c].dtype != want[c].dtype]
                err = f"dtype mismatch (spark,oracle): {mism}"[:300]
                print(f"{name} DTYPE {err[:200]}", flush=True)
            ok = hash_match
        except Exception as ex:  # noqa: BLE001 — report and continue
            ok = False
            err = str(ex)[:300]
            print(f"{name} EXC {err[:200]}", flush=True)
        rows[name] = {"rows_match": spark_rows == oracle_rows,
                      "schema_match": schema_match,
                      "hash_match": hash_match,
                      "spark_rows": spark_rows, "oracle_rows": oracle_rows,
                      "err": err}
        if not ok:
            bad.append(name)
        print(name, "OK" if ok else "FAIL", flush=True)
    print("TOTAL", len(qs), "BAD", bad, flush=True)
    if json_out:
        import json
        with open(json_out, "w") as fh:
            json.dump(rows, fh, indent=1, sort_keys=True)
        print(f"wrote {json_out} ({len(rows)} rows)", flush=True)
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
