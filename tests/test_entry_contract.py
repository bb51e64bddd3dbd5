"""Driver-contract rehearsal: run every ``queries()`` entry through Spark
AND its ``oracle_sql()`` through DuckDB on the same parquet tables, then
compare row count, column set, and (order-insensitively) every value —
the same gate CORRECTNESS_r{N}.json applies at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# Queries deliberately without a DuckDB oracle (driver records a weaker
# rows-only check): non-SQL-expressible ops. Keep this list tight.
ROWS_ONLY = {"ann_ivf_pq", "index_audit", "bpe_train"}

QUERY_NAMES = sorted(set(entry_mod.queries()) - ROWS_ONLY)


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif df[c].dtype == object:
            # duckdb may hand back Decimal for rounded values
            if len(df) and type(df[c].iloc[0]).__name__ == "Decimal":
                df[c] = df[c].astype("float64")
            else:
                df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def test_oracle_coverage():
    assert set(entry_mod.oracle_sql()) == set(entry_mod.queries()) - ROWS_ONLY


@pytest.mark.parametrize("name", sorted(ROWS_ONLY))
def test_rows_only_query_runs(spark, name):
    df = entry_mod.queries()[name](spark, SF)
    assert df.count() >= 1


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert df.columns == ["doc_id", "score"]


@pytest.mark.parametrize("name", QUERY_NAMES)
def test_query_matches_oracle(spark, ddb, name):
    got = _normalize(entry_mod.queries()[name](spark, SF).toPandas())
    want = _normalize(ddb.sql(entry_mod.oracle_sql()[name]).df())
    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {got.columns} vs {want.columns}"
    )
    assert len(got) == len(want), f"{name}: row count {len(got)} vs {len(want)}"
    for c in got.columns:
        if got[c].dtype == np.float64:
            np.testing.assert_array_equal(
                got[c].to_numpy(), want[c].to_numpy(),
                err_msg=f"{name}.{c} values differ",
            )
        else:
            assert got[c].tolist() == want[c].tolist(), f"{name}.{c} values differ"
