"""Local replica of the driver's CORRECTNESS gate: run every ``queries()``
entry at sf0.01 and compare against its ``oracle_sql()`` in DuckDB —
row count, schema (column names), and order-insensitive values."""

import math

import duckdb
import numpy as np
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.01"
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


@pytest.fixture(scope="module")
def ducked():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.copy()
    df = df[sorted(df.columns)]
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ducked, name):
    q = entrymod.queries()[name]
    got = normalize(q(spark, SF).toPandas())
    exp = normalize(ducked.sql(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), f"{name}: column mismatch"
    assert len(got) == len(exp), f"{name}: row count {len(got)} vs {len(exp)}"
    for c in got.columns:
        if pd.api.types.is_float_dtype(got[c]):
            a, b = got[c].values, exp[c].values
            both_nan = np.isnan(a) & np.isnan(b)
            close = np.isclose(a, b, rtol=0, atol=1.5e-6, equal_nan=True)
            assert (close | both_nan).all(), f"{name}.{c}: value mismatch"
        else:
            assert (got[c].values == exp[c].values).all() or got[c].equals(exp[c]), \
                f"{name}.{c}: value mismatch"


def test_rows_only_queries_run(spark):
    names = set(entrymod.queries()) - set(entrymod.oracle_sql())
    for name in sorted(names):
        df = entrymod.queries()[name](spark, SF)
        n = df.count()
        assert n >= 0 and len(df.schema) > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
