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


_RAW_CACHE: dict = {}


def _raw_frames(spark, ducked, name):
    """Full (unnormalized) Spark and DuckDB frames for one oracle query,
    computed once per session and shared between the value test and the
    dtype-parity gate."""
    if name not in _RAW_CACHE:
        got = entrymod.queries()[name](spark, SF).toPandas()
        exp = ducked.sql(entrymod.oracle_sql()[name]).df()
        _RAW_CACHE[name] = (got, exp)
    return _RAW_CACHE[name]


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(spark, ducked, name):
    got, exp = _raw_frames(spark, ducked, name)
    got, exp = normalize(got), normalize(exp)
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


def _dtype_key(s: pd.Series) -> str:
    """Canonical dtype label for driver-comparator parity.

    The driver hashes raw values column-by-column, so a Spark int64 vs a
    DuckDB HUGEINT-degraded float64 hash-mismatches even when every value
    is numerically identical (the round-4 packing failure).  Integer
    widths are folded together (int32 vs int64 print identically) and
    datetimes fold across unit, but kind mismatches (int vs float,
    numeric vs object) are exactly the class of bug this gate exists to
    catch — keep them strict."""
    if pd.api.types.is_datetime64_any_dtype(s):
        return "datetime"
    if pd.api.types.is_bool_dtype(s):
        return "bool"
    if pd.api.types.is_integer_dtype(s):
        return "int"
    if pd.api.types.is_float_dtype(s):
        return "float"
    return "object"


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_oracle_dtype_parity(spark, ducked, name):
    """Raw (pre-normalization) dtype kinds must agree between the Spark
    result and the DuckDB oracle over the FULL frames — the driver compares
    raw value hashes, so any kind drift (HUGEINT->float64,
    DECIMAL-vs-DOUBLE) is a driver hash failure even with identical values.
    One legitimate asymmetry: a nullable integer column arrives in pandas
    as float64 exactly when the frame contains a null, on BOTH sides — so
    int-vs-float passes only if the float side actually holds a NaN (the
    driver sees the same full frames and hashes them identically then)."""
    got, exp = _raw_frames(spark, ducked, name)
    assert sorted(got.columns) == sorted(exp.columns), f"{name}: columns"
    for c in sorted(got.columns):
        gk, ek = _dtype_key(got[c]), _dtype_key(exp[c])
        if {gk, ek} == {"int", "float"}:
            fs = got[c] if gk == "float" else exp[c]
            assert fs.isna().any(), (
                f"{name}.{c}: {got[c].dtype} vs {exp[c].dtype} with no "
                "nulls to explain the upcast — driver hash would differ")
            continue
        assert gk == ek, (
            f"{name}.{c}: spark dtype {got[c].dtype} ({gk}) vs "
            f"oracle dtype {exp[c].dtype} ({ek})")


def test_rows_only_queries_run(spark):
    names = set(entrymod.queries()) - set(entrymod.oracle_sql())
    for name in sorted(names):
        df = entrymod.queries()[name](spark, SF)
        n = df.count()
        assert n >= 0 and len(df.schema) > 0, name


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0
