"""Range join pinned against a naive inequality join; KMV sketch pinned
for exactness-below-k and estimator accuracy."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from hastl_spark.operators.rangejoin import range_join
from hastl_spark.operators.sketch import KMV_P, kmv_distinct, kmv_hash

EPOCH = dt.datetime(2024, 1, 1)


def _ts(seconds):
    return EPOCH + dt.timedelta(seconds=int(seconds))


def _frames(seed=7, n_pts=800, n_iv=40):
    rng = np.random.default_rng(seed)
    pts = pd.DataFrame({
        "key": [f"k{int(i)}" for i in rng.integers(0, 3, n_pts)],
        "ts": [_ts(s) for s in rng.integers(0, 10**5, n_pts)],
        "pid": np.arange(n_pts, dtype=np.int64),
    })
    start = rng.integers(0, 10**5, n_iv)
    length = rng.integers(-600, 20_000, n_iv)  # some empty/inverted
    iv = pd.DataFrame({
        "key": [f"k{int(i)}" for i in rng.integers(0, 3, n_iv)],
        "iv_start": [_ts(s) for s in start],
        "iv_end": [_ts(s + l) for s, l in zip(start, length)],
        "iv_id": np.arange(n_iv, dtype=np.int64),
    })
    return pts, iv


@pytest.mark.parametrize("by,bucket_seconds", [("key", 3600), (None, 500),
                                               ("key", 10**6)])
def test_range_join_matches_inequality_join(spark, by, bucket_seconds):
    pts, iv = _frames()
    pdf, idf = spark.createDataFrame(pts), spark.createDataFrame(iv)
    if by is None:
        pdf, idf = pdf.drop("key"), idf.drop("key")
    got = range_join(pdf, idf, on="ts", start_col="iv_start",
                     end_col="iv_end", by=by,
                     bucket_seconds=bucket_seconds)
    cond = (pdf.ts >= idf.iv_start) & (pdf.ts < idf.iv_end)
    if by:
        cond = cond & (pdf[by] == idf[by])
        idf = idf.withColumnRenamed("key", "k2")
        naive = pdf.join(idf, (pdf.ts >= idf.iv_start) & (pdf.ts < idf.iv_end)
                         & (pdf.key == idf.k2))
    else:
        naive = pdf.join(idf, cond)
    a = got.select("pid", "iv_id")
    b = naive.select("pid", "iv_id")
    assert a.exceptAll(b).count() + b.exceptAll(a).count() == 0


def test_range_join_boundaries(spark):
    pts = spark.createDataFrame(
        [("a", _ts(3600), 0), ("a", _ts(7200), 1), ("a", _ts(7199), 2)],
        "key string, ts timestamp, pid long")
    iv = spark.createDataFrame(
        [("a", _ts(3600), _ts(7200), 10)],
        "key string, iv_start timestamp, iv_end timestamp, iv_id long")
    got = range_join(pts, iv, on="ts", start_col="iv_start",
                     end_col="iv_end", by="key").select("pid").toPandas()
    assert sorted(got["pid"]) == [0, 2]  # start inclusive, end exclusive


def test_range_join_rejects_collisions(spark):
    pts, iv = _frames()
    with pytest.raises(ValueError, match="collide"):
        range_join(spark.createDataFrame(pts),
                   spark.createDataFrame(iv.rename(columns={"iv_id": "pid"})),
                   on="ts", start_col="iv_start", end_col="iv_end", by="key")


def test_kmv_exact_below_k(spark):
    rows = [("g", int(v)) for v in range(50)] * 3  # 50 distinct, repeated
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_distinct(df, group_col="g", value_col="v", k=256).toPandas()
    assert len(out) == 1
    assert out.iloc[0]["n_seen"] == 50 and out.iloc[0]["est"] == 50.0


def test_kmv_estimate_within_bound(spark):
    rng = np.random.default_rng(11)
    true_n = 20_000
    vals = rng.choice(10**12, true_n, replace=False)
    rows = [("g", int(v)) for v in vals]
    df = spark.createDataFrame(rows, "g string, v long")
    out = kmv_distinct(df, group_col="g", value_col="v", k=256).toPandas()
    est = out.iloc[0]["est"]
    # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(est - true_n) / true_n < 0.25, est


def test_kmv_hash_matches_duckdb(spark):
    import duckdb

    from hastl_spark.operators.sketch import kmv_hash_sql

    vals = [0, 1, 17, 10**9, 10**12 + 7, -5]
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = [r[0] for r in df.select(kmv_hash(F.col("v"))).collect()]
    exp = [duckdb.sql(f"select {kmv_hash_sql(str(v))}").fetchone()[0]
           for v in vals]
    assert got == exp


def test_range_join_subsecond_end(spark):
    """An interval ending fractionally past a bucket boundary must still
    cover that final bucket (unix_timestamp truncation regression)."""
    pts = spark.createDataFrame(
        [("a", EPOCH + dt.timedelta(seconds=3600, microseconds=200_000), 0),
         ("a", EPOCH + dt.timedelta(seconds=3600, microseconds=600_000), 1)],
        "key string, ts timestamp, pid long")
    iv = spark.createDataFrame(
        [("a", _ts(0),
          EPOCH + dt.timedelta(seconds=3600, microseconds=500_000), 10)],
        "key string, iv_start timestamp, iv_end timestamp, iv_id long")
    got = range_join(pts, iv, on="ts", start_col="iv_start",
                     end_col="iv_end", by="key",
                     bucket_seconds=3600).select("pid").toPandas()
    assert sorted(got["pid"]) == [0]  # .2s in, .6s out (end-exclusive)
