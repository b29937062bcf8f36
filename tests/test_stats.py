"""stats_agg: moments pinned to NumPy, degenerate groups return NULL,
NULL/NaN values excluded."""

import math

import numpy as np

from hastl_spark.operators.stats import stats_agg


def _np_row(xs, ddof=1):
    a = np.array(xs, dtype=np.float64)
    n = len(a)
    mean = a.mean()
    m2 = ((a - mean) ** 2).mean()
    m3 = ((a - mean) ** 3).mean()
    m4 = ((a - mean) ** 4).mean()
    std = a.std(ddof=ddof) if n > ddof else None
    skew = m3 / m2 ** 1.5 if m2 > 0 else None
    kurt = m4 / m2 ** 2 - 3 if m2 > 0 else None
    rnd = lambda v: None if v is None else round(v, 4)
    return (n, rnd(mean), rnd(std), rnd(skew), rnd(kurt))


def test_moments_match_numpy(spark):
    data = {
        "a": [1.0, 2.0, 3.0, 4.0, 10.0],
        "b": [5.0, 5.0, 5.0],          # zero variance -> skew/kurt NULL
        "c": [7.25],                   # single element -> stddev NULL too
    }
    rows = [(k, v) for k, vs in data.items() for v in vs]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {r.grp: (r.n, r.mean, r.stddev, r.skewness, r.kurtosis_ex)
           for r in stats_agg(df, ["grp"], "value").collect()}
    for k, vs in data.items():
        want = _np_row(vs)
        for g, w in zip(got[k], want):
            if w is None:
                assert g is None, (k, got[k], want)
            else:
                assert math.isclose(g, w, abs_tol=2e-4), (k, got[k], want)


def test_null_and_nan_excluded(spark):
    rows = [("a", 1.0), ("a", None), ("a", float("nan")), ("a", 3.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    r = stats_agg(df, ["grp"], "value").collect()[0]
    assert r.n == 2 and r.mean == 2.0


def test_float_cancellation_constant_group(spark):
    """[0.1, 0.1, 0.1]: s2 - n*mean^2 is ~-3.5e-18 — without the clamp
    stddev is NaN in Spark and a hard sqrt error in DuckDB."""
    df = spark.createDataFrame([("a", 0.1)] * 3, "grp string, value double")
    r = stats_agg(df, ["grp"], "value").collect()[0]
    assert r.stddev == 0.0
    assert r.skewness is None and r.kurtosis_ex is None  # m2 below eps


def test_all_null_group_is_absent(spark):
    """Matches the SQL twin's WHERE semantics: a group whose every value
    is NULL/NaN produces NO output row (not an n=0 row)."""
    rows = [("a", 1.0), ("b", None), ("b", float("nan"))]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {r.grp for r in stats_agg(df, ["grp"], "value").collect()}
    assert got == {"a"}
