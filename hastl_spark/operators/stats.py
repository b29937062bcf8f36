"""Moment statistics aggregate (TimescaleDB ``stats_agg`` 1D twin):
count / mean / sample-stddev / skewness / excess kurtosis per group,
computed from EXPLICIT power sums.

Why power sums instead of the engines' built-ins: Spark's ``skewness`` is
the population g1 while DuckDB's ``skewness`` is the bias-corrected
sample G1 — built-ins are not cross-engine comparable. Deriving every
moment from sum(x), sum(x^2), sum(x^3), sum(x^4) pins ONE formula that
both the Spark plan and the SQL oracle evaluate, and the shared
4-decimal round absorbs the order-dependent float-sum jitter (same
discipline as the pricing aggregates).

Scale shape: one two-phase hash aggregation — the exchange carries five
doubles per group (the power sums partial-aggregate map-side), identical
to any sum/count rollup. Mergeable by construction: power sums add, so
tier rollups compose the same way counters do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# below this central-moment magnitude the group is numerically constant:
# m2 is float-cancellation noise and per-engine noise differs, so skewness
# and kurtosis are reported NULL (shared with the SQL twin)
_M2_EPS = 1e-12


def stats_agg(df: DataFrame, key_cols: list[str], value_col: str,
              ddof: int = 1) -> DataFrame:
    """Per ``key_cols``: n, mean, stddev (ddof=1 sample / ddof=0
    population), skewness (population g1), excess kurtosis (population
    g2 - 3). NULL/NaN values are excluded. Groups too small for a moment
    return NULL for it (n <= ddof for stddev, variance 0 likewise)."""
    v = F.col(value_col)
    ok = v.isNotNull() & ~F.isnan(v.cast("double"))
    x = F.when(ok, v.cast("double"))
    agg = df.groupBy(*key_cols).agg(
        F.count(x).alias("n"),
        F.sum(x).alias("s1"),
        F.sum(x * x).alias("s2"),
        F.sum(x * x * x).alias("s3"),
        F.sum(x * x * x * x).alias("s4"),
    )
    n = F.col("n").cast("double")
    mean = F.col("s1") / n
    # central moments from power sums (one formula, both engines)
    # explicit multiplications, not ** (pow(x, 3) and x*x*x can differ in
    # the last ulp — the oracle multiplies, so we multiply)
    m2 = F.col("s2") / n - mean * mean
    m3 = (F.col("s3") / n - 3 * mean * F.col("s2") / n
          + 2 * mean * mean * mean)
    m4 = (F.col("s4") / n - 4 * mean * F.col("s3") / n
          + 6 * mean * mean * F.col("s2") / n - 3 * mean * mean * mean * mean)
    # clamp at 0: s2 - n*mean^2 lands at ~-1e-18 for constant groups
    # (float cancellation), which would be NaN here and a hard sqrt error
    # in DuckDB; and gate skew/kurt on m2 > 1e-12 — near the cancellation
    # floor the moments are pure noise and the two engines' noise differs
    var = F.when(n > ddof, F.greatest(
        (F.col("s2") - n * mean * mean) / (n - ddof), F.lit(0.0)))
    std = F.sqrt(var)
    skew = F.when((n > 0) & (m2 > _M2_EPS), m3 / F.pow(m2, 1.5))
    kurt = F.when((n > 0) & (m2 > _M2_EPS), m4 / (m2 * m2) - 3)
    return agg.filter(F.col("n") > 0).select(
        *key_cols,
        F.col("n"),
        F.round(mean, 4).alias("mean"),
        F.round(std, 4).alias("stddev"),
        F.round(skew, 4).alias("skewness"),
        F.round(kurt, 4).alias("kurtosis_ex"),
    )


def stats_agg_oracle_sql(table: str, key_cols: list[str], value_col: str,
                         ddof: int = 1) -> str:
    """DuckDB twin evaluating the identical power-sum formulas."""
    keys = ", ".join(key_cols)
    return f"""
        WITH p AS (
          SELECT {keys},
                 count({value_col}) AS n,
                 sum({value_col}) AS s1,
                 sum({value_col} * {value_col}) AS s2,
                 sum({value_col} * {value_col} * {value_col}) AS s3,
                 sum({value_col} * {value_col} * {value_col} * {value_col})
                     AS s4
          FROM {table}
          WHERE {value_col} IS NOT NULL AND NOT isnan({value_col})
          GROUP BY {keys}
        )
        SELECT {keys}, n,
               round(s1 / n, 4) AS mean,
               round(CASE WHEN n > {ddof}
                     THEN sqrt(greatest(
                          (s2 - n * (s1/n) * (s1/n)) / (n - {ddof}), 0.0))
                     END, 4) AS stddev,
               round(CASE WHEN n > 0 AND (s2/n - (s1/n)*(s1/n)) > {_M2_EPS!r}
                 THEN (s3/n - 3*(s1/n)*s2/n + 2*(s1/n)*(s1/n)*(s1/n))
                 / pow(s2/n - (s1/n)*(s1/n), 1.5) END, 4) AS skewness,
               round(CASE WHEN n > 0 AND (s2/n - (s1/n)*(s1/n)) > {_M2_EPS!r}
                 THEN (s4/n - 4*(s1/n)*s3/n + 6*(s1/n)*(s1/n)*s2/n
                  - 3*(s1/n)*(s1/n)*(s1/n)*(s1/n))
                 / ((s2/n - (s1/n)*(s1/n)) * (s2/n - (s1/n)*(s1/n))) - 3
                 END, 4) AS kurtosis_ex
        FROM p
        WHERE n > 0
    """
