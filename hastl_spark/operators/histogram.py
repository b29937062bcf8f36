"""Fixed-bin value histograms (TimescaleDB ``histogram`` / SQL
``width_bucket`` twin) as a pure two-phase codegen aggregation.

Scale shape: bin assignment is a scalar expression (division + floor +
clamp), so the plan is scan -> partial hash-agg -> ONE exchange on
(key, bin) -> final agg. Map-side combine collapses each partition to at
most ``n_bins`` rows per key before the shuffle — at 100 TB the exchange
carries O(keys x bins), not O(rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bin_of(value: Column, lo: float, hi: float, n_bins: int) -> Column:
    """0-based bin index with edge clamping: values < lo land in bin 0,
    values >= hi in bin n_bins-1 (width_bucket's under/overflow buckets
    folded into the edge bins so the output arity is fixed). NULL and NaN
    values map to NULL — NOT to a bin: Spark's null-skipping
    least/greatest would otherwise silently clamp them into the TOP bin
    (review finding), fabricating observations no histogram should count."""
    w = (hi - lo) / n_bins
    raw = F.floor((value - F.lit(lo)) / F.lit(w))
    clamped = F.greatest(F.least(raw, F.lit(n_bins - 1)), F.lit(0)).cast("int")
    return F.when(value.isNull() | F.isnan(value.cast("double")),
                  F.lit(None).cast("int")).otherwise(clamped)


def value_histogram(df: DataFrame, key_cols: list[str], value_col: str,
                    lo: float, hi: float, n_bins: int) -> DataFrame:
    """Per ``key_cols``: one row per non-empty bin with ``bin`` (0-based),
    ``bin_lo`` (inclusive lower edge) and ``cnt``. Empty bins are omitted
    (dense output = a calendar-style left join, same as densify)."""
    if not hi > lo or n_bins < 1:
        raise ValueError("need hi > lo and n_bins >= 1")
    w = (hi - lo) / n_bins
    b = bin_of(F.col(value_col), lo, hi, n_bins)
    return (df.withColumn("bin", b).filter(F.col("bin").isNotNull())
            .groupBy(*key_cols, "bin")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .select(*key_cols, "bin",
                    F.round(F.col("bin") * F.lit(w) + F.lit(lo), 6)
                    .alias("bin_lo"), "cnt"))
