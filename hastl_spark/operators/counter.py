"""Reset-aware counter aggregation (TimescaleDB ``counter_agg`` twin).

Monotonic-counter telemetry (bytes sent, requests served) resets to zero on
process restart; a naive ``max - min`` under-counts across resets. The
counter delta treats every decrease as a reset: the counter is assumed to
restart at 0 and climb to the observed value, so a decrease contributes the
full new value instead of a negative step.

Scale shape: ONE window exchange on (key, bucket) computes the lagged
neighbor, then the per-key aggregation reuses the same hash partitioning —
Catalyst plans a single Exchange for both (the same partition-reuse the
rollup tiers rely on). No driver collection, no UDF: lag + conditional sum
are whole-stage-codegen expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def counter_agg(df: DataFrame, key_cols: list[str], ts_col: str = "ts",
                value_col: str = "value",
                tiebreak_col: str | None = None) -> DataFrame:
    """Per ``key_cols`` group: ``n`` samples, ``num_resets``, the
    reset-corrected total increase ``delta``, and ``rate`` = delta per
    second across the group's observed span (null for single-sample or
    zero-span groups, as in TimescaleDB's ``rate``).

    ``tiebreak_col`` makes the lag order total when timestamps can tie
    (equal-ts rows would otherwise make the pairwise steps
    nondeterministic).
    """
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(*key_cols).orderBy(*order)
    prev = F.lag(value_col).over(w)
    step = F.when(prev.isNull(), F.lit(0.0)).otherwise(
        F.when(F.col(value_col) >= prev, F.col(value_col) - prev)
        .otherwise(F.col(value_col)))
    reset = F.when(prev.isNotNull() & (F.col(value_col) < prev), 1).otherwise(0)
    stepped = df.select(*key_cols, ts_col, value_col,
                        step.alias("_step"), reset.alias("_reset"))
    # microsecond-exact span (unix_timestamp would truncate sub-second
    # parts — the round-4 truncation bug class); both engines compute the
    # same (max_us - min_us) / 1e6 double
    # unix_micros requires TIMESTAMP (not NTZ); the cast's timezone shift
    # cancels in the max-min difference
    span = ((F.unix_micros(F.max(ts_col).cast("timestamp"))
             - F.unix_micros(F.min(ts_col).cast("timestamp")))
            / F.lit(1_000_000.0))
    agg = stepped.groupBy(*key_cols).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_reset").alias("num_resets"),
        F.round(F.sum("_step"), 4).alias("delta"),
        span.alias("_span"),
    )
    return agg.select(
        *key_cols, "n", "num_resets", "delta",
        F.when(F.col("_span") > 0,
               F.round(F.col("delta") / F.col("_span"), 6)).alias("rate"))
