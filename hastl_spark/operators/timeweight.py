"""Time-weighted average over irregular samples (TimescaleDB
``time_weight('LOCF')`` semantics).

Each sample holds its value until the next sample: within a group,
twa = sum(v_i * (t_{i+1} - t_i)) / (t_last - t_first); the final sample
contributes zero width.  Groups with a single sample (zero span) are
dropped — there is no interval to average over.

Pure window + aggregate (codegen, one shuffle on the group key).  A
tiebreaker column makes equal-timestamp ordering deterministic: two
samples at the same instant contribute zero width EXCEPT the one the
sort places last before a gap, so the pairing must be pinned for the
DuckDB oracle to reproduce the value bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def time_weighted_avg(
    df: DataFrame,
    *,
    key_cols: Sequence[str],
    ts_col: str,
    value_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Per-key LOCF time-weighted average -> (keys..., span_s, twa)."""
    w = Window.partitionBy(*key_cols).orderBy(ts_col, tiebreak_col)
    # cast("double"), not unix_timestamp(): the latter truncates to whole
    # seconds while the oracle's epoch() keeps the microsecond fraction
    t = F.col(ts_col).cast("timestamp").cast("double")
    dt = F.lead(t).over(w) - t
    weighted = df.withColumn("_wv", F.col(value_col) * F.coalesce(dt, F.lit(0.0)))
    return (
        weighted.groupBy(*key_cols)
        .agg(
            (F.max(t) - F.min(t)).alias("span_s"),
            F.sum("_wv").alias("_num"),
        )
        .filter(F.col("span_s") > 0)
        .select(*key_cols, F.col("span_s"),
                F.round(F.col("_num") / F.col("span_s"), 4).alias("twa"))
    )
