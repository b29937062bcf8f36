"""Robust (median/MAD) z-score anomaly flagging over a rollup tier.

Complements the STL route (where the remainder component is the anomaly
signal) with the classic distribution-free detector: per key,
z = 0.6745 * (x - median) / MAD, flag |z| > threshold.  Uses Spark's
exact ``median`` aggregate (interpolated, matching DuckDB's on
int/double), so the whole query is SQL-portable and oracle-checkable.

Plan shape: two aggregations over the tier + two broadcast joins of the
per-key stats (n_keys rows — trivially broadcastable at any scale; the
tier itself never re-shuffles beyond its own groupBy).  MAD==0 keys
(constant series) produce no flags — division is gated, not NaN.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def robust_zscore_anomalies(
    tier: DataFrame,
    *,
    value_col: str = "cnt",
    key_col: str = "source",
    threshold: float = 3.5,
) -> DataFrame:
    """tier(key, bucket, value) -> flagged rows with (med, mad, z) appended."""
    x = F.col(value_col).cast("double")
    med = tier.groupBy(key_col).agg(F.median(x).alias("med"))
    dev = tier.join(broadcast(med), key_col)
    mad = dev.groupBy(key_col).agg(
        F.median(F.abs(x - F.col("med"))).alias("mad"), F.first("med").alias("med")
    )
    scored = tier.join(broadcast(mad), key_col).withColumn(
        "z", F.lit(0.6745) * (x - F.col("med")) / F.col("mad")
    )
    return scored.filter((F.col("mad") > 0) & (F.abs("z") > F.lit(threshold)))
