"""Relational bucket-grid densification (gap materialization).

The pipeline proper densifies inside the gap-fill UDF (zero extra shuffle);
this DataFrame-level operator exists as the standalone, SQL-checkable
equivalent (SURVEY.md §2.3): generated calendar per (source, range) via
``sequence()`` + ``explode`` + left join — calendars are generated
distributedly, never on the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def densify_grid(rollup: DataFrame, bucket_seconds: int = 60,
                 key_col: str = "source") -> DataFrame:
    """rollup(key, bucket, ...) -> one row per (key, grid bucket),
    null metrics at gaps. Grid spans each key's [min, max] bucket."""
    bounds = rollup.groupBy(key_col).agg(
        F.min("bucket").alias("b_min"), F.max("bucket").alias("b_max")
    )
    grid = bounds.select(
        key_col,
        F.explode(
            F.sequence(
                F.col("b_min"),
                F.col("b_max"),
                F.expr(f"INTERVAL {bucket_seconds} SECONDS"),
            )
        ).alias("bucket"),
    )
    # AQE handles residual skew; both sides are (source,bucket)-keyed so the
    # join co-partitions with the upstream aggregation's output.
    return grid.join(rollup, [key_col, "bucket"], "left")
