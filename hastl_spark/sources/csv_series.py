"""CSV series source — engine twin of the reference's bulk-CSV example
(examples/bulk_csv.py:16-27): select value columns, zeros-as-missing, one
series per column, batch-ready for the STL kernel or gap-fill operator.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_series_csv(spark: SparkSession, path: str, value_cols: list[str],
                    zero_as_nan: bool = True, header: bool = True) -> DataFrame:
    """Returns long-form (series string, idx long, y double): column name as
    the series key, file order as the integer time axis (the reference's
    implicit index), 0 -> null when ``zero_as_nan`` (bulk_csv.py:24-27).

    The dense-rank window is a single-partition sort — fine for this
    source's contract (one bounded CSV of series columns, the reference's
    own input shape); unbounded event streams should carry real event time
    instead (``with_event_time``)."""
    df = (
        spark.read.option("header", str(header).lower())
        .option("inferSchema", "true").csv(path)
    )
    # idx must be a DENSE integer coordinate (consumers treat it as the time
    # axis) — monotonically_increasing_id() jumps by 2^33 across partitions,
    # so rank the per-partition ids into contiguous row numbers instead.
    # One narrow window over the raw ids; file order is preserved because
    # the ids are monotone in read order within the file.
    from pyspark.sql import Window

    df = df.select(F.monotonically_increasing_id().alias("_mid"), *value_cols)
    df = df.withColumn(
        "idx", F.row_number().over(Window.orderBy("_mid")) - 1
    ).drop("_mid")
    stack_expr = ", ".join(f"'{c}', CAST(`{c}` AS DOUBLE)" for c in value_cols)
    long = df.selectExpr(
        "idx", f"stack({len(value_cols)}, {stack_expr}) AS (series, y)"
    ).select("series", "idx", F.col("y").cast("double").alias("y"))
    if zero_as_nan:
        long = long.withColumn("y", F.when(F.col("y") == 0, None).otherwise(F.col("y")))
    return long
