"""Distributed range (interval-containment) join.

Spark compiles ``point BETWEEN start AND end`` joins to
BroadcastNestedLoopJoin (small side) or a cartesian product — both
explode at scale.  This operator uses the standard bucket-explode plan:

    explode each interval into the time buckets it covers (``sequence``
    + ``explode`` — generated distributedly), equi-join points to
    interval-buckets on (key, bucket), then apply the exact containment
    predicate as a post-join filter.

Cost: one equi-shuffle of O(|points| + |interval-buckets|); each point
meets only the intervals sharing its bucket, never the whole interval
table.  ``bucket_seconds`` trades interval-side blowup (long intervals →
many bucket rows) against join selectivity; pick it near the median
interval length.  Intervals are half-open ``[start, end)`` (the rollup
tier convention).

When the interval side is small, pass ``broadcast=True`` — the exploded
bucket table broadcasts and the points never shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_B = "__rj_b"


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    on: str,
    start_col: str,
    end_col: str,
    by: str | None = None,
    bucket_seconds: int = 3600,
    broadcast: bool = False,
) -> DataFrame:
    """Join each point row to every interval row containing it.

    ``points.on`` (timestamp) must fall in ``[start_col, end_col)``;
    ``by`` optionally adds an equality key (e.g. the series key).  The
    output carries all columns of both sides (names must not collide,
    except ``by``).
    """
    collide = (set(intervals.columns) - {by}) & set(points.columns)
    if collide:
        raise ValueError(f"interval columns collide with points: {sorted(collide)}")
    if bucket_seconds <= 0:
        raise ValueError("bucket_seconds must be positive")

    # Bucket on exact MICROSECONDS: unix_timestamp() truncates sub-second
    # parts, so an interval ending fractionally after a bucket boundary
    # would never explode into its final bucket and would silently drop
    # matches (events timestamps are microsecond-grained).
    us = bucket_seconds * 1_000_000
    # cast("timestamp") first: unix_micros rejects TIMESTAMP_NTZ columns
    # (parquet default here); session TZ is pinned UTC so the cast is
    # value-preserving
    micros = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    bucket = lambda c: F.floor(micros(c) / us)  # noqa: E731
    # Empty/inverted intervals must be dropped BEFORE the explode:
    # sequence(a, b) with b < a generates a DESCENDING range in Spark.
    intervals = intervals.filter(F.col(end_col) > F.col(start_col))
    # End is exclusive: the last covered bucket is the one holding end-1µs,
    # so an interval ending exactly on a boundary does not cover that
    # bucket, while one ending 1µs past it does.
    iv = intervals.withColumn(
        _B,
        F.explode(F.sequence(
            bucket(F.col(start_col)),
            F.floor((micros(F.col(end_col)) - F.lit(1)) / us),
        )),
    )
    if broadcast:
        iv = F.broadcast(iv)
    pts = points.withColumn(_B, bucket(F.col(on)))
    keys = [_B] if by is None else [by, _B]
    return (
        pts.join(iv, keys)
        .filter((F.col(on) >= F.col(start_col)) & (F.col(on) < F.col(end_col)))
        .drop(_B)
    )
