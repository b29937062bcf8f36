"""Ordered event funnels: per user, the earliest strictly-increasing
timestamp chain through a fixed stage sequence (view -> click -> purchase).

Semantics (the standard product-analytics funnel): stage k's timestamp is
the MIN event time of stage k's type that is strictly AFTER the user's
stage k-1 timestamp; ``reached`` = length of the satisfied prefix. A user
who purchases before ever viewing does NOT count as a full conversion.

Scale shape: all stages resolve in ONE exchange — the frame is hash-
partitioned by user once, then each stage is a Window aggregate over that
same partitioning (Catalyst stacks the Window operators without
re-shuffling, exactly like the rollup tier cascade), and the final
per-user aggregate reuses it again. No joins, no driver state, no UDF;
at 10^9 users the plan is scan -> one shuffle -> codegen windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_stages(df: DataFrame, stages: list[str], user_col: str = "user_id",
                  ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """One row per user seen in ``df``: ``s1_ts .. sK_ts`` (null once the
    chain breaks) and ``reached`` in [0, K]."""
    if not stages:
        raise ValueError("need at least one stage")
    w = Window.partitionBy(user_col)
    out = df.select(user_col, ts_col, type_col)
    prev_ts = None
    names = []
    for i, stage in enumerate(stages, start=1):
        cond = F.col(type_col) == stage
        if prev_ts is not None:
            # strict ordering; a null prev makes cond null -> min skips it,
            # so a broken chain stays broken for every later stage
            cond = cond & (F.col(ts_col) > F.col(prev_ts))
        name = f"s{i}_ts"
        out = out.withColumn(name, F.min(F.when(cond, F.col(ts_col))).over(w))
        prev_ts = name
        names.append(name)
    return (out.groupBy(user_col)
            .agg(*[F.first(n).alias(n) for n in names])
            .select(user_col, *names,
                    sum((F.col(n).isNotNull().cast("int") for n in names),
                        F.lit(0)).alias("reached")))


def funnel_summary(df: DataFrame, stages: list[str], user_col: str = "user_id",
                   ts_col: str = "ts", type_col: str = "event_type") -> DataFrame:
    """Counts per furthest-stage-reached: (reached, n_users) — the funnel
    conversion table."""
    per_user = funnel_stages(df, stages, user_col, ts_col, type_col)
    return per_user.groupBy("reached").agg(F.count(F.lit(1)).alias("n_users"))
