"""Sessionization as a first-class operator (TimescaleDB/Flink
session-window parity; promoted from the former entry-only `sessions`
query per the round-4 verdict).

Semantics: events for the same key belong to one session while the gap
between consecutive events is <= ``gap_s`` seconds; a strictly larger gap
(or the first event) starts a new session. This matches Flink's
``EventTimeSessionWindows.withGap`` and TimescaleDB's classic
``LAG``-based sessionization recipe.

Scale shape: ONE exchange on the session key. ``lag`` (session-start
flags) and the running ``sum`` (session ids) share the same
``partitionBy(key).orderBy(ts, tiebreak)`` window, so Catalyst evaluates
both in a single Window operator over a single sort — adding session ids
costs nothing beyond the flag pass. The per-session aggregate then reuses
the same hash partitioning (key is a prefix of the group-by), so AQE
plans no second wide exchange for `session_stats`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _session_window(key_cols: list[str], ts_col: str,
                    tiebreak_cols: list[str]) -> Window:
    return Window.partitionBy(*key_cols).orderBy(ts_col, *tiebreak_cols)


def sessionize(events: DataFrame, gap_s: int = 1800, ts_col: str = "ts",
               key_cols: list[str] | str = "user_id",
               tiebreak_cols: list[str] | str = ()) -> DataFrame:
    """Tag every event with ``is_session_start`` (0/1) and a per-key
    ``session_id`` (1-based, ordered by time).

    ``tiebreak_cols`` break ordering ties for equal timestamps so the
    result is deterministic at any parallelism (pass the event's unique
    id column).
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    if isinstance(tiebreak_cols, str):
        tiebreak_cols = [tiebreak_cols]
    w = _session_window(key_cols, ts_col, list(tiebreak_cols))
    # microsecond-exact gap (unix_timestamp TRUNCATES sub-second parts and
    # merges sessions whose true gap straddles gap_s — the round-4
    # truncation bug class; counter.py/state.py use the same discipline,
    # and the DuckDB oracle's epoch() is fractional already)
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap = us - F.lag(us).over(w)
    flagged = events.withColumn(
        "is_session_start",
        F.when(gap.isNull() | (gap > gap_s * 1_000_000),
               F.lit(1)).otherwise(F.lit(0)))
    # running sum over the SAME window spec -> single Window operator
    return flagged.withColumn(
        "session_id", F.sum("is_session_start").over(w).cast("bigint"))


def session_stats(events: DataFrame, gap_s: int = 1800, ts_col: str = "ts",
                  key_cols: list[str] | str = "user_id",
                  tiebreak_cols: list[str] | str = (),
                  value_col: str | None = None) -> DataFrame:
    """One row per (key..., session_id): start/end timestamps, duration in
    seconds, event count, and (optionally) the summed ``value_col``."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    tagged = sessionize(events, gap_s=gap_s, ts_col=ts_col,
                        key_cols=key_cols, tiebreak_cols=tiebreak_cols)
    span_us = (F.unix_micros(F.max(ts_col).cast("timestamp"))
               - F.unix_micros(F.min(ts_col).cast("timestamp")))
    aggs = [
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (span_us / F.lit(1_000_000.0)).alias("duration_s"),  # µs-exact
        F.count(F.lit(1)).alias("n_events"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 4).alias("total_value"))
    return tagged.groupBy(*key_cols, "session_id").agg(*aggs)


def session_counts(events: DataFrame, gap_s: int = 1800, ts_col: str = "ts",
                   key_cols: list[str] | str = "user_id",
                   tiebreak_cols: list[str] | str = ()) -> DataFrame:
    """Per-key session and event counts — the shape the driver `sessions`
    oracle checks (sum of start flags == count of distinct session ids)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    tagged = sessionize(events, gap_s=gap_s, ts_col=ts_col,
                        key_cols=key_cols, tiebreak_cols=tiebreak_cols)
    return tagged.groupBy(*key_cols).agg(
        F.sum("is_session_start").alias("n_sessions"),
        F.count(F.lit(1)).alias("n_events"))
