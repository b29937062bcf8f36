"""State-timeline and heartbeat/uptime aggregates (TimescaleDB toolkit
``state_agg`` / ``heartbeat_agg`` twins) as pure lead/lag window plans.

Both are gaps-and-islands shapes: a single window exchange on the key
computes each event's successor, then per-key aggregation reuses that
partitioning. No UDFs, no driver state; at 10^12 rows the plans are
scan -> one shuffle -> codegen windows + hash agg.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _us(col):
    # microsecond-exact epoch (unix_timestamp truncates sub-second parts);
    # NTZ -> TZ cast shifts cancel in every difference taken below
    return F.unix_micros(col.cast("timestamp"))


def state_durations(df: DataFrame, key_col: str, ts_col: str = "ts",
                    state_col: str = "state",
                    tiebreak_col: str | None = None) -> DataFrame:
    """Duration spent in each state per key: a state holds from its event
    until the key's NEXT event (any state); the key's last event closes the
    timeline (zero tail duration — equivalent to ``state_agg`` evaluated at
    the last observed instant). Output: (key, state, n_entries,
    total_seconds), seconds to 6 decimals."""
    order = [F.col(ts_col)] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = Window.partitionBy(key_col).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    dur = F.when(nxt.isNotNull(),
                 (_us(nxt) - _us(F.col(ts_col))) / F.lit(1_000_000.0)
                 ).otherwise(F.lit(0.0))
    return (df.select(F.col(key_col), F.col(state_col).alias("state"),
                      dur.alias("_dur"))
            .groupBy(key_col, "state")
            .agg(F.count(F.lit(1)).alias("n_entries"),
                 F.round(F.sum("_dur"), 6).alias("total_seconds")))


def heartbeat_uptime(df: DataFrame, key_col: str, ts_col: str = "ts",
                     window_seconds: float = 60.0) -> DataFrame:
    """Uptime from heartbeats: each beat asserts liveness for
    ``window_seconds``; uptime is the measure of the UNION of the
    [ts, ts+W] intervals (= sum of min(W, next-ts) over beats, W for each
    island's last beat), and ``n_islands`` counts maximal live stretches
    (a gap > W starts a new island). Output: (key, n_beats, n_islands,
    uptime_seconds)."""
    if window_seconds <= 0:
        raise ValueError("window_seconds must be > 0")
    w = Window.partitionBy(key_col).orderBy(ts_col)
    nxt = F.lead(ts_col).over(w)
    gap = (_us(nxt) - _us(F.col(ts_col))) / F.lit(1_000_000.0)
    W = F.lit(float(window_seconds))
    live = F.when(nxt.isNull(), W).otherwise(F.least(gap, W))
    new_island = F.when(nxt.isNotNull() & (gap > W), 1).otherwise(0)
    stepped = df.select(F.col(key_col), live.alias("_live"),
                        new_island.alias("_brk"))
    return (stepped.groupBy(key_col)
            .agg(F.count(F.lit(1)).alias("n_beats"),
                 (F.sum("_brk") + F.lit(1)).cast("long").alias("n_islands"),
                 F.round(F.sum("_live"), 6).alias("uptime_seconds")))
