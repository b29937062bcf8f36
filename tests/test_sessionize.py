"""Sessionize operator unit tests: session ids, stats, and determinism
under timestamp ties."""

import datetime as dt

from pyspark.sql import functions as F

from hastl_spark.operators.sessionize import (session_counts, session_stats,
                                              sessionize)


def _events(spark):
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0)
    rows = [
        # user a: 3 events in one session, then a 40-min gap -> new session
        ("a", t0, 1), ("a", t0 + dt.timedelta(minutes=10), 2),
        ("a", t0 + dt.timedelta(minutes=20), 3),
        ("a", t0 + dt.timedelta(minutes=60), 4),
        # user b: single event
        ("b", t0, 5),
        # user c: two events at the SAME timestamp (tiebreak by id), then
        # exactly at the 30-min boundary (gap == gap_s stays in-session)
        ("c", t0, 6), ("c", t0, 7),
        ("c", t0 + dt.timedelta(minutes=30), 8),
        ("c", t0 + dt.timedelta(minutes=60, seconds=1), 9),
    ]
    return spark.createDataFrame(rows, "user_id string, ts timestamp, event_id long")


def test_session_ids_and_boundaries(spark):
    tagged = sessionize(_events(spark), gap_s=1800, key_cols="user_id",
                        tiebreak_cols="event_id")
    got = {r.event_id: (r.session_id, r.is_session_start)
           for r in tagged.collect()}
    assert got[1] == (1, 1) and got[2] == (1, 0) and got[3] == (1, 0)
    assert got[4] == (2, 1)          # 40-min gap starts session 2
    assert got[5] == (1, 1)
    assert got[6] == (1, 1) and got[7] == (1, 0)   # same-ts tie stays together
    assert got[8] == (1, 0)          # gap == gap_s is NOT a new session
    assert got[9] == (2, 1)          # 30m01s > gap_s


def test_subsecond_gap_is_exact(spark):
    """unix_timestamp truncation would merge these: true gap 1800.8s >
    1800s must start a new session (microsecond-exact discipline)."""
    t0 = dt.datetime(2026, 1, 1, 0, 0, 0, 100000)
    rows = [("u", t0, 1),
            ("u", t0 + dt.timedelta(seconds=1800, microseconds=800000), 2)]
    ev = spark.createDataFrame(
        rows, "user_id string, ts timestamp, event_id long")
    got = {r.event_id: r.session_id
           for r in sessionize(ev, gap_s=1800,
                               tiebreak_cols="event_id").collect()}
    assert got == {1: 1, 2: 2}


def test_session_stats(spark):
    stats = {(r.user_id, r.session_id): (r.duration_s, r.n_events)
             for r in session_stats(_events(spark), gap_s=1800,
                                    tiebreak_cols="event_id").collect()}
    assert stats[("a", 1)] == (1200, 3)
    assert stats[("a", 2)] == (0, 1)
    assert stats[("b", 1)] == (0, 1)
    assert stats[("c", 1)] == (1800, 3)
    assert stats[("c", 2)] == (0, 1)


def test_counts_equal_stats_rollup(spark):
    ev = _events(spark)
    counts = {r.user_id: (r.n_sessions, r.n_events)
              for r in session_counts(ev, gap_s=1800,
                                      tiebreak_cols="event_id").collect()}
    stats = session_stats(ev, gap_s=1800, tiebreak_cols="event_id") \
        .groupBy("user_id").agg(
            F.count(F.lit(1)).alias("ns"),
            F.sum("n_events").alias("ne")).collect()
    assert counts == {r.user_id: (r.ns, r.ne) for r in stats}
