"""Semantics tests for the round-5 analytics breadth operators: reset-aware
counters, fixed-bin histograms, event funnels, the in-engine EWMA fold, and
the text census ops (repetition, tf-idf, vocab, deterministic split).

The driver-contract oracle tests pin Spark == DuckDB on real data; these
pin the SEMANTICS on hand-built cases where the expected answer is derived
independently (by hand or a trivially-correct python loop)."""

import datetime as dt

import numpy as np
import pytest
from pyspark.sql import functions as F

T0 = dt.datetime(2026, 1, 1, 0, 0, 0)


def _ts(s):
    return T0 + dt.timedelta(seconds=s)


# ---------------------------------------------------------------- counter


def test_counter_agg_resets_and_rate(spark):
    from hastl_spark.operators.counter import counter_agg

    rows = [  # counter climbs 10->25->40, resets, climbs 5->12
        ("a", _ts(0), 10.0, 1), ("a", _ts(10), 25.0, 2),
        ("a", _ts(20), 40.0, 3), ("a", _ts(30), 5.0, 4),
        ("a", _ts(40), 12.0, 5),
        ("b", _ts(0), 7.0, 6),  # single sample: delta 0, rate null
    ]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, value double, event_id long")
    got = {r["key"]: r for r in counter_agg(
        df, ["key"], ts_col="ts", value_col="value",
        tiebreak_col="event_id").collect()}
    # a: steps 0, 15, 15, reset->5, 7 => delta 42, one reset, span 40s
    assert got["a"]["n"] == 5 and got["a"]["num_resets"] == 1
    assert got["a"]["delta"] == 42.0
    assert got["a"]["rate"] == round(42.0 / 40.0, 6)
    assert got["b"]["n"] == 1 and got["b"]["num_resets"] == 0
    assert got["b"]["delta"] == 0.0 and got["b"]["rate"] is None


def test_counter_agg_tiebreak_determinism(spark):
    """Equal timestamps: event_id orders the pairs, so the delta is
    well-defined (v ordered 10,30,20 by id => steps 0,20,reset->20)."""
    from hastl_spark.operators.counter import counter_agg

    rows = [("a", _ts(0), 10.0, 1), ("a", _ts(0), 30.0, 2),
            ("a", _ts(0), 20.0, 3)]
    df = spark.createDataFrame(
        rows, "key string, ts timestamp, value double, event_id long")
    r = counter_agg(df, ["key"], tiebreak_col="event_id").collect()[0]
    assert r["delta"] == 40.0 and r["num_resets"] == 1 and r["rate"] is None


# ---------------------------------------------------------------- histogram


def test_value_histogram_bins_and_clamping(spark):
    from hastl_spark.operators.histogram import value_histogram

    vals = [-5.0, 0.0, 49.9, 50.0, 250.0, 499.9, 500.0, 777.0]
    df = spark.createDataFrame([("k", v) for v in vals],
                               "key string, value double")
    got = {r["bin"]: (r["bin_lo"], r["cnt"]) for r in value_histogram(
        df, ["key"], "value", lo=0.0, hi=500.0, n_bins=10).collect()}
    # -5 clamps into bin 0; 500 and 777 clamp into bin 9
    assert got[0] == (0.0, 3)      # -5, 0, 49.9
    assert got[1] == (50.0, 1)     # 50.0
    assert got[5] == (250.0, 1)
    assert got[9] == (450.0, 3)    # 499.9, 500, 777
    assert sum(c for _, c in got.values()) == len(vals)

    with pytest.raises(ValueError):
        value_histogram(df, ["key"], "value", lo=1.0, hi=1.0, n_bins=10)


# ---------------------------------------------------------------- funnel


def test_funnel_strict_order_chain(spark):
    from hastl_spark.operators.funnel import funnel_stages, funnel_summary

    rows = [
        # u1: full conversion in order
        (1, _ts(0), "view"), (1, _ts(10), "click"), (1, _ts(20), "purchase"),
        # u2: purchase BEFORE view -> chain stops at view
        (2, _ts(50), "purchase"), (2, _ts(60), "view"),
        # u3: click only (no view) -> reached 0
        (3, _ts(0), "click"),
        # u4: view, then click at the SAME ts (not strictly after) -> 1
        (4, _ts(0), "view"), (4, _ts(0), "click"),
        # u5: two views; click after the SECOND view only -- the funnel
        # anchors on the FIRST view, so the later click still matches
        (5, _ts(0), "view"), (5, _ts(100), "view"), (5, _ts(150), "click"),
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
    got = {r["user_id"]: r for r in funnel_stages(
        df, ["view", "click", "purchase"]).collect()}
    assert got[1]["reached"] == 3 and got[1]["s3_ts"] == _ts(20)
    assert got[2]["reached"] == 1 and got[2]["s2_ts"] is None
    assert got[3]["reached"] == 0 and got[3]["s1_ts"] is None
    assert got[4]["reached"] == 1
    assert got[5]["reached"] == 2 and got[5]["s2_ts"] == _ts(150)
    summ = {r["reached"]: r["n_users"] for r in funnel_summary(
        df, ["view", "click", "purchase"]).collect()}
    assert summ == {3: 1, 1: 2, 0: 1, 2: 1}


# ---------------------------------------------------------------- ewma


def test_ewma_matches_numpy_fold(spark):
    from hastl_spark.operators.smooth import ewma

    rng = np.random.default_rng(7)
    vals = rng.uniform(0, 100, 40).round(3)
    rows = [("k", i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "key string, i long, value double")
    got = (ewma(df, alpha=0.2, window=12, key_col="key", order_col="i",
                value_col="value").toPandas().sort_values("i"))

    def naive(i):
        lo = max(0, i - 11)
        acc = vals[lo]
        for x in vals[lo + 1:i + 1]:
            acc = acc + 0.2 * (x - acc)
        return round(acc, 6)

    want = [naive(i) for i in range(len(vals))]
    assert got["ewma"].tolist() == want

    with pytest.raises(ValueError):
        ewma(df, alpha=0.0, window=12, key_col="key", order_col="i",
             value_col="value")
    with pytest.raises(ValueError):
        ewma(df, alpha=0.5, window=0, key_col="key", order_col="i",
             value_col="value")


# ---------------------------------------------------------------- text ops


def test_repetition_ratio_hand_case(spark):
    from hastl_spark.operators.text import repetition_ratio

    docs = spark.createDataFrame(
        [(1, "a b a b a b"),      # grams: aba bab aba bab -> 2 distinct of 4
         (2, "w x y z"),          # 2 grams, both distinct -> 0
         (3, "only two")],        # < 3 words -> 0 grams
        "doc_id long, text string")
    got = {r["doc_id"]: (r["n_grams"], r["rep_ratio"])
           for r in repetition_ratio(docs, n=3).collect()}
    assert got[1] == (4, 0.5)
    assert got[2] == (2, 0.0)
    assert got[3] == (0, 0.0)


def test_repetition_np_twin_equals_catalyst(spark):
    """The Arrow-batched repetition pass (the driver query path since r6)
    must be row-identical to the Catalyst array-expression shape,
    including NULL text, empty text, repeated-space and <n-word docs."""
    from hastl_spark.operators.text import (repetition_ratio,
                                            repetition_ratio_np)

    docs = spark.createDataFrame(
        [(1, "a b a b a b"), (2, "w x y z"), (3, "only two"),
         (4, None), (5, ""), (6, "a  b  a  b"), (7, "x " * 500)],
        "doc_id long, text string")
    a = sorted(map(tuple, repetition_ratio(docs, n=3).collect()))
    b = sorted(map(tuple, repetition_ratio_np(docs, n=3).collect()))
    assert a == b


def test_tf_top_terms_vs_naive(spark):
    from hastl_spark.operators.text import tf_top_terms

    texts = {1: "apple apple banana", 2: "banana cherry", 3: "apple cherry date"}
    docs = spark.createDataFrame(list(texts.items()), "doc_id long, text string")
    got = {}
    for r in tf_top_terms(docs, k=2).collect():
        got.setdefault(r["doc_id"], []).append((r["rnk"], r["term"], r["score"]))
    # naive: score = tf * N / df, ties by term asc
    N = 3
    df_ = {"apple": 2, "banana": 2, "cherry": 2, "date": 1}
    for d, text in texts.items():
        tf = {}
        for t in text.split():
            tf[t] = tf.get(t, 0) + 1
        ranked = sorted(tf, key=lambda t: (-tf[t] * N / df_[t], t))[:2]
        want = [(i + 1, t, round(tf[t] * N / df_[t], 6))
                for i, t in enumerate(ranked)]
        assert sorted(got[d]) == want, d


def test_vocab_topk_deterministic_tiebreak(spark):
    from hastl_spark.operators.text import vocab_topk

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b d"), (3, "z z")],
        "doc_id long, text string")
    got = [(r["gram"], r["cnt"]) for r in vocab_topk(docs, k=3, n=2).collect()]
    # counts: "a b" x2; "b c", "b d", "z z" x1 -> ties broken gram-asc
    assert got == [("a b", 2), ("b c", 1), ("b d", 1)]


def test_deterministic_split_disjoint_stable(spark):
    from hastl_spark.operators.text import deterministic_split

    docs = spark.createDataFrame([(i,) for i in range(2000)], "doc_id long")
    a = deterministic_split(docs, 0.9, 0.05).toPandas()
    b = deterministic_split(docs, 0.9, 0.05).toPandas()
    assert a.sort_values("doc_id").equals(b.sort_values("doc_id"))  # stable
    frac = a["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.03
    assert abs(frac.get("valid", 0) - 0.05) < 0.02
    assert abs(frac.get("test", 0) - 0.05) < 0.02
    with pytest.raises(ValueError):
        deterministic_split(docs, 0.9, 0.2)


# ---------------------------------------------------------------- state/uptime


def test_state_durations_hand_case(spark):
    from hastl_spark.operators.state import state_durations

    rows = [  # u1: A for 10s, B for 20s, A closes the timeline (0s)
        (1, _ts(0), "A", 1), (1, _ts(10), "B", 2), (1, _ts(30), "A", 3),
        # u2: single event -> zero duration
        (2, _ts(0), "A", 4),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, state string, event_id long")
    got = {(r["user_id"], r["state"]): (r["n_entries"], r["total_seconds"])
           for r in state_durations(df, key_col="user_id",
                                    tiebreak_col="event_id").collect()}
    assert got[(1, "A")] == (2, 10.0)
    assert got[(1, "B")] == (1, 20.0)
    assert got[(2, "A")] == (1, 0.0)


def test_heartbeat_uptime_islands(spark):
    from hastl_spark.operators.state import heartbeat_uptime

    rows = [  # W=60: beats at 0,30,50 form one island (union [0,110]);
        # beat at 300 is its own island ([300,360])
        (1, _ts(0)), (1, _ts(30)), (1, _ts(50)), (1, _ts(300)),
        (2, _ts(0)),  # single beat: one island of exactly W
    ]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    got = {r["user_id"]: (r["n_beats"], r["n_islands"], r["uptime_seconds"])
           for r in heartbeat_uptime(df, key_col="user_id",
                                     window_seconds=60.0).collect()}
    assert got[1] == (4, 2, 110.0 + 60.0)
    assert got[2] == (1, 1, 60.0)

    import pytest as _pytest
    with _pytest.raises(ValueError):
        heartbeat_uptime(df, key_col="user_id", window_seconds=0)
