"""Sequence packing + mixture sampling (operators/packing.py).

Pins: distributed prefix-sum == naive single-window cumsum; pack
conservation (every pack except a source's last is exactly full, totals
add up); span arithmetic on boundary-straddling docs; mixture sampling
determinism + exact arithmetic vs a python reimplementation."""

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from hastl_spark.operators.packing import (
    _MIX_A, _MIX_C, _MIX_DENOM, _MIX_M,
    mixture_sample, pack_sequences, pack_summary,
)

BUDGET = 100


@pytest.fixture(scope="module")
def docs(spark):
    # 3 sources x 40 docs, deterministic varied costs incl. ones bigger
    # than half the budget (forces straddles) — ids interleaved across
    # sources like a real corpus
    rows = []
    for i in range(120):
        src = f"s{i % 3}"
        cost = 7 + (i * 13) % 90
        rows.append((i, src, cost))
    return spark.createDataFrame(rows, "doc_id long, source string, n_chars long")


def test_matches_naive_single_window(spark, docs):
    # tiny shard_size so the test actually exercises multi-shard stitching
    got = pack_sequences(docs, BUDGET, shard_size=8).orderBy("doc_id").collect()
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    naive = (docs.withColumn("_cum", F.sum("n_chars").over(w))
             .withColumn("_start", F.col("_cum") - F.col("n_chars"))
             .withColumn("pack_id", F.floor(F.col("_start") / BUDGET))
             .withColumn("pack_offset", F.col("_start") % BUDGET)
             .withColumn("packs_spanned",
                         (F.floor((F.col("_cum") - 1) / BUDGET)
                          - F.col("pack_id") + 1).cast("int"))
             .select("doc_id", "source", "pack_id", "pack_offset",
                     "packs_spanned")
             .orderBy("doc_id").collect())
    assert [tuple(r) for r in got] == [tuple(r) for r in naive]


def test_pack_conservation(spark, docs):
    summ = pack_summary(docs, BUDGET, shard_size=8)
    rows = summ.collect()
    totals = {r["source"]: r["t"] for r in
              docs.groupBy("source").agg(F.sum("n_chars").alias("t")).collect()}
    by_src = {}
    for r in rows:
        by_src.setdefault(r["source"], []).append(r)
    for src, packs in by_src.items():
        packs.sort(key=lambda r: r["pack_id"])
        # contiguous pack ids from 0
        assert [p["pack_id"] for p in packs] == list(range(len(packs)))
        # every pack but the last exactly full; total conserved
        assert all(p["n_units"] == BUDGET for p in packs[:-1])
        assert sum(p["n_units"] for p in packs) == totals[src]
        assert all(1 <= p["n_units"] <= BUDGET for p in packs)


def test_straddle_spans(spark):
    # one source, costs 60+60: second doc starts at 60, ends at 120 ->
    # starts in pack 0 at offset 60, spans packs 0 and 1
    d = spark.createDataFrame(
        [(0, "s", 60), (1, "s", 60)], "doc_id long, source string, n_chars long")
    got = {r["doc_id"]: r for r in pack_sequences(d, BUDGET).collect()}
    assert (got[0]["pack_id"], got[0]["pack_offset"], got[0]["packs_spanned"]) == (0, 0, 1)
    assert (got[1]["pack_id"], got[1]["pack_offset"], got[1]["packs_spanned"]) == (0, 60, 2)


def test_pack_tokens_preserves_stream_and_fills_packs(spark):
    """flatten(packs in pack_id order) == concat(docs' tokens in id order)
    per source; every pack but the last exactly budget tokens; straddling
    docs split across pack boundaries at the right positions."""
    from hastl_spark.operators.packing import pack_tokens

    rows = []
    for i in range(90):
        src = f"s{i % 3}"
        # ids unique only WITHIN a source (like the sequences table's
        # numeric suffixes) — pins cross-source duplicate-id handling
        # through the (source, _shard) partitioning and carried payloads
        rows.append((i // 3, src,
                     [i * 1000 + k for k in range(3 + (i * 7) % 60)],
                     3 + (i * 7) % 60))
    df = spark.createDataFrame(
        rows, "doc_id long, source string, tokens array<long>, n_tok long")
    packs = pack_tokens(df, BUDGET, shard_size=8).collect()
    by_src = {}
    for r in packs:
        by_src.setdefault(r["source"], []).append(r)
    want = {}
    for i, src, toks, n in rows:
        want.setdefault(src, []).extend(toks)
    for src, ps in by_src.items():
        ps.sort(key=lambda r: r["pack_id"])
        assert [p["pack_id"] for p in ps] == list(range(len(ps)))
        assert all(len(p["tokens"]) == BUDGET for p in ps[:-1])
        assert 1 <= len(ps[-1]["tokens"]) <= BUDGET
        got = [t for p in ps for t in p["tokens"]]
        assert got == want[src]


def test_mixture_sample_exact_and_deterministic(spark, docs):
    rates = {"s0": 0.25, "s1": 0.75, "s2": 1.0}
    got = sorted(r["doc_id"] for r in mixture_sample(docs, rates).collect())
    got2 = sorted(r["doc_id"] for r in mixture_sample(docs, rates).collect())
    assert got == got2
    # python reimplementation of the exact integer arithmetic
    expect = []
    for i in range(120):
        src = f"s{i % 3}"
        u = ((i * _MIX_A + _MIX_C) % _MIX_M) % _MIX_DENOM
        if u < int(round(rates[src] * _MIX_DENOM)):
            expect.append(i)
    assert got == expect
    # s2 at rate 1.0 keeps everything
    assert sum(1 for i in got if i % 3 == 2) == 40
    # survivors are byte-identical input rows (filter only — row invariant)
    surv = mixture_sample(docs, rates)
    assert surv.columns == docs.columns
    orig = {r["doc_id"]: tuple(r) for r in docs.collect()}
    assert all(tuple(r) == orig[r["doc_id"]] for r in surv.collect())


def test_mixture_sample_large_ids_no_overflow(spark):
    """ids >= ~8.36e9 used to overflow int64 in id*A (ANSI runtime error /
    silent wrap): the pre-mod reduction must keep the arithmetic exact up
    to the repo's 10-digit doc_id convention, with the SQL twin agreeing."""
    import duckdb

    from hastl_spark.operators.packing import mixture_sample_where_sql

    ids = [0, 1, 8_400_000_000, 9_999_999_999, 2**62]
    docs = spark.createDataFrame([(i, "s0") for i in ids],
                                 "doc_id long, source string")
    rates = {"s0": 0.5}
    got = sorted(r["doc_id"] for r in mixture_sample(docs, rates).collect())
    # exact python reimplementation (arbitrary precision = ground truth)
    expect = [i for i in ids
              if ((i % _MIX_M) * _MIX_A + _MIX_C) % _MIX_M % _MIX_DENOM
              < int(round(0.5 * _MIX_DENOM))]
    assert got == expect
    con = duckdb.connect()
    con.execute("CREATE TABLE t(doc_id BIGINT, source VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", [(i, "s0") for i in ids])
    sql_got = sorted(r[0] for r in con.execute(
        "SELECT doc_id FROM t WHERE "
        + mixture_sample_where_sql(rates)).fetchall())
    assert sql_got == expect
