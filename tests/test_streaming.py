"""Structured-Streaming continuous aggregate: drain with availableNow and
compare against the batch rollup; then append late-arriving files and
verify the MERGE updates the affected buckets only."""

import pytest
from pyspark.sql import functions as F

from hastl_spark.operators.rollup import rollup_1m, with_event_time
from hastl_spark.sources.sequences import generate_scale
from hastl_spark.sources.tables import KeyedTable
from hastl_spark.streaming.incremental import run_streaming_rollup


@pytest.mark.slow
def test_streaming_rollup_matches_batch(spark, tmp_path):
    seq_dir = str(tmp_path / "seqs")
    seqs = generate_scale(spark, "xs").cache()
    first = seqs.filter(F.split("doc_id", "-").getItem(1).cast("long") < 150 * 100_000)
    rest = seqs.subtract(first)
    first.write.mode("overwrite").parquet(seq_dir)

    table_path = str(tmp_path / "t1m_stream")
    q = run_streaming_rollup(spark, seq_dir, table_path, str(tmp_path / "ckpt"))
    q.awaitTermination(300)

    cols = ["source", "bucket", "cnt", "sum_n_tok"]
    t = KeyedTable(table_path, ["source", "bucket"])
    got1 = t.read(spark).select(*cols)
    exp1 = rollup_1m(with_event_time(first)).select(*cols)
    assert got1.exceptAll(exp1).count() + exp1.exceptAll(got1).count() == 0

    # late/new data arrives as more files -> drain again -> table == full batch
    rest.write.mode("append").parquet(seq_dir)
    q2 = run_streaming_rollup(spark, seq_dir, table_path, str(tmp_path / "ckpt"))
    q2.awaitTermination(300)
    got2 = t.read(spark).select(*cols)
    exp2 = rollup_1m(with_event_time(seqs)).select(*cols)
    assert got2.exceptAll(exp2).count() + exp2.exceptAll(got2).count() == 0
    assert t.snapshot() >= 2


@pytest.mark.slow
def test_streaming_asof_enrich_matches_batch(spark, tmp_path):
    """Stream events in two file batches through the as-of enrich; the
    accumulated output must equal the batch as-of join of ALL events
    (exactness of foreachBatch as-of against a static right side)."""
    import datetime as dt

    import numpy as np
    import pandas as pd

    from hastl_spark.operators.asof import asof_join
    from hastl_spark.streaming.enrich import run_streaming_asof_enrich

    rng = np.random.default_rng(31)
    epoch = dt.datetime(2024, 1, 1)
    n_left, n_right = 600, 80
    left = pd.DataFrame({
        "key": [f"k{int(i)}" for i in rng.integers(0, 4, n_left)],
        "ts": [epoch + dt.timedelta(seconds=int(s))
               for s in rng.choice(10**5, n_left, replace=False)],
        "ev": np.arange(n_left, dtype=np.int64),
    })
    right = pd.DataFrame({
        "key": [f"k{int(i)}" for i in rng.integers(0, 4, n_right)],
        "rt": [epoch + dt.timedelta(seconds=int(s))
               for s in rng.choice(10**5, n_right, replace=False)],
        "payload": rng.integers(0, 1000, n_right).astype(np.int64),
    })
    ldf, rdf = spark.createDataFrame(left), spark.createDataFrame(right)

    left_dir = str(tmp_path / "stream_left")
    out_dir = str(tmp_path / "stream_out")
    ldf.filter("ev < 300").write.mode("overwrite").parquet(left_dir)

    kwargs = dict(by="key", left_on="ts", right_on="rt",
                  tolerance_seconds=20_000)
    q = run_streaming_asof_enrich(
        spark, left_dir, "key string, ts timestamp, ev long", rdf,
        out_dir, str(tmp_path / "ckpt_asof"), **kwargs)
    q.awaitTermination(300)
    # second tranche of files -> drain again from the same checkpoint
    ldf.filter("ev >= 300").write.mode("append").parquet(left_dir)
    q2 = run_streaming_asof_enrich(
        spark, left_dir, "key string, ts timestamp, ev long", rdf,
        out_dir, str(tmp_path / "ckpt_asof"), **kwargs)
    q2.awaitTermination(300)

    got = spark.read.parquet(out_dir).drop("_batch")
    exp = asof_join(ldf, rdf, **kwargs)
    assert got.count() == n_left
    assert got.exceptAll(exp).count() + exp.exceptAll(got).count() == 0
