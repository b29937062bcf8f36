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
