"""applyInPandasWithState gap monitor: streaming-detected missing buckets
must equal the batch densification's null rows (within the observed range),
including gaps that straddle two micro-batch file drops."""

import pytest
from pyspark.sql import functions as F

from hastl_spark.operators.densify import densify_grid
from hastl_spark.operators.rollup import rollup_1m, with_event_time
from hastl_spark.sources.sequences import SEQS_PER_BUCKET, generate_scale
from hastl_spark.streaming.stateful import run_gap_monitor


@pytest.mark.slow
def test_streaming_gaps_match_batch_densify(spark, tmp_path):
    seqs = generate_scale(spark, "xs").cache()
    seq_no = F.split("doc_id", "-").getItem(1).cast("long")
    b = (seq_no / SEQS_PER_BUCKET).cast("long")
    seq_dir = str(tmp_path / "seqs")
    seqs.filter(b < 150).write.mode("overwrite").parquet(seq_dir)

    out = str(tmp_path / "gaps")
    ckpt = str(tmp_path / "ckpt")
    q = run_gap_monitor(spark, seq_dir, out, ckpt)
    q.awaitTermination(300)
    # second drop: the rest of the data (gaps straddling the boundary must
    # still be detected exactly once thanks to the high-water-mark state)
    seqs.filter(b >= 150).write.mode("append").parquet(seq_dir)
    q2 = run_gap_monitor(spark, seq_dir, out, ckpt)
    q2.awaitTermination(300)

    got = spark.read.parquet(out).select("source", "missing_bucket")
    assert got.count() == got.distinct().count()  # no double-detection

    # batch ground truth: null rows of the densified grid, excluding each
    # source's leading/trailing edge (streaming can't know gaps before the
    # first or after the last observed bucket)
    dense = densify_grid(rollup_1m(with_event_time(seqs)))
    batch_gaps = dense.filter(F.col("cnt").isNull()).select(
        "source", F.col("bucket").alias("missing_bucket"))
    diff = (got.exceptAll(batch_gaps).count()
            + batch_gaps.exceptAll(got).count())
    assert diff == 0
