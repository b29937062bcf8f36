"""Structured-Streaming continuous aggregates (SURVEY.md §2.9).

The batch pipeline maintains tiers via incremental MERGE; this module is the
true-streaming variant: ``readStream`` over the sequences directory (new
parquet files = new data, the sandbox stand-in for a Kafka/Iceberg CDC
feed) -> event-time derivation -> watermarked tumbling-window aggregation
-> ``foreachBatch`` MERGE into the same KeyedTable tier tables, giving
exactly-once-per-key upserts on top of at-least-once micro-batches.

Watermark semantics: late rows within ``late_threshold`` still update their
bucket (MERGE is idempotent per key); rows later than that are dropped by
the state store — the documented retention contract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from hastl_spark.operators.rollup import with_event_time
from hastl_spark.sources.tables import DAY_SPEC, KeyedTable


def streaming_rollup_1m(spark: SparkSession, seq_dir: str, schema,
                        late_threshold: str = "10 minutes") -> DataFrame:
    """Streaming (source, 1m window) aggregation with a watermark."""
    stream = (
        spark.readStream.schema(schema).format("parquet")
        .option("path", seq_dir)
        .option("maxFilesPerTrigger", "64")
        .load()
    )
    seq = with_event_time(stream)
    return (
        seq.withWatermark("ts", late_threshold)
        .groupBy("source", F.window("ts", "1 minute").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"),
             F.sum(F.col("n_tok").cast("long")).alias("sum_n_tok"))
        .select("source", F.col("w.start").alias("bucket"), "cnt", "sum_n_tok")
    )


def run_streaming_rollup(spark: SparkSession, seq_dir: str, table_path: str,
                         checkpoint_dir: str, late_threshold: str = "10 minutes",
                         available_now: bool = True):
    """Start (or drain, with availableNow) the streaming 1m rollup into a
    MERGE-maintained KeyedTable. Returns the query handle."""
    schema = ("doc_id string, tokens array<int>, n_tok int, source string")
    agg = streaming_rollup_1m(spark, seq_dir, schema, late_threshold)
    # SAME partition layout as the batch pipeline's tier_1m (DAY_SPEC):
    # a source-partitioned stream table would rewrite each source's whole
    # accumulated history per micro-batch (quadratic over the stream) and
    # collide with the batch writer's layout guard on shared paths
    table = KeyedTable(table_path, ["source", "bucket"], part_spec=DAY_SPEC)

    def sink(batch_df: DataFrame, batch_id: int):
        if batch_df.isEmpty():
            return
        table.merge_upsert(batch_df.sparkSession, batch_df, watermark_col="bucket")

    writer = (
        agg.writeStream.foreachBatch(sink)
        .outputMode("update")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
