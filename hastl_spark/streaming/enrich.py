"""Streaming as-of enrichment (stream left, static/slowly-changing right).

The batch as-of join (``operators/asof.py``) is an unbounded-preceding
window — unsupported over a stream. But against a STATIC right side the
as-of match of a left row depends only on that row and the right side,
never on other left rows, so applying the batch operator inside
``foreachBatch`` is EXACT (not an approximation): the union-merge window
runs per micro-batch with the full right side, and the stream stays
append-only.

Scale shape: each micro-batch pays one hash shuffle of
O(|batch| + |right|).  When the right side is a rollup tier it is orders
smaller than the accumulated stream, and Spark caches the static side's
scan across batches.  For a right side that itself updates (a maintained
tier table), re-read it inside the sink — foreachBatch re-plans per batch,
which is exactly the slowly-changing-dimension behaviour wanted.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hastl_spark.operators.asof import asof_join


def run_streaming_asof_enrich(
    spark: SparkSession,
    left_dir: str,
    left_schema: str,
    right: DataFrame | Callable[[SparkSession], DataFrame],
    out_dir: str,
    checkpoint_dir: str,
    *,
    by: str,
    left_on: str,
    right_on: str,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    available_now: bool = True,
):
    """Drain ``left_dir`` (new parquet files = new data) through the as-of
    join against ``right`` and append the enriched rows to ``out_dir``.

    ``right`` may be a DataFrame (static) or a callable re-evaluated each
    micro-batch (slowly-changing tier).  Returns the query handle.
    """

    stream = (
        spark.readStream.schema(left_schema).format("parquet")
        .option("path", left_dir)
        .option("maxFilesPerTrigger", "64")
        .load()
    )

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        r = right(batch_df.sparkSession) if callable(right) else right
        out = asof_join(
            batch_df, r, by=by, left_on=left_on, right_on=right_on,
            direction=direction, tolerance_seconds=tolerance_seconds,
        )
        # foreachBatch is at-least-once: a replayed batch must land
        # idempotently, so each batch dynamically OVERWRITES its own
        # `_batch` partition instead of blind-appending (a retry after a
        # partial commit would otherwise duplicate rows). Readers see an
        # extra `_batch` column, same as any partitioned sink.
        from pyspark.sql import functions as F

        (out.withColumn("_batch", F.lit(int(batch_id)))
         .write.partitionBy("_batch")
         .option("partitionOverwriteMode", "dynamic")
         .mode("overwrite").parquet(out_dir))

    writer = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
