"""Streaming incremental dedup: new document files drain through a
persisted MinHash index.

Each micro-batch probes :class:`~hastl_spark.operators.dedup_index.
MinHashIndex` for near-dup pairs (new-vs-everything-seen and
new-vs-new), appends them to the pairs sink, and merges the batch's
signatures into the index so LATER batches dedup against it.

Exactness — DISJOINT batches assumed: every unordered near-dup pair is
emitted exactly once — in the micro-batch where its LATER element
arrives (both-in-one-batch pairs come from the probe's new-vs-new side).
So the union of emitted pairs over any batch PARTITIONING of the corpus
(each doc_id arrives in exactly one batch) equals the batch LSH
self-join over the whole corpus — pinned by test against
``minhash_lsh_pairs_portable``. A doc_id RE-INGESTED in a later
micro-batch is outside that invariant: the probe correctly skips the
doc's own stale index rows (left-anti guard), but its pairs are
re-emitted under the new ``_batch`` partition, duplicating rows in the
pairs sink. Consumers of a feed that can re-send documents should
dedupe the sink on (id_a, id_b) downstream (or drop a re-ingested doc's
prior pairs when its index rows are replaced); only replay-after-merge
of the SAME batch converges to identical sink content.

Failure semantics: foreachBatch is at-least-once. The index merge is
keyed (a replayed batch upserts the same rows — idempotent), and the
pairs sink dynamically overwrites its own ``_batch`` partition, the same
replay discipline as the streaming as-of sink. One asymmetry remains: a
replay AFTER the index merge committed re-probes with the batch already
indexed; the probe joins new rows against the indexed copy of themselves,
which yields the same pairs (self-pairs are excluded by id inequality,
duplicates collapse in the probe's dropDuplicates), so the overwritten
partition converges to identical content.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from hastl_spark.operators.dedup_index import MinHashIndex


def run_streaming_dedup(
    spark: SparkSession,
    docs_dir: str,
    docs_schema: str,
    index_path: str,
    pairs_out_dir: str,
    checkpoint_dir: str,
    *,
    n: int = 5,
    k: int = 16,
    bands: int = 4,
    threshold: float = 0.35,
    max_bucket: int | None = 65536,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_files_per_trigger: int = 64,
    available_now: bool = True,
):
    """Drain ``docs_dir`` (new parquet files = new documents) through the
    incremental dedup probe + index merge. Returns the query handle."""
    index = MinHashIndex(index_path, n=n, k=k, bands=bands)

    stream = (
        spark.readStream.schema(docs_schema).format("parquet")
        .option("path", docs_dir)
        .option("maxFilesPerTrigger", str(max_files_per_trigger))
        .load()
    )

    def sink(batch_df, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        from pyspark.sql import functions as F

        pairs, _ = index.dedup_incremental(
            batch_df.sparkSession, batch_df, threshold=threshold,
            max_bucket=max_bucket, text_col=text_col, id_col=id_col)
        (pairs.withColumn("_batch", F.lit(int(batch_id)))
         .write.partitionBy("_batch")
         .option("partitionOverwriteMode", "dynamic")
         .mode("overwrite").parquet(pairs_out_dir))
        # no manual release: dedup_incremental returns an eagerly
        # localCheckpoint-ed frame (never persist()-ed); its blocks are
        # freed by the ContextCleaner once the frame is garbage-collected

    writer = (
        stream.writeStream.foreachBatch(sink)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
