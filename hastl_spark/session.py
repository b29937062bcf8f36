"""SparkSession builder with the engine's standard configuration."""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(cpus: int | None = None, shuffle_partitions: int | None = None,
              app_name: str = "hastl-spark", extra_conf: dict | None = None) -> SparkSession:
    """local[cpus] session tuned for the engine.

    AQE on (runtime re-plan + skew-join handling), Arrow on (every pandas-UDF
    boundary is Arrow-batched), shuffle partitions sized to parallelism —
    at cluster scale these carry over 1:1 (SURVEY.md §4).
    """
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cpus), 8)
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "65536")
        .config("spark.sql.session.timeZone", "UTC")
        # parquet's Hadoop vectored-IO path funnels every task's reads
        # through one small shared thread pool — on a many-core local
        # filesystem it serializes array-column scans (measured 4x slowdown
        # at local[32]); plain per-task reads scale. Revisit per filesystem
        # on a real cluster (S3/HDFS benefit from vectored coalescing).
        .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
