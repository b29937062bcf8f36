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
    # one BLAS/OMP thread per python worker: Spark already runs one task
    # per core, so intra-task numpy threading oversubscribes the host — and
    # silently un-pins the parallelism level under measurement (a local[2]
    # session would borrow extra host cores inside the UDFs, corrupting
    # scaling-efficiency numbers). Must be in the JVM's env before launch;
    # python workers inherit it.
    pin_threads = {}
    for var in ("OMP_NUM_THREADS", "OPENBLAS_NUM_THREADS", "MKL_NUM_THREADS",
                "NUMEXPR_NUM_THREADS"):
        os.environ.setdefault(var, "1")
        # under spark-submit the JVM predates this process's env, so python
        # workers need the pin via executorEnv as well
        pin_threads[f"spark.executorEnv.{var}"] = os.environ[var]
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
        # int64-micros timestamps (the Iceberg spec forbids INT96, and
        # INT96 carries no parquet min/max statistics — the table layer's
        # commit-time footer stats need them for watermark columns)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        # parquet's Hadoop vectored-IO path funnels every task's reads
        # through one small shared thread pool — on a many-core local
        # filesystem it serializes array-column scans (measured 4x slowdown
        # at local[32]); plain per-task reads scale. Revisit per filesystem
        # on a real cluster (S3/HDFS benefit from vectored coalescing).
        .config("spark.hadoop.parquet.hadoop.vectored.io.enabled", "false")
        # commit files on task completion (v2): the v1 job-commit walks and
        # renames every output file sequentially on the driver — a fixed
        # cost linear in file count that dominates partitioned tier writes.
        # Snapshot visibility is provided by the table layer's atomic
        # manifest, not by job-commit atomicity, so v2 is safe here.
        .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # InferFiltersFromGenerate copies the exploded expression into an
        # inferred `size(e) > 0 AND isnotnull(e)` Filter below the Generate.
        # For a STORED array column that can prune a scan, but every explode
        # here generates from a DERIVED array (grams/shingles/qvec
        # transforms), so the rule just re-evaluates the whole array
        # expression per row in an interpreted Filter — Generate already
        # skips null/empty inputs itself (outer=false). Worst case measured:
        # quantize's per-element lambda referencing an inlined array_max
        # went O(d^2) interpreted TWICE; embeddings_quantized 3.4s -> 0.25s
        # at sf1.0 with the rule excluded. Semantics unchanged (the rule is
        # an optimization only).
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        # FAIR job scheduling: the pipeline overlaps independent stages
        # (gap-fill vs tier cascade) from concurrent driver threads; FIFO
        # would give the first job every slot and serialize the overlap
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
    )
    for k, v in pin_threads.items():
        b = b.config(k, v)
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()
