"""Persisted IVF index with incremental maintenance.

``ivf.py`` trains centroids and assigns the corpus in one batch job. A
production ANN serving path instead keeps the inverted file as a TABLE:
new vectors are assigned to the EXISTING centroids and merged in (cheap,
incremental), and a staleness metric — mean cosine of vectors to their
cell centroid — tells the operator when drift has degraded the quantizer
enough to warrant a (rare, expensive) retrain + full reassign.

Spark shape: the index is a :class:`KeyedTable` partitioned by ``cell``
(search probes prune to n_probe partitions via manifest-scoped partition
pruning — the IVF promise made durable), keyed by ``vec_id`` (re-adding a
vector replaces its row). Centroids ride in the table manifest as a JSON
property: full-precision floats (JSON doubles round-trip exactly), so
incremental assignments are bit-identical to batch assignments with the
same centroids — pinned by test.
"""

from __future__ import annotations

import json

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import KeyedTable
from .ivf import _assign_udf, ivf_topk, train_centroids
from .similarity import _dot, _norm


class IVFStore:
    PROP_KEY = "ivf_centroids"
    FIT_KEY = "ivf_fit_cos"  # corpus-weighted mean cos at build time

    def __init__(self, path: str):
        self.table = KeyedTable(path, key_cols=["vec_id"],
                                partition_col="cell")

    # ---- centroid persistence ----
    def centroids(self) -> np.ndarray:
        blob = self.table.prop(self.PROP_KEY)
        if blob is None:
            raise ValueError(
                f"no centroids recorded at {self.table.path} — call build()")
        return np.array(json.loads(blob), dtype=np.float64)

    # ---- writes ----
    def build(self, spark: SparkSession, embeddings: DataFrame,
              dim: int, n_lists: int = 16, sample: int = 4096,
              iters: int = 10, seed: int = 42,
              id_col: str = "vec_id", vec_col: str = "embedding") -> dict:
        """Train the coarse quantizer and ingest ``embeddings``. A rebuild
        over an existing table retrains and FULLY replaces all partitions
        (stale cells from the old quantizer must not survive)."""
        C = train_centroids(embeddings, dim=dim, n_lists=n_lists,
                            sample=sample, iters=iters, seed=seed,
                            id_col=id_col, vec_col=vec_col)
        # persist: the pandas-UDF assignment (the dominant cost) would
        # otherwise execute twice — once for the fit scalar, once inside
        # the table write (review finding)
        rows = self._assign(embeddings, C, id_col, vec_col).persist()
        try:
            # build-time quantizer fit, recorded with the centroids: the
            # retrain signal is RELATIVE degradation from this number (an
            # absolute cosine floor is meaningless across dimensions —
            # random 64-dim data tops out near 0.28 even for a perfect
            # quantizer)
            fit = (self._fit_cos(rows, C)
                   .agg((F.sum(F.col("_cos") * 1.0) / F.count(F.lit(1)))
                        .alias("m")).collect()[0].m)
            if fit is None:
                raise ValueError("cannot build an IVF index from an empty "
                                 "embeddings frame")
            props = {self.PROP_KEY: json.dumps(C.tolist()),
                     self.FIT_KEY: repr(float(fit))}
            if self.table.exists():
                return self.table.overwrite(spark, rows, props=props)
            return self.table.merge_upsert(spark, rows, props=props)
        finally:
            rows.unpersist()

    def add(self, spark: SparkSession, new_vectors: DataFrame,
            id_col: str = "vec_id", vec_col: str = "embedding") -> dict:
        """Assign new vectors to the EXISTING centroids and upsert them —
        the incremental path; no retrain, touches only the cells the new
        vectors land in."""
        rows = self._assign(new_vectors, self.centroids(), id_col, vec_col)
        return self.table.merge_upsert(spark, rows)

    @staticmethod
    def _assign(vectors: DataFrame, C: np.ndarray,
                id_col: str, vec_col: str) -> DataFrame:
        assign = _assign_udf(C, 1)
        return vectors.select(
            F.col(id_col).alias("vec_id"), F.col(vec_col).alias("embedding"),
            F.element_at(assign(F.col(vec_col)), 1).alias("cell"))

    # ---- reads ----
    def read_index(self, spark: SparkSession) -> DataFrame:
        return self.table.read(spark)

    def topk(self, spark: SparkSession, queries: DataFrame, k: int = 5,
             n_probe: int = 4, id_col: str = "vec_id",
             vec_col: str = "embedding") -> DataFrame:
        """ANN search over the PERSISTED index (assignments are read, not
        recomputed). Queries assign to their n_probe nearest cells; only
        those cell partitions are scanned (manifest-scoped pruning)."""
        C = self.centroids()
        qassign = _assign_udf(C, n_probe)
        q = queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
            _norm(F.col(vec_col)).alias("_qn"),
            F.explode(qassign(F.col(vec_col))).alias("cell"))
        # prune the index scan to the union of probed cells
        probed = sorted({str(r.cell) for r in
                         q.select("cell").distinct().collect()})
        have = set(self.table.partition_values())
        live = [p for p in probed if p in have]
        if not live:
            # every probed cell is empty in the index: no candidates
            from pyspark.sql.types import (DoubleType, IntegerType,
                                           StructField, StructType)

            idt = queries.schema[id_col].dataType
            return spark.createDataFrame([], StructType([
                StructField("query_id", idt),
                StructField("neighbor_id", idt),
                StructField("rank", IntegerType()),
                StructField("cosine", DoubleType())]))
        idx = self.table.read_partitions(spark, live)
        idx = idx.withColumn("_nn", _norm(F.col("embedding")))
        cand = (
            idx.join(F.broadcast(q), "cell")
            .filter(F.col("vec_id") != F.col("query_id"))
            .select("query_id", "qvec", "_qn",
                    F.col("vec_id").alias("neighbor_id"),
                    F.col("embedding").alias("nvec"), "_nn")
            .dropDuplicates(["query_id", "neighbor_id"]))
        scored = cand.withColumn(
            "cosine",
            _dot(F.col("qvec"), F.col("nvec")) / (F.col("_qn") * F.col("_nn")))
        from pyspark.sql import Window

        w = Window.partitionBy("query_id").orderBy(
            F.desc("cosine"), F.asc("neighbor_id"))
        return (scored.withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= k)
                .select("query_id", "neighbor_id", "rank",
                        F.round("cosine", 6).alias("cosine")))

    # ---- maintenance signal ----
    @staticmethod
    def _fit_cos(idx: DataFrame, C: np.ndarray) -> DataFrame:
        """Index frame + ``_cos`` = cosine(v, C[cell]): centroids as a
        literal array-of-arrays lookup — pure Catalyst, no UDF."""
        c_lit = F.array(*[
            F.array(*[F.lit(float(x)) for x in row]) for row in C])
        withc = idx.withColumn("_c", F.element_at(c_lit, F.col("cell") + 1))
        cos = (_dot(F.col("embedding"), F.col("_c"))
               / F.greatest(_norm(F.col("embedding")), F.lit(1e-12)))
        return withc.withColumn("_cos", cos)

    def staleness(self, spark: SparkSession) -> DataFrame:
        """Per-cell quantizer fit: vector count and mean cosine of vectors
        to their assigned centroid. A healthy quantizer keeps mean_cos near
        its build-time level and cells balanced; drift (new data far from
        every centroid) pulls mean_cos down — the retrain signal."""
        return (self._fit_cos(self.read_index(spark), self.centroids())
                .groupBy("cell")
                .agg(F.count(F.lit(1)).alias("n_vectors"),
                     F.round(F.avg("_cos"), 6).alias("mean_cos")))

    def needs_retrain(self, spark: SparkSession,
                      min_fit_ratio: float = 0.8,
                      max_skew: float = 8.0) -> dict:
        """Retrain decision from the staleness frame: corpus-weighted mean
        cosine degraded below ``min_fit_ratio`` x the build-time fit
        (drift), or max/mean cell-size ratio above ``max_skew`` (quantizer
        imbalance -> probe cost blowup)."""
        rows = self.staleness(spark).collect()
        n = sum(r.n_vectors for r in rows)
        wmean = sum(r.n_vectors * r.mean_cos for r in rows) / max(n, 1)
        baseline = float(self.table.prop(self.FIT_KEY, "nan"))
        sizes = [r.n_vectors for r in rows]
        skew = (max(sizes) * len(sizes) / max(n, 1)) if sizes else 0.0
        drifted = (wmean < min_fit_ratio * baseline
                   if baseline == baseline else False)
        return {
            "n_vectors": n,
            "n_cells": len(rows),
            "weighted_mean_cos": round(wmean, 6),
            "build_fit_cos": round(baseline, 6) if baseline == baseline else None,
            "cell_skew": round(skew, 3),
            "needs_retrain": bool(drifted or skew > max_skew),
        }
