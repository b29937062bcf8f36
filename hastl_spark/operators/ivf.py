"""IVF (inverted-file) approximate nearest neighbor over an embedding column.

The scale path beyond LSH: a k-means coarse quantizer partitions the corpus
into ``n_lists`` cells; queries probe only their ``n_probe`` nearest cells,
so exact-distance work shrinks by ~n_lists/n_probe while recall stays high
for clustered data.

Spark shape:
  * TRAIN: deterministic k-means on a bounded sample pulled to the driver
    (NumPy, seeded) — centroids are a small model, exactly like fitting any
    broadcast-side dimension table;
  * ASSIGN: one Arrow-batched pandas UDF computes argmax(<v, c_j>) per
    vector (one BLAS matmul per batch) — corpus is scanned once;
  * SEARCH: queries assign to their n_probe closest cells, join on cell id
    (broadcast — queries are small), exact cosine re-rank + window top-k.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from .similarity import _dot, _norm


def train_centroids(embeddings: DataFrame, dim: int, n_lists: int = 16,
                    sample: int = 4096, iters: int = 10, seed: int = 42,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> np.ndarray:
    """Seeded mini k-means on a driver-side sample. Returns [n_lists, dim]
    L2-normalized centroids (cosine cells).

    The sample is the ``sample`` vectors with the lowest ``xxhash64(id)``
    (orderBy + limit = TakeOrdered, one pass, no full sort): deterministic
    on a real multi-executor cluster AND unbiased — ordering by the raw id
    would train on the corpus head, which is content-correlated in
    time-ordered corpora (round-3 review finding)."""
    pdf = (embeddings.select(id_col, vec_col)
           .orderBy(F.xxhash64(F.col(id_col).cast("string")))
           .limit(sample).toPandas())
    X = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
    X = X / np.maximum(np.linalg.norm(X, axis=1, keepdims=True), 1e-12)
    rng = np.random.default_rng(seed)
    C = X[rng.choice(len(X), size=min(n_lists, len(X)), replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ C.T, axis=1)
        for j in range(len(C)):
            m = assign == j
            if m.any():
                c = X[m].mean(axis=0)
                C[j] = c / max(np.linalg.norm(c), 1e-12)
    return C


def _assign_udf(C: np.ndarray, n_probe: int):
    CT = C.T.copy()

    @pandas_udf("array<int>")
    def assign(vecs: pd.Series) -> pd.Series:
        M = np.stack(vecs.to_numpy()).astype(np.float64)
        M = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        sims = M @ CT
        top = np.argsort(-sims, axis=1)[:, :n_probe].astype(np.int32)
        return pd.Series(list(top))

    return assign


def ivf_index(embeddings: DataFrame, centroids: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Corpus -> (cell, id, vec): each vector in its single best cell."""
    assign = _assign_udf(centroids, 1)
    return embeddings.select(
        F.col(id_col), F.col(vec_col),
        F.element_at(assign(F.col(vec_col)), 1).alias("cell"),
    )


def ivf_topk(embeddings: DataFrame, queries: DataFrame, centroids: np.ndarray,
             k: int = 5, n_probe: int = 4,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Top-k cosine neighbors probing n_probe cells per query."""
    # norms per side before the cell join (once per corpus/query row, not
    # per candidate pair — the HOF fold is interpreted per element)
    idx = ivf_index(embeddings, centroids, id_col, vec_col) \
        .withColumn("_nn", _norm(F.col(vec_col)))
    qassign = _assign_udf(centroids, n_probe)
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qvec"),
        _norm(F.col(vec_col)).alias("_qn"),
        F.explode(qassign(F.col(vec_col))).alias("cell"),
    )
    cand = (
        idx.join(F.broadcast(q), "cell")
        .filter(F.col(id_col) != F.col("query_id"))
        .select("query_id", "qvec", "_qn", F.col(id_col).alias("neighbor_id"),
                F.col(vec_col).alias("nvec"), "_nn")
        .dropDuplicates(["query_id", "neighbor_id"])
    )
    scored = cand.withColumn(
        "cosine", _dot(F.col("qvec"), F.col("nvec"))
        / (F.col("_qn") * F.col("_nn")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", F.round("cosine", 6).alias("cosine"))
    )
