"""IVF ANN: recall vs exact brute force on the driver's embeddings."""

import numpy as np
import pytest

from hastl_spark.operators.ivf import ivf_index, ivf_topk, train_centroids
from hastl_spark.operators.similarity import brute_force_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def embs(spark):
    e = spark.read.parquet(f"{SF}/embeddings.parquet").cache()
    e.count()
    return e


def test_centroids_deterministic_and_normalized(spark, embs):
    C1 = train_centroids(embs, dim=64, n_lists=8)
    C2 = train_centroids(embs, dim=64, n_lists=8)
    np.testing.assert_array_equal(C1, C2)
    np.testing.assert_allclose(np.linalg.norm(C1, axis=1), 1.0, rtol=1e-9)


def test_index_covers_corpus(spark, embs):
    C = train_centroids(embs, dim=64, n_lists=8)
    idx = ivf_index(embs, C)
    assert idx.count() == embs.count()
    cells = [r["cell"] for r in idx.select("cell").distinct().collect()]
    assert all(0 <= c < 8 for c in cells)
    assert len(cells) >= 4  # quantizer actually spreads the data


def test_ivf_recall_against_exact(spark, embs):
    C = train_centroids(embs, dim=64, n_lists=8)
    exact = brute_force_topk(embs, embs.filter("vec_id < 10"), k=5).toPandas()
    approx = ivf_topk(embs, embs.filter("vec_id < 10"), C, k=5, n_probe=4).toPandas()
    hits = 0
    for q in range(10):
        e = set(exact[exact.query_id == q].neighbor_id)
        a = set(approx[approx.query_id == q].neighbor_id)
        hits += len(e & a)
    assert hits / 50 >= 0.7  # probing half the cells on clustered data


def test_ivf_training_unbiased_under_id_order(spark):
    """Ids correlating with content (time-ordered corpora) must not bias
    training: the sample orders by xxhash64(id), not raw id. Fixture: two
    well-separated clusters where ALL low ids are cluster A — a head-of-
    corpus sample would train on A only and recall on B queries collapses."""
    rng = np.random.default_rng(3)
    dim, n_half = 16, 300
    a = rng.normal(0, 0.05, (n_half, dim)) + np.eye(dim)[0] * 2
    b = rng.normal(0, 0.05, (n_half, dim)) + np.eye(dim)[1] * 2
    rows = [(i, v.tolist()) for i, v in enumerate(a)] + \
           [(n_half + i, v.tolist()) for i, v in enumerate(b)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    # sample smaller than cluster A: lowest-id sampling would never see B
    C = train_centroids(df, dim=dim, n_lists=4, sample=200)
    # both clusters must be represented among the centroids (head-biased
    # training puts all 4 in A; B then crams into whichever A-cell is
    # nearest — a skew/imbalance failure at scale)
    ca = a.mean(axis=0) / np.linalg.norm(a.mean(axis=0))
    cb = b.mean(axis=0) / np.linalg.norm(b.mean(axis=0))
    assert (C @ ca > 0.9).any() and (C @ cb > 0.9).any()
    cells = ivf_index(df, C).groupBy("cell").count().toPandas()
    assert cells["count"].max() <= 1.5 * n_half  # no single dominant cell
    # and recall stays healthy on the high-id (cluster B) queries
    exact = brute_force_topk(df, df.filter(f"vec_id >= {2 * n_half - 5}"),
                             k=5).toPandas()
    approx = ivf_topk(df, df.filter(f"vec_id >= {2 * n_half - 5}"), C,
                      k=5, n_probe=2).toPandas()
    hits = 0
    for q in exact.query_id.unique():
        e = set(exact[exact.query_id == q].neighbor_id)
        ap = set(approx[approx.query_id == q].neighbor_id)
        hits += len(e & ap)
    assert hits / 25 >= 0.9


def test_ivf_full_probe_equals_exact(spark, embs):
    # probing ALL cells makes IVF exhaustive -> identical to brute force
    C = train_centroids(embs, dim=64, n_lists=4)
    exact = brute_force_topk(embs, embs.filter("vec_id < 5"), k=3).toPandas()
    full = ivf_topk(embs, embs.filter("vec_id < 5"), C, k=3, n_probe=4).toPandas()
    e = exact.sort_values(["query_id", "rank"]).reset_index(drop=True)
    f = full.sort_values(["query_id", "rank"]).reset_index(drop=True)
    assert (e.neighbor_id.values == f.neighbor_id.values).all()
