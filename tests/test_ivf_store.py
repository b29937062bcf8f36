"""Persisted IVF index maintenance: incremental add == batch assign,
search over the stored index == in-memory IVF search, staleness math
pinned to NumPy, drift triggers the retrain signal."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from hastl_spark.operators.ivf import ivf_index, ivf_topk
from hastl_spark.operators.ivf_store import IVFStore

SF = "/root/testdata/sf0.01"


def _embs(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture()
def store_path(tmp_path):
    return str(tmp_path / "ivf_idx")


def test_incremental_add_equals_batch_assign(spark, store_path):
    embs = _embs(spark)
    old = embs.filter("vec_id < 300")
    new = embs.filter("vec_id >= 300 AND vec_id < 500")

    store = IVFStore(store_path)
    store.build(spark, old, dim=64, n_lists=16)
    store.add(spark, new)

    C = store.centroids()
    got = {r.vec_id: r.cell for r in store.read_index(spark)
           .select("vec_id", "cell").collect()}
    want = {r.vec_id: r.cell for r in
            ivf_index(embs.filter("vec_id < 500"), C)
            .select("vec_id", "cell").collect()}
    assert got == want  # bit-identical cells, old and new alike


def test_readd_replaces_not_duplicates(spark, store_path):
    embs = _embs(spark).filter("vec_id < 300")
    store = IVFStore(store_path)
    store.build(spark, embs, dim=64, n_lists=8)
    n0 = store.read_index(spark).count()
    store.add(spark, embs.filter("vec_id < 100"))  # re-ingest a prefix
    assert store.read_index(spark).count() == n0


def test_topk_over_store_matches_inmemory(spark, store_path):
    embs = _embs(spark).filter("vec_id < 500")
    store = IVFStore(store_path)
    store.build(spark, embs.filter("vec_id < 350"), dim=64, n_lists=16)
    store.add(spark, embs.filter("vec_id >= 350"))

    q = embs.filter("vec_id < 6")
    got = store.topk(spark, q, k=5, n_probe=16).collect()
    want = ivf_topk(embs, q, store.centroids(), k=5, n_probe=16).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted(((r.query_id, r.rank, r.neighbor_id, r.cosine)
                   for r in got)) == \
           sorted(((r.query_id, r.rank, r.neighbor_id, r.cosine)
                   for r in want))


def test_staleness_matches_numpy(spark, store_path):
    embs = _embs(spark).filter("vec_id < 400")
    store = IVFStore(store_path)
    store.build(spark, embs, dim=64, n_lists=8)
    C = store.centroids()

    rows = store.read_index(spark).collect()
    by_cell = {}
    for r in rows:
        v = np.array(r.embedding, dtype=np.float64)
        cos = float(v @ C[r.cell] / max(np.linalg.norm(v), 1e-12))
        by_cell.setdefault(r.cell, []).append(cos)
    got = {r.cell: (r.n_vectors, r.mean_cos)
           for r in store.staleness(spark).collect()}
    for cell, coss in by_cell.items():
        n, mean_cos = got[cell]
        assert n == len(coss)
        assert abs(mean_cos - np.mean(coss)) < 1e-4

    health = store.needs_retrain(spark)
    assert health["n_vectors"] == len(rows)
    # fresh build matches its own recorded fit, so no retrain signal
    assert abs(health["weighted_mean_cos"] - health["build_fit_cos"]) < 1e-4
    assert not health["needs_retrain"]


def test_drift_triggers_retrain_signal(spark, store_path):
    embs = _embs(spark).filter("vec_id < 400")
    store = IVFStore(store_path)
    store.build(spark, embs, dim=64, n_lists=8)
    base = store.needs_retrain(spark)
    assert not base["needs_retrain"]

    # drifted batch: negated vectors — cosine to every centroid flips sign,
    # halving the corpus-weighted fit vs the recorded build-time fit
    drifted = embs.filter("vec_id < 400").select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform("embedding", lambda x: -x).alias("embedding"))
    store.add(spark, drifted)
    after = store.needs_retrain(spark)
    assert after["weighted_mean_cos"] < base["weighted_mean_cos"]
    # the signal is a RELATIVE fit ratio: a threshold above the measured
    # degradation flags retrain, one below it does not
    ratio = after["weighted_mean_cos"] / after["build_fit_cos"]
    assert store.needs_retrain(
        spark, min_fit_ratio=min(0.999, ratio + 0.02))["needs_retrain"]
    assert not store.needs_retrain(
        spark, min_fit_ratio=ratio - 0.02)["needs_retrain"]
