"""PCA whitening (operators/pca.py): distributed moments must equal a
numpy twin, the fit must be bit-deterministic under partitioning, the
projection must whiten (unit variance, zero mean) and stay pure JVM."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_ORACLE
from rust_evm_indexer_spark.operators import pca as P


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(str(SF_ORACLE / "embeddings.parquet"))


@pytest.fixture(scope="module")
def X(emb):
    return np.array(
        [r["embedding"] for r in emb.orderBy("vec_id").collect()], dtype=np.float64
    )


def test_moments_match_numpy(emb, X):
    mean, S, n = P.embedding_moments(emb)
    assert n == len(X)
    assert np.allclose(mean, X.mean(0), atol=1e-12)
    assert np.allclose(np.asarray(S), (X.T @ X) / n, atol=1e-12)


def test_fit_matches_numpy_eigh_with_sign_convention(emb, X):
    comps = P.fit_pca_whitener(emb, k=4)
    mu = X.mean(0)
    cov = (X.T @ X) / len(X) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)
    for rank, c in enumerate(comps):
        w = vecs[:, -1 - rank].copy()
        if w[int(np.argmax(np.abs(w)))] < 0:
            w = -w
        assert np.allclose(c["w"], w, atol=1e-9)
        assert abs(c["var"] - float(vals[-1 - rank])) < 1e-12
        assert abs(c["b"] - float(mu @ w)) < 1e-12


def test_fit_bit_identical_under_partitioning(emb):
    a = P.fit_pca_whitener(emb, k=2)
    b = P.fit_pca_whitener(emb.repartition(13), k=2)
    assert a == b  # exact — DECIMAL moment sums + fixed sign pivot


def test_projection_whitens(spark, emb):
    comps = P.fit_pca_whitener(emb, k=3)
    cdf = spark.createDataFrame(
        [(c["j"], c["w"], c["b"], c["s"]) for c in comps],
        "j int, w array<double>, b double, s double",
    )
    stats = (
        P.project_whitened(emb, cdf)
        .groupBy("j")
        .agg(F.avg("value").alias("m"), F.var_pop("value").alias("v"))
        .collect()
    )
    assert len(stats) == 3
    for r in stats:
        assert abs(r["m"]) < 1e-4  # centered
        assert abs(r["v"] - 1.0) < 1e-3  # unit variance


def test_projection_plan_pure_jvm_no_shuffle(spark, emb):
    cdf = spark.createDataFrame(
        [(0, [0.1] * 64, 0.0, 1.0)], "j int, w array<double>, b double, s double"
    )
    plan = (
        P.project_whitened(emb, cdf)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "EvalPython" not in plan
    # broadcast join + per-row fold only: no shuffle Exchange (the
    # BroadcastExchange of the k component rows is not a shuffle)
    assert "Exchange hashpartitioning" not in plan
    assert "Exchange rangepartitioning" not in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan
