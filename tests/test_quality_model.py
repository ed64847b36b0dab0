"""Quality-classifier training + scoring (operators/quality_model.py):
the distributed Newton fit must equal a single-machine numpy twin, be
bit-deterministic under partitioning, separate the weak label, and keep
the scoring plan pure JVM."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import SF_ORACLE
from rust_evm_indexer_spark.operators import quality_model as QM


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(str(SF_ORACLE / "documents.parquet"))


@pytest.fixture(scope="module")
def feats(spark, docs):
    f = QM.weak_label(QM.quality_features(docs)).cache()
    f.count()
    yield f
    f.unpersist()


def _numpy_newton(X, y, n_iter=8, ridge=1e-3):
    """Single-machine reference twin of train_quality_model: identical
    update rule (Newton with ridge on the same terms), float sums."""
    n, d1 = X.shape
    w = np.zeros(d1)
    for _ in range(n_iter):
        z = X @ w
        p = 1.0 / (1.0 + np.exp(-z))
        g = X.T @ (p - y)
        g[1:] += ridge * w[1:]
        H = (X * (p * (1 - p))[:, None]).T @ X + ridge * np.eye(d1)
        w = w - np.linalg.solve(H, g)
    return w


def test_training_matches_numpy_twin(feats):
    rows = feats.orderBy("doc_id").collect()
    X = np.array(
        [[1.0] + [r[c] for c in QM.FEATURES] for r in rows]
    )
    y = np.array([r["y"] for r in rows])
    expected = _numpy_newton(X, y)
    got = np.array(QM.train_quality_model(feats))
    # decimal(38,18) accumulation vs numpy float sums: tiny tail drift
    assert np.allclose(got, expected, rtol=1e-6, atol=1e-8)


def test_training_bit_identical_under_partitioning(feats):
    w1 = QM.train_quality_model(feats, n_iter=3)
    w2 = QM.train_quality_model(feats.repartition(17), n_iter=3)
    assert w1 == w2  # exact — DECIMAL sufficient statistics


def test_classifier_separates_weak_label(docs, feats):
    w = QM.train_quality_model(feats)
    scored = QM.score_with_weights(docs, w)
    j = scored.join(feats.select("doc_id", "y"), "doc_id")
    acc = (
        j.where(F.col("keep").cast("double") == F.col("y")).count() / j.count()
    )
    # a linear model on an AND-rule target: well above chance, below 1.0
    assert acc >= 0.85


def test_scoring_plan_is_pure_jvm_with_pruned_scan(docs):
    w = [0.1, 0.2, -0.3, 0.4, -0.5]
    plan = QM.score_with_weights(docs, w)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan  # no Python UDF in the hot path
    assert "Exchange" not in plan  # per-row scoring: no shuffle at all
    # column pruning: only doc_id + text leave the scan
    assert "lang" not in plan.split("ReadSchema")[-1]


def test_score_bounds_and_keep_rule(docs):
    w = [0.0, 0.5, 0.0, 0.0, 0.0]
    out = QM.score_with_weights(docs, w)
    bad = out.where(
        (F.col("q_score") < 0) | (F.col("q_score") > 1)
        | (F.col("keep") != (F.col("q_score") >= 0.5))
    )
    assert bad.count() == 0
