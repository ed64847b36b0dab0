"""Distributed PCA whitening for embedding columns — the third member
of the "executors aggregate sufficient statistics, the driver solves a
tiny dense problem" family (`quality_model.train_quality_model` fits a
GLM this way; `pq.pq_train` quantizes this way).

Why an LLM-data pipeline needs it: raw encoder embeddings are
anisotropic — a few dominant directions carry most of the variance, so
cosine thresholds behave inconsistently across the space.  Whitening
(PCA-rotate, scale each component to unit variance) is the standard fix
before semantic dedup / ANN retrieval (e.g. ABTT, Mu & Viswanath 2018,
arXiv:1702.01417: removing/normalizing top principal components makes
cosine geometry meaningful), and doubles as dimensionality reduction
for cheaper downstream indexes.

Shape at scale
--------------
- **Pass 1 — mean**: d DECIMAL-summed aggregates in one scan.
- **Pass 2 — second moments**: each row emits its d(d+1)/2
  upper-triangle products via nested ``transform`` (pure JVM, no
  Python); ``groupBy(i, j)`` with DECIMAL sums — partial aggregation
  collapses every task to ≤ d(d+1)/2 rows before the shuffle, so the
  wide stage moves O(d²) rows per task regardless of corpus size.  The
  O(n·d²) flops are inherent to covariance; for very large d, sample
  rows first (the ``pq.TRAIN_SAMPLE_CAP`` posture) — components are
  statistics, not per-row state.
- **Driver**: assemble the d×d covariance (numpy, microseconds at
  d=64), symmetric eigendecomposition, keep the top-k eigenpairs.
  DECIMAL sufficient statistics make the fitted components
  bit-identical under any partitioning — same posture as
  `quality_model`.
- **Projection**: component rows ``(j, w, b, s)`` broadcast against the
  corpus; per-row work is one sequential-fold dot product per component
  (``proj_j = s_j · (x·w_j − b_j)`` with ``b_j = mean·w_j`` folded into
  the export as a scalar), all whole-stage codegen, zero shuffle.  The
  k× row amplification happens AFTER the scan and never crosses an
  Exchange.

Determinism: eigenvectors have a sign ambiguity — fixed by forcing the
largest-|coefficient| entry positive (ties broken by lowest index), so
exports are reproducible run to run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal type for order-independent moment accumulation.
_ACC = "decimal(38,18)"


def embedding_moments(
    df: DataFrame, vec_col: str = "embedding", dim: int = 64
) -> tuple[list[float], list[list[float]], int]:
    """One scan for the mean, one scan for the raw second-moment upper
    triangle; returns ``(mean, second_moment_matrix, n_rows)`` with
    every entry an exact decimal-summed average."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    base = df.select(v.alias("v"))

    mrow = base.agg(
        F.count("*").alias("n"),
        *[
            F.sum(F.element_at("v", i + 1).cast(_ACC)).alias(f"m{i}")
            for i in range(dim)
        ],
    ).first()
    n = mrow["n"]
    mean = [float(mrow[f"m{i}"]) / n for i in range(dim)]

    pairs = base.select(
        F.explode(
            F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(dim - 1)),
                    lambda i: F.transform(
                        F.sequence(i, F.lit(dim - 1)),
                        lambda j: F.struct(
                            i.alias("i"),
                            j.alias("j"),
                            (
                                F.element_at("v", i + 1) * F.element_at("v", j + 1)
                            ).alias("p"),
                        ),
                    ),
                )
            )
        ).alias("e")
    ).select("e.i", "e.j", "e.p")
    srows = pairs.groupBy("i", "j").agg(F.sum(F.col("p").cast(_ACC)).alias("s"))
    S = [[0.0] * dim for _ in range(dim)]
    for r in srows.collect():
        S[r["i"]][r["j"]] = S[r["j"]][r["i"]] = float(r["s"]) / n
    return mean, S, n


def fit_pca_whitener(
    df: DataFrame,
    vec_col: str = "embedding",
    dim: int = 64,
    k: int = 16,
    eps: float = 1e-9,
) -> list[dict]:
    """Fit the top-``k`` whitened principal components.  Returns one
    dict per component: ``{"j", "w" (length-d direction), "b"
    (mean·w, the centering scalar), "s" (1/√(λ+eps) whitening scale),
    "var" (λ)}`` — exactly the export schema the scoring path and the
    DuckDB oracle both consume."""
    import numpy as np

    mean, S, _ = embedding_moments(df, vec_col, dim)
    mu = np.asarray(mean)
    cov = np.asarray(S) - np.outer(mu, mu)
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = []
    for rank, idx in enumerate(range(dim - 1, dim - 1 - k, -1)):
        w = vecs[:, idx].copy()
        pivot = int(np.argmax(np.abs(w)))  # sign convention: pivot > 0
        if w[pivot] < 0:
            w = -w
        lam = float(vals[idx])
        comps.append(
            {
                "j": rank,
                "w": [float(x) for x in w],
                "b": float(np.dot(mu, w)),
                "s": float(1.0 / np.sqrt(max(lam, 0.0) + eps)),
                "var": lam,
            }
        )
    return comps


def project_whitened(
    df: DataFrame,
    components: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Whitened projection, exploded form ``(vec_id, j, value)``: the
    k component rows broadcast against the corpus, one sequential-fold
    dot product per (row, component) — the similarity-family fold, so
    Spark and the oracle's ``list_inner_product`` agree bitwise —
    rounded to 6dp.  No shuffle; scalar output columns hash cleanly."""
    from .similarity import _dot

    proj = F.round(
        F.col("s") * (_dot(F.col(vec_col), F.col("w")) - F.col("b")), 6
    )
    return df.join(F.broadcast(components.select("j", "w", "b", "s"))).select(
        id_col, "j", proj.alias("value")
    )
