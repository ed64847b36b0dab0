"""Learned quality classifier: distributed logistic-regression training
over JVM-aggregated sufficient statistics, plus pure-codegen scoring —
the CCNet (Wenzek et al., arXiv:1911.00359) / fastText (Joulin et al.,
arXiv:1607.01759) / FineWeb-Edu "quality model" stage of an LLM data
pipeline, re-expressed Spark-first.

Reference parity: the reference serves rule-filtered scans
(src/handlers.rs); a training-data engine additionally needs a LEARNED
filter whose training is itself distributed.  This module supplies both
halves with the repo's standing disciplines:

Shape at scale
--------------
- **Feature extraction is per-row codegen** — no Python, no shuffle, no
  vocabulary state: every feature is closed-form over the normalized
  word array (`quality_features`).
- **Each Newton/IRLS iteration is ONE scan**: the executors compute the
  (d+1) gradient sums and the (d+1)(d+2)/2 upper-triangle Hessian sums
  in a single map-side-combined aggregation; only that fixed-width row
  crosses to the driver, which solves the tiny (d+1)×(d+1) system with
  numpy.  The model never leaves the driver; the data never leaves the
  executors — the classic distributed-GLM shape (Spark MLlib's
  LogisticRegression does the same with LBFGS) expressed through the
  DataFrame API so it inherits whole-stage codegen and AQE.
- **Newton, not SGD**, because d is tiny (handcrafted features): ~8
  scans converge where first-order methods need hundreds — at 100 TB
  the scan count IS the cost model, exactly like `bpe.train_bpe`'s
  merge rounds.
- **Bit-identical training under any partitioning**: every sufficient
  statistic accumulates through ``DECIMAL(38,18)`` (exact,
  order-independent integer arithmetic — the `unigram_nll` posture
  applied to training), so the fitted weights do not depend on
  partition count, AQE decisions, or cluster size.  Feature values are
  quantized to 18dp by the cast; bounded (all features are O(log n) or
  ratios ≤ 1), so no overflow until ~1e19 rows.
- **Scoring is a broadcast of d+1 doubles folded as literals** into a
  left-associated dot product, sigmoid in double, 6dp round — an
  expression tree a DuckDB oracle replays verbatim from the exported
  weights (the PQ-codebook export pattern, `catalog._ensure_pq_export`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .dedup import normalize_text
from .textops import LANG_MARKERS

#: fixed stopword lexicon for the stopword-ratio feature (the en marker
#: set — a stand-in for the usual top-N corpus stopwords).
STOPWORDS: tuple[str, ...] = LANG_MARKERS["en"]

#: feature column names, in model order (weights align to these).
FEATURES: tuple[str, ...] = ("f_logwords", "f_meanlen", "f_stopratio", "f_distinct")

#: decimal type for order-independent sufficient-statistic accumulation.
_ACC = "decimal(38,18)"


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document handcrafted quality features, all closed-form JVM
    expressions over the normalized word array:

    - ``f_logwords``: ln(1 + word count) — length band signal
    - ``f_meanlen``: mean word length, derived arithmetically from the
      normalized string length (norm is single-spaced, so
      Σ len(word) = len(norm) − (n − 1)) — no per-word pass
    - ``f_stopratio``: share of words in the fixed stopword lexicon
    - ``f_distinct``: unique-word ratio (type/token ratio) — the cheap
      repetition signal

    Emits ``doc_id`` + the four features as doubles.  Documents whose
    normalized text is empty are dropped (no words ⇒ no features).
    """
    norm = normalize_text(text_col)
    nd = F.size("_ws").cast("double")
    stop_hits = F.size(F.filter("_ws", lambda w: w.isin(*STOPWORDS)))
    return (
        df.select("doc_id", norm.alias("_norm"), F.split(norm, " ").alias("_ws"))
        .where(F.col("_norm") != "")
        .select(
            "doc_id",
            F.log(F.lit(1.0) + nd).alias("f_logwords"),
            (
                (F.length("_norm") - (F.size("_ws") - F.lit(1))).cast("double") / nd
            ).alias("f_meanlen"),
            (stop_hits.cast("double") / nd).alias("f_stopratio"),
            (F.size(F.array_distinct("_ws")).cast("double") / nd).alias("f_distinct"),
        )
    )


def weak_label(feats: DataFrame) -> DataFrame:
    """Deterministic weak-supervision target for the demo/driver path
    (real deployments join human or LLM labels here): a doc is
    "high quality" when it is long enough AND lexically diverse enough.
    The rule deliberately uses a feature INTERACTION the linear model
    must trade off, so the fit is non-trivial."""
    y = (
        (F.col("f_logwords") >= F.lit(3.5)) & (F.col("f_distinct") >= F.lit(0.55))
    ).cast("double")
    return feats.withColumn("y", y)


def _dot(weights: list[float], cols: list[Column]) -> Column:
    """Left-associated affine form b + Σ w_i·x_i — the exact
    association order the oracle SQL mirrors, so both engines run the
    identical IEEE operation sequence per row."""
    z = F.lit(float(weights[0]))
    for w, c in zip(weights[1:], cols):
        z = z + F.lit(float(w)) * c
    return z


def train_quality_model(
    feats: DataFrame,
    label_col: str = "y",
    n_iter: int = 8,
    ridge: float = 1e-3,
) -> list[float]:
    """Fit logistic regression by Newton/IRLS and return
    ``[intercept, w_f0, ..., w_f3]``.

    Each iteration aggregates, in ONE distributed scan with map-side
    partial aggregation:

    - gradient: ``g_j = Σ (p − y)·x_j + ridge·w_j``
    - Hessian upper triangle: ``H_jk = Σ p(1−p)·x_j·x_k`` (+ ridge on
      the diagonal)

    with every Σ accumulated in DECIMAL(38,18) so the result is
    bit-identical under any partitioning.  The driver solves the
    (d+1)×(d+1) system (numpy, microseconds) and broadcasts the next
    weight vector as plan literals.  ``n_iter`` is fixed (no data-
    dependent stopping) so training is deterministic end-to-end.

    Cache ``feats`` before calling when the upstream plan is expensive:
    the loop re-scans it ``n_iter`` times by design (scan count is the
    whole cost model — see module docstring).
    """
    import numpy as np

    d = len(FEATURES)
    w = [0.0] * (d + 1)
    xs = [F.lit(1.0)] + [F.col(c) for c in FEATURES]
    y = F.col(label_col)

    for _ in range(n_iter):
        z = _dot(w, [F.col(c) for c in FEATURES])
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
        r = p * (F.lit(1.0) - p)
        aggs = []
        for j in range(d + 1):
            aggs.append(
                F.sum(((p - y) * xs[j]).cast(_ACC)).alias(f"g{j}")
            )
        for j in range(d + 1):
            for k in range(j, d + 1):
                aggs.append(
                    F.sum((r * xs[j] * xs[k]).cast(_ACC)).alias(f"h{j}_{k}")
                )
        row = feats.agg(*aggs).first()
        g = np.array([float(row[f"g{j}"]) for j in range(d + 1)])
        H = np.zeros((d + 1, d + 1))
        for j in range(d + 1):
            for k in range(j, d + 1):
                H[j, k] = H[k, j] = float(row[f"h{j}_{k}"])
        g[1:] += ridge * np.asarray(w[1:])
        H += ridge * np.eye(d + 1)
        w = (np.asarray(w) - np.linalg.solve(H, g)).tolist()
    return [float(v) for v in w]


def score_with_weights(
    df: DataFrame, weights: list[float], text_col: str = "text"
) -> DataFrame:
    """Score documents under a trained model: per-row sigmoid of the
    left-folded affine form, 6dp-rounded (ULP differences in ``exp``
    between engines cannot cross a 6dp boundary in practice — the
    ``unigram_nll``/``bm25`` posture).  Emits
    ``(doc_id, q_score, keep)`` with ``keep = q_score ≥ 0.5``.
    Pure codegen: the model rides into the plan as d+1 literals."""
    feats = quality_features(df, text_col)
    z = _dot(weights, [F.col(c) for c in FEATURES])
    score = F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6)
    return feats.select(
        "doc_id",
        score.alias("q_score"),
        (score >= F.lit(0.5)).alias("keep"),
    )
