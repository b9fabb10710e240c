"""Trainable document-quality classifier: distributed logistic
regression by full-batch gradient descent.

The "train the filter" stage of a corpus pipeline (fastText-style
quality classifiers are trained on weak labels exactly like this):
`doc_features` assembles the signals, a weak labeler provides y, and
this fits w so the learned gate can replace / audit the heuristic.

Scale shape (the reason this lives here rather than importing an ML
library): every GD iteration is ONE map-side-combined aggregation —
per-row error terms fold into (1 + n_features) partial sums, a single
row reaches the driver, and the weight vector (driver-sized, a few
floats) is rebroadcast as literals in the next iteration's
expressions. No Python in the hot path, no per-row UDF, no shuffle
beyond the one-row agg; scoring is a pure map-only projection. The
same pattern as operators/… k-means: iterate on the MODEL, never on
the data. Persist the pruned feature projection before training — at
100 TB that cache (a handful of double columns) is what the `iters`
passes re-read, not the corpus.

All arithmetic is float (training is inherently so) — classifier
queries register rows-only, with invariant pytests standing in for a
SQL oracle (tests/test_classifier.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# z-clip keeps exp() finite; beyond ±30 the sigmoid is saturated to
# ~1e-13 of its asymptote, far below any gradient signal.
_Z_CLIP = 30.0
_EPS = 1e-12


def _sigmoid(z: Column) -> Column:
    zc = F.greatest(F.lit(-_Z_CLIP), F.least(F.lit(_Z_CLIP), z))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-zc))


def logreg_train(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
) -> dict:
    """Fit logistic regression on ``feature_cols`` against the 0/1
    ``label_col``. Features are standardized internally (one stats
    pass) so `lr` needs no per-dataset tuning; the returned model
    carries the (mean, std) so scoring reapplies the same transform.

    Deterministic: zero-init weights, fixed iteration count, no
    sampling — two trainings on the same frame return bit-identical
    models.

    Returns {"weights", "bias", "mean", "std", "loss"} where loss is
    the per-iteration mean log-loss trace (assert it decreases).
    """
    k = len(feature_cols)
    stats = df.agg(
        *[F.avg(F.col(c).cast("double")).alias(f"m{j}") for j, c in enumerate(feature_cols)],
        *[F.stddev_pop(F.col(c).cast("double")).alias(f"s{j}") for j, c in enumerate(feature_cols)],
    ).first()
    mean = [float(stats[f"m{j}"] or 0.0) for j in range(k)]
    std = [float(stats[f"s{j}"] or 0.0) or 1.0 for j in range(k)]

    y = F.col(label_col).cast("double")
    xs = [
        (F.col(c).cast("double") - F.lit(mean[j])) / F.lit(std[j])
        for j, c in enumerate(feature_cols)
    ]

    w = [0.0] * k
    b = 0.0
    trace: list[float] = []
    for _ in range(iters):
        z = F.lit(b)
        for j in range(k):
            z = z + F.lit(w[j]) * xs[j]
        p = _sigmoid(z)
        err = p - y
        pc = F.greatest(F.lit(_EPS), F.least(F.lit(1.0 - _EPS), p))
        row = df.agg(
            F.avg(err).alias("g_b"),
            *[F.avg(err * xs[j]).alias(f"g{j}") for j in range(k)],
            F.avg(-(y * F.log(pc) + (F.lit(1.0) - y) * F.log(F.lit(1.0) - pc))).alias(
                "loss"
            ),
        ).first()
        trace.append(float(row["loss"]))
        b -= lr * float(row["g_b"])
        w = [w[j] - lr * (float(row[f"g{j}"]) + l2 * w[j]) for j in range(k)]
    return {"weights": w, "bias": b, "mean": mean, "std": std, "loss": trace}


def logreg_score(
    df: DataFrame,
    model: dict,
    feature_cols: list[str],
    prob_col: str = "p",
) -> DataFrame:
    """Map-only scoring: appends the predicted probability under the
    trained model (same standardization as training)."""
    z = F.lit(model["bias"])
    for j, c in enumerate(feature_cols):
        xj = (F.col(c).cast("double") - F.lit(model["mean"][j])) / F.lit(
            model["std"][j]
        )
        z = z + F.lit(model["weights"][j]) * xj
    return df.withColumn(prob_col, _sigmoid(z))


def quality_classifier_report(
    features: DataFrame,
    feature_cols: list[str],
    weak_label: Column,
    group_col: str = "source",
    threshold: float = 0.5,
    iters: int = 30,
) -> DataFrame:
    """Self-distillation report: train on the weak labels, score the
    corpus, and roll up per group — (group, n_docs, n_weak_pos,
    n_pred_pos, n_agree). Agreement quantifies how learnable the
    heuristic gate is from the features; a near-random n_agree says
    the label leaks no signal into these features.

    One cached feature projection, `iters` one-row aggs, one map-only
    scoring pass, one n_groups-row rollup.
    """
    labeled = features.withColumn("__y", weak_label.cast("int")).persist()
    try:
        model = logreg_train(labeled, feature_cols, "__y", iters=iters)
        # the cache exists for training's eager one-row aggs; the lazy
        # result below evaluates after the finally-unpersist and
        # recomputes the features once — one extra pass, zero staleness
        scored = logreg_score(labeled, model, feature_cols)
        pred = (F.col("p") >= F.lit(threshold)).cast("int")
        return (
            scored.withColumn("__pred", pred)
            .groupBy(group_col)
            .agg(
                F.count("*").alias("n_docs"),
                F.sum("__y").cast("long").alias("n_weak_pos"),
                F.sum("__pred").cast("long").alias("n_pred_pos"),
                F.sum((F.col("__pred") == F.col("__y")).cast("int"))
                .cast("long")
                .alias("n_agree"),
            )
        )
    finally:
        labeled.unpersist()


def logloss(p: float, y: int) -> float:
    """Reference scalar log-loss (test model)."""
    pc = min(max(p, _EPS), 1.0 - _EPS)
    return -(y * math.log(pc) + (1 - y) * math.log(1.0 - pc))
