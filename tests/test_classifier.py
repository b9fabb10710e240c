"""Distributed logistic regression (functions/classifier.py): GD
convergence, separable-data recovery, determinism, standardization
invariance, and the self-distillation report's bookkeeping."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from myasynstreamjoin_spark.functions.classifier import (
    logloss,
    logreg_score,
    logreg_train,
    quality_classifier_report,
)


def _separable(spark, n=600, flip_margin=False):
    """y = 1 iff x1 > 0, with a clear margin; x2 is noise-ish."""
    rows = []
    for i in range(n):
        x1 = (i % 20) - 9.5          # symmetric around 0, |x1| >= 0.5
        x2 = ((i * 7) % 13) - 6.0    # uncorrelated residue pattern
        y = 1 if (x1 > 0) != flip_margin else 0
        rows.append((i, float(x1), float(x2), y))
    return spark.createDataFrame(rows, "id long, x1 double, x2 double, y int")


def test_logreg_learns_separable_data_and_loss_decreases(spark):
    df = _separable(spark)
    model = logreg_train(df, ["x1", "x2"], "y", iters=25)
    # loss trace: strictly below start, final near zero for separable data
    assert model["loss"][-1] < model["loss"][0] / 4
    assert model["loss"][-1] < 0.25
    # x1 carries the signal: dominant positive standardized weight
    assert model["weights"][0] > 3 * abs(model["weights"][1])
    scored = logreg_score(df, model, ["x1", "x2"])
    acc = scored.select(
        F.avg(((F.col("p") >= 0.5).cast("int") == F.col("y")).cast("int"))
    ).first()[0]
    assert acc >= 0.98
    # probabilities are probabilities
    mn, mx = scored.agg(F.min("p"), F.max("p")).first()
    assert 0.0 <= mn and mx <= 1.0


def test_logreg_is_deterministic(spark):
    df = _separable(spark, n=300)
    a = logreg_train(df, ["x1", "x2"], "y", iters=10)
    b = logreg_train(df, ["x1", "x2"], "y", iters=10)
    assert a == b


def test_logreg_standardization_makes_scale_irrelevant(spark):
    """A feature rescaled 1000x must yield the same predictions —
    the internal standardization eats the scale."""
    df = _separable(spark, n=400)
    big = df.withColumn("x1", F.col("x1") * 1000.0)
    m1 = logreg_train(df, ["x1", "x2"], "y", iters=15)
    m2 = logreg_train(big, ["x1", "x2"], "y", iters=15)
    p1 = [r["p"] for r in logreg_score(df, m1, ["x1", "x2"])
          .orderBy("id").collect()]
    p2 = [r["p"] for r in logreg_score(big, m2, ["x1", "x2"])
          .orderBy("id").collect()]
    assert p1 == pytest.approx(p2, abs=1e-9)


def test_logreg_loss_matches_scalar_model(spark):
    """First-iteration loss (w=0) against the pure-Python log-loss."""
    df = _separable(spark, n=100)
    model = logreg_train(df, ["x1", "x2"], "y", iters=1)
    ys = [r["y"] for r in df.collect()]
    expect = sum(logloss(0.5, y) for y in ys) / len(ys)
    assert model["loss"][0] == pytest.approx(expect, rel=1e-12)


def test_quality_classifier_report_bookkeeping(spark):
    df = _separable(spark, n=400).withColumn(
        "grp", (F.col("id") % 3).cast("string")
    )
    rep = {r["grp"]: r for r in quality_classifier_report(
        df, ["x1", "x2"], weak_label=F.col("y") == 1, group_col="grp",
        iters=20,
    ).collect()}
    assert sum(r["n_docs"] for r in rep.values()) == 400
    for r in rep.values():
        assert 0 <= r["n_weak_pos"] <= r["n_docs"]
        assert 0 <= r["n_pred_pos"] <= r["n_docs"]
        assert 0 <= r["n_agree"] <= r["n_docs"]
        # separable data: the learned gate reproduces the weak label
        assert r["n_agree"] >= 0.95 * r["n_docs"]
