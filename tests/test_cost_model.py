"""Cost-model dispatch and similarity-operator properties."""

from __future__ import annotations

import pyspark.sql.functions as F

from myasynstreamjoin_spark.config import DEFAULT_CONFIG as CFG
from myasynstreamjoin_spark.functions.similarity import (
    embedding_neardup_pairs,
    exact_embedding_pairs,
)
from myasynstreamjoin_spark.operators.cost_model import (
    adaptive_agg,
    batch_strategy,
    per_window_strategy,
)
from myasynstreamjoin_spark.sources import fixtures, tables


def test_adaptive_agg_matches_plain_groupby(spark, sf_dir):
    kv = fixtures.keyed_values(spark, sf_dir, CFG)
    plain = {
        tuple(r)
        for r in kv.groupBy("key").agg(F.count("*").cast("long").alias("cnt")).collect()
    }
    for lam in (1.0, 1e9):  # λ extremes force both strategy branches
        got = {
            tuple(r)
            for r in adaptive_agg(kv, ["key"], {"cnt": ("count", "*")}, CFG, lam=lam).collect()
        }
        assert got == plain


def test_strategy_decision_consistent(spark, sf_dir):
    kv = fixtures.keyed_values(spark, sf_dir, CFG)
    row = batch_strategy(kv, "key", CFG, lam=1.0).collect()[0]
    assert row["strategy"] == (0 if row["cost_hh"] <= row["cost_apk"] else 1)
    assert row["rr_switch"] == (1 if row["p1"] > 0.1 else 0)

    win = per_window_strategy(
        fixtures.with_window(kv, CFG), "key", "ltw", CFG, lam=1.0
    ).collect()
    assert win
    for r in win:
        assert r["strategy"] in (0, 1)


def test_lsh_neardup_is_subset_of_exact(spark, sf_dir):
    emb = tables.load_table(spark, sf_dir, "embeddings")
    exact = {
        (r["id_a"], r["id_b"]) for r in exact_embedding_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, threshold=0.4, n_planes=4).collect()
    }
    assert lsh <= exact
