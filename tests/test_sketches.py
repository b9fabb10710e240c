"""Mergeable sketch bank, quantile + set-algebra members
(operators/stats.py::quantile_sketch_shards / quantile_sketch_rollup /
audience_set_algebra): shard-merge conservation, exact-percentile
audit, and Theta's below-threshold EXACTNESS against join-based
truth."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from myasynstreamjoin_spark.operators.stats import (
    audience_set_algebra,
    distinct_sketch_shards,
    quantile_sketch_rollup,
    quantile_sketch_shards,
)
from myasynstreamjoin_spark.sources import tables


def test_kll_rollup_conserves_counts_and_audits_green(spark, sf_dir):
    ev = tables.load_table(spark, sf_dir, "events")
    sk = quantile_sketch_shards(ev)
    exact = ev.groupBy(F.col("event_type").alias("grp")).agg(
        *[
            F.expr(f"percentile(value, {q + s * 0.05})").alias(
                f"q{int(q*100)}_{'hi' if s > 0 else 'lo'}"
            )
            for q in (0.1, 0.5, 0.9)
            for s in (-1, 1)
        ]
    )
    out = {r["grp"]: r for r in quantile_sketch_rollup(sk, exact=exact).collect()}
    totals = {
        r["grp"]: r["n"]
        for r in sk.groupBy("grp").agg(F.sum("n_local").alias("n")).collect()
    }
    exact_counts = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count("value").alias("n")).collect()
    }
    for grp, r in out.items():
        # merge loses no rows: sketch n == Σ shard n == exact count
        assert r["n_total"] == totals[grp] == exact_counts[grp]
        # estimates sit between the exact 10th and 90th percentiles'
        # neighborhood — the in-query 5% audit must be green here
        assert r["approx_ok"], r
        assert r["est_q10"] <= r["est_q50"] <= r["est_q90"]


def test_kll_subset_merge_answers_subset_questions(spark, sf_dir):
    """Merging only SOME shards answers that subset exactly as a
    direct sketch over the subset's rows would — the late-merge
    property that makes the bank useful."""
    ev = tables.load_table(spark, sf_dir, "events")
    sk = quantile_sketch_shards(ev)
    shards = sorted(
        r["shard"] for r in sk.select("shard").distinct().collect()
    )
    half = shards[: max(1, len(shards) // 2)]
    merged_half = quantile_sketch_rollup(sk.where(F.col("shard").isin(half)))
    n_half = {
        r["grp"]: r["n_total"] for r in merged_half.collect()
    }
    # row-count conservation against the raw rows of those shards
    day = F.expr("ts DIV 86400000000000").cast("string")
    raw = (
        ev.where(day.isin(half) & F.col("value").isNotNull())
        .groupBy("event_type")
        .agg(F.count("*").alias("n"))
    )
    want = {r["event_type"]: r["n"] for r in raw.collect()}
    assert n_half == want


def test_theta_algebra_is_exact_below_threshold(spark, sf_dir):
    """At test cardinalities (≪ 2^lg_k) Theta sketches are EXACT sets:
    every estimate must equal the join-based truth integer-for-integer
    — union, intersection, and difference."""
    ev = tables.load_table(spark, sf_dir, "events")
    pairs = [("click", "purchase"), ("view", "error")]
    got = {
        (r["a"], r["b"]): r
        for r in audience_set_algebra(ev, pairs).collect()
    }
    users = {
        t: {
            r["user_id"]
            for r in ev.where(F.col("event_type") == t)
            .select("user_id")
            .distinct()
            .collect()
        }
        for t in {x for p in pairs for x in p}
    }
    for a, b in pairs:
        r = got[(a, b)]
        assert r["est_a"] == len(users[a])
        assert r["est_b"] == len(users[b])
        assert r["est_union"] == len(users[a] | users[b])
        assert r["est_intersection"] == len(users[a] & users[b])
        assert r["est_a_minus_b"] == len(users[a] - users[b])


@pytest.mark.parametrize(
    "sf", ["sf0.001", "sf0.01"]  # pytest-mirror SF + the DRIVER's correctness SF
)
def test_exact_regime_guard_for_sketch_oracles(spark, sf):
    """The q_sketch_distinct / q_theta_audience / q_stream_theta
    oracles hardcode EXACT equality (est_merged == exact count, full
    inclusion-exclusion set algebra, approx_ok TRUE), which only holds
    while every group's distinct cardinality sits inside the sketches'
    exact regimes: HLL lg_k=12 keeps exact coupon counts well below
    its coupon capacity (first divergence MEASURED at ~1500
    distinct/group on these fixtures, round 7), and Theta lg_k=12
    retains 4096 hashes, i.e. is an exact set below that. If the
    driver ever regenerates larger fixtures or the correctness SF
    rises, this guard fails FIRST with an explanation, instead of the
    oracles flipping to silent false reds (round-8 advice item)."""
    sf_dir = os.path.join("/root/testdata", sf)
    if not os.path.isdir(sf_dir):
        pytest.skip(f"{sf_dir} not generated")
    ev = tables.load_table(spark, sf_dir, "events")
    max_d = (
        ev.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("d"))
        .agg(F.max("d"))
        .first()[0]
    )
    assert max_d <= 750, (
        f"{sf}: {max_d} distinct users/group exceeds the HLL lg_k=12 "
        "exact-coupon guard (divergence measured at ~1500; 2x margin) "
        "— regenerate the q_sketch_distinct oracle before the next "
        "driver round"
    )
    assert max_d <= 2048, (
        f"{sf}: {max_d} distinct users/group exceeds half of Theta "
        "lg_k=12's 4096 retained hashes — the q_theta_audience / "
        "q_stream_theta exact set algebra is about to break"
    )


def test_day_shard_floors_negative_epochs(spark):
    """Day-shard keys use FLOOR division (pmod-adjusted DIV): a
    pre-1970 event (-1 ns) must land in day -1 exactly as the DuckDB
    oracles' `//` places it, not truncate up into day 0 (round-8
    advice item)."""
    df = spark.createDataFrame(
        [
            (-1, "a", 1.0, 1),
            (0, "a", 2.0, 2),
            (86_400_000_000_000, "a", 3.0, 3),
        ],
        "ts long, event_type string, value double, user_id long",
    )
    for frame in (quantile_sketch_shards(df), distinct_sketch_shards(df)):
        shards = sorted(r["shard"] for r in frame.collect())
        assert shards == ["-1", "0", "1"], shards
