"""Exact integer z-score outliers: known-answer flags, group
independence, and the no-float-path determinism contract."""

from __future__ import annotations

from pyspark.sql import functions as F

from myasynstreamjoin_spark.operators.stats import zscore_outliers


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_type string, event_id long, value double"
    )


def test_single_spike_flagged(spark):
    # 10 values at 1.0 and one at 100: only the spike exceeds 3 sigma
    rows = [("a", i, 1.0) for i in range(10)] + [("a", 99, 100.0)]
    out = zscore_outliers(_events(spark, rows)).collect()
    assert [(r.event_id, r.value) for r in out] == [(99, 100.0)]


def test_uniform_group_has_no_outliers(spark):
    rows = [("a", i, 5.0) for i in range(20)]
    assert zscore_outliers(_events(spark, rows)).count() == 0


def test_groups_are_independent(spark):
    # 50 is normal in group b (which spreads 40..60) but a spike in a
    rows = (
        [("a", i, 1.0) for i in range(10)]
        + [("a", 98, 50.0)]
        + [("b", i + 100, 40.0 + 2.0 * i) for i in range(11)]  # 40..60
        + [("b", 199, 50.5)]
    )
    out = zscore_outliers(_events(spark, rows)).collect()
    assert {(r.event_type, r.event_id) for r in out} == {("a", 98)}


def test_strict_inequality_at_exact_boundary(spark):
    # two-point group: each point sits at exactly 1 sigma, so k=1 must
    # NOT flag (strict >) — the cross-multiplied integers tie exactly
    rows = [("a", 1, 0.0), ("a", 2, 2.0)]
    assert zscore_outliers(_events(spark, rows), k=1).count() == 0


def test_psi_near_zero_for_same_distribution(spark):
    from myasynstreamjoin_spark.operators.stats import population_stability_index

    df = spark.range(0, 2000).select(
        (F.col("id") % 100).cast("double").alias("value")
    )
    row = population_stability_index(df, df).collect()[0]
    assert row.psi == 0.0
    assert row.n_ref == row.n_cur == 2000


def test_psi_detects_shift_and_clamps_outliers(spark):
    from myasynstreamjoin_spark.operators.stats import population_stability_index

    ref = spark.range(0, 1000).select(
        (F.col("id") % 100).cast("double").alias("value")
    )
    # shifted + values far beyond the reference range (must clamp)
    cur = spark.range(0, 1000).select(
        ((F.col("id") % 100) + 80.0 + F.when(F.col("id") % 50 == 0, 1e6).otherwise(0.0)).alias("value")
    )
    stable = population_stability_index(ref, ref).collect()[0].psi
    drifted = population_stability_index(ref, cur).collect()[0].psi
    assert drifted > 0.25 > stable


def test_mad_outliers_robust_to_extreme_row(spark):
    """One extreme row inflates mean/σ but not median/MAD: the robust
    gate still flags it (and only it)."""
    from myasynstreamjoin_spark.operators.stats import mad_outliers

    rows = [("a", i, 1.0 + (i % 5) * 0.001) for i in range(50)]
    rows.append(("a", 99, 1000.0))
    ev = spark.createDataFrame(rows, "event_type string, event_id long, value double")
    got = {r.event_id for r in mad_outliers(ev).collect()}
    assert got == {99}


def test_mad_outliers_median_is_lower_order_statistic(spark):
    """Even-n group: lower median used (no interpolation), so a value
    at the upper-middle is judged against the lower-middle median."""
    from myasynstreamjoin_spark.operators.stats import mad_outliers

    # n=4: x = 1,1,3,100 → lower median 1 (rank 2); devs 0,0,2,99;
    # lower-median dev = 0 → mad 0 → flag everything with dev > 0
    ev = spark.createDataFrame(
        [("a", 1, 0.001), ("a", 2, 0.001), ("a", 3, 0.003), ("a", 4, 0.1)],
        "event_type string, event_id long, value double",
    )
    got = {r.event_id for r in mad_outliers(ev, c=5).collect()}
    assert got == {3, 4}


def test_bootstrap_replicates_center_on_truth(spark, sf_dir):
    """Replicate totals are deterministic, distinct across replicates,
    and their mean sits near the true total (Poisson(1) weights have
    mean 1); n_rows_used ≈ row count per replicate."""
    from pyspark.sql import functions as F

    from myasynstreamjoin_spark.operators.stats import bootstrap_totals
    from myasynstreamjoin_spark.sources import tables

    li = tables.load_table(spark, sf_dir, "lineitem")
    n = li.count()
    truth = li.select(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,4)")
            * (F.lit(1).cast("decimal(18,4)")
               - F.col("l_discount").cast("decimal(18,4)"))
        ).cast("double").alias("t")
    ).collect()[0].t
    rows = bootstrap_totals(li).collect()
    assert len(rows) == 32
    again = bootstrap_totals(li).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    totals = [r.total_revenue for r in rows]
    assert len(set(totals)) > 16  # genuinely different resamples
    mean = sum(totals) / len(totals)
    assert abs(mean - truth) / truth < 0.05
    for r in rows:
        assert abs(r.n_rows_used - n) / n < 0.2


def test_drift_timeline_flags_the_shifted_window(spark):
    """Three hourly windows: the second repeats the first's value
    distribution exactly (PSI must be exactly 0.0 — p == q in every
    bucket), the third shifts hard (PSI > 0.25, the standard action
    threshold). Oracle parity is covered by q_drift_timeline."""
    from myasynstreamjoin_spark.operators.stats import drift_timeline

    H = 3_600_000_000_000
    rows = []
    eid = 0
    for w, vals in enumerate(
        [
            [1.0] * 30 + [5.0] * 10,
            [1.0] * 30 + [5.0] * 10,   # identical distribution
            [9.0] * 35 + [1.0] * 5,    # hard shift
        ]
    ):
        for i, v in enumerate(vals):
            rows.append((eid, w * H + i * 1_000_000, float(v)))
            eid += 1
    ev = spark.createDataFrame(rows, "event_id long, ts long, value double")
    out = {
        r["win_start_ns"] // H: (r["n_prev"], r["n_cur"], r["psi"])
        for r in drift_timeline(ev).collect()
    }
    assert set(out) == {1, 2}
    assert out[1] == (40, 40, 0.0)
    assert out[2][2] > 0.25


def test_linear_trend_matches_polyfit_and_nulls_vertical_keys(spark):
    from myasynstreamjoin_spark.operators.stats import linear_trend

    import numpy as np

    rows = []
    xs = list(range(12))
    ys = [3 * x + 7 + (1 if x % 3 == 0 else -1) for x in xs]
    rows += [("up", x, y) for x, y in zip(xs, ys)]
    rows += [("vertical", 4, y) for y in (1, 2, 3)]  # all-same x
    df = spark.createDataFrame(rows, "k string, x long, y long")
    out = {
        r["key"]: (r["n"], r["slope"], r["intercept"])
        for r in linear_trend(df, "k", F.col("x"), F.col("y")).collect()
    }
    slope, icept = np.polyfit(xs, ys, 1)
    n, got_s, got_i = out["up"]
    assert n == 12
    assert abs(got_s - slope) < 1e-9 and abs(got_i - icept) < 1e-9
    assert out["vertical"] == (3, None, None)
