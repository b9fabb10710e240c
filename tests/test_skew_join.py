"""Runtime proof of the AQE skew-join path (SURVEY.md §2.3 X7/X13's
batch-join answer): a join with one pathologically hot key gets its
oversized shuffle partition SPLIT at runtime — the engine-level
replacement for the reference's hand-built heavy-hitter partitioners.
Asserted on the adaptive executed plan, not on configuration."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_aqe_splits_skewed_join_partition(spark, tmp_path):
    # one hot key (~200k rows) among 200 uniform keys (~100 rows each)
    hot = spark.range(200_000).select(
        F.lit("HOT").alias("k"), F.col("id").alias("payload")
    )
    tail = spark.range(20_000).select(
        F.concat(F.lit("k"), (F.col("id") % 200).cast("string")).alias("k"),
        F.col("id").alias("payload"),
    )
    left_path = str(tmp_path / "left")
    right_path = str(tmp_path / "right")
    hot.union(tail).write.parquet(left_path)
    (
        spark.range(5_000)
        .select(
            F.when(F.col("id") % 2 == 0, F.lit("HOT"))
            .otherwise(F.concat(F.lit("k"), (F.col("id") % 200).cast("string")))
            .alias("k"),
            F.col("id").alias("r_payload"),
        )
        .write.parquet(right_path)
    )

    overrides = {
        # force a shuffle join and make the hot partition count as skewed
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    prev = {k: spark.conf.get(k, None) for k in overrides}
    try:
        for k, v in overrides.items():
            spark.conf.set(k, v)
        joined = spark.read.parquet(left_path).join(
            spark.read.parquet(right_path), "k"
        )
        # Execute THIS DataFrame's QueryExecution (count()/write would
        # plan their own query and leave joined's adaptive plan
        # unfinalized) so AQE finalizes it with runtime stats.
        qe = joined._jdf.queryExecution()
        assert qe.toRdd().count() > 0
        plan = qe.executedPlan().toString()
        assert "isFinalPlan=true" in plan
        # AQE marks the rewritten join and the split partitions
        assert "skew=true" in plan
    finally:
        for k, v in prev.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_join_profile_exact_cardinality(spark):
    """est_rows equals the true join cardinality; top key identified
    with its share."""
    from myasynstreamjoin_spark.operators.stats import join_profile

    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,)], "o_orderkey long"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (9,)], "l_orderkey long"
    )
    r = join_profile(left, right, "o_orderkey", "l_orderkey").collect()[0]
    true_rows = left.join(right, left.o_orderkey == right.l_orderkey).count()
    assert r.est_rows == true_rows == 7
    assert (r.top_key, r.top_rows) == (1, 6)
    assert abs(r.top_share - 6 / 7) < 1e-12
    assert (r.n_left, r.n_right, r.keys_left, r.keys_right, r.keys_common) == (
        4, 5, 3, 3, 2)


def test_heavy_hitters_eager_checkpoint_results_exact(spark):
    """heavy_hitters/batch_stats checkpoint their counts table EAGERLY
    at construction (a lazy variant was measured in r12 and rejected:
    under AQE, localCheckpoint's toRdd materializes the aggregation's
    shuffle stages at construct regardless of the eager flag, so
    construction can never be job-free). Pin the exact results the
    checkpointed plan produces down both consumer branches."""
    from myasynstreamjoin_spark.operators.stats import (
        batch_stats,
        heavy_hitters,
    )

    df = spark.range(1000).select(
        F.when(F.col("id") % 10 == 0, F.lit("hot"))
        .otherwise(F.col("id").cast("string"))
        .alias("key")
    )
    hh = heavy_hitters(df, "key")
    bs = batch_stats(df, "key")
    # 100 "hot" rows > 0.2*1000/12 = 16.7; every other key is a singleton
    assert [(r.key, r.cnt) for r in hh.collect()] == [("hot", 100)]
    row = bs.collect()[0]
    assert (row.m_total, row.k_keys, row.max_cnt) == (1000, 901, 100)
    assert (row.n_heavy, row.n_singletons) == (1, 900)
