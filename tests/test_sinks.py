"""Partitioned/bucketed sink plan properties: the write-side halves of
the 100 TB design (SCALE.md). Partition pruning must eliminate
directories before I/O; bucketed joins and aggregations must run with
no exchange."""

from __future__ import annotations

import shutil
import tempfile

import pyspark.sql.functions as F
import pytest

from myasynstreamjoin_spark.plans.explain import n_shuffles, scan_report
from myasynstreamjoin_spark.sources import tables
from myasynstreamjoin_spark.sources.sinks import (
    read_table,
    write_bucketed,
    write_partitioned,
)


@pytest.fixture(scope="module")
def tmpdir():
    d = tempfile.mkdtemp(prefix="masj_sinks_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_partitioned_write_prunes_on_read(spark, sf_dir, tmpdir):
    ev = tables.load_table(spark, sf_dir, "events").withColumn(
        "day", F.expr("CAST(ts DIV 86400000000000 AS INT)")
    )
    path = f"{tmpdir}/events_by_day"
    write_partitioned(ev, path, ["day"])

    back = spark.read.parquet(path)
    days = sorted(r[0] for r in back.select("day").distinct().collect())
    assert len(days) > 5, "fixture should span multiple days"

    one_day = back.where(F.col("day") == days[0])
    # partition pruning: the scan reads one directory, not all of them
    scans = scan_report(one_day)
    assert scans
    # row parity with the unpartitioned filter
    expected = ev.where(F.col("day") == days[0]).count()
    assert one_day.count() == expected
    # the physical scan must report a partition filter on `day`
    plan = one_day._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "day" in plan.split("PartitionFilters")[1][:200]


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmpdir):
    orders = tables.load_table(spark, sf_dir, "orders")
    lineitem = tables.load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    write_bucketed(orders, "orders_b", ["o_orderkey"], n_buckets=8,
                   sort_cols=["o_orderkey"], path=f"{tmpdir}/orders_b")
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], n_buckets=8,
                   sort_cols=["l_orderkey"], path=f"{tmpdir}/lineitem_b")

    ob, lb = read_table(spark, "orders_b"), read_table(spark, "lineitem_b")
    # disable broadcast so the test exercises the co-located path
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = ob.join(lb, ob["o_orderkey"] == lb["l_orderkey"])
        assert n_shuffles(joined) == 0, "bucketed equi-join must not exchange"
        # join result parity with the plain-parquet join
        plain = orders.join(lineitem, orders["o_orderkey"] == lineitem["l_orderkey"])
        assert joined.count() == plain.count()

        # aggregation on the bucket key also avoids the exchange
        agg = lb.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert n_shuffles(agg) == 0, "bucketed group-by must not exchange"
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_overwrite_is_fail_safe(spark):
    """A failing overwrite must NOT destroy the previous table. Spark's
    own CTAS-overwrite drops the managed table before writing, so
    write_bucketed stages into a __masj_staging table and swaps only
    after the write commits; the swap must also preserve the bucket
    metadata (exchange-free agg) and a retry after the failure must
    succeed (stale staging cleanup)."""
    df1 = spark.range(100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    df2 = spark.range(50).select(
        F.col("id").alias("k"), (F.col("id") * 3).alias("v")
    )
    try:
        write_bucketed(df1, "failsafe_t", ["k"], n_buckets=4)
        bad = df1.select(
            "k", F.expr("CAST(assert_true(k < 10) AS STRING)").alias("v")
        )
        with pytest.raises(Exception):
            write_bucketed(bad, "failsafe_t", ["k"], n_buckets=4)
        # previous version intact after the failed overwrite
        assert read_table(spark, "failsafe_t").count() == 100
        # retry works and the swapped-in table keeps bucket metadata
        write_bucketed(df2, "failsafe_t", ["k"], n_buckets=4)
        assert read_table(spark, "failsafe_t").count() == 50
        plan = (
            read_table(spark, "failsafe_t")
            .groupBy("k")
            .agg(F.count("*").alias("c"))
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Bucketed: true" in plan and "Exchange" not in plan
    finally:
        spark.sql("DROP TABLE IF EXISTS failsafe_t")
        spark.sql("DROP TABLE IF EXISTS failsafe_t__masj_staging")


def test_bucketed_overwrite_same_external_path_raises(spark, tmpdir):
    """Re-pointing an external table at its OWN current location can't
    be staged fail-safely (the staging write would clobber the live
    files first) — it must fail fast instead of silently breaking the
    overwrite contract."""
    df = spark.range(10).select(F.col("id").alias("k"))
    p = f"{tmpdir}/same_path"
    try:
        write_bucketed(df, "samepath_t", ["k"], n_buckets=2, path=p)
        with pytest.raises(ValueError, match="fresh path"):
            write_bucketed(df, "samepath_t", ["k"], n_buckets=2, path=p)
        # the live table is untouched by the refused overwrite
        assert read_table(spark, "samepath_t").count() == 10
    finally:
        spark.sql("DROP TABLE IF EXISTS samepath_t")
