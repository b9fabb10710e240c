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
