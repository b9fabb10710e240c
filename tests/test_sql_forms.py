"""Equivalence pins for the single-string SQL forms (round 12).

Each SQL form in ``operators.sql_forms`` must be EXACTLY the DataFrame
form it replaces on the declared-query path: same rows, same schema
(names, types, order), same plan shape (exchange count and join
strategies — a SQL rewrite that silently flipped a broadcast join to a
shuffle would pass a row compare and still be a 100 TB regression).

Row equality is asserted raw (no float rounding): the rewritten
queries are hash-checked by the driver, so the test must be at least
as strict as the driver's typed value hash.
"""

from __future__ import annotations

import re

import pytest

from myasynstreamjoin_spark.operators import sql_forms
from myasynstreamjoin_spark.operators.relational import (
    large_orders,
    regional_revenue,
    shipping_priority,
)
from myasynstreamjoin_spark.operators.star_join import star_join_count
from myasynstreamjoin_spark.operators.tpch import (
    local_supplier_volume,
    order_count_distribution,
    product_type_profit,
)
from myasynstreamjoin_spark.sources.tables import load_table, table_view

TABLES = (
    "region", "nation", "customer", "supplier", "part", "orders", "lineitem",
)


def _views(spark, sf_dir):
    return {t: table_view(spark, sf_dir, t) for t in TABLES}


def _tbl(spark, sf_dir, name):
    return load_table(spark, sf_dir, name)


def _assert_same(df_form, sql_form):
    # full schema equality: names, types, order AND nullability — the
    # driver's value hash is typed via the Arrow schema, which sees all
    assert sql_form.schema == df_form.schema
    a = sorted(map(tuple, df_form.collect()))
    b = sorted(map(tuple, sql_form.collect()))
    assert a == b
    assert len(a) > 0  # a trivially-empty compare proves nothing


def _plan_shape(df) -> dict:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return {
        op: len(re.findall(rf"\b{op}\b", plan))
        for op in ("Exchange", "BroadcastHashJoin", "SortMergeJoin",
                   "ShuffledHashJoin")
    }


def _assert_same_shape(df_form, sql_form):
    assert _plan_shape(sql_form) == _plan_shape(df_form)


CASES = {
    "regional_revenue": (
        lambda s, d: regional_revenue(
            _tbl(s, d, "customer"), _tbl(s, d, "orders"), _tbl(s, d, "lineitem"),
            _tbl(s, d, "supplier"), _tbl(s, d, "nation"), _tbl(s, d, "region"),
        ),
        lambda s, d: sql_forms.regional_revenue_sql(s, _views(s, d)),
    ),
    "shipping_priority": (
        lambda s, d: shipping_priority(
            _tbl(s, d, "customer"), _tbl(s, d, "orders"), _tbl(s, d, "lineitem"),
        ),
        lambda s, d: sql_forms.shipping_priority_sql(s, _views(s, d)),
    ),
    "local_supplier_volume": (
        lambda s, d: local_supplier_volume(
            _tbl(s, d, "customer"), _tbl(s, d, "orders"), _tbl(s, d, "lineitem"),
            _tbl(s, d, "supplier"), _tbl(s, d, "nation"), _tbl(s, d, "region"),
        ),
        lambda s, d: sql_forms.local_supplier_volume_sql(s, _views(s, d)),
    ),
    "product_type_profit": (
        lambda s, d: product_type_profit(
            _tbl(s, d, "lineitem"), _tbl(s, d, "orders"), _tbl(s, d, "part"),
            _tbl(s, d, "supplier"), _tbl(s, d, "nation"),
        ),
        lambda s, d: sql_forms.product_type_profit_sql(s, _views(s, d)),
    ),
    "order_count_distribution": (
        lambda s, d: order_count_distribution(
            _tbl(s, d, "customer"), _tbl(s, d, "orders"),
        ),
        lambda s, d: sql_forms.order_count_distribution_sql(s, _views(s, d)),
    ),
    "large_orders": (
        lambda s, d: large_orders(
            _tbl(s, d, "lineitem"), _tbl(s, d, "orders"), _tbl(s, d, "customer"),
        ),
        lambda s, d: sql_forms.large_orders_sql(s, _views(s, d)),
    ),
    "star_join_count": (
        lambda s, d: star_join_count(
            _tbl(s, d, "lineitem"), _tbl(s, d, "orders"), _tbl(s, d, "customer"),
        ),
        lambda s, d: sql_forms.star_join_count_sql(s, _views(s, d)),
    ),
}


@pytest.mark.parametrize("name", sorted(CASES))
def test_sql_form_matches_dataframe_form(spark, sf_dir, name):
    df_builder, sql_builder = CASES[name]
    df_form = df_builder(spark, sf_dir)
    sql_form = sql_builder(spark, sf_dir)
    _assert_same(df_form, sql_form)
    _assert_same_shape(df_form, sql_form)


def test_topk_revenue_sql_matches_entry_chain(spark, sf_dir):
    # the entry wrapper now rides the SQL form; rebuild the DataFrame
    # chain inline (kept verbatim from the r11 entry) as the reference
    from pyspark.sql import functions as F

    li = _tbl(spark, sf_dir, "lineitem")
    o = _tbl(spark, sf_dir, "orders")
    c = _tbl(spark, sf_dir, "customer")
    rev = (
        F.col("l_extendedprice").cast("decimal(18,4)")
        * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
    )
    df_form = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c.where(F.col("c_mktsegment") == "BUILDING")),
              o["o_custkey"] == F.col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(F.sum(rev).alias("rev_d"))
        .select("l_orderkey", F.round(F.col("rev_d"), 2).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )
    sql_form = sql_forms.topk_revenue_sql(spark, _views(spark, sf_dir))
    # top-k rows are an ordered result: compare in emitted order
    assert sql_form.schema == df_form.schema
    assert list(map(tuple, sql_form.collect())) == list(map(tuple, df_form.collect()))


def test_tpch_q1_sql_matches_entry_chain(spark, sf_dir):
    from pyspark.sql import functions as F

    li = _tbl(spark, sf_dir, "lineitem")
    dec = lambda c: F.col(c).cast("decimal(18,4)")  # noqa: E731
    one = F.lit(1).cast("decimal(18,4)")
    disc_price = dec("l_extendedprice") * (one - dec("l_discount"))
    charge = disc_price * (one + dec("l_tax"))
    agg = (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).alias("sq"),
            F.sum(dec("l_extendedprice")).alias("sbp"),
            F.sum(disc_price).alias("sdp"),
            F.sum(charge).alias("sc"),
            F.sum(dec("l_discount")).alias("sd"),
            F.count("*").alias("count_order"),
        )
    )
    n = F.col("count_order")
    df_form = agg.select(
        "l_returnflag",
        "l_linestatus",
        F.round(F.col("sq"), 2).cast("double").alias("sum_qty"),
        F.round(F.col("sbp"), 2).cast("double").alias("sum_base_price"),
        F.round(F.col("sdp"), 2).cast("double").alias("sum_disc_price"),
        F.round(F.col("sc"), 2).cast("double").alias("sum_charge"),
        F.round(F.col("sq").cast("double") / n, 4).alias("avg_qty"),
        F.round(F.col("sbp").cast("double") / n, 4).alias("avg_price"),
        F.round(F.col("sd").cast("double") / n, 6).alias("avg_disc"),
        "count_order",
    )
    sql_form = sql_forms.tpch_q1_sql(spark, _views(spark, sf_dir))
    _assert_same(df_form, sql_form)
    _assert_same_shape(df_form, sql_form)


def test_table_view_stable_and_invalidates(spark, sf_dir, tmp_path):
    """Same identity → same view name (no re-registration churn);
    regenerated file → fresh view over the fresh data."""
    import shutil

    v1 = table_view(spark, sf_dir, "nation")
    v2 = table_view(spark, sf_dir, "nation")
    assert v1 == v2
    n1 = spark.table(v1).count()
    assert n1 > 0

    work = tmp_path / "sfcopy"
    work.mkdir()
    for t in ("nation",):
        shutil.copy(f"{sf_dir}/{t}.parquet", work / f"{t}.parquet")
    w1 = table_view(spark, str(work), "nation")
    assert w1 != v1
    # regenerate with fewer rows: identity changes, view must follow
    spark.table(w1).limit(3).write.mode("overwrite").parquet(str(work / "tmp_out"))
    import os
    part = next(
        f for f in os.listdir(work / "tmp_out") if f.endswith(".parquet")
    )
    shutil.copy(work / "tmp_out" / part, work / "nation.parquet")
    w2 = table_view(spark, str(work), "nation")
    assert w2 != w1
    assert spark.table(w2).count() == 3
