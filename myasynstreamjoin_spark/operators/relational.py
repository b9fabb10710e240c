"""Relational SQL-layer coverage the reference lacked.

SURVEY.md §2.4 lists the operator families absent from the reference —
distinct aggregation, grouping sets/rollup/cube, analytic window
functions, sorts/limits/top-k, set operations — all of which a user of
a general engine expects. Each lands here as a DataFrame operator with
a DuckDB oracle, so the coverage is verified, not claimed.

Scale notes baked into the plans:
- dimension tables (region, nation, supplier, filtered customer) are
  broadcast — no shuffle of the fact side for those joins;
- aggregates are declared so Catalyst plans partial→final
  HashAggregate (map-side combine before any shuffle);
- top-k = window rank + filter (one shuffle per partition key) or
  orderBy+limit (TakeOrderedAndProject — never a full sort at scale);
- rollup/cube expand grouping sets *after* partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _dec(c: str) -> Column:
    return F.col(c).cast("decimal(18,4)")


def rollup_pricing(lineitem: DataFrame) -> DataFrame:
    """ROLLUP (returnflag, linestatus): per-group, per-flag and grand
    totals in one pass. Output: (l_returnflag, l_linestatus, gid,
    sum_qty, n) where gid is the grouping bitmask (0 = leaf row).
    """
    return (
        lineitem.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.grouping_id().cast("long").alias("gid"),
            F.sum(_dec("l_quantity")).alias("sq"),
            F.count("*").alias("n"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            "gid",
            F.round(F.col("sq"), 2).cast("double").alias("sum_qty"),
            "n",
        )
    )


def topk_per_group(customer: DataFrame, k: int = 3) -> DataFrame:
    """Analytic top-k: the k highest-balance customers per market
    segment via row_number() over a partitioned, fully-ordered window
    (ties broken by key so both engines agree).

    Output: (c_mktsegment, c_custkey, c_acctbal, rn).
    """
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    return (
        customer.select(
            "c_mktsegment",
            "c_custkey",
            F.round(F.col("c_acctbal"), 2).alias("c_acctbal"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= k)
    )


def distinct_users_per_type(events: DataFrame) -> DataFrame:
    """Distinct aggregation: exact count(DISTINCT user_id) next to a
    plain count — Catalyst plans the distinct via expand + two-level
    agg, no row ever reaches the driver.

    Output: (event_type, n_users, n_events).
    """
    return events.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


def _custkeys_in_year(orders: DataFrame, year: int) -> DataFrame:
    return orders.where(F.year("o_orderdate") == year).select("o_custkey").distinct()


def repeat_customers(orders: DataFrame, y1: int = 1995, y2: int = 1996) -> DataFrame:
    """Set op INTERSECT: customers ordering in both years.
    Output: (o_custkey)."""
    return _custkeys_in_year(orders, y1).intersect(_custkeys_in_year(orders, y2))


def churned_customers(orders: DataFrame, y1: int = 1995, y2: int = 1996) -> DataFrame:
    """Set op EXCEPT: customers ordering in y1 but not y2.
    Output: (o_custkey)."""
    return _custkeys_in_year(orders, y1).exceptAll(
        _custkeys_in_year(orders, y2)
    ).distinct()


def regional_revenue(
    customer: DataFrame,
    orders: DataFrame,
    lineitem: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    region_name: str = "ASIA",
    y_from: str = "1995-01-01 00:00:00",
    y_to: str = "1997-01-01 00:00:00",
) -> DataFrame:
    """TPC-H Q5-shaped 6-way join: revenue per nation for one region,
    local suppliers only (c_nationkey = s_nationkey).

    Plan shape for 100 TB: lineitem (the fact) is never broadcast;
    region→nation→supplier collapse into broadcast hash joins on the
    fact side, orders is the only other shuffle join; the final agg is
    nation-cardinality rows.

    Output: (n_name, revenue).
    """
    r = region.where(F.col("r_name") == region_name)
    dims = (
        supplier.join(
            F.broadcast(nation.join(F.broadcast(r), nation["n_regionkey"] == r["r_regionkey"])),
            supplier["s_nationkey"] == F.col("n_nationkey"),
        )
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    rev = _dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - _dec("l_discount"))
    return (
        lineitem.join(orders, lineitem["l_orderkey"] == orders["o_orderkey"])
        .where(
            (F.col("o_orderdate") >= F.lit(y_from).cast("timestamp"))
            & (F.col("o_orderdate") < F.lit(y_to).cast("timestamp"))
        )
        .join(F.broadcast(dims), lineitem["l_suppkey"] == dims["s_suppkey"])
        .join(
            customer,
            (orders["o_custkey"] == customer["c_custkey"])
            & (customer["c_nationkey"] == dims["s_nationkey"]),
        )
        .groupBy("n_name")
        .agg(F.sum(rev).alias("rev_d"))
        .select("n_name", F.round(F.col("rev_d"), 2).cast("double").alias("revenue"))
    )
