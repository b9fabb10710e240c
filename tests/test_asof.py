"""asof_join semantics + plan shape.

Semantics under test (DuckDB/kdb ASOF convention): each left row gets
the latest right row with right_ts <= left_ts on the same key; equal
timestamps match; left rows with no eligible right row keep nulls.
Plan property: the union-then-window formulation shuffles exactly once
(one Exchange on the key), which is what makes it 100 TB safe.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myasynstreamjoin_spark.operators.asof import asof_join


def _build(spark):
    left = spark.createDataFrame(
        [
            ("a", 10, "l1"),
            ("a", 20, "l2"),
            ("a", 5, "l0"),   # before any right row -> nulls
            ("b", 100, "l3"),  # key with no right rows at all -> nulls
            ("c", 7, "l4"),   # exact tie with right ts=7 -> matches
        ],
        "k string, lts long, tag string",
    )
    right = spark.createDataFrame(
        [
            ("a", 8, 1.0),
            ("a", 15, 2.0),
            ("c", 7, 9.0),
        ],
        "k string, rts long, val double",
    )
    return left, right


def test_asof_semantics(spark):
    left, right = _build(spark)
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                    right_vals=["val"])
    got = {r["tag"]: (r["r_rts"], r["r_val"]) for r in out.collect()}
    assert got == {
        "l0": (None, None),
        "l1": (8, 1.0),
        "l2": (15, 2.0),
        "l3": (None, None),
        "l4": (7, 9.0),
    }
    assert out.count() == left.count()  # left join: every left row kept


def test_asof_single_shuffle(spark):
    left, right = _build(spark)
    out = asof_join(left, right, on=["k"], left_ts="lts", right_ts="rts",
                    right_vals=["val"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    # union + window => exactly one Exchange, no SortMergeJoin
    assert plan.count("Exchange") == 1, plan
    assert "Join" not in plan, plan
