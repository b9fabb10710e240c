"""CDC merge semantics: latest-change-wins, tombstones, resurrection,
pass-through — plus the plan shape (base side never shuffles; the
touched-key anti-join broadcasts)."""

from __future__ import annotations

from pyspark.sql import functions as F

from myasynstreamjoin_spark.operators.cdc import cdc_apply


def _base(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0), (4, "d", 40.0)],
        "k int, name string, v double",
    )


def _changes(spark, rows):
    return spark.createDataFrame(rows, "k int, name string, v double, op string, gen int")


def test_upsert_delete_passthrough(spark):
    ch = _changes(
        spark,
        [
            (2, "b2", 21.0, "U", 1),   # update existing
            (3, None, 0.0, "D", 1),    # delete existing
            (5, "e", 50.0, "I", 1),    # insert new key
        ],
    )
    out = cdc_apply(_base(spark), ch, keys=("k",), order_cols=("gen",))
    got = {r.k: (r.name, r.v) for r in out.collect()}
    assert got == {
        1: ("a", 10.0),      # untouched base row passes through
        2: ("b2", 21.0),     # latest upsert wins
        4: ("d", 40.0),
        5: ("e", 50.0),      # insert lands
    }


def test_latest_change_wins_and_resurrection(spark):
    ch = _changes(
        spark,
        [
            (1, "a1", 11.0, "U", 1),
            (1, "a2", 12.0, "U", 2),   # supersedes gen 1
            (2, None, 0.0, "D", 2),    # delete AFTER an update
            (2, "b1", 21.0, "U", 1),
            (3, None, 0.0, "D", 1),
            (3, "c2", 33.0, "U", 2),   # resurrects the gen-1 delete
        ],
    )
    out = cdc_apply(_base(spark), ch, keys=("k",), order_cols=("gen",))
    got = {r.k: (r.name, r.v) for r in out.collect()}
    assert got == {1: ("a2", 12.0), 3: ("c2", 33.0), 4: ("d", 40.0)}


def test_schema_is_base_schema(spark):
    ch = _changes(spark, [(2, "b2", 21.0, "U", 1)])
    out = cdc_apply(_base(spark), ch, keys=("k",), order_cols=("gen",))
    assert out.columns == ["k", "name", "v"]


def test_plan_broadcasts_touched_keys(spark):
    ch = _changes(spark, [(2, "b2", 21.0, "U", 1)])
    out = cdc_apply(_base(spark), ch, keys=("k",), order_cols=("gen",))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    # Fallback form: shuffled anti-join when the change batch is huge.
    out2 = cdc_apply(
        _base(spark), ch, keys=("k",), order_cols=("gen",), broadcast_keys=False
    )
    assert out2.count() == 4


def test_incremental_count_refresh_equals_recompute(spark):
    from myasynstreamjoin_spark.operators.cdc import incremental_agg_refresh

    old = spark.createDataFrame([("a", 3), ("b", 1)], "k string, cnt long")
    ch = spark.createDataFrame(
        [
            ("a", "I"), ("a", "D"), ("a", "I"),   # net +1
            ("b", "D"),                           # drops to zero → gone
            ("c", "I"), ("c", "I"),               # new key
            ("a", "U"),                           # count-neutral
        ],
        "k string, op string",
    )
    out = {r.k: r.cnt for r in
           incremental_agg_refresh(old, ch, keys=("k",)).collect()}
    assert out == {"a": 4, "c": 2}


def test_incremental_refresh_is_order_insensitive(spark):
    from myasynstreamjoin_spark.operators.cdc import incremental_agg_refresh

    old = spark.createDataFrame([("x", 5)], "k string, cnt long")
    ch = [("x", "D")] * 3 + [("x", "I")] * 2
    import random

    rng = random.Random(7)
    for _ in range(3):
        shuffled = ch[:]
        rng.shuffle(shuffled)
        df = spark.createDataFrame(shuffled, "k string, op string")
        out = {r.k: r.cnt for r in
               incremental_agg_refresh(old, df, keys=("k",)).collect()}
        assert out == {"x": 4}


def test_snapshot_diff_classification(spark):
    """added / removed / changed classified correctly; unchanged keys
    dropped; NULL vs empty-string digests stay distinct."""
    from myasynstreamjoin_spark.operators.cdc import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "keep")],
        "k long, v string",
    )
    new = spark.createDataFrame(
        [(2, "B"), (3, ""), (4, "keep"), (5, "new")],
        "k long, v string",
    )
    got = {r.k: r.change for r in snapshot_diff(old, new, keys=("k",)).collect()}
    assert got == {1: "removed", 2: "changed", 3: "changed", 5: "added"}
