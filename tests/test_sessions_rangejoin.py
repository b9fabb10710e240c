"""Semantics + plan shape for sessionize and range_join.

sessionize: chain rule (events merge while consecutive gaps < gap; a
gap of exactly `gap` splits), native session_window, one Exchange.
range_join: inclusive bounds, each (interval, point) pair exactly
once even when an interval spans many buckets, no NestedLoopJoin in
the plan.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from myasynstreamjoin_spark.operators.rangejoin import range_join
from myasynstreamjoin_spark.operators.sessions import sessionize

H = 3_600_000_000  # 1h in µs


def test_sessionize_semantics(spark):
    df = spark.createDataFrame(
        [
            # u1: 0h, 1h, 2h chain in one session despite 0h->2h span;
            # the 2h->4h hop is exactly the gap and still MERGES
            ("u1", 0 * H), ("u1", 1 * H), ("u1", 2 * H), ("u1", 4 * H),
            # strictly more than the gap -> new session
            ("u1", 6 * H + 1),
            # u2: single event
            ("u2", 10 * H),
        ],
        "user string, ts_us long",
    )
    out = sessionize(df, keys=["user"], ts_us="ts_us", gap="2 hours")
    got = {(r["user"], r["session_start"]): (r["session_end"], r["n_events"])
           for r in out.collect()}
    assert got == {
        ("u1", 0): (4 * H, 4),
        ("u1", 6 * H + 1): (6 * H + 1, 1),
        ("u2", 10 * H): (10 * H, 1),
    }


def test_sessionize_single_shuffle(spark):
    df = spark.createDataFrame([("u", 0)], "user string, ts_us long")
    out = sessionize(df, keys=["user"], ts_us="ts_us", gap="1 hour")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_range_join_semantics(spark):
    points = spark.createDataFrame(
        [(0,), (5,), (10,), (99,), (100,), (101,)], "p long"
    )
    intervals = spark.createDataFrame(
        [("wide", 0, 100), ("empty", 50, 49), ("point", 5, 5)],
        "name string, s long, e long",
    )
    pairs = range_join(points, intervals, "p", "s", "e", bucket_width=7)
    got = sorted((r["name"], r["p"]) for r in pairs.collect())
    # wide [0,100] spans 15 buckets but each point matches exactly once;
    # bounds inclusive; 101 outside; inverted interval matches nothing.
    assert got == [
        ("point", 5),
        ("wide", 0), ("wide", 5), ("wide", 10), ("wide", 99), ("wide", 100),
    ]


def test_range_join_no_nested_loop(spark):
    points = spark.createDataFrame([(1,)], "p long")
    intervals = spark.createDataFrame([(0, 2)], "s long, e long")
    pairs = range_join(points, intervals, "p", "s", "e", bucket_width=4)
    plan = pairs._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan


def test_funnel_strict_order_semantics(spark):
    """Depth counts only steps completed strictly AFTER the previous
    step's first completion — an out-of-order purchase doesn't count,
    and the deepest reached step (not the first) determines depth."""
    from myasynstreamjoin_spark.operators.sessions import funnel_depth

    rows = [
        # user 1: full ordered funnel → 3
        (1, 100, "view"), (1, 200, "click"), (1, 300, "purchase"),
        # user 2: purchase BEFORE its click → stops at 2
        (2, 100, "view"), (2, 300, "click"), (2, 200, "purchase"),
        # user 3: click before any view → depth 1 (view only)
        (3, 200, "view"), (3, 100, "click"),
        # user 4: never viewed → 0
        (4, 100, "click"), (4, 200, "purchase"),
        # user 5: second click after view counts even though first was early
        (5, 150, "view"), (5, 100, "click"), (5, 250, "click"), (5, 400, "purchase"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts long, event_type string")
    got = {r["user_id"]: r["depth"] for r in funnel_depth(ev).collect()}
    assert got == {1: 3, 2: 2, 3: 1, 4: 0, 5: 3}


def test_pareto_frontier_tie_semantics(spark):
    """Skyline vs brute-force dominance on hand-built points: equal
    points both stay, within-group domination drops, groups isolate."""
    from myasynstreamjoin_spark.operators.relational import pareto_frontier

    rows = [
        # group g1: (5,5) dominates (4,5),(5,4),(3,3); duplicate (5,5)s stay
        ("g1", 1, 5, 5.0), ("g1", 2, 5, 5.0), ("g1", 3, 4, 5.0),
        ("g1", 4, 5, 4.0), ("g1", 5, 3, 3.0),
        # g1 frontier also: (2,7) (higher y, lower x — incomparable)
        ("g1", 6, 2, 7.0),
        # group g2: single point always on frontier
        ("g2", 7, 1, 1.0),
    ]
    df = spark.createDataFrame(rows, "g string, id long, x int, y double")
    got = {
        r.id
        for r in pareto_frontier(df, x="x", y="y", group="g", payload=["id"]).collect()
    }
    brute = {
        a[1]
        for a in rows
        if not any(
            b[0] == a[0] and b[2] >= a[2] and b[3] >= a[3]
            and (b[2] > a[2] or b[3] > a[3])
            for b in rows
        )
    }
    assert got == brute == {1, 2, 6, 7}


def test_transition_matrix_rows_sum_to_one(spark, sf_dir):
    """Each from-state's outgoing probabilities sum to 1 (exact counts,
    one division); n sums to total bigram count."""
    from myasynstreamjoin_spark.operators.sessions import transition_matrix
    from myasynstreamjoin_spark.sources import tables
    from pyspark.sql import functions as F

    tm = transition_matrix(tables.load_table(spark, sf_dir, "events"))
    sums = tm.groupBy("from_type").agg(F.sum("p").alias("s")).collect()
    assert sums
    for r in sums:
        assert abs(r.s - 1.0) < 1e-9


def test_touch_attribution_window_edges(spark):
    """Lookback edges: same-instant touch not credited, touch exactly
    at conv − lookback credited, no-touch conversion keeps NULLs."""
    from myasynstreamjoin_spark.operators.sessions import touch_attribution
    from pyspark.sql import functions as F

    DAY = 86400 * 10**9
    rows = [
        # user 1: view at t0, click at t0+1d, purchase at t0+2d
        (1, 0 * DAY, 10, "view"),
        (1, 1 * DAY, 11, "click"),
        (1, 2 * DAY, 12, "purchase"),
        # user 2: touch exactly at purchase ts → NOT credited
        (2, 5 * DAY, 20, "view"),
        (2, 5 * DAY, 21, "purchase"),
        # user 3: touch exactly lookback (7d) before → credited
        (3, 0 * DAY, 30, "click"),
        (3, 7 * DAY, 31, "purchase"),
        # user 4: touch too old (8d) → NULLs
        (4, 0 * DAY, 40, "view"),
        (4, 8 * DAY, 41, "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )
    got = {
        r.purchase_id: (r.first_id, r.last_id)
        for r in touch_attribution(ev).collect()
    }
    assert got == {12: (10, 11), 21: (None, None),
                   31: (30, 30), 41: (None, None)}


def test_resample_fills_gaps(spark):
    """A type silent for days gets explicit zero rows, and its MA
    decays across the gap instead of skipping it."""
    from myasynstreamjoin_spark.operators.timeseries import resample_daily

    DAY = 86400 * 10**9
    rows = [
        (1, 0 * DAY, "a"), (2, 0 * DAY + 5, "a"), (3, 4 * DAY, "a"),
        (4, 0 * DAY, "b"), (5, 1 * DAY, "b"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, ts long, event_type string")
    out = {(r.event_type, r.day): (r.n_events, r.ma)
           for r in resample_daily(ev, ma_days=3).collect()}
    # full 5-day calendar for both types
    assert len(out) == 10
    assert out[("a", 0)] == (2, 2.0)
    assert out[("a", 1)][0] == 0
    assert out[("a", 2)] == (0, 2 / 3)
    assert out[("a", 4)] == (1, 1 / 3)
    assert out[("b", 4)][0] == 0


def test_fuzzy_neighbor_pairs_snm_semantics(spark):
    """Near-identical names adjacent in sort order pair up with their
    edit distance; records farther apart than the window (or in a
    different first-char block) are not candidates — the documented
    SNM tradeoff."""
    from myasynstreamjoin_spark.operators.relational import fuzzy_neighbor_pairs

    rows = [
        (1, "acme corp"), (2, "acme corp."), (3, "acme korp"),
        (4, "zenith ltd"),
        # 5 sorts into the same block but > window=1 away from 1..3
        (5, "acme zzz unrelated name"),
    ]
    df = spark.createDataFrame(rows, "p_partkey long, p_name string")
    got = {
        (r.id_a, r.id_b): r.dist
        for r in fuzzy_neighbor_pairs(df, window=1, max_dist=2).collect()
    }
    # sort order within block 'a': "acme corp" < "acme corp." < "acme korp"
    assert got == {(1, 2): 1, (2, 3): 2}


def test_cep_pattern_veto_semantics(spark):
    """Match, veto-blocked match, timeout, and veto-after-then cases."""
    from myasynstreamjoin_spark.operators.sessions import cep_pattern

    MIN = 60 * 10**9
    rows = [
        # u1: clean view→purchase in 10 min
        (1, 0, 10, "view"), (1, 10 * MIN, 11, "purchase"),
        # u2: error between view and purchase → blocked
        (2, 0, 20, "view"), (2, 5 * MIN, 21, "error"),
        (2, 10 * MIN, 22, "purchase"),
        # u3: purchase after 61 min → no match
        (3, 0, 30, "view"), (3, 61 * MIN, 31, "purchase"),
        # u4: error AFTER the purchase (but within window) → not blocked
        (4, 0, 40, "view"), (4, 10 * MIN, 41, "purchase"),
        (4, 20 * MIN, 42, "error"),
    ]
    ev = spark.createDataFrame(
        rows, "user_id long, ts long, event_id long, event_type string"
    )
    got = {r.first_id: (r.then_id, r.blocked) for r in cep_pattern(ev).collect()}
    assert got == {10: (11, False), 20: (22, True),
                   30: (None, None), 40: (41, False)}
