"""Materializing hypercube star join (DuplicateHHJoin.scala:75-115
mechanism, finished): every joined triple appears exactly once even for
heavy keys whose tuples are replicated across cube cells, and the
per-key cardinality equals the counts-product."""

from __future__ import annotations

import pyspark.sql.functions as F

from myasynstreamjoin_spark.config import EngineConfig
from myasynstreamjoin_spark.operators.star_join import (
    star_cardinality,
    star_join_hypercube_rows,
)

# Fixture-sized heavy-hitter rule: threshold = 0.2 * 48 / 1 = 9.6 rows,
# so 'hh' (36 rows) is heavy and 'a'/'b' (6 rows each) are light —
# both cube and single-cell paths get exercised.
CFG = EngineConfig(n_mappers=1)


def _star(spark):
    """Skewed F3 fixture: key 'hh' is heavy (12 rows/rel — well past the
    θ·total/m threshold), keys a/b are light (2 rows/rel)."""
    rows = []
    for r in range(3):
        for x in range(12):
            rows.append((r, 1_000 + x, "hh", x))
        for key in ("a", "b"):
            for x in range(2):
                rows.append((r, 2_000 + x, key, 100 + x))
    return spark.createDataFrame(rows, "rel int, ts long, key string, value int")


def test_cardinality_matches_counts_product(spark):
    star = _star(spark)
    got = {
        (r["key"], r["card"])
        for r in star_join_hypercube_rows(star, cube=(2, 2, 2), cfg=CFG)
        .groupBy("key")
        .agg(F.count("*").alias("card"))
        .collect()
    }
    want = {(r["key"], r["card"]) for r in star_cardinality(star).collect()}
    assert got == want
    assert ("hh", 12 * 12 * 12) in got  # heavy key exercised the cube path
    assert ("a", 8) in got              # light key took the single-cell path


def test_each_triple_materializes_exactly_once(spark):
    """Replication must not duplicate joined rows: the multiset of
    (key, x0, x1, x2) triples equals the plain per-key cross join."""
    star = _star(spark)
    got = sorted(
        tuple(r) for r in star_join_hypercube_rows(star, cube=(2, 2, 2), cfg=CFG).collect()
    )
    rels = [
        star.where(F.col("rel") == r).select("key", F.col("value").alias(f"x{r}"))
        for r in range(3)
    ]
    plain = rels[0].join(rels[1], "key").join(rels[2], "key")
    want = sorted(tuple(r) for r in plain.select("key", "x0", "x1", "x2").collect())
    assert got == want


def test_heavy_work_spreads_over_cells(spark):
    """The point of the cube: a heavy key's joined rows come from more
    than one (key, cell) reducer group."""
    star = _star(spark)
    from myasynstreamjoin_spark.operators.stats import heavy_hitters

    assert {r["key"] for r in heavy_hitters(star, "key", CFG).collect()} == {"hh"}
    # Re-derive the cell assignment the operator uses and count distinct
    # cells actually holding hh triples: with cube (2,2,2) and 12
    # distinct payloads per rel, every one of the 8 cells is hit w.h.p.
    rows = star_join_hypercube_rows(star, cube=(2, 2, 2), cfg=CFG)
    # cells aren't in the output; assert indirectly via even split:
    # each (x0 % 2) bucket holds part of the result, so no single
    # reducer saw all 1728 heavy rows.
    per_bucket = (
        rows.where(F.col("key") == "hh")
        .groupBy(F.pmod(F.xxhash64("x0", F.lit(11)), F.lit(2)).alias("c"))
        .count()
        .collect()
    )
    assert len(per_bucket) == 2


def test_plan_cube_dims_reference_allocation(spark):
    """The cube-dimension planner reproduces the reference's invariants:
    workers split ∝ √(join size), Π dims ≤ mh per key, Σ mh ≤ m, and
    sub-1-worker keys are dropped as fake heavy hitters."""
    from myasynstreamjoin_spark.operators.star_join import plan_cube_dims

    rows = []
    # 'big': 24 rows/rel; 'mid': 8 rows/rel → both heavy under n_mappers=1
    # threshold (0.2·96 rows), with big's join product 27× mid's.
    for r in range(3):
        for x in range(24):
            rows.append((r, 0, "big", x))
        for x in range(8):
            rows.append((r, 0, "mid", x))
    star = spark.createDataFrame(rows, "rel int, ts long, key string, value int")
    plans = plan_cube_dims(star, cfg=CFG, m=12)
    by_key = {p["key"]: p for p in plans}
    assert set(by_key) <= {"big", "mid"}
    assert "big" in by_key
    assert sum(p["mh"] for p in plans) <= 12
    for p in plans:
        assert p["mx"] * p["my"] * p["mz"] <= p["mh"]
        assert min(p["mx"], p["my"], p["mz"]) >= 1
    # √-proportional split: √(24³) : √(8³) ≈ 5.2 : 1 of 12 workers
    if "mid" in by_key:
        assert by_key["big"]["mh"] > by_key["mid"]["mh"]


def test_auto_cube_picks_data_dependent_dims(spark):
    """cube='auto' (the default) must choose per-key dims from the data:
    for the skewed fixture with m=12 the planner lands on a NON-uniform
    cube (the while-loop decrement makes dims unequal), and the
    materialized join is still exactly the plain per-key cross join."""
    from myasynstreamjoin_spark.operators.star_join import plan_cube_dims

    star = _star(spark)
    plans = {p["key"]: p for p in plan_cube_dims(star, cfg=CFG, m=12)}
    assert set(plans) == {"hh"}
    dims = (plans["hh"]["mx"], plans["hh"]["my"], plans["hh"]["mz"])
    assert plans["hh"]["mh"] == 12
    assert 1 < plans["hh"]["mx"] * plans["hh"]["my"] * plans["hh"]["mz"] <= 12
    assert len(set(dims)) > 1  # shaped to the counts, not a uniform cube

    got = sorted(
        tuple(r)
        for r in star_join_hypercube_rows(star, cfg=CFG, m=12).collect()
    )
    rels = [
        star.where(F.col("rel") == r).select("key", F.col("value").alias(f"x{r}"))
        for r in range(3)
    ]
    plain = rels[0].join(rels[1], "key").join(rels[2], "key")
    want = sorted(tuple(r) for r in plain.select("key", "x0", "x1", "x2").collect())
    assert got == want


def test_auto_cube_no_heavy_keys_degenerates_to_plain_join(spark):
    """A uniform (no heavy hitter) input must take the single-cell path
    everywhere under auto sizing — no replication, correct join."""
    rows = [
        (r, 0, key, x) for r in range(3) for key in ("a", "b", "c") for x in range(2)
    ]
    star = spark.createDataFrame(rows, "rel int, ts long, key string, value int")
    out = star_join_hypercube_rows(star, cfg=EngineConfig(n_mappers=12), m=12)
    assert out.count() == 3 * 8  # 3 keys × 2³ triples each
