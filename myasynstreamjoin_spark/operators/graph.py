"""Iterative graph analytics over derived edge lists.

Beyond-reference surface: the connected-components pass
(`functions/cluster.py`) covers label propagation for dedup; this
module adds value-iteration (PageRank) over a co-occurrence graph —
the "importance" scan a pipeline runs over entity/link graphs.

Scale stance: the edge list is built once (same bounded basket
machinery as `copurchase_pairs`), degrees are a one-pass aggregate
joined back to edges, and each PageRank iteration is ONE shuffle
(groupBy dst) over the edge list — the rank vector never leaves the
cluster and the loop is a fixed plan unrolling, not a driver-side
convergence poll.

Determinism: ranks are INTEGER micro-units (10⁻¹² of total mass) and
every per-iteration operation is integer division/multiplication/sum
— order-independent and therefore bit-replayable by any external SQL
engine. A double-based formulation flips a round() boundary with
probability ~|nodes|·iters·ulp/precision per run (cross-engine sum
association differs); integer arithmetic has zero flake risk and the
floor-division mass loss (≤ outdeg micro-units per node per
iteration) is part of the operator's definition, mirrored in the
oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total PageRank mass in micro-units (10^12 — headroom: sums stay
#: far below 2^63 even with 10^9 nodes).
MASS = 1_000_000_000_000


def pagerank_copurchase(
    lineitem: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    k: int = 20,
    max_basket: int = 64,
) -> DataFrame:
    """Top-``k`` parts by PageRank over the symmetric co-purchase
    graph (edge u—v when some order contains both, deduped).

    Fixed ``n_iters`` value iterations in integer micro-units:
    r₀ = MASS div N;
    rₜ₊₁ = ((100−d)·MASS) div (100·N) + (d·Σ_in (rₜ(src) div deg(src))) div 100
    with d = ``damping_pct``. Dangling nodes can't occur (every node
    has degree ≥ 1 by construction).

    The loop unrolls into one logical plan — per iteration: edges ⋈
    ranks (shuffle on src), groupBy dst (shuffle on dst). At 100 TB
    pre-partition edges and ranks on the node key so the per-iteration
    join is co-located; localCheckpoint every few iterations to cut
    lineage (the 3-iteration default doesn't need it).

    Output: (part, rank) — rank = micro-units/10¹² rounded to 6;
    ties broken by part id.
    """
    items = lineitem.select("l_orderkey", "l_partkey").distinct()
    bounded = items.join(
        items.groupBy("l_orderkey")
        .agg(F.count("*").alias("__n"))
        .where(F.col("__n") <= max_basket)
        .select("l_orderkey"),
        "l_orderkey",
        "left_semi",
    )
    a = bounded.select("l_orderkey", F.col("l_partkey").alias("src"))
    b = bounded.select("l_orderkey", F.col("l_partkey").alias("dst"))
    # persisted: referenced by every iteration. The k-row RESULT is
    # materialized eagerly below so all three caches release before
    # returning (dup_span_stats' long-lived-session discipline).
    edges = (
        a.join(b, "l_orderkey")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .persist()
    )
    deg = edges.groupBy("src").agg(F.count("*").alias("deg"))
    # loop-invariant: (src, dst, deg) is identical every iteration, so
    # join it once and persist — otherwise each of the n_iters plans
    # re-runs the edges⋈deg shuffle (measured 1.67 GB → 0.9 GB total
    # shuffle at the sf1 probe).
    edges_deg = edges.join(deg, "src").persist()
    nodes = edges.select(F.col("src").alias("part")).distinct().persist()
    n_nodes = nodes.agg(F.count("*").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(n_nodes)).select(
        "part", F.expr(f"CAST({MASS} AS BIGINT) DIV n").alias("r")
    )
    for _ in range(n_iters):
        contrib = (
            edges_deg
            .join(ranks, edges_deg["src"] == ranks["part"])
            .select("dst", F.expr("r DIV deg").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, nodes["part"] == contrib["dst"], "left")
            .crossJoin(F.broadcast(n_nodes))
            .select(
                "part",
                # all-integer: `/` would detour through double (ANSI)
                # and its nearest-rounding can cross an integer before
                # truncation — DIV never does.
                F.expr(
                    f"CAST({100 - damping_pct} AS BIGINT) "
                    f"* CAST({MASS} AS BIGINT) DIV (100 * n) "
                    f"+ (CAST({damping_pct} AS BIGINT) "
                    f"* coalesce(in_sum, CAST(0 AS BIGINT))) DIV 100"
                ).alias("r"),
            )
        )
    try:
        return (
            ranks.select(
                "part",
                F.round(
                    F.col("r").cast("double") / F.lit(float(MASS)), 6
                ).alias("rank"),
            )
            .orderBy(F.col("rank").desc(), F.col("part"))
            .limit(k)
            .localCheckpoint(eager=True)
        )
    finally:
        edges_deg.unpersist()
        nodes.unpersist()
        edges.unpersist()
