"""Skew-aware grouped aggregation (the reference's portable core idea).

The reference's partitioner zoo (SURVEY.md §2.3 X3-X8: round-robin,
partial-key power-of-d-choices, head/tail APK, cost-model switching)
all attack one problem: a hot grouping key overloading one reducer.
In Spark the *first-order* fix is free — Catalyst's partial/final
HashAggregate combines map-side, so a hot key costs each mapper one
cell. Salting matters in the residual cases: high-cardinality state
per key (collect_list / distinct-style aggs) or extreme single-key
dominance. These helpers provide that residual path:

- `salted_agg`   — unconditional PKG analog (X4): every key spreads
  over `fanout` salts; two-phase combine re-merges.
- `split_skew_agg` — APK head/tail analog (X7): only detected heavy
  keys (freq > 0.2·total/m, APKGrouping.scala:97) are salted, the tail
  takes the plain single-shuffle path.

Each takes re-mergeable (partial, final) aggregate pairs so the
transform is semantics-preserving — tests assert equality with the
plain groupBy for count/sum/max/min.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myasynstreamjoin_spark.config import DEFAULT_CONFIG, EngineConfig

# (partial_agg, final_merge) pairs keyed by logical aggregate name.
# partial runs per (key, salt); final re-merges partials per key.
_MERGEABLE = {
    "count": (lambda c: F.count("*"), F.sum),
    "sum": (lambda c: F.sum(c), F.sum),
    "max": (lambda c: F.max(c), F.max),
    "min": (lambda c: F.min(c), F.min),
}


def _phases(aggs: dict[str, tuple[str, str]]) -> tuple[list[Column], list[Column]]:
    partials, finals = [], []
    for out_name, (fn, col) in aggs.items():
        if fn not in _MERGEABLE:
            raise ValueError(f"aggregate {fn!r} is not re-mergeable; use plain groupBy")
        partial, final = _MERGEABLE[fn]
        tmp = f"__p_{out_name}"
        partials.append(partial(col).alias(tmp))
        finals.append(final(tmp).cast("long").alias(out_name))
    return partials, finals


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    fanout: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation: groupBy(keys + salt) partials, then
    groupBy(keys) final merge.

    ``aggs`` maps output column name → (agg_fn, input_col), e.g.
    ``{"cnt": ("count", "*"), "total": ("sum", "value")}``.

    The salt is a deterministic hash of the whole row spread over
    ``fanout`` buckets (monotonically_increasing_id keeps it cheap and
    uniform without touching data columns), mirroring the reference's
    d-choices placement (PartialKeyPartitioner.scala:17-29) — but where
    the reference needed per-sender load tracking, uniform salting +
    final merge achieves the same balance statelessly.
    """
    partials, finals = _phases(aggs)
    salted = df.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(fanout))
    )
    partial = salted.groupBy(*keys, "__salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def split_skew_agg(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    fanout: int = 16,
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Head/tail skew aggregation (APK, X7): detect heavy keys with the
    reference's threshold, salt ONLY those (head → d choices,
    AdvancedPartialKeyPartitioner.scala:24-50), and run the light tail
    through the ordinary single-shuffle aggregate; union the results.

    The heavy-key set is a small broadcast (bounded by m/θ keys by the
    threshold's pigeonhole), exactly like the reference's re-broadcast
    feedback loop (BroadcastWrapper.scala:15-37) minus the cross-batch
    state.

    Since round 11 the head/tail split is expressed as a CONDITIONAL
    SALT inside one aggregation pass — salt spreads over ``fanout``
    values for detected-heavy rows and is the constant 0 for the tail
    — rather than two filtered branches union'd back together. The
    per-key results are identical (the tail's final merge folds one
    partial; the head's folds ``fanout``), but the old union form made
    every branch re-evaluate its whole input subtree: the r11 stage
    profile showed the plan scanning the fact table SIX times (each
    union arm re-ran the scan AND the heavy-hitter detection subtree,
    itself two scans before the heavy_hitters single-scan fix). The
    conditional form is 2 scans: one inside heavy_hitters, one for
    the aggregate — the 100 TB floor for detect-then-aggregate.

    Inherits ``heavy_hitters``' checkpoint lifetime contract (r11
    advice): construct-then-execute within one batch scope; do not
    cache the returned plan across a release_blocks boundary.
    """
    from myasynstreamjoin_spark.operators.stats import heavy_hitters

    key0 = keys[0]
    heavy = heavy_hitters(df, key0, cfg).select(
        F.col(key0).alias("__hk"), F.lit(True).alias("__heavy")
    )
    tagged = df.join(
        F.broadcast(heavy), df[key0] == F.col("__hk"), "left"
    ).drop("__hk")

    partials, finals = _phases(aggs)
    return (
        tagged.withColumn(
            "__salt",
            F.when(
                F.col("__heavy").isNotNull(),
                F.pmod(F.monotonically_increasing_id(), F.lit(fanout)),
            ).otherwise(F.lit(0).cast("long")),
        )
        .groupBy(*keys, "__salt")
        .agg(*partials)
        .groupBy(*keys)
        .agg(*finals)
    )
