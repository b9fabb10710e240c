"""The asynchronous multi-stream join (the reference's flagship query).

Semantics (SURVEY.md §2.5 J1): P port-streams are merged; per key (and
per event-time window in the stateful variant) the engine counts records
per port and combines with ``min`` across ports — the "join" result is
the number of matches guaranteed across all asynchronous inputs.

Reference implementations being re-expressed:
- stateless one-phase agg: stateless/cluster/HashJoin.scala:51-62
- stateless two-phase agg:  stateless/cluster/RoundRobinJoin.scala:51-84
- stateful naive layout:    state/cluster/naive/HashJoin.scala:69-131
  (completeness check — emit only/zero when all ports reported — at :91)
- stateful optimized layout: state/cluster/optimized/HashJoin.scala:70-108

Spark-first design: both reference variants collapse to a two-level
grouped aggregation. Catalyst plans it as partial+final HashAggregate
(the reference's hand-written two-phase merge, RoundRobinJoin.scala:51-73,
for free), and keying the first aggregate by (key, window, source) is
precisely the reference's "optimized state layout" insight — state
addressed by (key, window) so only ripe windows are touched. At 100 TB
this is two shuffles of pre-aggregated (key-cardinality-bounded) data,
not raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myasynstreamjoin_spark.config import DEFAULT_CONFIG, EngineConfig
from myasynstreamjoin_spark.sources.fixtures import with_window


def min_count_per_key(pw: DataFrame) -> DataFrame:
    """Stateless async join: per key, min across sources of the
    per-source count (ports not seen for a key are simply absent, as in
    stateless/cluster/HashJoin.scala:51-62).

    Input: F1 ``(ts, source, key)``. Output: ``(key, min_cnt)``.
    """
    per_source = pw.groupBy("key", "source").agg(F.count("*").alias("cnt"))
    return per_source.groupBy("key").agg(F.min("cnt").alias("min_cnt"))


def min_count_per_window(
    pw: DataFrame,
    cfg: EngineConfig = DEFAULT_CONFIG,
    emit_zero_if_incomplete: bool = False,
) -> DataFrame:
    """Stateful async join: per (key, tumbling window) min across
    sources of per-source counts, with the reference's completeness
    semantics (state/cluster/naive/HashJoin.scala:85-119):

    - ``emit_zero_if_incomplete=False``: emit only windows where every
      one of cfg.n_sources ports contributed (the `pcMap.size ==
      ports_num` check at :91 gating a real min).
    - ``emit_zero_if_incomplete=True``: emit the window with min 0 when
      a port is missing (the else-branch of the same check).

    Output: ``(key, ltw, min_cnt)`` where ltw = floor(ts/lgw)
    (state/cluster/naive/HashJoin.scala:50).
    """
    per_source = (
        with_window(pw, cfg)
        .groupBy("key", "ltw", "source")
        .agg(F.count("*").alias("cnt"))
    )
    per_window = per_source.groupBy("key", "ltw").agg(
        F.min("cnt").alias("mn"), F.count("source").alias("n_sources")
    )
    complete = F.col("n_sources") == cfg.n_sources
    if emit_zero_if_incomplete:
        return per_window.select(
            "key",
            "ltw",
            F.when(complete, F.col("mn")).otherwise(F.lit(0)).cast("long").alias("min_cnt"),
        )
    return per_window.where(complete).select(
        "key", "ltw", F.col("mn").cast("long").alias("min_cnt")
    )
