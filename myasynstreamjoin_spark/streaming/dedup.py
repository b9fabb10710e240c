"""Streaming deduplication: exact first-occurrence dedup with bounded
state, chained into a windowed aggregation.

Beyond-reference surface: the reference's stream is assumed
duplicate-free (Kafka at-least-once redelivery would double-count in
every aggregation, state/cluster/naive/HashJoin.scala:121-129 — there
is no dedup anywhere in the codebase). A training-data ingestion
pipeline can't assume that, so the engine provides streaming dedup as
a first-class operator.

Scale design: `dropDuplicatesWithinWatermark` keys the state store by
the dedup key only and evicts each entry once the watermark passes its
event time + delay — state is bounded by (arrival rate × watermark
delay), not by stream history, which is what makes exact streaming
dedup viable on an unbounded 100 TB/day feed. The downstream windowed
count is a second stateful operator in the same query (chained
stateful ops, `spark.sql.streaming.statefulOperator.allowMultiple`,
set in session.prepare_session); both shuffle on the same key so the
dedup→agg exchange is one (key-hash) repartition each.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from myasynstreamjoin_spark.config import DEFAULT_CONFIG, EngineConfig


def stream_distinct_user_counts(
    events: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Per (key, tumbling window): the number of distinct users, as a
    streaming dedup → windowed count. Duplicate (key, user, window)
    triples — at-least-once redelivery, or a user firing the same event
    type repeatedly within a window — collapse to the first occurrence
    before the count, so the append-mode output is exactly
    `count(DISTINCT user_id)` per ripe window.

    Output: (key, ltw, n_users), emitted once the watermark passes the
    window end (same emission contract as the flagship,
    streaming/windowed.py::stream_min_count_per_window).
    """
    parsed = events.select(
        F.expr("timestamp_micros(ts DIV 1000)").alias("etime"),
        F.col("user_id"),
        F.col("event_type").alias("key"),
    ).withColumn(
        "ltw", F.floor(F.unix_millis(F.col("etime")) / cfg.lgw_ms).cast("long")
    )
    deduped = parsed.withWatermark("etime", cfg.watermark_delay).dropDuplicatesWithinWatermark(
        ["key", "user_id", "ltw"]
    )
    return (
        deduped.groupBy(
            "key", F.window("etime", f"{cfg.lgw_ms} milliseconds").alias("w")
        )
        .agg(F.count("*").alias("n_users"))
        .select(
            "key",
            F.floor(F.unix_millis(F.col("w.start")) / cfg.lgw_ms)
            .cast("long")
            .alias("ltw"),
            F.col("n_users").cast("long").alias("n_users"),
        )
    )
