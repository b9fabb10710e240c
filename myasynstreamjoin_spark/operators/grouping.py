"""Grouped aggregation operators (reference SURVEY.md §2.4 A3-A6).

The reference implements these as per-partition mutable hash maps inside
``mapPartitions`` plus hand-rolled partial/final merges; here each is a
single declarative aggregate, which Catalyst compiles to partial+final
HashAggregate with whole-stage codegen — the same two-phase shape,
spill-safe and vectorized.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from myasynstreamjoin_spark.config import DEFAULT_CONFIG, EngineConfig
from myasynstreamjoin_spark.sources.fixtures import with_window


def count_per_key(kv: DataFrame) -> DataFrame:
    """Grouped count (A3: one-group-stateless/cluster/HHGrouping.scala:38-46).

    Input F2 ``(ts, key, value)`` → ``(key, cnt)``.
    """
    return kv.groupBy("key").agg(F.count("*").alias("cnt"))


def collect_count_per_key(kv: DataFrame) -> DataFrame:
    """Count via collected-buffer length (A6:
    one-group-state/cluster/PKGrouping.scala:73-98 appends every value
    to an ArrayBuffer and emits its length).

    Kept for API parity; note the deliberate inefficiency — at 100 TB
    you want `count`, not a materialized list. Provided so workloads
    that need the buffer itself (sampling, percentile sketches) have
    the pattern.
    """
    return kv.groupBy("key").agg(F.size(F.collect_list("value")).cast("long").alias("cnt"))


def agg_per_window(
    kv: DataFrame,
    agg: str = "max",
    cfg: EngineConfig = DEFAULT_CONFIG,
) -> DataFrame:
    """Per (key, tumbling window) aggregate of ``value`` (A4/A5:
    one-group-state/cluster/RRGrouping.scala:88-107 for max,
    HHGrouping.scala:76-101 for count).

    Output ``(key, ltw, agg_val)``; supported aggs: max, min, sum, count.
    """
    fns: dict[str, Column] = {
        "max": F.max("value"),
        "min": F.min("value"),
        "sum": F.sum("value"),
        "count": F.count("*"),
    }
    if agg not in fns:
        raise ValueError(f"unsupported agg {agg!r}")
    return (
        with_window(kv, cfg)
        .groupBy("key", "ltw")
        .agg(fns[agg].cast("long").alias("agg_val"))
    )


def count_per_sliding_window(
    events: DataFrame,
    width_ms: int = 2 * 3_600_000,
    step_ms: int = 3_600_000,
) -> DataFrame:
    """Per (key, SLIDING event-time window) count — the windowing shape
    the reference cannot express (its ltw = ts DIV lgw is tumbling
    only, SURVEY.md §2.6 T1); Spark's window(ts, width, step) assigns
    each row to width/step windows in one projection, and the count is
    the same single-shuffle partial/final aggregate as the tumbling
    form.

    Output: (key, win_start_ms, n) — win_start_ms = window start in
    epoch ms, one row per (key, covering window).
    """
    if width_ms % step_ms:
        raise ValueError("step must divide width")
    w = F.window(
        F.expr("timestamp_micros(ts DIV 1000)"),
        f"{width_ms} milliseconds",
        f"{step_ms} milliseconds",
    )
    return (
        events.select(F.col("event_type").alias("key"), w.alias("w"))
        .groupBy("key", "w")
        .agg(F.count("*").alias("n"))
        .select("key", F.unix_millis(F.col("w.start")).alias("win_start_ms"), "n")
    )
