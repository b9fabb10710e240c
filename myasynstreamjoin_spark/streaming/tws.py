"""T4-T7 on Spark's modern arbitrary-state API (transformWithState).

Third formulation of the reference's keyed stateful window operator
(state/org/apache/spark/streaming/MyMapWithStateWithIndexRDD.scala:62-148),
after the windowed-agg (streaming/windowed.py) and
applyInPandasWithState (streaming/stateful.py) forms — this one maps
the reference's mechanism most literally onto engine primitives:

  reference mechanism                     transformWithState primitive
  ------------------------------------    ----------------------------
  keyed state with index (T4)             ValueState per (key, ltw)
  emit on punctuation passing window (T5) event-time timer at window end
  state eviction on emit (T5)             state.clear() in the timer
  state timeout (T7)                      the timer IS the timeout
  mandatory checkpointing (T8)            checkpointLocation

Why keep three forms: the windowed-agg form is the production default
(pure JVM, no Python worker); this form is the template for stateful
logic a windowed agg CANNOT express (per-key state machines,
conditional emission) — the timer/state lifecycle here is exactly what
such operators need, demonstrated on semantics the agg form can verify.

In-order caveat shared with the reference (its streams are
in-order-per-port, state/timetable/MyStateJoinUtils.scala:44-46): a
row arriving AFTER its window's timer fired would re-create state and
re-fire; the upstream watermark filter drops such rows one batch after
the watermark passes, matching the reference's drop-late behavior.

RUNTIME DEPENDENCY: transformWithState's Python state server speaks
protobuf — running a query through this module requires the
``protobuf`` package (``google.protobuf``), which this build sandbox
does not ship. The module imports and the query PLANS without it
(verified in tests); execution is gated by ``tws_available()`` and the
equivalence test skips when the dependency is absent. On a real
deployment (protobuf present) no code change is needed.
"""

from __future__ import annotations

from typing import Any, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    ExpiredTimerInfo,
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

from myasynstreamjoin_spark.config import DEFAULT_CONFIG, EngineConfig


def tws_available() -> bool:
    """True when the runtime can EXECUTE transformWithState queries
    (planning works regardless): the Python-side state server requires
    protobuf."""
    try:
        from google.protobuf import descriptor  # noqa: F401

        return True
    except ImportError:
        return False


class _MinCountProcessor(StatefulProcessor):
    """Per (key, ltw): accumulate per-source counts in ValueState; on
    the event-time timer at window end, emit min-across-sources iff
    every source reported, then clear."""

    def __init__(self, n_sources: int, lgw_ms: int) -> None:
        self._n = n_sources
        self._lgw_ms = lgw_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        schema = ", ".join(f"c{r} LONG" for r in range(self._n))
        self._counts = handle.getValueState("counts", schema)

    def handleInputRows(
        self, key: Any, rows: Iterator[pd.DataFrame], timerValues: TimerValues
    ) -> Iterator[pd.DataFrame]:
        acc = [0] * self._n
        for pdf in rows:
            for src, cnt in pdf["source"].value_counts().items():
                acc[int(src)] += int(cnt)
        if self._counts.exists():
            prev = self._counts.get()
            acc = [a + int(p) for a, p in zip(acc, prev)]
        else:
            # first sight of this (key, ltw): arm the emission timer at
            # window end — fires when the event-time watermark passes it
            ltw = int(key[1])
            self._handle.registerTimer((ltw + 1) * self._lgw_ms)
        self._counts.update(tuple(acc))
        return iter([])

    def handleExpiredTimer(
        self, key: Any, timerValues: TimerValues, expiredTimerInfo: ExpiredTimerInfo
    ) -> Iterator[pd.DataFrame]:
        out: list[pd.DataFrame] = []
        if self._counts.exists():
            counts = [int(c) for c in self._counts.get()]
            if all(c > 0 for c in counts):
                out.append(
                    pd.DataFrame(
                        {
                            "key": [key[0]],
                            "ltw": [int(key[1])],
                            "min_cnt": [min(counts)],
                        }
                    )
                )
        self._counts.clear()  # T5: eviction on emission
        return iter(out)

    def close(self) -> None:
        pass


def tws_min_count(
    events: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Streaming flagship on transformWithStateInPandas: per (key,
    tumbling window) min across sources of per-source counts, emitted
    once per complete window when the watermark passes window end.

    Output schema matches every other formulation: (key, ltw, min_cnt).
    """
    parsed = events.select(
        F.expr("timestamp_micros(ts DIV 1000)").alias("etime"),
        (F.col("user_id") % cfg.n_sources).cast("int").alias("source"),
        F.col("event_type").alias("key"),
        F.expr(f"CAST(ts DIV {cfg.lgw_ns} AS LONG)").alias("ltw"),
    ).withWatermark("etime", cfg.watermark_delay)
    return parsed.groupBy("key", "ltw").transformWithStateInPandas(
        statefulProcessor=_MinCountProcessor(cfg.n_sources, cfg.lgw_ms),
        outputStructType="key STRING, ltw LONG, min_cnt LONG",
        outputMode="Append",
        timeMode="EventTime",
    )
