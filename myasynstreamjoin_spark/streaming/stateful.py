"""Custom stateful streaming operator via applyInPandasWithState.

This is the engine's port of the reference's forked mapWithState
(SURVEY.md §2.6 T4, state/org/apache/spark/streaming/rdd/
MyMapWithStateWithIndexRDD.scala:26-161): keyed state holding
per-(window, source) counts, with watermark-triggered emission and
eviction. One reference behavior is NOT expressible as a native
windowed aggregation: emitting **0** for a window a key participated
in but where some source is missing (the else-branch of the
completeness check, state/cluster/naive/HashJoin.scala:91-119) *after*
the watermark passes, via explicit state sweep. That zero-emission
semantics is what this operator provides; everything else should use
`streaming.windowed` (native, faster).

State layout: flat arrays (ltws, counts[len(ltws)·n_sources]) — the
reference's "optimized layout" (state keyed by window so only ripe
windows are touched on trigger, state/cluster/optimized/HashJoin.scala:70-108).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from myasynstreamjoin_spark.config import DEFAULT_CONFIG, EngineConfig

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("ltw", T.LongType(), False),
        T.StructField("min_cnt", T.LongType(), False),
    ]
)

STATE_SCHEMA = T.StructType(
    [
        T.StructField("ltws", T.ArrayType(T.LongType()), True),
        T.StructField("counts", T.ArrayType(T.LongType()), True),
    ]
)


def _make_update_fn(lgw_ms: int, n_sources: int):
    def update(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        # --- load state ---------------------------------------------
        windows: dict[int, list[int]] = {}
        if state.exists:
            ltws, counts = state.get
            for i, w in enumerate(ltws):
                windows[int(w)] = list(counts[i * n_sources : (i + 1) * n_sources])

        # --- fold in new data (reference: per-record mappingFunc,
        #     state/cluster/naive/HashJoin.scala:121-129) -------------
        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ms = pdf["etime"].astype("int64") // 1_000_000  # ns → ms
            # Vectorized fold: count per (window, source) in pandas, then
            # merge the (few) distinct cells — never a per-row Python loop.
            grp = pd.DataFrame(
                {"ltw": ms // lgw_ms, "src": pdf["source"].astype("int64")}
            ).groupby(["ltw", "src"]).size()
            for (ltw, src), n in grp.items():
                cell = windows.setdefault(int(ltw), [0] * n_sources)
                cell[int(src)] += int(n)

        # --- trigger sweep: emit + evict everything the watermark has
        #     passed (reference: MyMapWithStateWithIndexRDD.scala:62-103,
        #     emission with 0-if-incomplete per HashJoin.scala:91) ----
        wm = state.getCurrentWatermarkMs()
        ripe = sorted(w for w in windows if (w + 1) * lgw_ms <= wm)
        rows: list[tuple[Any, ...]] = []
        for w in ripe:
            counts_w = windows.pop(w)
            rows.append((key[0], w, min(counts_w)))  # 0 if any source absent

        # --- persist / schedule next trigger -------------------------
        if windows:
            ltws_out = sorted(windows)
            flat = [c for w in ltws_out for c in windows[w]]
            state.update((ltws_out, flat))
            next_end = min((w + 1) * lgw_ms for w in windows)
            state.setTimeoutTimestamp(max(next_end, wm + 1))
        else:
            state.remove()

        if rows:
            yield pd.DataFrame(rows, columns=["key", "ltw", "min_cnt"])

    return update


def stateful_min_count(
    events: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG
) -> DataFrame:
    """Streaming async join with the reference's zero-if-incomplete
    emission, as a custom stateful operator. Output: (key, ltw, min_cnt)
    for every window some source touched, once the watermark passes —
    min_cnt = 0 when not all cfg.n_sources sources reported."""
    parsed = events.select(
        F.expr("timestamp_micros(ts DIV 1000)").alias("etime"),
        (F.col("user_id") % cfg.n_sources).cast("int").alias("source"),
        F.col("event_type").alias("key"),
    ).withWatermark("etime", cfg.watermark_delay)
    return parsed.groupBy("key").applyInPandasWithState(
        _make_update_fn(cfg.lgw_ms, cfg.n_sources),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )


SCALAR_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("key", T.StringType(), False),
        T.StructField("ltw", T.LongType(), False),
        T.StructField("val", T.DoubleType(), False),
    ]
)

SCALAR_STATE_SCHEMA = T.StructType(
    [
        T.StructField("ltws", T.ArrayType(T.LongType()), True),
        T.StructField("vals", T.ArrayType(T.DoubleType()), True),
    ]
)


def _make_scalar_update_fn(lgw_ms: int, fold: str):
    """Generalization of the min-count update fn to scalar folds — the
    reference's grouped-max-via-state (A4, one-group-state/cluster/
    RRGrouping.scala:88-96) and grouped-sum, same watermark-triggered
    emission and eviction machinery, state = one scalar per live
    window."""
    if fold not in ("max", "sum"):
        raise ValueError(f"unsupported fold: {fold}")

    def update(
        key: tuple[str],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        windows: dict[int, float] = {}
        if state.exists:
            ltws, vals = state.get
            windows = {int(w): float(v) for w, v in zip(ltws, vals)}

        for pdf in pdfs:
            if len(pdf) == 0:
                continue
            ms = pdf["etime"].astype("int64") // 1_000_000
            grp = pd.DataFrame({"ltw": ms // lgw_ms, "v": pdf["value"]}).groupby("ltw")["v"]
            agg = grp.max() if fold == "max" else grp.sum()
            for ltw, v in agg.items():
                w = int(ltw)
                if w in windows:
                    windows[w] = max(windows[w], float(v)) if fold == "max" else windows[w] + float(v)
                else:
                    windows[w] = float(v)

        wm = state.getCurrentWatermarkMs()
        ripe = sorted(w for w in windows if (w + 1) * lgw_ms <= wm)
        rows = [(key[0], w, windows.pop(w)) for w in ripe]

        if windows:
            ltws_out = sorted(windows)
            state.update((ltws_out, [windows[w] for w in ltws_out]))
            next_end = min((w + 1) * lgw_ms for w in windows)
            state.setTimeoutTimestamp(max(next_end, wm + 1))
        else:
            state.remove()

        if rows:
            yield pd.DataFrame(rows, columns=["key", "ltw", "val"])

    return update


def stateful_window_value(
    events: DataFrame, cfg: EngineConfig = DEFAULT_CONFIG, fold: str = "max"
) -> DataFrame:
    """Streaming per-(key, window) scalar aggregate (max or sum of
    `value`) as a custom stateful operator — the multi-fold
    generalization of `stateful_min_count`. Use the native windowed agg
    (`streaming/windowed.py`) unless custom state semantics are needed;
    this exists to prove the stateful harness is a reusable primitive,
    not a one-off. Output: (key, ltw, val) per ripe window.
    """
    parsed = events.select(
        F.expr("timestamp_micros(ts DIV 1000)").alias("etime"),
        F.col("value").cast("double").alias("value"),
        F.col("event_type").alias("key"),
    ).withWatermark("etime", cfg.watermark_delay)
    return parsed.groupBy("key").applyInPandasWithState(
        _make_scalar_update_fn(cfg.lgw_ms, fold),
        outputStructType=SCALAR_OUTPUT_SCHEMA,
        stateStructType=SCALAR_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.EventTimeTimeout,
    )
