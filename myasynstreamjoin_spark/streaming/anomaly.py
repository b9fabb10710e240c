"""Streaming anomaly monitor: flag events that deviate > k·σ from the
RUNNING per-group statistics accumulated over all prior micro-batches
— the live counterpart of ``operators.stats.zscore_outliers`` (same
exact-integer flag rule), and the third member of the engine's
foreachBatch control-loop family (cost-model feedback, quality
expectations, now anomaly detection).

Semantics: batch N's rows are judged against the statistics of batches
0..N−1 ONLY (a spike must not soften its own baseline — and the flag
decision for a row never depends on later rows). Groups seen fewer
than ``min_count`` times are never flagged (cold start).

Replay safety (foreachBatch is at-least-once): flagged rows write to a
PER-BATCH directory ``{out}/b{N}`` in overwrite mode, so a redelivered
batch replaces its own output instead of appending duplicates; the
per-group totals are snapshotted to ``{state}/s{N}.json`` after each
batch (atomic tmp+rename) and a replayed batch N reloads the newest
snapshot BELOW N — the same pre-N-base rule as ``streaming/cdc.py``.
A restarted monitor therefore resumes its baselines instead of
cold-starting.

Bounded state, unbounded stream: one (n, Σx, Σx²) integer triple per
group — O(#groups) in memory and per snapshot; flagged rows live in
the sink, never in the driver.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _load_state_below(state_dir: str, batch_id: int) -> dict:
    best, state = None, {}
    if not os.path.isdir(state_dir):
        return state
    for name in os.listdir(state_dir):
        if not (name.startswith("s") and name.endswith(".json")):
            continue
        try:
            v = int(name[1:-5])
        except ValueError:
            continue
        if v < batch_id and (best is None or v > best):
            best = v
    if best is not None:
        with open(os.path.join(state_dir, f"s{best}.json")) as f:
            state = {k: tuple(v) for k, v in json.load(f).items()}
    return state


def _save_state(state_dir: str, batch_id: int, totals: dict) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, f".s{batch_id}.tmp")
    with open(tmp, "w") as f:
        json.dump({k: list(v) for k, v in totals.items()}, f)
    os.replace(tmp, os.path.join(state_dir, f"s{batch_id}.json"))


def read_flagged(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """All flagged rows across batches, or None if nothing flagged."""
    if not os.path.isdir(out_dir):
        return None
    dirs = [
        os.path.join(out_dir, d)
        for d in os.listdir(out_dir)
        if d.startswith("b")
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def run_streaming_anomalies(
    events: DataFrame,
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    state_dir: str | None = None,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 3,
    unit: int = 1000,
    min_count: int = 10,
) -> dict[str, tuple[int, int, int]]:
    """Drain a (bounded, for tests) event stream; write flagged rows
    under ``out_dir`` (one subdir per batch). Returns the final
    per-group totals.
    """
    sdir = state_dir or (out_dir.rstrip("/") + "_state")
    totals: dict[str, tuple[int, int, int]] = {}
    last_applied: list[int] = [-1]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if last_applied[0] != bid - 1:
            # first batch of this incarnation, or a replay: resume the
            # baselines from the newest snapshot BELOW this batch
            totals.clear()
            totals.update(_load_state_below(sdir, bid))
        bspark = batch_df.sparkSession
        xq = F.round(F.col(value_col) * F.lit(unit)).cast("decimal(38,0)")
        batch = batch_df.select(group_col, id_col, value_col, xq.alias("__x"))
        # 1) flag against PRIOR stats (broadcast |groups| rows)
        prior = [
            (g, str(n), str(s), str(ss))
            for g, (n, s, ss) in totals.items()
            if n >= min_count
        ]
        if prior:
            st = bspark.createDataFrame(
                prior, f"{group_col} string, n string, s string, ss string"
            ).select(
                group_col,
                F.col("n").cast("decimal(38,0)").alias("__n"),
                F.col("s").cast("decimal(38,0)").alias("__s"),
                F.col("ss").cast("decimal(38,0)").alias("__ss"),
            )
            nx_s = F.col("__n") * F.col("__x") - F.col("__s")
            var_n2 = F.col("__n") * F.col("__ss") - F.col("__s") * F.col("__s")
            flagged = (
                batch.join(F.broadcast(st), group_col)
                .where(
                    nx_s * nx_s > F.lit(k * k).cast("decimal(38,0)") * var_n2
                )
                .select(
                    group_col,
                    id_col,
                    value_col,
                    F.lit(bid).alias("batch_id"),
                )
            )
            # per-batch overwrite → replays replace, never duplicate
            flagged.write.mode("overwrite").parquet(
                os.path.join(out_dir, f"b{bid}")
            )
        # 2) fold this batch into the running totals (|groups| rows)
        rows = (
            batch.groupBy(group_col)
            .agg(
                F.count("*").alias("n"),
                F.sum("__x").alias("s"),
                F.sum(F.col("__x") * F.col("__x")).alias("ss"),
            )
            .collect()
        )
        for r in rows:
            n0, s0, ss0 = totals.get(r[group_col], (0, 0, 0))
            totals[r[group_col]] = (
                n0 + int(r["n"]), s0 + int(r["s"]), ss0 + int(r["ss"])
            )
        _save_state(sdir, bid, totals)
        last_applied[0] = bid

    q = (
        events.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return totals
