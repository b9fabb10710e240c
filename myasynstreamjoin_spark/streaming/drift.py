"""Streaming PSI drift monitor: score every micro-batch's value
distribution against its PREDECESSOR batch — the live counterpart of
``operators.stats.drift_timeline`` (same buckets, same add-one
smoothing, same nano-unit fold: the PSI expressions are imported from
stats.py so stream ≡ batch holds bit-for-bit), and the fourth member
of the foreachBatch control-loop family (cost-model feedback, quality
expectations, anomaly flags, now distribution drift).

Semantics: batch N yields one row (win_start_ns, n_prev, n_cur, psi)
comparing it to batch N−1; the first batch of a stream emits nothing
(no predecessor — exactly `drift_timeline`'s "window with a
predecessor" rule). Bucket bounds are REQUIRED: a stream never knows
its global min/max, so the caller pins the reference range (a model's
training-time value range) the way any production drift monitor does.

Replay safety (foreachBatch is at-least-once): per-batch output dirs
``{out}/b{N}`` in overwrite mode; the predecessor histogram (one
n_buckets-long integer list) snapshots to ``{state}/s{N}.json``
(atomic tmp+rename) and a replayed batch N reloads the newest snapshot
BELOW N — the pre-N-base rule shared with streaming/anomaly.py and
streaming/cdc.py.

Bounded state, unbounded stream: n_buckets integers per snapshot.
The per-batch bucket histogram is computed distributed (groupBy on the
batch, JVM-side round/clamp identical to the batch operator) and only
the n_buckets-row result is collected; the PSI itself is evaluated on
a tiny in-memory frame with the SHARED Spark expressions — never in
Python float arithmetic, so no libm-vs-JVM ulp risk.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myasynstreamjoin_spark.operators.stats import (
    psi_close_expr,
    psi_nano_term,
)


def _load_prev_below(state_dir: str, batch_id: int) -> tuple | None:
    best = None
    if not os.path.isdir(state_dir):
        return None
    for name in os.listdir(state_dir):
        if not (name.startswith("s") and name.endswith(".json")):
            continue
        try:
            v = int(name[1:-5])
        except ValueError:
            continue
        if v < batch_id and (best is None or v > best):
            best = v
    if best is None:
        return None
    with open(os.path.join(state_dir, f"s{best}.json")) as f:
        d = json.load(f)
    return d["win"], d["counts"]


def _save_state(state_dir: str, batch_id: int, win, counts: list) -> None:
    os.makedirs(state_dir, exist_ok=True)
    tmp = os.path.join(state_dir, f".s{batch_id}.tmp")
    with open(tmp, "w") as f:
        json.dump({"win": win, "counts": counts}, f)
    os.replace(tmp, os.path.join(state_dir, f"s{batch_id}.json"))


def read_drift(spark: SparkSession, out_dir: str) -> DataFrame | None:
    """All drift rows across COMMITTED batches (the ``_SUCCESS`` rule),
    or None if nothing scored yet."""
    if not os.path.isdir(out_dir):
        return None
    dirs = [
        os.path.join(out_dir, d)
        for d in sorted(os.listdir(out_dir))
        if d.startswith("b")
        and os.path.exists(os.path.join(out_dir, d, "_SUCCESS"))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)


def run_streaming_drift(
    events: DataFrame,
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    bounds: tuple[int, int],
    state_dir: str | None = None,
    value_col: str = "value",
    ts_col: str = "ts",
    window_ns: int = 3_600_000_000_000,
    n_buckets: int = 10,
    unit: int = 1000,
    require_adjacent: bool = True,
) -> None:
    """Drain a (bounded, for tests) event stream; write one PSI row
    per batch-with-a-predecessor under ``out_dir``. When each batch
    carries exactly one event-time window in window order, the union
    of the outputs equals ``drift_timeline(events, bounds=bounds)``
    row for row (pytest-locked in tests/test_stream_drift.py).

    ``require_adjacent`` (default) scores a batch only when its window
    immediately follows the predecessor's (w == prev_w + 1), exactly
    `drift_timeline`'s w−1 join — a data gap yields silence, not a
    misleading drift score against a stale histogram. Monitors whose
    batches don't align to event-time windows pass False to compare
    against the previous batch unconditionally."""
    sdir = state_dir or (out_dir.rstrip("/") + "_state")
    mn, mx = int(bounds[0]), int(bounds[1])
    prev_state: list = [None]  # (win, counts) of the predecessor batch
    last_applied: list[int] = [-1]

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        if last_applied[0] != bid - 1:
            # first batch of this incarnation, or a replay: resume the
            # predecessor histogram from the newest snapshot BELOW bid
            prev_state[0] = _load_prev_below(sdir, bid)
        bspark = batch_df.sparkSession
        xq = F.round(F.col(value_col) * F.lit(unit)).cast("long")
        rows = (
            batch_df.where(
                F.col(value_col).isNotNull() & F.col(ts_col).isNotNull()
            )
            .select(
                F.expr(f"{ts_col} DIV {int(window_ns)}L").alias("__w"),
                xq.alias("__xq"),
            )
            .select(
                "__w",
                F.greatest(
                    F.lit(mn), F.least(F.lit(mx), F.col("__xq"))
                ).alias("__cl"),
            )
            .select(
                "__w",
                F.expr(
                    f"((__cl - {mn}L) * {n_buckets}) DIV ({mx}L - {mn}L + 1)"
                ).alias("bucket"),
            )
            .groupBy("bucket")
            .agg(F.count("*").alias("c"), F.min("__w").alias("w"))
            .collect()  # ≤ n_buckets rows — the histogram, not the data
        )
        if not rows:
            last_applied[0] = bid
            return
        cur_counts = [0] * n_buckets
        for r in rows:
            cur_counts[int(r["bucket"])] = int(r["c"])
        cur_win = min(int(r["w"]) for r in rows)
        prev = prev_state[0]
        if prev is not None and require_adjacent and prev[0] != cur_win - 1:
            prev = None
        if prev is not None:
            _, prev_counts = prev
            # dense add-one smoothing over (prev, cur), folded with the
            # SHARED batch expressions on an n_buckets-row frame
            tiny = bspark.createDataFrame(
                [
                    (b, prev_counts[b] + 1, cur_counts[b] + 1)
                    for b in range(n_buckets)
                ],
                "bucket long, ar long, ac long",
            ).select(
                "ar",
                "ac",
                F.lit(sum(prev_counts) + n_buckets).alias("tr"),
                F.lit(sum(cur_counts) + n_buckets).alias("tc"),
            )
            nano = psi_nano_term(
                F.col("ar"), F.col("tr"), F.col("ac"), F.col("tc")
            )
            out = (
                tiny.select(nano.alias("nano"), "tr", "tc")
                .groupBy()
                .agg(
                    (F.max("tr") - F.lit(n_buckets)).alias("n_prev"),
                    (F.max("tc") - F.lit(n_buckets)).alias("n_cur"),
                    psi_close_expr().alias("psi"),
                )
                .select(
                    F.lit(cur_win * window_ns).alias("win_start_ns"),
                    "n_prev",
                    "n_cur",
                    "psi",
                )
            )
        else:
            out = bspark.createDataFrame(
                [],
                "win_start_ns long, n_prev long, n_cur long, psi double",
            )
        # per-batch overwrite → replays replace, never duplicate
        out.write.mode("overwrite").parquet(os.path.join(out_dir, f"b{bid}"))
        _save_state(sdir, bid, cur_win, cur_counts)
        prev_state[0] = (cur_win, cur_counts)
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
