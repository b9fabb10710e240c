"""Streaming anomaly monitor: flag events that deviate > k·σ from the
RUNNING per-group statistics accumulated over all prior micro-batches
— the live counterpart of ``operators.stats.zscore_outliers`` (same
exact-integer flag rule), and the third member of the engine's
foreachBatch control-loop family (cost-model feedback, quality
expectations, now anomaly detection).

Semantics: batch N's rows are judged against the statistics of batches
0..N−1 ONLY (a spike must not soften its own baseline — and the flag
decision for a row never depends on later rows, so results are stable
under replay). Groups seen fewer than ``min_count`` times are never
flagged (cold start).

Bounded state, unbounded stream: the driver holds one (n, Σx, Σx²)
integer triple per group — O(#groups), folded eagerly per batch like
``feedback.py``'s running counts; flagged rows land in an append-only
parquet sink, never in driver memory.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def run_streaming_anomalies(
    events: DataFrame,
    spark: SparkSession,
    out_dir: str,
    checkpoint_dir: str,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: int = 3,
    unit: int = 1000,
    min_count: int = 10,
) -> dict[str, tuple[int, int, int]]:
    """Drain a (bounded, for tests) event stream; write flagged rows
    to ``out_dir`` as parquet. Returns the final per-group totals.
    """
    totals: dict[str, tuple[int, int, int]] = {}

    def process(batch_df: DataFrame, batch_id: int) -> None:
        bspark = batch_df.sparkSession
        xq = F.round(F.col(value_col) * F.lit(unit)).cast("decimal(38,0)")
        batch = batch_df.select(
            group_col, id_col, value_col, xq.alias("__x")
        )
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
                    F.lit(int(batch_id)).alias("batch_id"),
                )
            )
            flagged.write.mode("append").parquet(out_dir)
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
