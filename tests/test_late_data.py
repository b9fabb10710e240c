"""T10 late-data handling, observed end-to-end (the reference's only
behavior here was a stderr warning, state/timetable/MyStateJoinUtils.scala:44-46).

Pins Spark's actual two-phase watermark semantics, discovered
empirically: the LATE-EVENT filter uses the previous batch's
watermark while EVICTION uses the current one — so out-of-order data
arriving in the first batch after the watermark advances is still
admitted, and data arriving one batch later is dropped and counted in
``numRowsDroppedByWatermark``. A monitoring pipeline must read that
metric, not assume drops start the instant the watermark moves."""

from __future__ import annotations

import json
import shutil
import time

from pyspark.sql import functions as F

from myasynstreamjoin_spark.session import prepare_session
from myasynstreamjoin_spark.sources import tables
from myasynstreamjoin_spark.streaming.windowed import EVENTS_SCHEMA


def test_late_rows_dropped_with_one_batch_lag_and_counted(spark, sf_dir, tmp_path):
    prepare_session(spark)
    src = tmp_path / "src"
    src.mkdir()
    # load_table normalizes ts to epoch-ns long; the thirds written below
    # are therefore engine-logical (EVENTS_SCHEMA) parquet.
    ev = tables.load_table(spark, sf_dir, "events")
    qs = ev.agg(
        F.expr("percentile(ts, 0.34D)").alias("a"),
        F.expr("percentile(ts, 0.67D)").alias("b"),
    ).collect()[0]
    thirds = [
        ev.where(F.col("ts") >= qs["b"]),                              # newest FIRST
        ev.where((F.col("ts") >= qs["a"]) & (F.col("ts") < qs["b"])),  # late
        ev.where(F.col("ts") < qs["a"]),                               # very late
    ]
    for i, part in enumerate(thirds):
        part.coalesce(1).write.parquet(str(src / f"t{i}"))
        for f in (src / f"t{i}").glob("part-*.parquet"):
            shutil.move(str(f), str(src / f"{chr(97 + i)}.parquet"))
        shutil.rmtree(src / f"t{i}")
        time.sleep(1.1)  # distinct mtimes fix the replay order

    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .select(
            F.expr("timestamp_micros(ts DIV 1000)").alias("etime"),
            F.col("event_type").alias("key"),
        )
        .withWatermark("etime", "1 hour")
        .groupBy("key", F.window("etime", "1 hour"))
        .count()
    )
    q = (
        stream.writeStream.outputMode("update")
        .format("memory")
        .queryName("late_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = [json.loads(p.json) for p in q.recentProgress]
    finally:
        q.stop()

    dropped = {
        p["batchId"]: sum(
            op.get("numRowsDroppedByWatermark", 0)
            for op in p.get("stateOperators", [])
        )
        for p in progress
    }
    # batch 0 (in-order) and batch 1 (late, but filter watermark lags
    # one batch) admit everything; batch 2's very-late rows are dropped
    assert dropped[0] == 0
    assert dropped[1] == 0
    assert dropped[2] > 0.5 * thirds[2].count()
