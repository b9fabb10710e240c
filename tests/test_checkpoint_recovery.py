"""Checkpoint recovery — the T8 semantics the reference only had as a
mandatory mapWithState checkpoint dir: a streaming query stopped and
restarted from its checkpoint must process each input exactly once
into an idempotent file sink (offset log + sink manifest, no
duplicates, no gaps)."""

from __future__ import annotations

import shutil

from pyspark.sql import functions as F

from myasynstreamjoin_spark.session import prepare_session
from myasynstreamjoin_spark.sources import tables
from myasynstreamjoin_spark.streaming.windowed import EVENTS_SCHEMA


def test_restart_from_checkpoint_is_exactly_once(spark, sf_dir, tmp_path):
    prepare_session(spark)
    src = tmp_path / "src"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    src.mkdir()

    # load_table normalizes ts; the halves written below are
    # engine-logical (EVENTS_SCHEMA) parquet.
    ev = tables.load_table(spark, sf_dir, "events")
    half1 = ev.where(F.col("event_id") % 2 == 0)
    half2 = ev.where(F.col("event_id") % 2 == 1)
    n_total = ev.count()

    def run_once():
        stream = (
            spark.readStream.schema(EVENTS_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src))
            .select("event_id", "event_type")
        )
        q = (
            stream.writeStream.outputMode("append")
            .format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    # first life: only half the input exists
    half1.coalesce(1).write.mode("overwrite").parquet(str(src / "batch1"))
    # FileStreamSource lists leaf files; flatten the nested dir
    for f in (src / "batch1").glob("part-*.parquet"):
        shutil.move(str(f), str(src / "a.parquet"))
    shutil.rmtree(src / "batch1")
    run_once()
    n_first = spark.read.parquet(out).count()
    assert 0 < n_first < n_total

    # second life: new file arrives, query restarts from the checkpoint
    half2.coalesce(1).write.mode("overwrite").parquet(str(src / "batch2"))
    for f in (src / "batch2").glob("part-*.parquet"):
        shutil.move(str(f), str(src / "b.parquet"))
    shutil.rmtree(src / "batch2")
    run_once()

    got = spark.read.parquet(out)
    # exactly once: every event exactly one row, nothing reprocessed
    assert got.count() == n_total
    assert got.select("event_id").distinct().count() == n_total
