"""The custom Python DataSource serving the reference's Kafka text
grammar (S1) — batch and streaming reads must emit identical records,
and the decoded stream must drive the flagship async-join pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from myasynstreamjoin_spark.sources.fixtures import decode_packed_lines
from myasynstreamjoin_spark.sources.grammar_source import register_grammar_source

OPTS = {"messages": "40", "records_per_message": "6", "partitions": "2",
        "ports": "3", "seed": "7"}


def test_batch_read_is_deterministic_and_decodable(spark):
    register_grammar_source(spark)
    raw = spark.read.format("ref_grammar").options(**OPTS).load()
    assert raw.columns == ["partition", "offset", "value"]
    assert raw.count() == 80  # messages × partitions
    decoded = decode_packed_lines(raw.select(F.col("value").alias("payload")))
    assert decoded.count() == 80 * 6
    # positional parse round-trips: every port id in range, keys in space
    assert decoded.where(~F.col("source").isin(0, 1, 2)).count() == 0
    assert decoded.where(~F.col("key").isin(*"ABCDEF")).count() == 0
    # determinism: second read identical
    again = decode_packed_lines(
        spark.read.format("ref_grammar").options(**OPTS).load()
        .select(F.col("value").alias("payload"))
    )
    assert decoded.exceptAll(again).count() == 0


def test_stream_read_equals_batch_read(spark, tmp_path):
    register_grammar_source(spark)
    batch = spark.read.format("ref_grammar").options(**OPTS).load()
    stream = (
        spark.readStream.format("ref_grammar")
        .options(**OPTS, messages_per_batch="7")
        .load()
    )
    q = (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("grammar_sink")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = spark.table("grammar_sink")
    assert got.count() == batch.count()
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0


def test_decoded_grammar_drives_flagship_pipeline(spark):
    from myasynstreamjoin_spark.config import EngineConfig
    from myasynstreamjoin_spark.operators.asyn_join import min_count_per_window

    register_grammar_source(spark)
    cfg = EngineConfig(lgw_ms=1000)
    raw = spark.read.format("ref_grammar").options(**OPTS).load()
    pw = decode_packed_lines(raw.select(F.col("value").alias("payload"))).select(
        F.expr("timestamp_millis(ts)").alias("ts"), "source", "key"
    )
    # every window gets all 3 ports by construction → rows for complete
    # windows only, min over per-port counts ≥ 1
    res = min_count_per_window(
        pw.select(F.expr("CAST(unix_millis(ts) * 1000000 AS LONG)").alias("ts"),
                  "source", "key"),
        cfg,
    )
    rows = res.collect()
    assert len(rows) > 0
    assert all(r.min_cnt >= 1 for r in rows)


def test_stream_restart_no_duplicates(spark, tmp_path):
    """Exactly-once across a checkpoint restart: a fresh reader's
    in-memory head resets to 0, and the committed-floor clamp must
    prevent re-emitting committed offset ranges into a file sink."""
    register_grammar_source(spark)
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_once():
        stream = (
            spark.readStream.format("ref_grammar")
            .options(**OPTS, messages_per_batch="7")
            .load()
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

    run_once()   # first life: full finite replay
    run_once()   # second life: restart from checkpoint, nothing new
    run_once()   # third life: still nothing new
    got = spark.read.parquet(out)
    batch = spark.read.format("ref_grammar").options(**OPTS).load()
    assert got.count() == batch.count(), "restart re-emitted committed offsets"
    assert got.exceptAll(batch).count() == 0
    assert batch.exceptAll(got).count() == 0
