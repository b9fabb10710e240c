"""Kafka source builder (production streaming ingress).

The reference consumes ';'-packed "ts port word" text records from a
Kafka 0.8 direct stream (stateless/cluster/HashJoin.scala:39-42,64-65,
offset policy from stream.json:8). The Structured Streaming equivalent
below preserves one-source-partition-per-Kafka-partition parallelism
and applies the same grammar decode as sources.fixtures.

The spark-sql-kafka connector jar is not in this container, so the
builder is untested here; its decode path (`decode_kafka_payload`) is
pure column expressions shared with the tested fixture codec.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def kafka_stream(
    spark: SparkSession,
    brokers: str,
    topics: str,
    starting_offsets: str = "latest",  # reference "largest", stream.json:8
) -> DataFrame:
    """Raw Kafka stream (key/value binary). Requires the
    spark-sql-kafka-0-10 package on the classpath."""
    return (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", brokers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .load()
    )


def decode_kafka_payload(raw: DataFrame) -> DataFrame:
    """Decode packed "ts source key" payloads (the F1 grammar) into
    typed rows — explode on ';', positional split on ' ', cast.
    Identical semantics to fixtures.decode_packed_lines, applied to the
    Kafka value column."""
    rec = F.explode(F.split(F.col("value").cast("string"), ";")).alias("rec")
    parts = F.split(F.col("rec"), " ")
    return raw.select(rec).select(
        parts.getItem(0).cast("long").alias("ts"),
        parts.getItem(1).cast("int").alias("source"),
        parts.getItem(2).alias("key"),
    )
