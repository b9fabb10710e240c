"""Parquet table loaders for the driver's deterministic test tables.

The reference's only source is a Kafka direct stream of packed text
records (stateless/cluster/HashJoin.scala:64-65); this engine's batch
source is columnar parquet (pushdown + pruning for free), with the
Kafka/text grammar preserved in :mod:`fixtures` as a codec and in
:mod:`myasynstreamjoin_spark.streaming` as a streaming source.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver tables from ``{sf_dir}/{name}.parquet``.

    Column pruning and predicate pushdown happen automatically: callers
    should select/filter on the returned DataFrame and let Catalyst
    push into the scan (verify with plans.explain.scan_report).
    """
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def rebalance(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to the cluster's parallelism.

    Use before work-amplifying operators (shingle explode, per-row
    signature computation): scan partitioning follows *bytes*
    (maxPartitionBytes, row-group boundaries), so a small-on-disk input
    that fans out 100× downstream otherwise runs on a handful of tasks.
    The shuffle moves only the narrow input rows — cheap relative to
    the amplified work it parallelizes. At full scale this also evens
    out skewed file sizes.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (for spark.sql use)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
