"""Checkpoint-block discipline shared by the iterative operators and
the per-batch streaming kernels.

Two primitives:

- ``ckpt_disk(df)`` — eager localCheckpoint on DISK_ONLY blocks, for
  any frame whose GRAIN scales with the corpus (edges, grams, tokens,
  lines, events). Default-storage checkpoint blocks buffer per-task
  arrays on heap while writing (the round-6 graph OOM) and later
  participate in memory eviction, which is what turned the
  ContextCleaner's GC-timed block retirement into a crash under
  accumulated multi-batch pressure (round-7 streaming-e2e failure:
  FileNotFound on a half-dropped block, fatal under local mode's
  single task attempt). Disk blocks are written once and never
  re-evicted. Node/doc-grain frames stay on the default level — small
  and re-read hot.

- ``persisted_ids(spark)`` / ``release_blocks(spark, before)`` — REAL
  deterministic end-of-batch cleanup. ``DataFrame.unpersist()`` is a
  silent no-op for localCheckpoint blocks (verified on PySpark 4.1.2:
  it goes through the CacheManager, which only tracks
  ``df.persist()``-style cached plans, never the RDD-level
  checkpoint storage), so freeing them needs the RDD handles from
  ``JavaSparkContext.getPersistentRDDs``. A kernel snapshots the live
  ids at batch entry and releases everything NEW at commit time —
  which also sweeps checkpoints made INSIDE library calls (the span
  election's internal one, a caller's post-kernel gates), without
  each site having to thread handles around. Blocks persisted before
  the snapshot (static benchmark frames, prebuilt tables) are
  untouched.

Releasing a locally-checkpointed RDD's blocks truncates its lineage
irrecoverably — only call ``release_blocks`` at a point where the
batch's every sink has already materialized (the kernels' documented
commit-runs-LAST contract).
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, SparkSession


def ckpt_disk(df: DataFrame) -> DataFrame:
    """Eager localCheckpoint on DISK_ONLY blocks (corpus-grain rule)."""
    return df.localCheckpoint(eager=True, storageLevel=StorageLevel.DISK_ONLY)


def persisted_ids(spark: SparkSession) -> set[int]:
    """Ids of every RDD currently holding persisted/checkpointed
    blocks in this context."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    return {int(k) for k in jmap.keySet().toArray()}


def release_blocks(
    spark: SparkSession, before: set[int], blocking: bool = True
) -> int:
    """Unpersist every RDD persisted since ``before`` (a
    ``persisted_ids`` snapshot). Returns how many were released."""
    jmap = spark.sparkContext._jsc.getPersistentRDDs()
    released = 0
    for k in jmap.keySet().toArray():
        if int(k) not in before:
            jmap.get(k).unpersist(blocking)
            released += 1
    return released
