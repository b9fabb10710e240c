"""Pins the checkpoint-block lifecycle facts myasynstreamjoin_spark/
blocks.py is built on (round-7 review finding, verified empirically):

1. ``DataFrame.unpersist()`` is a SILENT NO-OP for localCheckpoint
   blocks — it goes through the CacheManager, which only tracks
   ``df.persist()``-style cached plans. If a Spark upgrade ever
   changes this, the streaming kernels' release path should be
   revisited (it would become redundant, not wrong).
2. ``release_blocks(spark, before)`` actually frees every RDD
   persisted since the ``persisted_ids`` snapshot, and leaves
   pre-snapshot blocks alone.
"""

from __future__ import annotations

from myasynstreamjoin_spark.blocks import (
    ckpt_disk,
    persisted_ids,
    release_blocks,
)


def test_dataframe_unpersist_is_a_noop_for_local_checkpoints(spark):
    before = persisted_ids(spark)
    df = ckpt_disk(spark.range(10_000).selectExpr("id", "id * 2 AS y"))
    assert df.count() == 10_000
    new = persisted_ids(spark) - before
    assert new, "localCheckpoint should register a persistent RDD"
    df.unpersist(blocking=True)
    assert persisted_ids(spark) - before == new, (
        "DataFrame.unpersist unexpectedly freed localCheckpoint blocks —"
        " the blocks.py release path may now be redundant; re-evaluate"
    )
    release_blocks(spark, before)


def test_release_blocks_frees_only_post_snapshot_rdds(spark):
    base = persisted_ids(spark)
    keep = ckpt_disk(spark.range(1_000).selectExpr("id AS a"))
    assert keep.count() == 1_000
    snapshot = persisted_ids(spark)
    kept_ids = snapshot - base
    victim = ckpt_disk(spark.range(2_000).selectExpr("id AS b"))
    assert victim.count() == 2_000
    released = release_blocks(spark, snapshot)
    assert released >= 1
    after = persisted_ids(spark)
    # post-snapshot blocks gone, pre-snapshot blocks intact
    assert after & kept_ids == kept_ids
    assert not (after - base - kept_ids)
    # the surviving frame still computes (its blocks were untouched)
    assert keep.count() == 1_000
    release_blocks(spark, base)
