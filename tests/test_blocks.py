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
3. ``batch_scope`` (round 8) holds the per-context lock for the whole
   snapshot→release window, so two concurrent batch bodies on one
   SparkContext can never release each other's in-flight blocks (the
   review's laundering scenario), and sweeps its own blocks even on
   an exception. A randomized kernel-composition test drives nested
   scopes and mixed storage levels and asserts zero leak / zero
   premature release across commits.
"""

from __future__ import annotations

import random
import threading
import time

from myasynstreamjoin_spark.blocks import (
    batch_scope,
    ckpt_disk,
    persisted_ids,
    release_blocks,
    release_ids,
    scoped_batch,
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


def test_release_ids_frees_exactly_the_given_set(spark):
    base = persisted_ids(spark)
    a = ckpt_disk(spark.range(500).selectExpr("id AS a"))
    assert a.count() == 500
    a_ids = persisted_ids(spark) - base
    b = ckpt_disk(spark.range(600).selectExpr("id AS b"))
    assert b.count() == 600
    released = release_ids(spark, a_ids)
    assert released == len(a_ids)
    after = persisted_ids(spark)
    assert not (after & a_ids)
    assert b.count() == 600  # untouched
    # releasing an already-gone id is a counted-as-zero no-op
    assert release_ids(spark, a_ids) == 0
    release_blocks(spark, base)


def test_batch_scope_releases_own_blocks_and_spares_prior(spark):
    base = persisted_ids(spark)
    static = ckpt_disk(spark.range(300).selectExpr("id AS s"))
    assert static.count() == 300
    static_ids = persisted_ids(spark) - base
    assert static_ids
    with batch_scope(spark):
        inner = ckpt_disk(spark.range(400).selectExpr("id AS i"))
        assert inner.count() == 400
        assert persisted_ids(spark) - base - static_ids, (
            "the scope's checkpoint should be live inside the window"
        )
    # scope-created blocks gone, the pre-scope block intact
    assert persisted_ids(spark) - base == static_ids
    assert static.count() == 300
    release_blocks(spark, base)


def test_batch_scope_sweeps_on_exception(spark):
    base = persisted_ids(spark)
    try:
        with batch_scope(spark):
            df = ckpt_disk(spark.range(250).selectExpr("id AS e"))
            assert df.count() == 250
            raise RuntimeError("batch failed mid-flight")
    except RuntimeError:
        pass
    assert persisted_ids(spark) == base, (
        "a failed batch's blocks must not leak"
    )


def test_batch_scope_serializes_concurrent_batches(spark):
    """The round-8 review scenario: two foreachBatch bodies sharing
    one SparkContext. Without the per-context lock, scope A's exit
    releases scope B's in-flight localCheckpoint blocks and B's next
    action dies on truncated lineage. With it, the windows serialize:
    each thread's checkpointed frame must stay computable for the
    whole scope, and no thread may observe another's open window."""
    base = persisted_ids(spark)
    errors: list[BaseException] = []
    active = []  # thread names currently inside a scope
    overlap = []

    def batch_body(name: str) -> None:
        try:
            for _ in range(3):
                with batch_scope(spark):
                    active.append(name)
                    if len(active) > 1:
                        overlap.append(tuple(active))
                    df = ckpt_disk(
                        spark.range(2_000).selectExpr("id", "id*3 AS t")
                    )
                    assert df.count() == 2_000
                    time.sleep(0.05)
                    # still computable at end-of-scope: nobody swept us
                    assert df.count() == 2_000
                    active.remove(name)
        except BaseException as exc:  # noqa: BLE001 — repro harness
            errors.append(exc)

    threads = [
        threading.Thread(target=batch_body, args=(f"t{i}",))
        for i in range(3)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors, f"concurrent batch bodies failed: {errors!r}"
    assert not overlap, f"scopes overlapped on one context: {overlap!r}"
    assert persisted_ids(spark) == base


def test_scoped_batch_decorator_wraps_foreach_batch_signature(spark):
    base = persisted_ids(spark)
    seen = {}

    @scoped_batch
    def process(batch_df, batch_id):
        df = ckpt_disk(batch_df.selectExpr("id * 2 AS d"))
        seen["rows"] = df.count()
        seen["bid"] = batch_id

    process(spark.range(123), 7)
    assert seen == {"rows": 123, "bid": 7}
    assert persisted_ids(spark) == base


def test_randomized_kernel_composition_no_leak_no_premature_release(spark):
    """Adversarial lifecycle sweep (round-7 verdict stretch): N
    'batches', each opening a scope that makes a random mix of
    DISK_ONLY and default-storage checkpoints, sometimes via a nested
    inner scope (a kernel calling a library op that manages its own
    window). Every frame must stay computable until ITS scope closes
    (no premature release) and the context must end each batch exactly
    where it started (no leak). Seeded: failures reproduce."""
    rng = random.Random(0xB10C5)
    for batch in range(6):
        # per-batch snapshot, and the leak assertion below checks only
        # that nothing NEW survives the scope (set DIFFERENCE, not
        # equality): the shared session carries blocks from earlier
        # suite tests, and Spark's ContextCleaner may async-remove one
        # of those mid-test — an exact == against a test-start snapshot
        # flaked once in the r9 full-suite run for exactly that reason.
        pre_batch = persisted_ids(spark)
        with batch_scope(spark):
            frames = []
            for j in range(rng.randint(1, 4)):
                n = rng.randint(100, 2_000)
                df = spark.range(n).selectExpr("id", f"id % {j + 2} AS m")
                df = (
                    ckpt_disk(df)
                    if rng.random() < 0.5
                    else df.localCheckpoint(eager=True)
                )
                frames.append((df, n))
            if rng.random() < 0.5:
                # nested library-internal window: its blocks die at the
                # INNER exit; the outer frames must survive it
                with batch_scope(spark):
                    inner = ckpt_disk(spark.range(500).selectExpr("id AS x"))
                    assert inner.count() == 500
            for df, n in frames:
                assert df.count() == n, (
                    f"batch {batch}: premature release inside the scope"
                )
        assert persisted_ids(spark) - pre_batch == set(), (
            f"batch {batch}: leaked blocks past commit"
        )
