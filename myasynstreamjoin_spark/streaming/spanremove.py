"""Streaming duplicate-span removal: ExactSubstr-style cleaning at
ingest time, against an ACCUMULATED gram index — a newly arrived
document loses every k-token span the pipeline has EVER seen (plus
within-batch duplicates), without rescanning the corpus. The streaming
twin of `functions/dedup.py::remove_duplicate_spans`, completing the
ingest-time dedup family (exact: `stream_dedup`; near-dup:
`neardup.py`; benchmark: `decontaminate.py`; substring: here).

Per micro-batch (foreachBatch):
1. gram the batch with the SAME kernels as the batch operator
   (`_span_toked` / `_span_grams`);
2. cross-batch deletions = batch occurrences of any gram already in
   the index (first-seen-wins: the index occurrence preceded, so every
   batch occurrence is non-canonical — no counts or positions needed,
   the index is just the distinct gram SET);
3. within-batch deletions = the batch operator's canonical election
   (`_span_election_dels`) over the grams NOT in the index — grams the
   index already covers were fully deleted in step 2 and must not
   elect a batch-local survivor;
4. reassemble the batch docs from surviving positions
   (`_span_reassemble`) into a per-batch overwrite sink
   (replay-idempotent);
5. the index advances one version (old ∪ distinct new grams), with
   the same pre-N-base versioning as `streaming/cdc.py`, so a
   redelivered batch rebuilds against the index state it originally
   saw.

When batches arrive in ascending doc_id ranges, first-seen order
equals the batch operator's (doc_id, pos) canonical order and the
per-batch sinks union to EXACTLY the batch answer — which is how
`q_stream_remove_spans` shares `q_remove_spans`'s DuckDB oracle.

Scale: the index is the corpus's distinct gram set — at 100 TB use
``hashed=True`` (8-byte grams), bucket the index table by gram so the
per-batch semi-join prunes, and replace full-rewrite versioning with
partitioned appends + manifest (same note as streaming CDC/neardup).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myasynstreamjoin_spark.blocks import scoped_batch
from myasynstreamjoin_spark.streaming.cdc import replay_base_version


def clean_batch_against_index(
    batch_df: DataFrame,
    grams_dir: str,
    batch_id: int,
    k: int = 8,
    hashed: bool | str = False,
):
    """The shared micro-batch kernel of the streaming span-removal
    family (used here and by `streaming/pipeline_e2e.py`): clean
    ``batch_df`` against the accumulated gram index at
    ``{grams_dir}/v{N}``. Returns ``(cleaned, commit_index)`` where
    ``cleaned`` is (doc_id, n_tokens, n_removed, text_clean) and
    ``commit_index()`` advances the versioned index to v{batch_id} —
    call it LAST in the batch, after every other sink commits, so a
    crash replays the batch against the exact state it originally
    saw (`replay_base_version` is strictly-below).

    The internal snapshot→release pair is lock-free: direct callers
    must not run concurrently with another batch body on the same
    SparkContext (blocks.py constraint). The stream runners wrap each
    batch in ``blocks.batch_scope``, which enforces this."""
    from myasynstreamjoin_spark.functions.dedup import (
        _span_election_dels,
        _span_grams,
        _span_reassemble,
        _span_toked,
    )

    from myasynstreamjoin_spark.blocks import (
        ckpt_disk,
        persisted_ids,
        release_blocks,
    )

    bid = int(batch_id)
    bspark = batch_df.sparkSession
    # snapshot BEFORE any of this batch's checkpoints: commit_index()
    # releases everything persisted after this point — grams, toked,
    # the span election's internal checkpoint, and any post-kernel
    # checkpoint the caller makes before committing (see
    # myasynstreamjoin_spark/blocks.py for why DataFrame.unpersist
    # cannot do this and why DISK_ONLY is the corpus-grain rule).
    pre_batch = persisted_ids(bspark)
    toked = _span_toked(batch_df)
    grams = ckpt_disk(_span_grams(toked, k, hashed))

    base_v = replay_base_version(grams_dir, bid)
    new_index = grams.select("gram").distinct()
    if base_v is not None:
        old_index = bspark.read.parquet(os.path.join(grams_dir, f"v{base_v}"))
    else:
        old_index = bspark.createDataFrame([], new_index.schema)

    cross_dels = grams.join(old_index, "gram", "left_semi").select(
        "doc_id",
        F.explode(
            F.sequence(F.col("pos"), F.col("pos") + F.lit(k - 1))
        ).alias("pos"),
    )
    fresh = grams.join(old_index, "gram", "left_anti")
    dels = _span_election_dels(fresh, k, disk=True).unionByName(cross_dels)
    cleaned = _span_reassemble(toked, dels)

    def commit_index() -> None:
        old_index.unionByName(new_index).distinct().write.mode(
            "overwrite"
        ).parquet(os.path.join(grams_dir, f"v{bid}"))
        # the contract says commit LAST: every sink that consumes this
        # batch's frames has already materialized, so release ALL of
        # the batch's checkpoint blocks synchronously (RDD-level —
        # DataFrame.unpersist is a no-op for localCheckpoint storage).
        release_blocks(bspark, pre_batch)

    return cleaned, commit_index


def run_stream_remove_spans(
    docs: DataFrame,
    spark: SparkSession,
    work_dir: str,
    checkpoint_dir: str,
    k: int = 8,
    hashed: bool | str = False,
) -> None:
    """Drain a (bounded, for tests) document stream; cleaned docs
    appear under ``{work_dir}/clean/b{N}``, the gram-index versions
    under ``{work_dir}/grams/v{N}``."""
    clean_dir = os.path.join(work_dir, "clean")
    grams_dir = os.path.join(work_dir, "grams")

    @scoped_batch
    def process(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        cleaned, commit_index = clean_batch_against_index(
            batch_df, grams_dir, bid, k, hashed
        )
        cleaned.write.mode("overwrite").parquet(
            os.path.join(clean_dir, f"b{bid}")
        )
        commit_index()

    q = (
        docs.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(process)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def read_clean_docs(spark: SparkSession, work_dir: str) -> DataFrame | None:
    clean_dir = os.path.join(work_dir, "clean")
    if not os.path.isdir(clean_dir):
        return None
    # only COMMITTED batch dirs (Spark's _SUCCESS marker), mirroring
    # latest_version's convention — a crash mid-write leaves a
    # half-written b{N} whose partial rows the replay will rewrite
    dirs = [
        os.path.join(clean_dir, d)
        for d in os.listdir(clean_dir)
        if d.startswith("b")
        and os.path.exists(os.path.join(clean_dir, d, "_SUCCESS"))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)
