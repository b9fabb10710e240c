"""Streaming line dedup: C4-style keep-first LINE cleaning at ingest
time, against an ACCUMULATED line index — a newly arrived document
loses every line the pipeline has EVER seen (plus within-batch later
occurrences), without rescanning the corpus. The streaming twin of
`functions/lines.py::line_dedup`, completing the ingest-time dedup
family at line granularity (exact docs: `stream_dedup`; near-dup:
`neardup.py`; spans: `spanremove.py`; lines: here).

Per micro-batch (foreachBatch):
1. segment the batch with the SAME `doc_lines` kernel as the batch
   operator;
2. cross-batch drops = every batch occurrence of a line already in
   the index (first-seen-wins: the index occurrence preceded, so no
   counts or positions are needed — the index is the distinct line
   SET, like the span stream's gram set);
3. within-batch drops = the batch operator's min-struct election over
   the lines NOT in the index;
4. reassemble via the shared `_line_reassemble` into a per-batch
   overwrite sink (replay-idempotent);
5. the index advances one version (old ∪ distinct new lines) with the
   pre-N-base versioning shared with CDC/near-dup/span streams, so a
   redelivered batch rebuilds against the state it originally saw.

When batches arrive in ascending doc_id ranges, first-seen order
equals the batch operator's (doc_id, line_no) order and the per-batch
sinks union to EXACTLY the batch answer — which is how
`q_stream_line_dedup` shares `q_line_dedup`'s DuckDB oracle.

Scale: the index is the corpus's distinct line set; at 100 TB persist
it as the bucketed `write_line_index` table (partitioned appends +
manifest instead of full-rewrite versioning — same note as the CDC
and near-dup streams) and probe bucket-locally.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myasynstreamjoin_spark.blocks import scoped_batch
from myasynstreamjoin_spark.streaming.cdc import drain_foreach_batch, replay_base_version


def dedup_batch_against_lines(
    batch_df: DataFrame,
    index_dir: str,
    batch_id: int,
    width: int | None = 12,
    delim: str = "\n",
    min_chars: int = 1,
):
    """The micro-batch kernel: clean ``batch_df`` against the
    accumulated line index at ``{index_dir}/v{N}``. Returns
    ``(cleaned, commit_index)`` where ``cleaned`` is (doc_id, n_lines,
    n_removed, text_clean) — the batch operator's exact schema — and
    ``commit_index()`` advances the versioned index to v{batch_id};
    call it LAST, after every other sink commits.

    The internal snapshot→release pair is lock-free: direct callers
    must not run concurrently with another batch body on the same
    SparkContext (blocks.py constraint). ``run_stream_line_dedup``
    wraps each batch in ``blocks.batch_scope``, which enforces this."""
    from myasynstreamjoin_spark.functions.lines import (
        _line_reassemble,
        doc_lines,
    )

    from myasynstreamjoin_spark.blocks import (
        ckpt_disk,
        persisted_ids,
        release_blocks,
    )

    bid = int(batch_id)
    bspark = batch_df.sparkSession
    sep = " " if width is not None else delim
    # corpus-grain rule + end-of-batch block release — see
    # myasynstreamjoin_spark/blocks.py (round-7 streaming-e2e finding)
    pre_batch = persisted_ids(bspark)
    lines = ckpt_disk(doc_lines(batch_df, width, delim))
    cand = lines.where(F.length("line") >= min_chars).select(
        "line", "doc_id", "line_no"
    )

    base_v = replay_base_version(index_dir, bid)
    new_index = cand.select("line").distinct()
    if base_v is not None:
        old_index = bspark.read.parquet(os.path.join(index_dir, f"v{base_v}"))
    else:
        old_index = bspark.createDataFrame([], new_index.schema)

    cross_drops = cand.join(old_index, "line", "left_semi").select(
        "doc_id", "line_no"
    )
    fresh = cand.join(old_index, "line", "left_anti")
    first = fresh.groupBy("line").agg(
        F.min(F.struct("doc_id", "line_no")).alias("first"),
        F.count("*").alias("__c"),
    )
    within_drops = (
        fresh.join(first.where(F.col("__c") >= 2), "line")
        .where(
            ~(
                (F.col("doc_id") == F.col("first.doc_id"))
                & (F.col("line_no") == F.col("first.line_no"))
            )
        )
        .select("doc_id", "line_no")
    )
    cleaned = _line_reassemble(
        lines, cross_drops.unionByName(within_drops), sep
    )

    def commit_index() -> None:
        old_index.unionByName(new_index).distinct().write.mode(
            "overwrite"
        ).parquet(os.path.join(index_dir, f"v{bid}"))
        # commit runs LAST: every sink has materialized — release the
        # batch's checkpoint blocks at the RDD level (DataFrame
        # .unpersist is a no-op for localCheckpoint storage).
        release_blocks(bspark, pre_batch)

    return cleaned, commit_index


def run_stream_line_dedup(
    docs: DataFrame,
    spark: SparkSession,
    work_dir: str,
    checkpoint_dir: str,
    width: int | None = 12,
    delim: str = "\n",
    min_chars: int = 1,
) -> None:
    """Drain a (bounded, for tests) document stream; cleaned docs
    appear under ``{work_dir}/clean/b{N}``, the line-index versions
    under ``{work_dir}/lines/v{N}``."""
    clean_dir = os.path.join(work_dir, "clean")
    index_dir = os.path.join(work_dir, "lines")

    @scoped_batch
    def process(batch_df: DataFrame, batch_id: int) -> None:
        bid = int(batch_id)
        cleaned, commit_index = dedup_batch_against_lines(
            batch_df, index_dir, bid, width, delim, min_chars
        )
        cleaned.write.mode("overwrite").parquet(
            os.path.join(clean_dir, f"b{bid}")
        )
        commit_index()

    drain_foreach_batch(docs, checkpoint_dir, process)


def read_clean_docs(spark: SparkSession, work_dir: str) -> DataFrame | None:
    """Union of the COMMITTED (_SUCCESS) per-batch cleaned sinks."""
    clean_dir = os.path.join(work_dir, "clean")
    if not os.path.isdir(clean_dir):
        return None
    dirs = [
        os.path.join(clean_dir, d)
        for d in os.listdir(clean_dir)
        if d.startswith("b")
        and os.path.exists(os.path.join(clean_dir, d, "_SUCCESS"))
    ]
    if not dirs:
        return None
    return spark.read.parquet(*dirs)
