"""Streaming weighted reservoir: Efraimidis–Spirakis sampling over a
document stream — the k-row quality-weighted training sample is
maintained INCREMENTALLY as batches arrive, and equals the batch
sampler's answer under ANY batch split (not just ascending feeds).

That exactness is the algorithm's defining property: the selection
key ln(u)/w is a pure function of (row id, weight), so
``top-k(A ∪ B) = top-k(top-k(A) ∪ top-k(B))`` — an order-free,
idempotent merge. The reservoir is therefore just "union the batch's
candidates with the saved k rows, keep the top k", with none of the
first-seen-order caveats the line/span streams carry. This is why
`q_stream_weighted_sample` shares `q_weighted_sample`'s oracle with
an UNORDERED (hash) split.

State: one parquet version per batch, ≤ k rows each (schema = input
columns + the __wkey the merge orders by), with the pre-N-base replay
versioning shared with the CDC/near-dup/span/line streams. At 100 TB
the reservoir is k rows — driver-tiny; the per-batch cost is the
batch's own scan + a k-row TakeOrderedAndProject, no corpus state at
all.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from myasynstreamjoin_spark.streaming.cdc import drain_foreach_batch, latest_version, replay_base_version


def sample_batch_with_reservoir(
    batch_df: DataFrame,
    state_dir: str,
    batch_id: int,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
):
    """The micro-batch kernel: merge ``batch_df`` into the reservoir
    at ``{state_dir}/v{N}``. Returns ``commit_state()`` which writes
    v{batch_id} = top-k of (old reservoir ∪ batch candidates) by the
    shared `wrs_key` — the same filter and tie-break as the batch
    sampler, so the final reservoir IS `weighted_sample_k`'s answer."""
    from myasynstreamjoin_spark.functions.pipeline import wrs_key

    bid = int(batch_id)
    bspark = batch_df.sparkSession
    w = F.col(weight_col)
    cand = batch_df.where(
        (w > 0) & ~F.isnan(w.cast("double"))
    ).withColumn("__wkey", wrs_key(weight_col, id_col))

    base_v = replay_base_version(state_dir, bid)
    if base_v is not None:
        old = bspark.read.parquet(os.path.join(state_dir, f"v{base_v}"))
    else:
        old = bspark.createDataFrame([], cand.schema)

    merged = (
        old.unionByName(cand)
        .orderBy(F.desc("__wkey"), F.asc(id_col))
        .limit(k)
    )

    def commit_state() -> None:
        merged.write.mode("overwrite").parquet(
            os.path.join(state_dir, f"v{bid}")
        )

    return commit_state


def run_stream_weighted_sample(
    docs: DataFrame,
    spark: SparkSession,
    work_dir: str,
    checkpoint_dir: str,
    weight_col: str,
    k: int,
    id_col: str = "doc_id",
) -> None:
    """Drain a (bounded, for tests) document stream; reservoir
    versions appear under ``{work_dir}/reservoir/v{N}``."""
    state_dir = os.path.join(work_dir, "reservoir")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        commit_state = sample_batch_with_reservoir(
            batch_df, state_dir, int(batch_id), weight_col, k, id_col
        )
        commit_state()

    drain_foreach_batch(docs, checkpoint_dir, process)


def read_sample(spark: SparkSession, work_dir: str) -> DataFrame | None:
    """The current sample: the LATEST committed reservoir version,
    with the merge key dropped (schema = the sampled input rows)."""
    state_dir = os.path.join(work_dir, "reservoir")
    v = latest_version(state_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(state_dir, f"v{v}")).drop(
        "__wkey"
    )
