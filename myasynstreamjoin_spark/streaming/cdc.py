"""Streaming CDC: apply a change-feed STREAM to a versioned parquet
snapshot — the continuous ``MERGE INTO`` a lakehouse runs to keep a
mutable table current from an append-only log (the streaming completion
of :mod:`myasynstreamjoin_spark.operators.cdc`).

Snapshot layout: ``{snapshot_dir}/v{batch_id}`` per applied micro-batch;
the live table is the highest version. Each ``foreachBatch`` merges the
batch into the LATEST VERSION BELOW ITS OWN BATCH ID — that base choice
is what makes replays idempotent: if batch N is re-delivered after a
crash, it re-reads the same pre-N base and overwrites ``v{N}`` with the
identical result (exactly-once snapshots on top of at-least-once batch
delivery).

Ordering semantics: the change LOG's arrival order is the order of
authority across batches (standard for CDC feeds); ``order_cols``
resolve races only WITHIN a batch (via ``cdc_apply``'s max_by). A feed
that can deliver out of order across batches needs a monotone version
column and MERGE-time conflict checks instead.

Scale shape: per batch, the base side is a plain parquet scan that
never shuffles (``cdc_apply`` broadcasts the batch's touched keys into
a left-anti join) and the output rewrite is the same full-copy a
naive lakehouse does — at 100 TB, partition the snapshot by a key
range and rewrite only partitions the batch touches (the optimization
is orthogonal to the merge semantics tested here).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from myasynstreamjoin_spark.operators.cdc import cdc_apply

_VERSION_RE = re.compile(r"^v(\d+)$")


def replay_base_version(snapshot_dir: str, batch_id: int) -> int | None:
    """The version a (possibly replayed) micro-batch must rebuild
    against: the highest committed version STRICTLY BELOW its own
    batch id. On first delivery no version ≥ batch_id exists yet, so
    this is simply the latest; on redelivery it skips the batch's own
    (possibly half-written) version and lands on the state the batch
    originally saw — the one call that replaces the old two-step
    "latest ≤ bid, fall back if it IS bid" dance (provably equivalent:
    the fallback fired exactly when the max ≤ bid was bid itself, and
    both paths then return the max < bid). Shared by the CDC,
    near-dup, and span-removal streams."""
    return latest_version(snapshot_dir, below=int(batch_id))


def latest_version(snapshot_dir: str, below: int | None = None) -> int | None:
    """Highest committed snapshot version (optionally below a batch id).

    A version is committed iff Spark's ``_SUCCESS`` marker exists —
    a crash mid-write leaves no marker and the replay overwrites it.
    """
    if not os.path.isdir(snapshot_dir):
        return None
    best = None
    for name in os.listdir(snapshot_dir):
        m = _VERSION_RE.match(name)
        if not m:
            continue
        v = int(m.group(1))
        if below is not None and v >= below:
            continue
        if not os.path.exists(os.path.join(snapshot_dir, name, "_SUCCESS")):
            continue
        best = v if best is None or v > best else best
    return best


def read_snapshot(spark: SparkSession, snapshot_dir: str) -> DataFrame | None:
    """The live table: the highest committed version, or None."""
    v = latest_version(snapshot_dir)
    if v is None:
        return None
    return spark.read.parquet(os.path.join(snapshot_dir, f"v{v}"))


def run_cdc_stream(
    changes: DataFrame,
    snapshot_dir: str,
    checkpoint_dir: str,
    keys: tuple[str, ...],
    order_cols: tuple[str, ...],
    op_col: str = "op",
) -> None:
    """Drain a (bounded, for tests) change stream into the snapshot.

    ``changes`` is a streaming DataFrame carrying the snapshot's data
    columns plus ``op_col`` and ``order_cols``. Each micro-batch is
    merged with ``cdc_apply`` and written as the next version.
    """
    data_cols = [
        c for c in changes.columns if c != op_col and c not in order_cols
    ]

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        base_v = replay_base_version(snapshot_dir, batch_id)
        if base_v is None:
            base = spark.createDataFrame(
                [], batch_df.select(*data_cols).schema
            )
        else:
            base = spark.read.parquet(
                os.path.join(snapshot_dir, f"v{base_v}")
            )
        merged = cdc_apply(
            base, batch_df, keys=keys, order_cols=order_cols, op_col=op_col
        )
        merged.write.mode("overwrite").parquet(
            os.path.join(snapshot_dir, f"v{int(batch_id)}")
        )

    q = (
        changes.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(apply_batch)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()


def vacuum_snapshots(snapshot_dir: str, keep: int = 2) -> list[int]:
    """Delete all but the newest ``keep`` committed snapshot versions
    (the VACUUM every versioned table needs, or storage grows one full
    copy per micro-batch). Never touches the live version; uncommitted
    directories (no ``_SUCCESS``) are removed too — they are failed
    writes a later replay has superseded.

    ``keep`` must be ≥ 2 while the stream can still replay: the
    replay-idempotency contract re-merges a redelivered batch against
    the version BELOW it — vacuuming that base away would make the
    replay rebuild from an empty table and silently drop the rest of
    the snapshot. Only a cleanly-stopped table (checkpoint committed
    past the last batch) could safely keep 1; this API refuses the
    footgun outright.

    Returns the version numbers removed.
    """
    import shutil

    if keep < 2:
        raise ValueError(
            "keep must be >= 2: the newest version's replay base must "
            "survive vacuum (see run_cdc_stream's idempotency contract)"
        )
    if not os.path.isdir(snapshot_dir):
        return []
    committed = []
    removed = []
    for name in os.listdir(snapshot_dir):
        m = _VERSION_RE.match(name)
        if not m:
            continue
        v = int(m.group(1))
        if os.path.exists(os.path.join(snapshot_dir, name, "_SUCCESS")):
            committed.append(v)
        else:
            shutil.rmtree(os.path.join(snapshot_dir, name))
            removed.append(v)
    for v in sorted(committed)[:-keep]:
        shutil.rmtree(os.path.join(snapshot_dir, f"v{v}"))
        removed.append(v)
    return sorted(removed)


def drain_foreach_batch(docs, checkpoint_dir: str, process) -> None:
    """The shared drain loop of every accumulated-index / stateful
    foreachBatch stream in this package: run the (bounded, for tests)
    stream to exhaustion and stop. Factored so the replay-safety
    contract (checkpointLocation + processAllAvailable + stop in a
    finally) lives in one place; the older stream modules predate it
    and still inline the identical block."""
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
