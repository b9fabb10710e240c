"""CDC / MERGE: apply a change feed (upserts + deletes) to a base
snapshot — the lakehouse ingest operator (Delta/Iceberg ``MERGE INTO``
semantics) a 100 TB pipeline runs every batch to keep a mutable table
current from an immutable log.

Beyond-reference surface (SURVEY.md §7 phase 5): the reference engine
is append-only streams; this is the batch-side completion of its
latest-row compaction (``relational.latest_snapshot``) into a full
merge: latest change per key wins, ``D`` tombstones remove the key,
untouched base rows pass through.

Scale shape: the base table NEVER shuffles. The change feed (per-batch,
orders of magnitude smaller than the base) reduces to one row per key
via a max_by struct aggregate (O(1) state, map-side combined), and the
touched-key set broadcasts into a left-anti join against the base — a
broadcast hash anti-join that pipelines with the base scan. Only when a
change batch is itself huge (backfill) should ``broadcast_keys=False``
fall back to a shuffled anti-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cdc_apply(
    base: DataFrame,
    changes: DataFrame,
    keys: tuple[str, ...],
    order_cols: tuple[str, ...],
    op_col: str = "op",
    broadcast_keys: bool = True,
) -> DataFrame:
    """Merge ``changes`` into ``base`` and return the new snapshot.

    ``changes`` carries the base's data columns plus ``op_col`` (``'I'``
    / ``'U'`` upsert, ``'D'`` delete) and ``order_cols`` (a PER-KEY
    strict ordering — e.g. a change sequence number — so "latest" is
    deterministic on any engine; ties would make the merge ambiguous).
    The latest change per key decides that key's fate; earlier changes
    to the same key are superseded (a delete followed by a later upsert
    resurrects the key).

    Output: the merged snapshot, base schema.
    """
    data_cols = base.columns
    ord_ = F.struct(*[F.col(c) for c in order_cols])
    row = F.max_by(
        F.struct(*[F.col(c) for c in (*data_cols, op_col)]), ord_
    )
    latest = (
        changes.groupBy(*keys)
        .agg(row.alias("__r"))
        .select("__r.*")
    )
    touched = latest.select(*keys)
    if broadcast_keys:
        touched = F.broadcast(touched)
    kept = base.join(touched, list(keys), "left_anti")
    upserts = latest.where(F.col(op_col) != "D").select(*data_cols)
    return kept.unionByName(upserts)


def incremental_agg_refresh(
    old_agg: DataFrame,
    changes: DataFrame,
    keys: tuple[str, ...],
    count_col: str = "cnt",
    op_col: str = "op",
) -> DataFrame:
    """Incremental materialized-view maintenance for per-key COUNTS:
    refresh ``old_agg`` (keys → cnt) from a change feed without
    touching the base table — Δ-maintenance, the reason a 100 TB
    aggregate can stay current from a feed that is orders of magnitude
    smaller than a recompute scan.

    Feed semantics: ``'I'`` adds a row to its key, ``'D'`` removes one
    (the feed carries the before-image, as CDC feeds do); updates that
    change a key arrive as D(old key) + I(new key), and updates that
    keep the key don't change counts, so ``'U'`` rows are count-neutral
    and ignored. Keys whose count reaches zero drop out of the view.

    Scale shape: the delta aggregate is feed-sized; the view is
    refreshed with one outer join on the key — at scale, co-partition
    the view and the delta on the key (bucketed view table) so the
    refresh is exchange-free. All-integer arithmetic: refresh order
    never changes the result, and refreshing with the full feed equals
    recomputing from scratch (pytest-pinned).

    Output: the refreshed (keys → cnt) view.
    """
    delta = (
        changes.where(F.col(op_col).isin("I", "D"))
        .groupBy(*keys)
        .agg(
            F.sum(
                F.when(F.col(op_col) == "I", F.lit(1)).otherwise(F.lit(-1))
            ).alias("__d")
        )
    )
    return (
        old_agg.join(delta, list(keys), "full_outer")
        .select(
            *keys,
            (
                F.coalesce(F.col(count_col), F.lit(0).cast("long"))
                + F.coalesce(F.col("__d"), F.lit(0))
            ).cast("long").alias(count_col),
        )
        .where(F.col(count_col) > 0)
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: tuple[str, ...],
    compare_cols: tuple[str, ...] | None = None,
) -> DataFrame:
    """Table-version diff: classify every key as ``added`` / ``removed``
    / ``changed`` between two snapshots — the reverse of ``cdc_apply``
    (snapshot pair → change feed), used for replication audits, data-
    contract regression checks, and generating a MERGE feed from full
    re-extracts when the upstream has no CDC log.

    Unchanged keys are dropped (at 100 TB they are ~all keys, so the
    output is change-sized, not table-sized). Comparison is an md5 over
    the concat of ``compare_cols`` (default: all non-key columns,
    sorted) computed BEFORE the join — the join then carries one
    16-byte digest per side instead of the full rows, and the equality
    test is engine-portable. NULLs are digest-distinct from empty
    strings (a NULL marker token per column).

    Scale shape: one full-outer shuffle join on the key columns — the
    minimal possible plan for a diff; both sides pre-project to
    (keys, digest) so the shuffle moves keys + 16 bytes per row.

    Output: (*keys, change) with change ∈ {'added','removed','changed'}.
    """
    cols = compare_cols or tuple(
        sorted(c for c in new.columns if c not in keys)
    )
    def digest(df: DataFrame):
        parts = []
        for c in cols:
            parts.append(F.coalesce(F.col(c).cast("string"), F.lit("\x00null")))
        return F.md5(F.encode(F.concat_ws("\x01", *parts), "UTF-8"))

    o = old.select(*keys, digest(old).alias("__ho"))
    n = new.select(*keys, digest(new).alias("__hn"))
    j = o.join(n, list(keys), "full_outer")
    change = (
        F.when(F.col("__ho").isNull(), F.lit("added"))
        .when(F.col("__hn").isNull(), F.lit("removed"))
        .when(F.col("__ho") != F.col("__hn"), F.lit("changed"))
    )
    return (
        j.select(*keys, change.alias("change"))
        .where(F.col("change").isNotNull())
    )
