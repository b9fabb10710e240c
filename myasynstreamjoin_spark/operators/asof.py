"""As-of join: each left row matched to the latest right row with
right_ts ≤ left_ts per key — the temporal join Spark's built-in
operators lack (SURVEY.md §2.5 notes the reference has no range/as-of
join either; this is part of the beyond-reference surface, the
standard primitive for point-in-time feature lookup).

Scale design — why NOT the obvious formulations:
- equi-join on key + range predicate explodes to |L|·|R| per key
  before the filter, then needs a per-left-row argmax: quadratic in
  the per-key row counts.
- a windowed self-join (bucket ts, join adjacent buckets) bounds the
  blowup but still double-shuffles and mishandles sparse keys.

The union trick instead: tag both sides, union them, sort within key
by (ts, right-before-left), and carry the last non-null right value
forward with an unbounded-preceding window. ONE shuffle on the key,
linear work, and Spark's window operator spills — 100 TB safe. Ties
(right_ts == left_ts) match, same as DuckDB/QuestDB/kdb ASOF
semantics; callers must pre-deduplicate multiple right rows per
(key, ts) or the carried value among equal timestamps is unspecified.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    right_vals: list[str],
    prefix: str = "r_",
) -> DataFrame:
    """Left as-of join.

    Output: every ``left`` row (all its columns), plus for each v in
    ``right_vals`` a ``{prefix}{v}`` column and ``{prefix}{right_ts}``,
    from the latest right row with ``right_ts`` ≤ ``left_ts`` on the
    same key (nulls when no such row exists).
    """
    left_cols = [c for c in left.columns]
    l_tagged = left.select(
        *left_cols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast("long").alias("__rts"),
        *[F.lit(None).cast(right.schema[v].dataType).alias(f"__v_{v}") for v in right_vals],
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols if c not in on],
        *on,
        F.col(right_ts).cast("long").alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.col(right_ts).cast("long").alias("__rts"),
        *[F.col(v).alias(f"__v_{v}") for v in right_vals],
    )
    unioned = l_tagged.unionByName(r_tagged)
    # right rows (__is_left=0) sort before left rows at equal ts, so an
    # equal-timestamp right row is visible to the left row's carry.
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *left_cols,
        "__is_left",
        F.last("__rts", ignorenulls=True).over(w).alias(f"{prefix}{right_ts}"),
        *[
            F.last(f"__v_{v}", ignorenulls=True).over(w).alias(f"{prefix}{v}")
            for v in right_vals
        ],
    )
    return carried.where(F.col("__is_left") == 1).drop("__is_left")
