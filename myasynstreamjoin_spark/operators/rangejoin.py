"""Interval/range join: points joined to every interval containing
them (``start <= point <= end``). Spark has no native range-join
strategy — a raw non-equi join plans as BroadcastNestedLoopJoin
(quadratic, OOM-prone at scale), so this is part of the
beyond-reference surface alongside the as-of join (operators/asof.py).

Scale design — bucketize to manufacture an equi-key: intervals are
exploded to every fixed-width bucket they overlap, points map to
exactly one bucket, and the join becomes an equi-join on bucket id
(shuffle- or broadcast-hash, AQE-skew-splittable) followed by the
exact range refinement. Each (interval, point) pair is produced at
most once because a point lives in one bucket. Replication factor is
len(interval)/bucket_width + 1 — pick ``bucket_width`` near the
typical interval length; per-bucket fan-in stays bounded, so the plan
survives a 100× scale-up where the nested-loop would not.

All arithmetic is integer (``div``), never float division: bucket ids
of epoch-ns values exceed a double's 2^53 exact-integer range.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    bucket_width: int,
) -> DataFrame:
    """Inner-join every point to every interval with
    ``start_col <= point_col <= end_col`` (inclusive ends, integer
    columns). Column names of the two inputs must be disjoint; output
    has all columns of both sides.
    """
    p = points.withColumn("__b", F.expr(f"{point_col} div {bucket_width}"))
    i = intervals.withColumn(
        "__b",
        F.explode(
            F.sequence(
                F.expr(f"{start_col} div {bucket_width}"),
                F.expr(f"{end_col} div {bucket_width}"),
            )
        ),
    )
    return (
        i.join(p, on="__b")
        .where(F.col(point_col).between(F.col(start_col), F.col(end_col)))
        .drop("__b")
    )
