"""Z-order (Morton) clustering key for multi-dimensional data layout.

Beyond-reference surface: the reference's only layout control is its
custom shuffle partitioners (SURVEY.md §2.3), which cluster ONE key.
A 100 TB table queried by two independent predicates (e.g. part AND
supplier, user AND time) can't be range-sorted for both — but sorting
by the bit-interleaved z-value keeps rows close in BOTH dimensions, so
parquet row-group min/max statistics prune scans for either predicate.
This is the same layout trick Delta/Iceberg `OPTIMIZE ZORDER BY` uses,
built here from plain column expressions.

Everything is closed-form bit arithmetic (shift/and/or in whole-stage
codegen): rank-scale each dimension into ``bits`` bits against its
global min/max (one tiny agg row, broadcast — no collect), then
interleave. The identical expression is emitted as SQL text for the
DuckDB oracle (``zvalue_sql``), so the layout key is engine-portable
and hash-checked like any other operator.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rank(x: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Scale x into [0, 2^bits) against [lo, hi]; degenerate range → 0."""
    top = (1 << bits) - 1
    r = F.floor((x.cast("double") - lo) * top / (hi - lo)).cast("int")
    return F.when(hi == lo, F.lit(0)).otherwise(r)


def _interleave(ra: Column, rb: Column, bits: int) -> Column:
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(ra, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(rb, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(lambda a, b: a + b, terms)  # disjoint bits: + == OR


def with_zvalue(
    df: DataFrame,
    col_a: str,
    col_b: str,
    bits: int = 10,
    out_col: str = "zv",
) -> DataFrame:
    """Append rank columns (``ra``, ``rb``) and the interleaved
    z-value ``out_col`` in [0, 4^bits). One pass: a single min/max agg
    row is broadcast-joined back (no driver collect), then the z-value
    is a pure projection.
    """
    bounds = df.agg(
        F.min(F.col(col_a).cast("double")).alias("__alo"),
        F.max(F.col(col_a).cast("double")).alias("__ahi"),
        F.min(F.col(col_b).cast("double")).alias("__blo"),
        F.max(F.col(col_b).cast("double")).alias("__bhi"),
    )
    ra = _rank(F.col(col_a), F.col("__alo"), F.col("__ahi"), bits)
    rb = _rank(F.col(col_b), F.col("__blo"), F.col("__bhi"), bits)
    return (
        df.crossJoin(F.broadcast(bounds))
        .withColumn("ra", ra)
        .withColumn("rb", rb)
        .withColumn(out_col, _interleave(F.col("ra"), F.col("rb"), bits))
        .drop("__alo", "__ahi", "__blo", "__bhi")
    )


def zvalue_sql(table: str, col_a: str, col_b: str, bits: int = 10) -> str:
    """The DuckDB-SQL twin of :func:`with_zvalue`: emits a query
    producing (*, ra, rb, zv) over ``table`` with identical arithmetic,
    for oracle checks."""
    top = (1 << bits) - 1
    interleave = " + ".join(
        f"(((ra >> {i}) & 1) << {2 * i}) + (((rb >> {i}) & 1) << {2 * i + 1})"
        for i in range(bits)
    )
    return f"""
        WITH __bounds AS (
          SELECT CAST(min({col_a}) AS DOUBLE) AS alo, CAST(max({col_a}) AS DOUBLE) AS ahi,
                 CAST(min({col_b}) AS DOUBLE) AS blo, CAST(max({col_b}) AS DOUBLE) AS bhi
          FROM {table}),
        __ranked AS (
          SELECT t.*,
            CASE WHEN ahi = alo THEN 0 ELSE
              CAST(floor((CAST({col_a} AS DOUBLE) - alo) * {top} / (ahi - alo)) AS INT)
            END AS ra,
            CASE WHEN bhi = blo THEN 0 ELSE
              CAST(floor((CAST({col_b} AS DOUBLE) - blo) * {top} / (bhi - blo)) AS INT)
            END AS rb
          FROM {table} t, __bounds)
        SELECT *, {interleave} AS zv FROM __ranked
    """


def write_zordered(
    df: DataFrame,
    path: str,
    col_a: str,
    col_b: str,
    n_files: int = 32,
    bits: int = 10,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet clustered by z-value: range-partition on
    ``zv`` (one shuffle, contiguous z-ranges per file) and sort within
    partitions, so each file covers a small rectangle of (a, b) space
    and parquet min/max stats prune scans filtered on EITHER column.
    The helper z-columns are dropped from the written schema.
    """
    zdf = with_zvalue(df, col_a, col_b, bits=bits)
    (
        zdf.repartitionByRange(n_files, "zv")
        .sortWithinPartitions("zv")
        .drop("ra", "rb", "zv")
        .write.mode(mode)
        .parquet(path)
    )


def file_skipping_stats(
    spark, path: str, cols: list[str]
) -> "DataFrame":
    """Per-file min/max/count manifest — the data-skipping index a
    lakehouse keeps (Delta stats / Iceberg manifests) so a filtered
    query prunes files before opening them. Pairs with
    ``write_zordered``: after a z-ordered rewrite each file covers a
    small rectangle of the clustered keys, and THIS table is what
    makes that layout actionable.

    Implementation: the scan's ``_metadata.file_name`` hidden column
    grouped per file — one pass, stats computed where the data lives;
    the output is #files rows (catalog-sized, not data-sized).

    Output: (file_name, n_rows, min_<c>, max_<c> per requested col).
    """
    df = spark.read.parquet(path)
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for c in cols:
        aggs += [F.min(c).alias(f"min_{c}"), F.max(c).alias(f"max_{c}")]
    return (
        df.groupBy(F.col("_metadata.file_name").alias("file_name"))
        .agg(*aggs)
    )
