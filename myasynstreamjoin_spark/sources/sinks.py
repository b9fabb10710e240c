"""Batch sinks: partitioned and bucketed parquet writers.

The reference's only sinks are console prints and `foreachRDD(collect)`
(SURVEY.md §2.1 S3) — nothing a 100 TB pipeline can use. These writers
are the scale-path equivalents:

- ``write_partitioned``: hive-style directory partitioning; downstream
  filters on the partition column prune whole directories before any
  I/O happens (asserted in tests/test_sinks.py).
- ``write_bucketed``: pre-shuffles rows into a fixed number of buckets
  on the join/agg key at WRITE time, so every later join or aggregation
  on that key runs with NO exchange — the shuffle is paid once instead
  of per-query. This is the batch analog of the reference's
  co-partitioned state (state/.../MyMapWithStateWithIndexRDD.scala:215-227
  requires data and state to share a partitioner for the same reason).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as parquet partitioned by ``partition_cols``.

    Partition columns should be low-cardinality derivations (a date, a
    source id, a bucket of a timestamp): thousands of directories are
    fine, millions of tiny files are not. Combine with AQE coalescing
    (or an explicit ``df.repartition(*partition_cols)``) so each
    partition directory gets few, large files.
    """
    df.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
    single_file_per_bucket: bool = False,
) -> None:
    """Write ``df`` as a bucketed (and optionally sorted) table.

    ``n_buckets`` should match (a small multiple of) the cluster's
    shuffle parallelism; both sides of a co-located join must use the
    SAME bucket count and columns. Sorting within buckets additionally
    removes the sort from sort-merge joins. ``path`` makes it an
    external table (bucket metadata lives in the catalog either way —
    ``spark.table``, not a bare parquet read, is required to get the
    exchange-free plans).

    Overwrite is FAIL-SAFE: Spark's own CTAS-overwrite drops the old
    managed table before writing (verified — a failing write loses the
    previous data), so when ``table`` is live in the catalog the new
    data is written to a ``__masj_staging`` table first and swapped in
    (DROP + RENAME, metadata-only) only after the write commits. A
    failed write leaves the previous table untouched; a crash inside
    the tiny swap window leaves the data recoverable in the staging
    table. Overwriting an EXTERNAL table at the SAME ``path`` it
    already occupies cannot be staged safely, so it raises — pass a
    fresh path per version (or DROP first for an explicitly
    destructive rewrite).
    """
    import os
    import shutil

    spark = df.sparkSession
    target = table
    swap = False
    if mode == "overwrite":
        if spark.catalog.tableExists(table):
            if path is not None:
                # Staging writes to `path` IMMEDIATELY — if that is the
                # live table's own location, the old files would be
                # clobbered before the swap commits and the fail-safe
                # contract silently broken. Fail fast instead.
                cur = next(
                    (
                        r["data_type"]
                        for r in spark.sql(
                            f"DESCRIBE FORMATTED {table}"
                        ).collect()
                        if r["col_name"] == "Location"
                    ),
                    None,
                )

                def _norm(p: str) -> str:
                    import os

                    return os.path.abspath(
                        str(p).removeprefix("file:")
                    ).rstrip("/")

                if cur is not None and _norm(cur) == _norm(path):
                    raise ValueError(
                        f"write_bucketed overwrite of {table!r} at its "
                        "CURRENT external location would clobber the "
                        "live files before the swap commits — pass a "
                        "fresh path per version (or DROP the table "
                        "first for an explicitly destructive rewrite)"
                    )
            target = f"{table}__masj_staging"
            swap = True
            spark.sql(f"DROP TABLE IF EXISTS {target}")
        if path is None:
            # An interrupted prior session can leave a MANAGED table's
            # warehouse location on disk with no catalog entry (the
            # in-memory catalog died with the session); saveAsTable
            # then fails with LOCATION_ALREADY_EXISTS even in
            # overwrite mode. Clean up only that orphaned case.
            loc = os.path.join(
                spark.conf.get("spark.sql.warehouse.dir").removeprefix(
                    "file:"
                ),
                target,
            )
            if not spark.catalog.tableExists(target):
                shutil.rmtree(loc, ignore_errors=True)
    if single_file_per_bucket:
        # Place each bucket as exactly one file: repartition by the
        # same murmur-pmod bucketBy uses, so each write task holds one
        # bucket — the condition under which Spark TRUSTS the
        # within-bucket sort (session.py's bucketedTableScan
        # .outputOrdering) and consumer sort-merge joins on the bucket
        # key skip the table-side sort entirely. Appends add one new
        # file per bucket and (correctly) void the sort trust until
        # the next rebuild — the bucket-local JOIN plans survive
        # either way.
        from pyspark.sql import functions as _F

        df = df.repartition(n_buckets, *[_F.col(c) for c in bucket_cols])
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path is not None:
        w = w.option("path", path)
    w.format("parquet").saveAsTable(target)
    if swap:
        spark.sql(f"DROP TABLE {table}")
        spark.sql(f"ALTER TABLE {target} RENAME TO {table}")
    if single_file_per_bucket and mode != "append":
        # The one-file-per-bucket guarantee is what lets the scan
        # TRUST the within-bucket sort; it rests on the repartition
        # above surviving planning. Verify on the WRITTEN files (cheap
        # directory listing) so a planner/AQE regression fails the
        # build loudly instead of silently reintroducing per-join
        # sorts (round-11 advice). Appends are exempt: they add one
        # file per bucket by design and correctly void the sort trust
        # until the next rebuild.
        assert_single_file_per_bucket(spark, table)


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    n_buckets: int | None = None,
) -> None:
    """Re-register an EXISTING ``write_bucketed`` output directory as
    a bucketed external table in a fresh session's (in-memory)
    catalog.

    Bucket metadata lives only in the catalog, and this repo's local
    catalog dies with the session — so a prebuilt table (e.g. the
    graph edge table, built once and probed many times) was previously
    reachable only from the session that wrote it; any other session
    would pay the full rebuild. The files themselves carry everything
    needed to re-claim the layout: schema from the parquet footers and
    ``n_buckets`` from Spark's own ``part-*_NNNNN`` bucket-id naming
    (max id + 1 — exact whenever the top bucket is non-empty, which a
    murmur-placed table at probe scale always satisfies; pass
    ``n_buckets`` explicitly otherwise). The CREATE uses the same
    CLUSTERED/SORTED clause ``bucketBy``/``sortBy`` wrote with, so
    consumer plans (exchange-free joins, trusted within-bucket sort
    when each bucket is one file) come back identical — pinned in
    tests/test_graph_edges.py.
    """
    import os
    import re

    if n_buckets is None:
        ids = [
            int(m.group(1))
            for name in os.listdir(path)
            if (m := re.match(r"part-\d+-.*_(\d{5})(?:\.|$)", name))
        ]
        if not ids:
            raise ValueError(f"no bucketed parquet files under {path!r}")
        n_buckets = max(ids) + 1
    schema = spark.read.parquet(path).schema
    cols = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
    )
    bucket_sql = ", ".join(f"`{c}`" for c in bucket_cols)
    sorted_clause = (
        "SORTED BY (" + ", ".join(f"`{c}`" for c in sort_cols) + ") "
        if sort_cols
        else ""
    )
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    spark.sql(
        f"CREATE TABLE {table} ({cols}) USING parquet "
        f"CLUSTERED BY ({bucket_sql}) {sorted_clause}"
        f"INTO {n_buckets} BUCKETS "
        f"LOCATION '{os.path.abspath(path)}'"
    )


def table_location(spark: SparkSession, table: str) -> str:
    """Filesystem location of a catalog table (local-path form)."""
    import os

    loc = next(
        r["data_type"]
        for r in spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        if r["col_name"] == "Location"
    )
    return os.path.abspath(str(loc).removeprefix("file:"))


def assert_single_file_per_bucket(spark: SparkSession, table: str) -> None:
    """Raise unless every bucket of ``table`` is exactly one data
    file on disk.

    Cheap (one directory listing), and the load-bearing invariant for
    every plan that relies on the bucketedTableScan outputOrdering
    conf: Spark only trusts the within-bucket sort when each bucket is
    a single file, and the writers that promise this (graph edge
    table, dedup indexes) get it from hash-partitioning PROPAGATION
    through dropDuplicates/persist/join — which a planner or AQE
    change could silently break. Bucket ids are parsed from Spark's
    own file naming (``part-*_NNNNN[.c*].parquet``)."""
    import os
    import re
    from collections import Counter

    per_bucket: Counter[int] = Counter()
    for name in os.listdir(table_location(spark, table)):
        m = re.match(r"part-\d+-.*_(\d{5})(?:\.|$)", name)
        if m:
            per_bucket[int(m.group(1))] += 1
    multi = {b: n for b, n in sorted(per_bucket.items()) if n > 1}
    if multi:
        raise AssertionError(
            f"bucketed table {table!r} has multiple files per bucket "
            f"({len(multi)} buckets, worst {max(multi.values())} "
            "files) — the write-side partitioning propagation "
            "regressed; within-bucket sort can no longer be trusted "
            f"(first offenders: {dict(list(multi.items())[:5])})"
        )


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a managed table written by ``write_bucketed`` (bucket
    metadata only survives through the catalog, not a bare parquet
    path read)."""
    return spark.table(table)
