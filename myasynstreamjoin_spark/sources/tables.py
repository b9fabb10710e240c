"""Parquet table loaders for the driver's deterministic test tables.

The reference's only source is a Kafka direct stream of packed text
records (stateless/cluster/HashJoin.scala:64-65); this engine's batch
source is columnar parquet (pushdown + pruning for free), with the
Kafka/text grammar preserved in :mod:`fixtures` as a codec and in
:mod:`myasynstreamjoin_spark.streaming` as a streaming source.
"""

from __future__ import annotations

import os
import weakref

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Engine time model: BIGINT epoch-nanoseconds, matching the reference's
# BigInt epoch timestamps (state/cluster/naive/HashJoin.scala:50). The
# driver's parquet physical type for these columns has drifted between
# regenerations (TIMESTAMP(NANOS) → timestamp[us]); the engine must not
# depend on the physical type, so these columns are normalized to
# epoch-ns at the load boundary — the ONLY place dtype is inspected.
EPOCH_NS_COLUMNS: dict[str, tuple[str, ...]] = {"events": ("ts",)}


def _ntz_epoch_ns(col: str) -> str:
    """SQL expression: TIMESTAMP_NTZ wall clock → epoch-ns as UTC,
    INDEPENDENT of spark.sql.session.timeZone. A plain
    ``unix_micros(CAST(ntz AS TIMESTAMP))`` reinterprets the wall clock
    in the session tz (silently shifting epochs when a caller runs
    non-UTC); field extraction is tz-free on NTZ and exact
    (EXTRACT SECOND is DECIMAL with the full fractional part —
    0 mismatches vs the cast form under UTC, verified over the whole
    fixture)."""
    return (
        f"(unix_date(CAST({col} AS DATE)) * 86400000000L"
        f" + hour({col}) * 3600000000L + minute({col}) * 60000000L"
        f" + CAST(EXTRACT(SECOND FROM {col}) * 1000000 AS LONG)) * 1000"
    )


def normalize_epoch_ns(df: DataFrame, cols: tuple[str, ...] = ("ts",)) -> DataFrame:
    """Normalize event-time columns to the engine's BIGINT epoch-ns.

    Accepts any physical encoding the driver has shipped so far:
    - BIGINT (TIMESTAMP(NANOS) parquet surfaced via ``nanosAsLong``, or
      an engine-written long column): passes through untouched.
    - TIMESTAMP_NTZ (timestamp[us] parquet, the current driver format):
      wall clock treated as UTC via tz-independent field extraction —
      exactly DuckDB's ``epoch_ns(ts)`` on naive timestamps, so oracle
      hashes are unchanged, and immune to a caller's session timezone.
    - TIMESTAMP (tz-aware): ``unix_micros`` directly (an instant needs
      no tz interpretation).

    Pure projection — no shuffle, stays in whole-stage codegen, and the
    column-pruned scan still reads only the referenced columns.
    """
    for c in cols:
        if c not in df.columns:
            continue
        dtype = df.schema[c].dataType
        if isinstance(dtype, T.TimestampNTZType):
            df = df.withColumn(c, F.expr(_ntz_epoch_ns(c)).cast("long"))
        elif isinstance(dtype, T.TimestampType):
            df = df.withColumn(c, (F.unix_micros(F.col(c)) * F.lit(1000)).cast("long"))
    return df


# Parquet SCHEMA cache for single-file driver tables, keyed on the
# file's identity (path, mtime_ns, size). Schema inference is the
# dominant cost of constructing a read — ~60 of the ~70 ms per
# spark.read.parquet here (footer fetch + merge on the JVM), paid on
# EVERY load_table call, several times per query, inside the timed
# region of every bench pass (guide §7.3: planning is driver-side
# work). An explicit .schema(...) skips inference (~13 ms). Only
# metadata is cached — never data, plans, or results: the scan still
# reads the parquet at execution, and a regenerated file (the
# documented events.ts physical-type drift) changes mtime/size and
# misses the cache, so drift handling in normalize_epoch_ns is
# untouched. Directories are never cached (an overwritten part-file
# need not touch the directory mtime); the driver tables are single
# files, which is exactly the safe case.
_SCHEMA_CACHE: dict[tuple[str, int, int], T.StructType] = {}


def _file_identity(path: str) -> tuple[str, int, int] | None:
    """(path, mtime_ns, size) for a plain file; None for directories
    or anything stat cannot see (never cache those)."""
    try:
        st = os.stat(path)
        if not os.path.isfile(path):
            return None
    except OSError:
        return None
    return (path, st.st_mtime_ns, st.st_size)


def _evict_superseded(cache: dict, path: str, new_key: tuple) -> None:
    """Drop cache entries for PRIOR identities of ``path`` when a new
    identity is inserted: a regenerated file supersedes its old
    (mtime, size) keys, and keeping them would grow the cache without
    bound in a long-lived process that regenerates inputs repeatedly
    (round-11 advice). Bounds both caches by live table count."""
    for k in [k for k in cache if k[0] == path and k != new_key]:
        del cache[k]


def _read_driver_parquet(spark: SparkSession, path: str) -> DataFrame:
    key = _file_identity(path)
    if key is None:
        return spark.read.parquet(path)
    schema = _SCHEMA_CACHE.get(key)
    if schema is None:
        df = spark.read.parquet(path)
        _evict_superseded(_SCHEMA_CACHE, path, key)
        _SCHEMA_CACHE[key] = df.schema
        return df
    return spark.read.schema(schema).parquet(path)


def read_driver_parquet(spark: SparkSession, path: str) -> DataFrame:
    """Public schema-cached batch-read handle for a driver parquet file
    — the supported entry point for modules (e.g. streaming.windowed)
    that need the on-disk schema without paying footer inference per
    call. Same cache + invalidation rules as ``load_table``."""
    return _read_driver_parquet(spark, path)


# Lazy-DataFrame cache, one layer above the schema cache: load_table
# returns the SAME (immutable, unexecuted) DataFrame object for the
# same session + file identity. Still metadata only — a DataFrame is
# a logical plan, so every action on it re-reads the parquet at
# execution; nothing row-shaped is retained. Keyed per SparkSession
# (weakly, so a discarded session frees its plans) and on the same
# (path, mtime_ns, size) identity as the schema cache, so a
# regenerated file misses and re-derives, drift normalization
# included. Saves the ~28 ms/call of reader construction + file
# listing + normalize_epoch_ns that remained after the schema cache
# (~47 load_table calls per bench headline pass = ~1.3 s/pass).
_DF_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one of the driver tables from ``{sf_dir}/{name}.parquet``.

    Column pruning and predicate pushdown happen automatically: callers
    should select/filter on the returned DataFrame and let Catalyst
    push into the scan (verify with plans.explain.scan_report).

    Event-time columns are normalized to BIGINT epoch-ns here (see
    ``normalize_epoch_ns``) so every downstream operator sees one
    logical schema regardless of the parquet physical type.

    SHARED-PLAN CONTRACT (round-11 advice): repeated calls return the
    SAME DataFrame object per (session, file identity), so two loads of
    one table share expression IDs. A self-join of one driver table
    must alias each side first (``load_table(...).alias("a")``) or
    Spark raises AMBIGUOUS_SELF_JOIN — asserted by
    tests/test_schema_drift.py::test_load_table_self_join_via_alias.
    """
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    key = _file_identity(path)
    if key is None:
        df = spark.read.parquet(path)
        cols = EPOCH_NS_COLUMNS.get(name)
        return normalize_epoch_ns(df, cols) if cols else df
    try:
        per_session = _DF_CACHE.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable: skip the cache
        per_session = {}
    df = per_session.get(key)
    if df is None:
        base = _read_driver_parquet(spark, path)
        cols = EPOCH_NS_COLUMNS.get(name)
        df = normalize_epoch_ns(base, cols) if cols else base
        _evict_superseded(per_session, path, key)
        per_session[key] = df
    return df


def rebalance(df: DataFrame, partitions: int | None = None) -> DataFrame:
    """Round-robin repartition to the cluster's parallelism.

    Use before work-amplifying operators (shingle explode, per-row
    signature computation): scan partitioning follows *bytes*
    (maxPartitionBytes, row-group boundaries), so a small-on-disk input
    that fans out 100× downstream otherwise runs on a handful of tasks.
    The shuffle moves only the narrow input rows — cheap relative to
    the amplified work it parallelizes. At full scale this also evens
    out skewed file sizes.
    """
    n = partitions or df.sparkSession.sparkContext.defaultParallelism
    return df.repartition(n)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view (for spark.sql use)."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)


# Stable-view cache, the spark.sql() counterpart of _DF_CACHE: each
# (session, file identity) gets ONE uniquely-named temp view registered
# once and reused by every single-string SQL query construction
# (round-11 verdict #1: a spark.sql() string analyzes ~5x cheaper than
# the equivalent DataFrame chain, but only if the per-construction
# py4j cost stays at one call — the kwargs formatter's per-call
# createOrReplaceTempView/dropTempView churn would eat the win). The
# view name embeds a hash of the file identity, so a regenerated file
# (new mtime/size) gets a FRESH view over the freshly-derived
# DataFrame and two sf_dirs used in one session never collide; stale
# views of a superseded identity are dropped on replacement. Metadata
# only, same safety class as the schema/DataFrame caches: a temp view
# is a named logical plan — every action still scans the parquet.
_VIEW_CACHE: "weakref.WeakKeyDictionary[SparkSession, dict]" = (
    weakref.WeakKeyDictionary()
)


def table_view(spark: SparkSession, sf_dir: str, name: str) -> str:
    """Return the name of a temp view over ``load_table(spark, sf_dir,
    name)``, registering it on first use per (session, file identity).

    The returned name is stable for the life of the file identity, so
    SQL text built around it can be constructed with zero py4j calls
    on the warm path. Views are prefixed ``masj_`` and suffixed with
    an identity hash — they cannot collide with caller-owned views.
    """
    import hashlib

    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    path = f"{sf_dir}/{name}.parquet"
    key = _file_identity(path)
    if key is None:
        # Un-stat-able input (directory table): no identity to key on —
        # register a per-sf_dir name and refresh it every call.
        ident = hashlib.md5(path.encode()).hexdigest()[:10]
        view = f"masj_{name}_{ident}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        return view
    try:
        per_session = _VIEW_CACHE.setdefault(spark, {})
    except TypeError:  # session not weak-referenceable: skip the cache
        per_session = {}
    view = per_session.get(key)
    if view is None:
        ident = hashlib.md5(repr(key).encode()).hexdigest()[:10]
        view = f"masj_{name}_{ident}"
        load_table(spark, sf_dir, name).createOrReplaceTempView(view)
        for k in [k for k in per_session if k[0] == path and k != key]:
            try:
                spark.catalog.dropTempView(per_session[k])
            except Exception:
                pass
            del per_session[k]
        per_session[key] = view
    return view
