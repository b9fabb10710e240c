"""Typed oracle audit: for every oracle-backed query, compare the Arrow
schema DuckDB produces for oracle_sql() against the Arrow schema Spark
would produce for queries() — the driver's value hash is TYPED, so a
DuckDB HUGEINT (decimal128(38,0)) column against a Spark bigint flips
the hash even when every value is bit-identical (round-5 verdict root
cause for q_triangles / q_pack_sequences).

DuckDB side is free (LIMIT-0 plan, no rows materialize). Spark side
maps the DataFrame's schema via pyspark's to_arrow_schema WITHOUT
collecting — cheap for lazy queries, but NOT free across the whole
registry: the streaming twins run their bounded stream to completion
inside the query builder, q_edge_table_degrees materializes a bucketed
table, and the e2e pipeline eager-checkpoints its gated stages. A
full no-arg run therefore executes those jobs; use the query-name
arguments when iterating.

Importable: canon(), compare_schemas(), audit_query() are reused by
tests/test_oracle_types.py and tools/driver_sim.py.

Usage: python tools/type_audit.py [sf_dir] [query ...]
Exit 0 = every compared pair matches (modulo the equivalences below).
"""

from __future__ import annotations

import sys

import pyarrow as pa

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(t: pa.DataType) -> str:
    """Canonical type label; collapses only representation-level variants
    that carry identical Python/pandas values (so the driver's typed hash
    cannot distinguish them): string widths and timestamp units.  Integer
    width, signedness, decimal-vs-int and float-vs-int all stay distinct —
    those are exactly the classes that can flip the driver hash."""
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "string"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "binary"
    if pa.types.is_timestamp(t):
        return "timestamp"
    if pa.types.is_date(t):
        return "date"
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        return f"list<{canon(t.value_type)}>"
    if pa.types.is_struct(t):
        inner = ", ".join(f"{f.name}: {canon(f.type)}" for f in t)
        return f"struct<{inner}>"
    if pa.types.is_map(t):
        return f"map<{canon(t.key_type)}, {canon(t.item_type)}>"
    return str(t)


def compare_schemas(spark_schema: pa.Schema, duck_schema: pa.Schema) -> list[str]:
    sp = {f.name: canon(f.type) for f in spark_schema}
    du = {f.name: canon(f.type) for f in duck_schema}
    bad = []
    for name in sorted(set(sp) | set(du)):
        a, b = sp.get(name), du.get(name)
        if a != b:
            bad.append(f"{name}: spark={a} oracle={b}")
    return bad


def nonscalar_columns(arrow_schema: pa.Schema) -> list[str]:
    """Top-level columns the driver canonicalizer CANNOT hash: its
    order-insensitive compare sorts a pandas frame by every column, and
    list/struct/map cells arrive as ndarray/dict — unhashable
    (round-6 red: q_pack_chunks, ``TypeError: unhashable type:
    'numpy.ndarray'``). Every ORACLE-BACKED query must emit only
    scalar top-level columns; nested values belong behind a
    deterministic digest (md5/concat_ws or an integer fold)."""
    return [
        f"{f.name}: {canon(f.type)}"
        for f in arrow_schema
        if pa.types.is_list(f.type)
        or pa.types.is_large_list(f.type)
        or pa.types.is_fixed_size_list(f.type)
        or pa.types.is_struct(f.type)
        or pa.types.is_map(f.type)
    ]


def register_views(con, sf_dir: str) -> None:
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS "
            f"SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )


def oracle_arrow_schema(con, sql: str):
    """Arrow schema of an oracle WITHOUT materializing any rows —
    DuckDB plans the full query under a LIMIT 0 wrapper (CTEs are
    legal inside a subquery) and returns an empty, fully-typed
    result."""
    return con.execute(f"SELECT * FROM ({sql}) LIMIT 0").arrow().schema


def audit_query(spark, con, fn, sql: str, sf_dir: str) -> list[str]:
    """Type-compare one query pair; returns mismatch descriptions."""
    from pyspark.sql.pandas.types import to_arrow_schema

    s_schema = to_arrow_schema(fn(spark, sf_dir).schema)
    bad = [
        f"driver-unhashable column {c}" for c in nonscalar_columns(s_schema)
    ]
    return bad + compare_schemas(s_schema, oracle_arrow_schema(con, sql))


def main() -> int:
    import duckdb
    from pyspark.sql import SparkSession

    sys.path.insert(0, ".")
    import __spark_entry__ as mod

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("type-audit")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    register_views(con, sf_dir)

    queries, oracles = mod.queries(), mod.oracle_sql()
    failures = 0
    checked = 0
    for qname, fn in queries.items():
        if only and qname not in only:
            continue
        if qname not in oracles:
            continue
        try:
            bad = audit_query(spark, con, fn, oracles[qname], sf_dir)
        except Exception as e:  # noqa: BLE001
            print(f"{qname}: ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        checked += 1
        if bad:
            failures += 1
            print(f"{qname}: TYPE MISMATCH  {'; '.join(bad)}")
    print(f"\n{checked} oracle-backed queries type-checked; "
          f"{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
