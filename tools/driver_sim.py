"""Driver simulator: exercises __spark_entry__ exactly as the harness
would — a plain SparkSession with NO engine configs, entry() smoke at
sf0.001, then every queries() entry at the given SF compared against
oracle_sql() via DuckDB (row count + sorted-column value compare +
Arrow TYPE compare).

The type compare exists because the real driver's value hash is TYPED:
round 5 proved that a DuckDB HUGEINT (decimal128(38,0)) column against
a Spark bigint flips the driver hash even when every value is
bit-identical, and norm()'s Python-value compare can never see that.

Usage: python tools/driver_sim.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

import duckdb
from pyspark.sql import SparkSession
from pyspark.sql.pandas.types import to_arrow_schema

sys.path.insert(0, ".")
import __spark_entry__ as mod  # noqa: E402
from tools.type_audit import (  # noqa: E402
    compare_schemas,
    nonscalar_columns,
    oracle_arrow_schema,
)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
ONLY = set(sys.argv[2:])


def norm(v):
    if isinstance(v, float):
        return "nan" if math.isnan(v) else round(v, 9)
    if hasattr(v, "tolist"):
        return norm(v.tolist())
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main() -> int:
    # Deliberately vanilla: the driver does not know about engine confs.
    spark = (
        SparkSession.builder.master("local[8]")
        .appName("driver-sim")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for name in (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{SF_DIR}/{name}.parquet')"
        )

    df = mod.entry(spark)
    n = len(df.collect())
    print(f"entry(): OK rows={n} schema={df.schema.simpleString()}")

    queries, oracles = mod.queries(), mod.oracle_sql()
    failures = 0
    for qname, fn in queries.items():
        if ONLY and qname not in ONLY:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            cols = sdf.columns
            rows = [tuple(r) for r in sdf.collect()]
        except Exception as e:  # noqa: BLE001
            print(f"{qname}: SPARK ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        dt = time.time() - t0
        if qname not in oracles:
            print(f"{qname}: rows-only rows={len(rows)} ({dt:.1f}s)")
            continue
        # LIMIT-0 Arrow pass for TYPES (the driver's hash is typed;
        # no rows materialize), then the plain execute for the value
        # compare — .as_py() would hand norm() Decimals whose
        # repr-sort misaligns with ints.
        d_schema = oracle_arrow_schema(con, oracles[qname])
        res = con.execute(oracles[qname])
        dcols = [d[0] for d in res.description]
        drows = [tuple(r) for r in res.fetchall()]
        status = []
        arrow_schema = to_arrow_schema(sdf.schema)
        # The real driver's canonicalizer dies sorting array/map/struct
        # cells (r6 q_pack_chunks red) — norm() below would silently
        # tolerate them, so fail the way the driver fails.
        shape_bad = nonscalar_columns(arrow_schema)
        if shape_bad:
            status.append(f"SHAPE driver-unhashable {'; '.join(shape_bad)}")
        type_bad = compare_schemas(arrow_schema, d_schema)
        if type_bad:
            status.append(f"TYPES {'; '.join(type_bad)}")
        if sorted(cols) != sorted(dcols):
            status.append(f"SCHEMA spark={sorted(cols)} duck={sorted(dcols)}")
        if len(rows) != len(drows):
            status.append(f"ROWCOUNT spark={len(rows)} duck={len(drows)}")
        if not status:
            so = sorted(range(len(cols)), key=lambda i: cols[i])
            do = sorted(range(len(dcols)), key=lambda i: dcols[i])
            a = sorted([tuple(norm(r[i]) for i in so) for r in rows], key=repr)
            b = sorted([tuple(norm(r[i]) for i in do) for r in drows], key=repr)
            bad = [(x, y) for x, y in zip(a, b) if x != y]
            if bad:
                status.append(f"VALUES {len(bad)} mismatched, first {bad[:2]}")
        if status:
            failures += 1
            print(f"{qname}: FAIL {'; '.join(status)} ({dt:.1f}s)")
        else:
            print(f"{qname}: MATCH rows={len(rows)} ({dt:.1f}s)")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
