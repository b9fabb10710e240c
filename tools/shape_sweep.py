"""One-shot sweep: report every ORACLE-BACKED query whose Spark output
schema has a top-level list/struct/map column (driver-unhashable —
round-6 q_pack_chunks class). Schema-only: builds each DataFrame but
collects nothing (streaming twins still run their bounded stream).

Usage: python tools/shape_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys

sys.path.insert(0, ".")


def main() -> int:
    from pyspark.sql.pandas.types import to_arrow_schema

    import __spark_entry__ as mod
    from myasynstreamjoin_spark.session import get_spark
    from tools.type_audit import nonscalar_columns

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="shape-sweep", shuffle_partitions=8)
    queries, oracles = mod.queries(), mod.oracle_sql()
    bad = 0
    for qname, fn in queries.items():
        if qname not in oracles:
            continue
        try:
            cols = nonscalar_columns(to_arrow_schema(fn(spark, sf_dir).schema))
        except Exception as e:  # noqa: BLE001
            print(f"{qname}: ERROR {type(e).__name__}: {e}", flush=True)
            bad += 1
            continue
        if cols:
            bad += 1
            print(f"{qname}: NONSCALAR {'; '.join(cols)}", flush=True)
    print(f"done: {bad} offenders")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
