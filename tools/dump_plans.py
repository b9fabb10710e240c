"""Dump .explain("formatted") for headline (or named) queries to
plans/<tag>/<query>_<suffix>.txt — the optimization round's evidence
trail (guide §1: capture the plan before and after every change).

Usage:
    python tools/dump_plans.py r11 before [q_name ...]

Streaming twins execute their stream during query construction, so they
are skipped unless named explicitly.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402
from myasynstreamjoin_spark.plans.explain import formatted_plan  # noqa: E402
from myasynstreamjoin_spark.session import get_spark  # noqa: E402

STREAMING = {"q_stream_min_count_window", "q_stream_grammar", "q_stream_cdc_chunks"}


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", tag,
    )
    os.makedirs(out_dir, exist_ok=True)
    import bench

    if not names:
        names = [q for q in bench.HEADLINE if q not in STREAMING]
    spark = get_spark(app_name=f"dump_plans_{tag}_{suffix}")
    queries = contract.queries()
    for name in names:
        try:
            df = queries[name](spark, sf_dir)
            plan = formatted_plan(df)
        except Exception as e:  # noqa: BLE001 — record the failure, keep going
            plan = f"PLAN CAPTURE FAILED: {e!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        print(f"# wrote {path} ({len(plan)} chars)", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
