"""Driver-window rotation audit (see the rotating-slots comment in
__spark_entry__.queries()).

The external driver independently verifies only the FIRST 50 registry
positions; positions 23-50 are meant to rotate each round through
queries the driver has never checked. This tool reports:

- how many of the current first-50 have never appeared in any
  CORRECTNESS_r*.json (the rotation freshness for THIS round),
- which oracle-backed queries remain never-driver-checked (the pool
  to rotate in next round),
- sanity: first-50 all oracle-backed, no duplicate registry keys.

Usage: python tools/rotation_check.py
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402


def main() -> int:
    # anchor to the repo root (like the import above) so a run from
    # any CWD sees the CORRECTNESS history instead of silently
    # reporting zero driver-checked queries
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        checked |= set(json.load(open(p)))
    qs = list(contract.queries())
    oracles = set(contract.oracle_sql())
    first50 = qs[:50]
    fresh = [q for q in first50 if q not in checked]
    pool = [q for q in qs[50:] if q not in checked and q in oracles]
    rows_only = [q for q in qs if q not in oracles]

    print(f"registry: {len(qs)} queries ({len(set(qs))} unique), "
          f"{len(oracles)} oracle-backed, rows-only: {sorted(rows_only)}")
    print(f"driver-checked ever (r* union): {len(checked)}")
    print(f"first-50 never-checked this round: {len(fresh)}")
    not_oracle = [q for q in first50 if q not in oracles]
    if not_oracle:
        print(f"WARNING: first-50 entries without oracles: {not_oracle}")
    if len(set(qs)) != len(qs):
        print("WARNING: duplicate registry keys!")
    print(f"\nnext-round rotation pool ({len(pool)} oracle-backed, "
          "never driver-checked):")
    for q in pool:
        print(f"  {q}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
