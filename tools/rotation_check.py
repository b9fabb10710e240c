"""Driver-window rotation audit (see the rotating-slots comment in
__spark_entry__.queries()).

The external driver independently verifies only the FIRST 50 registry
positions; positions 23-50 are meant to rotate each round through
queries the driver has never checked. This tool reports:

- how many of the current first-50 have never appeared in any
  CORRECTNESS_r*.json (the rotation freshness for THIS round),
- which oracle-backed queries remain never-driver-checked (the pool
  to rotate in next round),
- the STALENESS ranking (rotation policy #3 in the queries() comment):
  once the never-checked pool is empty, slots 23-50 re-verify the
  queries whose latest driver green is OLDEST — this tool prints the
  ranking whose head is the next window's composition (re-shaped
  queries jump the queue per policy #2; every slot oracle-backed per
  policy #4),
- sanity: first-50 all oracle-backed, no duplicate registry keys.

Usage: python tools/rotation_check.py
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as contract  # noqa: E402


def main() -> int:
    # anchor to the repo root (like the import above) so a run from
    # any CWD sees the CORRECTNESS history instead of silently
    # reporting zero driver-checked queries
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    checked: set[str] = set()
    last_green: dict[str, int] = {}
    for p in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        rnd = int(re.search(r"r(\d+)", os.path.basename(p)).group(1))
        for q in json.load(open(p)):
            checked.add(q)
            last_green[q] = max(last_green.get(q, 0), rnd)
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
    # policy #2 enforcement (round 11): every query the round re-shaped
    # must sit INSIDE the driver window — a re-shape coasting on a
    # stale green is the q_pack_chunks failure mode.
    reshaped = getattr(contract, "RESHAPED_THIS_ROUND", [])
    missing = [q for q in reshaped if q not in first50]
    if missing:
        print(f"ERROR: re-shaped queries NOT in the driver window: "
              f"{missing} (rotation policy #2)")
        return 1
    if reshaped:
        print(f"re-shaped this round, in window (policy #2): {reshaped}")
    print(f"\nnext-round rotation pool ({len(pool)} oracle-backed, "
          "never driver-checked):")
    for q in pool:
        print(f"  {q}")
    # staleness ranking (policy #3): oldest driver green first, ties
    # in registry order; only oracle-backed queries (policy #4) and
    # only ones outside the CURRENT window (they are being re-greened
    # this round already). The head of this list is the next window.
    n_slots = 28
    stale = [
        q for q in qs
        if q in oracles and q in last_green and q not in first50
    ]
    stale.sort(key=lambda q: (last_green[q], qs.index(q)))
    print(f"\nstaleness ranking head (next window's {n_slots} slots "
          "once the pool is empty; 'rN' = latest driver green):")
    for q in stale[:n_slots]:
        print(f"  r{last_green[q]:<3d} {q}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
