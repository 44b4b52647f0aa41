#!/usr/bin/env python
"""Merge a SPARK_GRAFT_ONLY subset bench run into BASELINE_V2_RUNS.json.

The v2 baseline (BASELINE.md) is per-query medians of >=7 warm repeats
on a quiet box. Queries added AFTER the last full v2 pass get their
rows from a subset run (same repeats, same box discipline) merged here
— the full-run raw data is never touched, only extended.

Usage: python scripts/baseline_v2_topup.py TOPUP_BENCH.json
Prints the markdown rows to splice into BASELINE.md and updates
BASELINE_V2_RUNS.json in place.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    topup = json.load(open(sys.argv[1]))
    if topup.get("repeats", 0) < 7:
        raise SystemExit(f"need >=7 repeats, top-up ran {topup.get('repeats')}")
    base = json.load(open("BASELINE_V2_RUNS.json"))
    added = []
    for name, times in topup["runs"].items():
        if not times:
            continue
        if name in base["runs"] and base["runs"][name]:
            print(f"skip {name}: already in the full v2 run")
            continue
        base["runs"][name] = times
        warm = sorted(times[1:]) if len(times) > 3 else sorted(times)
        med = statistics.median(warm)
        base["queries"][name] = med
        added.append((name, med))
    base["value"] = round(sum(base["queries"].values()), 3)
    with open("BASELINE_V2_RUNS.json", "w") as fh:
        json.dump(base, fh)
    total = sum(base["queries"].values())
    print(f"\nnew total (sum of medians) {total:.1f}s over "
          f"{len(base['queries'])} queries")
    print("\nrows to splice into BASELINE.md:\n")
    line = []
    for name, med in sorted(added):
        line.append(f"{name} {med:.2f}")
        if len(line) == 4:
            print(", ".join(line) + ",")
            line = []
    if line:
        print(", ".join(line))


if __name__ == "__main__":
    main()
