#!/usr/bin/env python
"""Render the BASELINE.md "engine-recorded v2" per-query table from a
bench JSON produced with SPARK_GRAFT_REPEATS>=7.

v2 methodology (r7 verdict item 2): per-query MEDIAN of >=7 warm
repeats on a quiet box — the r2 min-of-3 numbers were warm-state
outliers for Python-stage queries (media_decode read 2.01x against
them purely from baseline miscalibration). Medians of warm repeats are
stable against both cold outliers and lucky cache states.

Usage: python scripts/baseline_v2.py BENCH_LOCAL_rN.json
Prints the markdown block to splice into BASELINE.md.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> None:
    rec = json.load(open(sys.argv[1]))
    runs: dict[str, list[float]] = rec["runs"]
    repeats = rec.get("repeats", 0)
    if repeats < 7:
        raise SystemExit(f"need >=7 repeats, bench ran {repeats}")
    meds = {}
    for name, times in runs.items():
        if not times:
            continue
        warm = sorted(times[1:]) if len(times) > 3 else sorted(times)
        meds[name] = statistics.median(warm)
    total = sum(meds.values())
    print(f"total (sum of medians) {total:.1f}s over {len(meds)} queries, "
          f"{repeats} repeats (first run dropped as warmup, median of the rest)")
    print()
    items = sorted(meds.items())
    line: list[str] = []
    for name, m in items:
        line.append(f"{name} {m:.2f}")
        if len(line) == 4:
            print(", ".join(line) + ",")
            line = []
    if line:
        print(", ".join(line))


if __name__ == "__main__":
    main()
