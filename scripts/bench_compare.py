#!/usr/bin/env python
"""Compare a bench JSON against the previous round and BASELINE v2.

Prints geomean + total ratios over shared queries (baseline > 0.3 s,
the ambient-noise floor), the worst/best per-query deltas, and every
query at >=1.5x of its v2 baseline median (the 2x gate's watchlist).

Usage: python scripts/bench_compare.py BENCH_NEW.json [BENCH_PREV.json]
"""

from __future__ import annotations

import json
import math
import statistics
import sys


def _med_warm(times: list[float]) -> float:
    warm = sorted(times[1:]) if len(times) > 3 else sorted(times)
    return statistics.median(warm)


def _ratios(new: dict[str, float], ref: dict[str, float], floor: float):
    shared = [(k, new[k], ref[k]) for k in new
              if k in ref and ref[k] > floor and new[k] > 0]
    if not shared:
        return None
    logs = [math.log(n / r) for _, n, r in shared]
    geo = math.exp(sum(logs) / len(logs))
    tot_n = sum(n for _, n, _ in shared)
    tot_r = sum(r for _, _, r in shared)
    ranked = sorted(shared, key=lambda t: t[1] / t[2])
    return geo, tot_n / tot_r, len(shared), ranked


def main() -> None:
    new = json.load(open(sys.argv[1]))
    new_q = new["queries"]

    if len(sys.argv) > 2:
        prev = json.load(open(sys.argv[2]))
        r = _ratios(new_q, prev["queries"], 0.3)
        if r:
            geo, tot, n, ranked = r
            print(f"vs {sys.argv[2]}: geomean {geo:.2f}, totals ratio {tot:.2f} "
                  f"over {n} shared queries (>0.3s)")
            print("  best:", ", ".join(f"{k} {a/b:.2f}x" for k, a, b in ranked[:3]))
            print("  worst:", ", ".join(f"{k} {a/b:.2f}x" for k, a, b in ranked[-3:]))

    v2 = json.load(open("BASELINE_V2_RUNS.json"))
    v2_meds = {k: _med_warm(t) for k, t in v2["runs"].items() if t}
    r = _ratios(new_q, v2_meds, 0.3)
    if r:
        geo, tot, n, ranked = r
        print(f"vs BASELINE v2: geomean {geo:.2f}, totals ratio {tot:.2f} "
              f"over {n} shared queries (>0.3s)")
        watch = [(k, a, b) for k, a, b in ranked if a / b >= 1.5]
        if watch:
            print("  >=1.5x watchlist:")
            for k, a, b in watch:
                print(f"    {k}: {a:.2f}s vs v2 {b:.2f}s = {a/b:.2f}x")
        else:
            print("  no query at >=1.5x of its v2 median")
    missing = sorted(k for k in new_q if k not in v2_meds)
    if missing:
        print(f"  no v2 row yet ({len(missing)}): {', '.join(missing)}")


if __name__ == "__main__":
    main()
