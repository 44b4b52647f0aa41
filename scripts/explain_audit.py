#!/usr/bin/env python
"""Physical-plan audit over the query surface.

For every queries() entry, prints the scale-relevant facts of the
executed (AQE-final) plan: number of shuffle exchanges, broadcast
joins, whether parquet scans have pushed filters, how many columns each
scan reads (pruning), Python stages (ArrowEvalPython / MapInPandas /
BatchEvalPython), and whole-stage-codegen span count. Usage:

    python scripts/explain_audit.py [sf_dir] [query ...]

The point: at 100 TB the plan IS the performance — this makes "did I
broadcast the dim, did the filter reach the scan, did Python leak into
a hot path" reviewable per query in one shot.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datagrowth_spark import queries as Q
from datagrowth_spark.core.session import get_spark


def audit(name: str, df) -> dict:
    # Execute first (noop sink) so AQE's FINAL plan is what gets audited
    # — pre-execution plans under AQE hide the chosen join strategies
    # and coalesced exchanges.
    df.write.format("noop").mode("overwrite").save()
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    formatted = buf.getvalue()

    # Tree form preserves parent/child adjacency: classify each
    # SinglePartition exchange by what feeds it. An (Object)HashAggregate
    # child means the exchange carries one partial-agg row per upstream
    # partition (scalar totals, percentile sketches, per-shard counts) —
    # bounded at any corpus size. A Sort/Window/Project/Scan child means
    # the DATA PATH crosses one task: the true global-sort scale-killer.
    tree = df._jdf.queryExecution().executedPlan().toString()
    tree_lines = tree.splitlines()

    def node_depth(line: str) -> int:
        # Depth = column of the tree marker; -1 for non-node lines
        # (multi-line renderings, blank lines). The root node has no
        # marker — treat column 0.
        m = re.search(r"[+:]- ", line)
        if m:
            return m.start()
        return 0 if line.strip() and not line.startswith((" ", ":")) else -1

    def first_child(i: int) -> str:
        # Indentation-aware (ADVICE r4): the next NODE line strictly
        # deeper than line i; a same-depth line is a sibling, so the
        # exchange rendered no child here (shouldn't happen for a real
        # Exchange).
        d = node_depth(tree_lines[i])
        for j in range(i + 1, len(tree_lines)):
            dj = node_depth(tree_lines[j])
            if dj == -1:
                continue
            return tree_lines[j] if dj > d else ""
        return ""

    single, single_bad = 0, 0
    for i, line in enumerate(tree_lines):
        if "Exchange SinglePartition" not in line:
            continue
        single += 1
        child = first_child(i)
        # Bounded inputs: partial aggregates (scalar totals, percentile
        # sketches, per-shard counts — one row per upstream partition)
        # and reused exchanges/subqueries (already classified at their
        # defining occurrence).
        if not re.search(r"Aggregate|ReusedExchange|ReusedSubquery", child):
            single_bad += 1
    return {
        "single_part": single,
        "single_part_bad": single_bad,
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", formatted)),
        "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange", formatted)),
        "scans": len(re.findall(r"\(\d+\) Scan parquet", formatted)),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", formatted)),
        "python": len(re.findall(
            r"\(\d+\) (?:ArrowEvalPython|MapInPandas|BatchEvalPython|"
            r"FlatMapGroupsInPandas\w*)", formatted)),
        "codegen": len(set(re.findall(r"\[codegen id : (\d+)\]", formatted))),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    header = (f"{'query':28s} {'xchg':>4} {'bcast':>5} {'scans':>5} "
              f"{'pushed':>6} {'py':>3} {'wscg':>4} {'1part':>5} {'1part!':>6}")
    print(header)
    print("-" * len(header))
    for name, fn in Q.queries().items():
        if only and name not in only:
            continue
        try:
            info = audit(name, fn(spark, sf_dir))
            print(f"{name:28s} {info['exchanges']:>4} {info['broadcasts']:>5} "
                  f"{info['scans']:>5} {info['pushed']:>6} {info['python']:>3} "
                  f"{info['codegen']:>4} {info['single_part']:>5} "
                  f"{info['single_part_bad']:>6}")
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
