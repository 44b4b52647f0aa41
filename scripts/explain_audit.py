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
    return {
        "exchanges": len(re.findall(r"\(\d+\) Exchange\b", formatted)),
        "broadcasts": len(re.findall(r"\(\d+\) BroadcastExchange", formatted)),
        "scans": len(re.findall(r"\(\d+\) Scan parquet", formatted)),
        "pushed": len(re.findall(r"PushedFilters: \[[^\]]", formatted)),
        "python": len(re.findall(
            r"\(\d+\) (?:ArrowEvalPython|MapInPandas|BatchEvalPython|"
            r"FlatMapGroupsInPandas\w*)", formatted)),
        "codegen": len(set(re.findall(r"\[codegen id : (\d+)\]", formatted))),
        # Scale-killer flag: every SinglePartition exchange funnels the
        # full stage through ONE task (global windows/sorts/limits).
        # Only acceptable on provably tiny frames (per-shard totals,
        # final top-k). Anything corpus-sized here fails a 100× scale-up.
        # NOTE: explain("formatted") prints the node as "(5) Exchange"
        # with "Arguments: SinglePartition, ..." on its own line, so the
        # match must be on the bare keyword, not "Exchange SinglePartition"
        # (which literally never appears in formatted output and silently
        # reported zero for rounds 1-3).
        "single_part": len(re.findall(r"\bSinglePartition\b", formatted)),
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark(app_name="explain-audit")
    spark.sparkContext.setLogLevel("ERROR")
    header = (f"{'query':28s} {'xchg':>4} {'bcast':>5} {'scans':>5} "
              f"{'pushed':>6} {'py':>3} {'wscg':>4} {'1part':>5}")
    print(header)
    print("-" * len(header))
    for name, fn in Q.queries().items():
        if only and name not in only:
            continue
        try:
            info = audit(name, fn(spark, sf_dir))
            print(f"{name:28s} {info['exchanges']:>4} {info['broadcasts']:>5} "
                  f"{info['scans']:>5} {info['pushed']:>6} {info['python']:>3} "
                  f"{info['codegen']:>4} {info['single_part']:>5}")
        except Exception as exc:  # noqa: BLE001
            print(f"{name:28s} ERROR {type(exc).__name__}: {exc}")
    spark.stop()


if __name__ == "__main__":
    main()
