#!/usr/bin/env python
"""Dump ``explain("formatted")`` for named queries to plans/<tag>/.

Usage:
    python scripts/capture_plans.py <tag> <suffix> [query ...]

Writes plans/<tag>/<query>_<suffix>.txt for each query (suffix is
"before"/"after" in optimization rounds). The query function runs
first (noop sink) so AQE's final plan is what gets captured for the
executed-plan section; the formatted pre-execution plan is captured
too (it shows PushedFilters/ReadSchema per scan).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datagrowth_spark import queries as Q
from datagrowth_spark.core.session import get_spark
from datagrowth_spark.core.caching import release as release_caches


def main() -> None:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark(app_name="capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    registry = Q.queries()
    for name in names:
        df = registry[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        executed = df._jdf.queryExecution().executedPlan().toString()
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(f"== {name} ({suffix}) explain(formatted) ==\n")
            fh.write(buf.getvalue())
            fh.write(f"\n== {name} ({suffix}) executed plan (AQE-final) ==\n")
            fh.write(executed)
        release_caches()
        print(f"wrote {path}")
    spark.stop()


if __name__ == "__main__":
    main()
