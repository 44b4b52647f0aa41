#!/usr/bin/env python
"""Per-query Spark JOB counts (driver-round profile, guide §1.5/§2.6).

The pipeline/trainer families are driver-sequenced: their bench seconds
are mostly per-job fixed overhead at sf0.1, so the lever is the number
of jobs per run, not bytes. This prints one JSON line per query:
{"query": name, "jobs": N, "sec": s, "stages": M} using unique job
groups per run so counts never bleed across queries.

Run: python scripts/job_profile.py <query> [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datagrowth_spark import queries as Q
from datagrowth_spark.core.session import get_spark
from datagrowth_spark.core.caching import release as release_caches


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(os.environ.get("SPARK_GRAFT_REPEATS", "2"))
    spark = get_spark(app_name="job-profile")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    registry = Q.queries()
    # warmup
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    for name in names:
        best = None
        for rep in range(repeats):
            group = f"prof-{name}-{rep}"
            sc.setJobGroup(group, name)
            t0 = time.time()
            registry[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            sec = round(time.time() - t0, 3)
            sc.setJobGroup(None, None)
            tracker = sc.statusTracker()
            job_ids = tracker.getJobIdsForGroup(group)
            n_stages = 0
            for jid in job_ids:
                info = tracker.getJobInfo(jid)
                if info is not None:
                    n_stages += len(info.stageIds)
            rec = {"query": name, "rep": rep, "jobs": len(job_ids),
                   "stages": n_stages, "sec": sec}
            if best is None or rec["sec"] < best["sec"]:
                best = rec
            print(json.dumps(rec), flush=True)
            release_caches()
    spark.stop()


if __name__ == "__main__":
    main()
