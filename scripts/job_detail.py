#!/usr/bin/env python
"""Dump per-job name/description for one query run (UI REST API)."""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from datagrowth_spark import queries as Q
from datagrowth_spark.core.session import get_spark
from datagrowth_spark.core.caching import release as release_caches


def main() -> None:
    name = sys.argv[1]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="job-detail",
                      extra_conf={"spark.ui.enabled": "true"})
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    spark.range(10).count()  # warmup + UI up
    import urllib.request

    ui = sc.uiWebUrl
    app_id = sc.applicationId
    reps = int(os.environ.get("SPARK_GRAFT_REPEATS", "1"))
    for _ in range(max(0, reps - 1)):  # warm reps, not profiled
        Q.queries()[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
        release_caches()
    before = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs?status=succeeded"))
    seen = {j["jobId"] for j in before}
    import time as _time
    t0 = _time.time()
    Q.queries()[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
    print(f"last-rep wall: {_time.time() - t0:.3f}s")
    release_caches()
    jobs = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/jobs"))
    new = sorted((j for j in jobs if j["jobId"] not in seen), key=lambda j: j["jobId"])
    for j in new:
        dur = None
        if j.get("completionTime") and j.get("submissionTime"):
            from datetime import datetime
            fmt = "%Y-%m-%dT%H:%M:%S.%f%Z"
            try:
                dur = (datetime.strptime(j["completionTime"], fmt)
                       - datetime.strptime(j["submissionTime"], fmt)).total_seconds()
            except ValueError:
                pass
        print(f'{j["jobId"]:4d} {dur if dur is not None else "?":>7} '
              f'{len(j.get("stageIds", [])):2d}st  {j.get("name", "")[:110]}')
    print(f"total new jobs: {len(new)}")
    spark.stop()


if __name__ == "__main__":
    main()
