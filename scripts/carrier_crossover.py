#!/usr/bin/env python
"""Measure the map-vs-join model-carrier crossover for the trainers.

MAP_BCAST_THRESHOLD (operators/classifier.py) was set from two point
measurements (1024 buckets fine on the literal map, 65536 a >55-min
cliff). This probe traces the curve between them so the threshold is
data, not a guess: for each model size it times

* classifier: ``logreg_train`` k=2 (step 2 carries ~n_buckets
  non-zero weights — step 1's model is all-zero on both carriers, so
  k=2 is the smallest run that exercises the carrier at its real
  size) with ``use_broadcast`` forced False (literal map expression)
  and True (broadcast hash join);
* unigram: ``unigram_train`` k=1 at ``vocab_multi`` pieces (the seed
  model already has full-size scores in round 1) on both carriers.

The map series runs smallest-first and STOPS once a point exceeds
``--budget`` seconds (default 900): past the cliff the cost is not
worth measuring again (r10 measured >55 min at 65536 without
finishing one task).

Run (quiet box, never concurrent with other Spark jobs):
    SPARK_GRAFT_DRIVER_MEM=48g python scripts/carrier_crossover.py \
        [rows_millions=10]
Prints one JSON line per (op, size, carrier) and a final summary line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datagrowth_spark.core.session import get_spark

MAP_BUDGET_SEC = 900.0

CLF_SIZES = [1024, 2048, 4096, 8192, 16384]
UNI_SIZES = [512, 1024, 2048, 4096]
UNI_JOIN_EXTRA = [8192]


def main() -> None:
    scale_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n = int(scale_m * 1_000_000)
    spark = get_spark(app_name="carrier-crossover")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc text "),
                     (F.col("id") % (n // 20)).cast("string")).alias("text"),
            (F.xxhash64("id") % 20).cast("int").alias("stratum"),
        )
    )
    clf_docs = docs.select(
        "doc_id", "text", (F.col("stratum") < 10).alias("y")).persist()
    clf_docs.count()
    uni_wf = (docs.select(F.explode(F.split("text", " ")).alias("w"))
              .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))).persist()
    uni_wf.count()

    results = []

    def record(op, size, carrier, sec):
        line = {"op": op, "model_size": size, "carrier": carrier,
                "rows": n, "unit": "sec", "sec": round(sec, 2)}
        results.append(line)
        print(json.dumps(line), flush=True)

    def run_clf(n_buckets, use_broadcast):
        from datagrowth_spark.operators.classifier import logreg_train
        t0 = time.time()
        logreg_train(clf_docs, F.col("y"), k=2, n_buckets=n_buckets,
                     use_broadcast=use_broadcast).cleanup()
        return time.time() - t0

    def run_uni(vocab_multi, use_broadcast):
        from datagrowth_spark.operators.unigram import unigram_train
        t0 = time.time()
        unigram_train(uni_wf, k=1, vocab_multi=vocab_multi,
                      use_broadcast=use_broadcast).cleanup()
        return time.time() - t0

    # join series first (cheap, warms codegen/caches symmetrically)
    for size in CLF_SIZES:
        record("logreg_train_k2", size, "join", run_clf(size, True))
    for size in UNI_SIZES + UNI_JOIN_EXTRA:
        record("unigram_train_k1", size, "join", run_uni(size, True))

    # map series, smallest first, stop past the budget
    for size in CLF_SIZES:
        sec = run_clf(size, False)
        record("logreg_train_k2", size, "map", sec)
        if sec > MAP_BUDGET_SEC:
            print(json.dumps({"op": "logreg_train_k2", "carrier": "map",
                              "stopped_after": size,
                              "reason": f">{MAP_BUDGET_SEC}s"}), flush=True)
            break
    for size in UNI_SIZES:
        sec = run_uni(size, False)
        record("unigram_train_k1", size, "map", sec)
        if sec > MAP_BUDGET_SEC:
            print(json.dumps({"op": "unigram_train_k1", "carrier": "map",
                              "stopped_after": size,
                              "reason": f">{MAP_BUDGET_SEC}s"}), flush=True)
            break

    print(json.dumps({"metric": "carrier_crossover", "rows": n,
                      "results": results}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
