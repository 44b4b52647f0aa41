#!/usr/bin/env python
"""Isolated-repeat verdict for scale-smoke swings (house rule: before
calling an in-smoke number a regression, isolate the op and repeat
>= 3 times warm on a quiet box).

Reproduces scale_smoke.py's synthetic docs frame at the given scale,
then runs ONLY the named ops: one discarded warmup + N timed warm
repeats each. Prints one JSON line per op with all repeats + median.

Run: SPARK_GRAFT_DRIVER_MEM=48g python scripts/isolate_repeat.py \
         [rows_millions] [repeats] [op ...]
Ops: token_budget_select budget_threshold_rank_free
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datagrowth_spark.core.session import get_spark


def main() -> None:
    scale_m = float(sys.argv[1]) if len(sys.argv) > 1 else 100.0
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    ops = sys.argv[3:] or ["token_budget_select", "budget_threshold_rank_free"]
    n = int(scale_m * 1_000_000)
    spark = get_spark(app_name="isolate-repeat")
    spark.sparkContext.setLogLevel("ERROR")

    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc text "),
                     (F.col("id") % (n // 20)).cast("string")).alias("text"),
            (F.xxhash64("id") % 20).cast("int").alias("stratum"),
            (F.xxhash64("id", F.lit(1)) % 997).cast("double").alias("score"),
            (F.abs(F.xxhash64("id", F.lit(2))) % 900 + 100)
            .cast("long").alias("n_tokens"),
        )
    )

    def run_token_budget_select():
        from datagrowth_spark.operators.selection import select_by_token_budget
        select_by_token_budget(docs, ["stratum"], "score", "n_tokens",
                               budget=10_000_000, tiebreak_col="doc_id",
                               num_shards=32) \
            .write.format("noop").mode("overwrite").save()

    def run_budget_threshold_rank_free():
        from datagrowth_spark.operators.selection import budget_threshold
        budget_threshold(
            docs.withColumn("score01", (F.col("score") % 1000) / 1000.0),
            ["stratum"], "score01", "n_tokens", budget=10_000_000) \
            .write.format("noop").mode("overwrite").save()

    def run_weighted_sample_topk():
        from datagrowth_spark.operators.sampling import weighted_sample
        weighted_sample(docs, "n_tokens", "doc_id", k=1000) \
            .write.format("noop").mode("overwrite").save()

    def run_span_rewrite():
        from datagrowth_spark.operators.dedup import drop_duplicated_spans
        small = docs.where(F.col("doc_id") < n // 10).withColumn(
            "text", F.concat(F.lit("a b c d e f g h i j k l m n o p q r s t u "),
                             (F.col("doc_id") % (n // 200)).cast("string")))
        drop_duplicated_spans(small, "text", "doc_id", n=8) \
            .select(F.sum("n_removed")).write.format("noop").mode("overwrite").save()

    def _unigram(k):
        from datagrowth_spark.operators.unigram import unigram_train
        wf = (docs.select(F.explode(F.split("text", " ")).alias("w"))
              .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
        unigram_train(wf, k=k).cleanup()

    runners = {
        "token_budget_select": run_token_budget_select,
        "budget_threshold_rank_free": run_budget_threshold_rank_free,
        "weighted_sample_topk": run_weighted_sample_topk,
        "span_rewrite_1m_docs": run_span_rewrite,
        # warm-repeat halves of the unigram per-round marginal: the
        # in-smoke k1/k2 deltas are confounded by whichever variant
        # pays the big DP expression's codegen compile first; warm
        # medians of each isolate the true per-round cost.
        "unigram_train_k1": lambda: _unigram(1),
        "unigram_train_k2": lambda: _unigram(2),
    }
    for op in ops:
        fn = runners[op]
        fn()  # warmup, discarded
        times = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            times.append(round(time.time() - t0, 2))
        print(json.dumps({"op": op, "rows": n, "unit": "sec",
                          "repeats": times,
                          "median": statistics.median(times)}), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
