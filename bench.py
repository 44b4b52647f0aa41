#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Stdout is TWO JSON lines: first the FULL record {"metric": ...,
"value": total_sec, "unit": "sec", "queries": {name: sec}, "sf": ...,
"repeats": n, "runs": {name: [sec]}} (also written to
$SPARK_GRAFT_OUT, default BENCH_FULL_LATEST.json next to this file —
the artifact BENCH_LOCAL_rNN.json snapshots copy), then a COMPACT
summary line sized to fit the driver's ~2 KB stdout-tail capture.

Each query is executed with the noop sink (full computation, no
collect-to-driver cost) after a one-off session warmup, and repeated
$SPARK_GRAFT_REPEATS times (default 3). The first execution of a query
pays Catalyst/codegen compilation (measured 2-3x steady state at sf0.1),
so per-query time is the MIN across repeats — the throughput number that
scales — while every raw run is recorded so variance is visible.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from datagrowth_spark import queries as Q
from datagrowth_spark.core.session import get_spark

HEADLINE = [
    "dedup_paragraphs_fuzzy",
    "quality_clf_scores_reloaded",
    "unigram_lm_segments_reloaded",
    "bpe_encode_reloaded",
    "dedup_exact_normalized",
    "dedup_paragraphs",
    "sql_forecast_revenue",
    "sql_important_stock",
    "sql_shipmode_priority",
    "quality_clf_earlystop",
    "quality_clf_heldout",
    "quality_clf_scores_bcast",
    "unigram_lm_segments_bcast",
    "wordpiece_trainer_merges",
    "tokenizer_fertility",
    "corpus_oov_rate",
    "quality_clf_auc",
    "quality_clf_calibration",
    "quality_kn_bigram_lm",
    "cluster_budget_select",
    "quality_clf_train",
    "quality_clf_scores",
    "unigram_lm_pieces",
    "unigram_lm_segments",
    "sql_min_cost_supplier",
    "sql_product_profit",
    "sql_top_supplier",
    "sql_discounted_revenue",
    "bpe_trainer_merges",
    "bpe_trainer_vocab",
    "bpe_encode_lengths",
    "dsir_importance",
    "sql_small_qty_revenue",
    "sql_part_promotion",
    "sql_waiting_suppliers",
    "sql_global_sales_opp",
    "pricing_summary",
    "top_orders",
    "nation_revenue",
    "returned_items",
    "top_parts_per_brand",
    "customer_order_merge",
    "customers_without_orders",
    "active_suppliers",
    "orders_rollup",
    "order_count_distribution",
    "big_orders",
    "rich_idle_customers",
    "promo_share_monthly",
    "order_priority_check",
    "supplier_diversity",
    "events_daily",
    "events_value_quantiles",
    "events_sessionize",
    "events_json_props",
    "events_asof_orders",
    "events_value_bands",
    "events_rolling",
    "events_heavy_hitters",
    "customer_rfm",
    "finished_not_pending_custs",
    "docs_by_lang",
    "text_stats",
    "text_quality",
    "docs_quality_rank",
    "docs_length_percentile",
    "text_language_id",
    "text_fingerprint",
    "text_repetition",
    "corpus_vocab",
    "corpus_pack",
    "corpus_chunks",
    "corpus_split_stratified",
    "corpus_mix_rebalance",
    "corpus_mix_temperature",
    "bpe_pair_counts",
    "tfidf_top_terms",
    "quality_threshold_by_lang",
    "quality_unigram_lm",
    "pii_scan",
    "corpus_sample",
    "curation_pipeline",
    "dedup_exact",
    "dedup_spans_crossdoc",
    "dedup_ngram_jaccard",
    "dedup_minhash",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_clusters",
    "decontamination",
    "similarity_topk",
    "similarity_topk_ivf",
    "embedding_near_dups",
    "embedding_centroids",
    "embedding_assign",
    "media_decode",
    "media_resize",
    "media_frames",
    "media_features",
    "pipeline_seed_merge",
    "pipeline_growth_enrich",
    "streaming_events_hourly",
    "streaming_dedup_exact",
    "streaming_sessionize",
    "corpus_budget_select",
    "dataset_version_diff",
    "streaming_click_attribution",
    "quality_linear_classifier",
    "nation_pair_revenue",
    "sole_supplier_orders",
    "cheapest_supplier_per_part",
    "pipeline_growth_chain",
    "dedup_span_rewrite",
    "dedup_incremental",
    "corpus_weighted_sample",
    "semantic_dedup",
    "price_quantity_regression",
    "link_pagerank",
    "pipeline_composition",
    "collection_validate",
    "dedup_containment",
    "corpus_split_leakage_safe",
    "quality_bigram_lm",
    "embedding_quantize",
    "events_funnel",
    "html_extract",
    "text_ngram_novelty",
    "events_retention",
    "events_anomaly",
    "search_bm25",
    "events_user_paths",
    "basket_part_pairs",
    "embedding_outliers",
    "events_type_pivot",
    "events_cube",
    "events_cumulative_users",
    "streaming_user_stats",
    "customer_set_ops",
    "link_triangles",
    "text_self_dedup",
    "text_char_entropy",
    "sql_frontend",
    "sql_window_topn",
    "sql_exists_suppliers",
    "sql_not_exists_customers",
    "sql_cte_setops",
    "sql_correlated_scalar",
    "curriculum_pack",
    "epoch_shuffle",
    "length_bucket_batches",
    "streaming_seed_merge",
    "streaming_dedup_incremental",
    "docs_zorder_layout",
    "sql_rollup_grouping",
    "sql_lateral_topn",
    "sql_in_subquery_having",
    "dedup_canonicalize_quality",
    "url_canonicalize",
    "text_winnow_fingerprints",
    "corpus_token_drift",
    "source_quota_enforce",
    "decontamination_winnow",
    "entity_match_blocks",
    "dedup_winnow_pairs",
    "sql_time_range_window",
    "token_bigram_topk",
    "embedding_hard_negatives",
    "boilerplate_prefixes",
    "mixture_token_plan",
    "lm_heldout_perplexity",
    "sql_volume_shipping",
    "sql_market_share",
    "gopher_quality_rules",
    "ccnet_perplexity_buckets",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="datagrowth-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm up the JVM/session so the first measured query doesn't pay
    # session-bootstrap costs: exercise codegen, the parquet scan
    # codepath (on the 5-row region table — no query data precomputed),
    # and the noop sink's class loading.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")) \
        .write.format("noop").mode("overwrite").save()

    repeats = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
    registry = Q.queries()
    # Optional subset run (comma-separated names): used for BASELINE v2
    # top-ups — record >=7-repeat medians for queries added after the
    # last full baseline pass without re-running the whole surface.
    only = os.environ.get("SPARK_GRAFT_ONLY", "")
    if only:
        wanted = {n for n in only.split(",") if n}
        unknown = wanted - set(HEADLINE)
        if unknown:
            # a typo must fail loudly, not yield a silently-partial run
            # that baseline_v2_topup.py would accept (ADVICE r9)
            raise SystemExit(
                f"SPARK_GRAFT_ONLY names not in HEADLINE: {sorted(unknown)}")
        headline = [n for n in HEADLINE if n in wanted]
    else:
        headline = HEADLINE
    runs: dict[str, list[float]] = {name: [] for name in headline}
    errors: dict[str, str] = {}
    for _ in range(repeats):
        for name in headline:
            if name in errors:
                continue  # failed once — don't burn repeats re-failing
            fn = registry[name]
            t0 = time.time()
            try:
                fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            except Exception as exc:  # per-query isolation: one failure
                # must never wipe the whole bench record (round-2 lesson)
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
                continue
            runs[name].append(round(time.time() - t0, 3))

    timings = {name: min(times) for name, times in runs.items() if times}
    total = round(sum(timings.values()), 3)
    # Streaming rows: wall time includes stream startup/drain machinery;
    # record the micro-batch compute separately so rounds compare on
    # query work, not harness overhead.
    try:
        from datagrowth_spark.streaming.events import LAST_DRAIN_METRICS
        streaming_detail = {
            n: dict(m) for n, m in LAST_DRAIN_METRICS.items()
        }
    except Exception:
        streaming_detail = {}
    record = {
        "metric": "headline_queries_total_time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "repeats": repeats,
        "runs": runs,
    }
    if streaming_detail:
        record["streaming_drain"] = streaming_detail
    if errors:
        # A partial run must never look better than a clean one: flag it
        # and null the headline so totals over different query sets are
        # never compared (ADVICE r3).
        record["errors"] = errors
        record["partial"] = True
        record["value"] = None
        record["timed_queries_total_time"] = total
    print(json.dumps(record))
    # The driver captures only the LAST ~2 KB of stdout, so the full
    # record above (raw runs for 160+ queries) truncates to an
    # unparseable fragment (BENCH_r08/r09 both had parsed=null). Write
    # the full record to a file and END stdout with a compact one-line
    # summary that fits the tail capture: total, sf, repeats, and the
    # slowest per-query medians (the ones a perf reader checks first).
    out_path = os.environ.get(
        "SPARK_GRAFT_OUT",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "BENCH_FULL_LATEST.json"))
    try:
        with open(out_path, "w") as fh:
            json.dump(record, fh)
    except OSError as exc:
        print(f"bench: could not write {out_path}: {exc}", file=sys.stderr)
    slowest = dict(sorted(timings.items(), key=lambda kv: -kv[1])[:15])
    compact = {
        "metric": record["metric"],
        "value": record["value"],
        "unit": "sec",
        "sf": record["sf"],
        "repeats": repeats,
        "queries_timed": len(timings),
        "queries": {k: round(v, 3) for k, v in slowest.items()},
        "queries_omitted": max(0, len(timings) - len(slowest)),
        "full_record": os.path.basename(out_path),
    }
    if errors:
        compact["partial"] = True
        compact["errors"] = len(errors)
        compact["timed_queries_total_time"] = total
    print(json.dumps(compact))
    spark.stop()


if __name__ == "__main__":
    main()
