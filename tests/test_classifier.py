"""Distributed logistic-regression trainer (operators/classifier.py):
learning on a separable fixture, layout-independence, integer-unit
determinism, scoring-path consistency, cache lifecycle."""

import math

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators.classifier import (
    LogRegModel, _round_half_away, logreg_train)


def _docs(spark):
    """Separable toy corpus: positives carry 'alpha beta', negatives
    'gamma delta'; shared filler words appear in both classes."""
    rows = []
    for i in range(40):
        if i % 2 == 0:
            rows.append((i, "alpha beta filler words here alpha beta", 1))
        else:
            rows.append((i, "gamma delta filler words here gamma delta", 0))
    return spark.createDataFrame(rows, "doc_id long, text string, y int")


class TestLogRegTrain:
    def test_learns_separable_classes(self, spark):
        docs = _docs(spark)
        res = logreg_train(docs, F.col("y") == 1, k=3, n_buckets=256, lr=50.0)
        try:
            p = res.model.probability(F.col("text"))
            stats = {r["y"]: r["avg_p"] for r in docs.select(
                "y", p.alias("p")).groupBy("y").agg(
                F.avg("p").alias("avg_p")).collect()}
            assert stats[1] > 0.6 > 0.4 > stats[0]
        finally:
            res.cleanup()

    def test_loss_decreases(self, spark):
        docs = _docs(spark)
        y = F.col("y") == 1
        losses = []
        for k in (0, 1, 3):
            res = logreg_train(docs, y, k=k, n_buckets=256, lr=50.0)
            try:
                p = res.model.probability(F.col("text"))
                pc = F.least(F.greatest(p, F.lit(1e-6)), F.lit(1 - 1e-6))
                yd = y.cast("double")
                loss = docs.select(
                    (-(yd * F.log(pc) + (1 - yd) * F.log(1 - pc))).alias("l")
                ).agg(F.avg("l")).collect()[0][0]
                losses.append(loss)
            finally:
                res.cleanup()
        assert losses[0] > losses[1] > losses[2]

    def test_weights_layout_independent(self, spark):
        """Integer-unit sums are exact, so the trained model is
        bit-identical on any partitioning — the determinism contract."""
        docs = _docs(spark)
        a = logreg_train(docs.repartition(13), F.col("y") == 1,
                         k=2, n_buckets=256, lr=50.0)
        b = logreg_train(docs.coalesce(1), F.col("y") == 1,
                         k=2, n_buckets=256, lr=50.0)
        try:
            assert a.model.w6 == b.model.w6
            assert a.grad_norms == b.grad_norms
        finally:
            a.cleanup()
            b.cleanup()

    def test_first_step_gradient_is_half_residual(self, spark):
        """With w0 = 0 every p is exactly 0.5, so the step-1 per-doc
        nano-residual is round((500000 - 1e6·y)·1000/n) — checkable in
        closed form on a one-doc corpus."""
        docs = spark.createDataFrame(
            [(1, "alpha beta", 1)], "doc_id long, text string, y int")
        # features: alpha, beta, alpha_beta -> n = 3
        res = logreg_train(docs, F.col("y") == 1, k=1, n_buckets=64, lr=6.0)
        try:
            r9 = _round_half_away((500000 - 1000000) * 1000.0 / 3)
            # each of the 3 features has tf=1 -> g9 = r9; N = 1
            expected_delta = _round_half_away(-6.0 * r9 / (1000.0 * 1))
            nonzero = sorted(w for w in res.model.w6 if w != 0)
            assert nonzero and all(w == expected_delta for w in nonzero)
        finally:
            res.cleanup()

    def test_docs_without_features_excluded(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha beta", 1), (2, "", 0), (3, "   ", 0)],
            "doc_id long, text string, y int")
        res = logreg_train(docs, F.col("y") == 1, k=1, n_buckets=64)
        try:
            # only doc 1 contributes: all updates share its residual sign
            assert all(w >= 0 for w in res.model.w6)
            assert any(w > 0 for w in res.model.w6)
        finally:
            res.cleanup()

    def test_cleanup_releases_caches(self, spark):
        docs = _docs(spark)
        res = logreg_train(docs, F.col("y") == 1, k=1, n_buckets=64)
        assert res.caches
        res.cleanup()
        assert res.caches == []


class TestLogRegModel:
    def test_probability_matches_manual_sigmoid(self, spark):
        docs = _docs(spark)
        res = logreg_train(docs, F.col("y") == 1, k=2, n_buckets=256, lr=50.0)
        try:
            row = docs.select(
                res.model.margin(F.col("text")).alias("m"),
                res.model.probability(F.col("text")).alias("p"),
            ).limit(1).collect()[0]
            want = _round_half_away(
                1000000.0 / (1.0 + math.exp(-row["m"]))) / 1000000.0
            assert row["p"] == want
        finally:
            res.cleanup()

    def test_empty_model_scores_half(self, spark):
        model = LogRegModel([0] * 64, 64)
        frame = spark.createDataFrame([("hello world",)], "text string")
        (row,) = frame.select(
            model.probability(F.col("text")).alias("p")).collect()
        assert row["p"] == 0.5


class TestRoundHalfAway:
    @pytest.mark.parametrize("x,want", [
        (0.5, 1), (1.5, 2), (-0.5, -1), (-1.5, -2), (0.49, 0), (-0.49, 0),
        (2.0, 2), (-2.0, -2),
    ])
    def test_matches_sql_round(self, x, want):
        assert _round_half_away(x) == want


class TestBroadcastCarrier:
    """The one-row broadcast weight-map carrier (r9 verdict item 1)
    must be bit-equal to the literal expression on every surface:
    training trajectory, final weights, apply-path scores."""

    def test_training_bit_equal_across_carriers(self, spark):
        docs = _docs(spark)
        y = F.col("y") == 1
        lit_res = logreg_train(docs, y, k=3, n_buckets=256, lr=50.0,
                               use_broadcast=False)
        bc_res = logreg_train(docs, y, k=3, n_buckets=256, lr=50.0,
                              use_broadcast=True)
        try:
            assert lit_res.model.w6 == bc_res.model.w6
            assert lit_res.grad_norms == bc_res.grad_norms
        finally:
            lit_res.cleanup()
            bc_res.cleanup()

    def test_scores_bit_equal_across_carriers(self, spark):
        docs = _docs(spark)
        res = logreg_train(docs, F.col("y") == 1, k=2, n_buckets=256,
                           lr=50.0)
        try:
            lit = res.model.score_docs(docs, use_broadcast=False)
            bc = res.model.score_docs(docs, use_broadcast=True)
            lit_rows = {r["doc_id"]: r["score"]
                        for r in lit.select("doc_id", "score").collect()}
            bc_rows = {r["doc_id"]: r["score"]
                       for r in bc.select("doc_id", "score").collect()}
            assert lit_rows == bc_rows
            # same output columns either way (no __wmap leakage)
            assert lit.columns == bc.columns
        finally:
            res.cleanup()

    def test_broadcast_plan_is_hash_join_no_literal_map(self, spark):
        """The broadcast carrier's physical plan HASH-joins the weight
        frame (O(1) codegen'd lookup per feature) instead of inlining
        a map carrier (whose element_at is a linear scan — the
        measured r10 cliff) or folding a one-row broadcast dense array
        (interpreted HOF — the measured r12 4–8× regression). The
        literal carrier inlines the dense array with no broadcast or
        map at all."""
        docs = _docs(spark)
        res = logreg_train(docs, F.col("y") == 1, k=1, n_buckets=256,
                           lr=50.0)
        try:
            bc_plan = res.model.score_docs(
                docs, use_broadcast=True)._jdf.queryExecution() \
                .executedPlan().toString()
            assert "BroadcastHashJoin" in bc_plan
            assert "map_from_arrays" not in bc_plan
            lit_plan = res.model.score_docs(
                docs, use_broadcast=False)._jdf.queryExecution() \
                .executedPlan().toString()
            assert "BroadcastExchange" not in lit_plan
            assert "map_from_arrays" not in lit_plan
        finally:
            res.cleanup()

    def test_empty_model_broadcast_keeps_rows(self, spark):
        """An all-zero model's weight frame is EMPTY — the left join
        must keep every corpus row and backfill sigmoid(0) = 0.5."""
        docs = _docs(spark)
        model = LogRegModel([0] * 64, 64)
        out = model.score_docs(docs, use_broadcast=True)
        assert out.count() == docs.count()
        # sigmoid(0) everywhere
        assert {r["score"] for r in out.select("score").collect()} == {0.5}

    def test_null_text_scores_null_on_both_carriers(self, spark):
        """A NULL text yields a NULL score on BOTH carriers (r10
        advisory): the literal path's NULL margin propagates, and the
        join path's 0.5 backfill is gated on text being non-null. An
        EMPTY text is 0.5 on both."""
        docs = spark.createDataFrame(
            [(1, "alpha beta", 1), (2, None, 0), (3, "", 0)],
            "doc_id long, text string, y int")
        trained = logreg_train(docs.where(F.col("text").isNotNull()),
                               F.col("y") == 1, k=1, n_buckets=64, lr=50.0)
        try:
            for model in (trained.model, LogRegModel([0] * 64, 64)):
                lit = {r["doc_id"]: r["score"] for r in model.score_docs(
                    docs, use_broadcast=False).collect()}
                bc = {r["doc_id"]: r["score"] for r in model.score_docs(
                    docs, use_broadcast=True).collect()}
                assert lit == bc
                assert lit[2] is None
                assert lit[3] == 0.5
        finally:
            trained.cleanup()

    def test_null_id_scores_equal_on_both_carriers(self, spark):
        """A NULL id row keeps its real score on the join carrier (the
        join-back is null-safe — ADVICE r11): before eqNullSafe the
        null-unsafe equi-join dropped the aggregated score and the row
        silently fell to the 0.5 backfill while the literal path
        computed the true probability."""
        docs = spark.createDataFrame(
            [(1, "alpha beta gamma", 1), (None, "alpha beta gamma", 1),
             (3, "delta epsilon", 0)],
            "doc_id long, text string, y int")
        trained = logreg_train(docs.where(F.col("doc_id").isNotNull()),
                               F.col("y") == 1, k=2, n_buckets=64, lr=50.0)
        try:
            lit = {r["doc_id"]: r["score"] for r in trained.model.score_docs(
                docs, use_broadcast=False).collect()}
            bc = {r["doc_id"]: r["score"] for r in trained.model.score_docs(
                docs, use_broadcast=True).collect()}
            assert lit == bc
            # the NULL-id row has the same text as doc 1 — same score,
            # and NOT the 0.5 backfill
            assert bc[None] == bc[1]
        finally:
            trained.cleanup()


class TestAutoCarrierSelection:
    """MAP_BCAST_THRESHOLD = 256: both training and scoring auto-select
    the carrier on ``n_buckets`` (r12 — the literal carrier is an
    n_buckets-long dense-array expression regardless of sparsity, so
    the non-zero entry count no longer matters). Observables: the
    train result's ``carrier`` attribute and the scoring plan's
    broadcast hash join."""

    def test_train_auto_selects_on_bucket_count(self, spark):
        docs = _docs(spark)
        y = F.col("y") == 1
        joined = logreg_train(docs, y, k=1, n_buckets=257)
        literal = logreg_train(docs, y, k=1, n_buckets=256)
        try:
            assert joined.carrier == "broadcast"
            assert literal.carrier == "literal"
        finally:
            joined.cleanup()
            literal.cleanup()

    def test_score_auto_selects_on_bucket_count(self, spark):
        docs = _docs(spark)
        big = LogRegModel([1] * 257, 257)      # 257 buckets > 256
        small = LogRegModel([1] * 256, 256)    # 256 buckets, at bound
        big_plan = big.score_docs(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        small_plan = small.score_docs(docs)._jdf.queryExecution() \
            .executedPlan().toString()
        assert "BroadcastHashJoin" in big_plan
        assert "BroadcastExchange" not in small_plan


class TestEarlyStop:
    def test_stop_rule_fires_and_truncates(self, spark):
        """stop_num=0 makes the rule fire on step 2 (norm*den >= 0
        always) — training runs exactly 2 of the 5 budgeted steps."""
        docs = _docs(spark)
        res = logreg_train(docs, F.col("y") == 1, k=5, n_buckets=256,
                           lr=50.0, stop_num=0, stop_den=1)
        try:
            assert res.stopped_early
            assert len(res.grad_norms) == 2
        finally:
            res.cleanup()

    def test_stop_rule_never_fires_runs_budget(self, spark):
        """An unsatisfiable rule (norm_i*1 >= norm_{i-1}*10**6) runs
        all k steps with stopped_early=False."""
        docs = _docs(spark)
        res = logreg_train(docs, F.col("y") == 1, k=3, n_buckets=256,
                           lr=50.0, stop_num=10**6, stop_den=1)
        try:
            assert not res.stopped_early
            assert len(res.grad_norms) == 3
        finally:
            res.cleanup()

    def test_stopped_prefix_matches_unstopped_run(self, spark):
        """Early stopping is a pure truncation: the executed steps'
        norms and the weights after the stop step equal the same-k
        unstopped run (determinism of the integer trajectory)."""
        docs = _docs(spark)
        y = F.col("y") == 1
        full = logreg_train(docs, y, k=2, n_buckets=256, lr=50.0)
        stopped = logreg_train(docs, y, k=5, n_buckets=256, lr=50.0,
                               stop_num=0, stop_den=1)
        try:
            assert stopped.grad_norms == full.grad_norms
            assert stopped.model.w6 == full.model.w6
        finally:
            full.cleanup()
            stopped.cleanup()


class TestTrainSubsetEval:
    def test_n_docs_counts_feature_bearing_docs(self, spark):
        docs = _docs(spark)
        res = logreg_train(docs, F.col("y") == 1, k=1, n_buckets=256,
                           lr=50.0)
        try:
            assert res.n_docs == docs.count()  # every fixture doc has text
        finally:
            res.cleanup()

    def test_training_on_subset_ignores_heldout_rows(self, spark):
        """Weights trained on a filtered frame equal weights trained on
        a frame that never contained the held-out rows — the subset
        join leaks nothing."""
        docs = _docs(spark)
        subset = docs.where(F.col("doc_id") < 20)
        via_filter = logreg_train(docs.where(F.col("doc_id") < 20),
                                  F.col("y") == 1, k=2, n_buckets=256,
                                  lr=50.0)
        direct = logreg_train(subset, F.col("y") == 1, k=2, n_buckets=256,
                              lr=50.0)
        try:
            assert via_filter.model.w6 == direct.model.w6
            assert via_filter.n_docs == direct.n_docs == 20
        finally:
            via_filter.cleanup()
            direct.cleanup()
