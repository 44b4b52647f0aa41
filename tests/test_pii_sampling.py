"""PII scrubbing + deterministic sampling tests (beyond-reference layer)."""

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.functions.pii import pii_count, pii_counts, redact_pii
from datagrowth_spark.operators.sampling import hash_bucket, stratified_sample


def _texts(spark, rows):
    return spark.createDataFrame(rows, "id long, text string")


class TestPii:
    def test_counts_per_kind(self, spark):
        df = _texts(spark, [
            (1, "mail a@b.com and c.d+e@f.org, ip 10.0.0.1, call 555-123-4567"),
            (2, "nothing sensitive here"),
        ])
        got = {r["id"]: r for r in df.select(
            "id",
            pii_counts("text")["email"].alias("e"),
            pii_count("text", "ipv4").alias("i"),
            pii_count("text", "phone").alias("p"),
        ).collect()}
        assert (got[1]["e"], got[1]["i"], got[1]["p"]) == (2, 1, 1)
        assert (got[2]["e"], got[2]["i"], got[2]["p"]) == (0, 0, 0)

    def test_redaction_replaces_all_matches(self, spark):
        df = _texts(spark, [(1, "a@b.com then 1.2.3.4 then 555-123-4567 end")])
        out = df.select(redact_pii("text").alias("r")).collect()[0]["r"]
        assert out == "<PII> then <PII> then <PII> end"

    def test_phone_not_double_counted_as_ip(self, spark):
        df = _texts(spark, [(1, "dial 555-123-4567 now")])
        row = df.select(pii_count("text", "ipv4").alias("i"),
                        pii_count("text", "phone").alias("p")).collect()[0]
        assert (row["i"], row["p"]) == (0, 1)


class TestSampling:
    def test_bucket_is_deterministic_and_partition_independent(self, spark):
        df = spark.range(0, 200).withColumnRenamed("id", "k")
        a = {r["k"]: r["b"] for r in df.select("k", hash_bucket("k").alias("b")).collect()}
        b = {r["k"]: r["b"] for r in df.repartition(7).select("k", hash_bucket("k").alias("b")).collect()}
        assert a == b
        assert all(0 <= v < 100 for v in a.values())

    def test_stratified_rates_roughly_hold(self, spark):
        rows = [(i, "en" if i % 2 == 0 else "zh") for i in range(1000)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        out = stratified_sample(df, {"en": 50}, "lang", "doc_id", default_rate=10)
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        # 500 per stratum; md5 buckets are near-uniform.
        assert 200 < counts["en"] < 300
        assert 20 < counts.get("zh", 0) < 80

    def test_sample_stable_under_reordering(self, spark):
        rows = [(i, "en") for i in range(300)]
        df = spark.createDataFrame(rows, "doc_id long, lang string")
        ids1 = {r["doc_id"] for r in stratified_sample(df, {"en": 30}, "lang", "doc_id").collect()}
        shuffled = df.orderBy(F.rand(7))
        ids2 = {r["doc_id"] for r in stratified_sample(shuffled, {"en": 30}, "lang", "doc_id").collect()}
        assert ids1 == ids2

    def test_salt_changes_sample(self, spark):
        df = spark.createDataFrame([(i, "en") for i in range(300)], "doc_id long, lang string")
        a = {r["doc_id"] for r in stratified_sample(df, {"en": 30}, "lang", "doc_id", salt="s1").collect()}
        b = {r["doc_id"] for r in stratified_sample(df, {"en": 30}, "lang", "doc_id", salt="s2").collect()}
        assert a != b


class TestWeightedSample:
    """weighted_sample — deterministic Efraimidis-Spirakis top-k."""

    def test_partition_layout_invariant(self, spark):
        from datagrowth_spark.operators.sampling import weighted_sample

        df = spark.range(500).select(
            F.col("id").alias("doc_id"), (F.col("id") % 50 + 1).alias("w"))
        a = [r["doc_id"] for r in weighted_sample(df, "w", "doc_id", 50).collect()]
        b = [r["doc_id"] for r in
             weighted_sample(df.repartition(13), "w", "doc_id", 50).collect()]
        assert a == b and len(a) == 50

    def test_heavy_weights_dominate(self, spark):
        from datagrowth_spark.operators.sampling import weighted_sample

        # weight 1000 vs weight 1: the heavy half should dominate the
        # sample (in expectation ~all of it; assert a safe margin).
        df = spark.range(400).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") < 200, 1000).otherwise(1).alias("w"))
        got = weighted_sample(df, "w", "doc_id", 100).collect()
        heavy = sum(1 for r in got if r["doc_id"] < 200)
        assert heavy >= 90

    def test_zero_weight_excluded_and_k_truncates(self, spark):
        from datagrowth_spark.operators.sampling import weighted_sample

        df = spark.range(10).select(
            F.col("id").alias("doc_id"),
            F.when(F.col("id") % 2 == 0, 5).otherwise(0).alias("w"))
        got = weighted_sample(df, "w", "doc_id", 100).collect()
        assert sorted(r["doc_id"] for r in got) == [0, 2, 4, 6, 8]


class TestDsirImportance:
    """dsir_importance (operators/sampling.py): hashed-feature LLR
    importance weights for target-domain resampling."""

    def test_target_like_docs_score_higher(self, spark):
        from pyspark.sql import functions as F

        from datagrowth_spark.operators.sampling import dsir_importance

        rows = []
        # target docs share a small vocabulary; off-target uses another
        for d in range(3):
            rows += [(f"t{d}", "en", w) for w in ["alpha", "beta", "gamma"] * 4]
        for d in range(3):
            rows += [(f"r{d}", "xx", w) for w in ["delta", "epsilon", "zeta"] * 4]
        # a raw doc written in the target vocabulary
        rows += [("mix", "xx", w) for w in ["alpha", "beta", "gamma"] * 4]
        toks = spark.createDataFrame(rows, "doc_id string, lang string, token string")
        out = dsir_importance(toks, F.col("lang") == "en", n_buckets=64)
        scores = {r["doc_id"]: r["importance"] for r in out.collect()}
        # target-vocabulary docs (including the raw 'mix' one) beat the
        # off-target docs
        assert scores["mix"] > scores["r0"]
        assert scores["t0"] == scores["mix"]  # same profile, same weight
        assert all(scores[f"t{d}"] > scores[f"r{d}"] for d in range(3))

    def test_token_counts_preserved(self, spark):
        from pyspark.sql import functions as F

        from datagrowth_spark.operators.sampling import dsir_importance

        toks = spark.createDataFrame(
            [("a", "en", "x"), ("a", "en", "y"), ("b", "xx", "x")],
            "doc_id string, lang string, token string")
        out = dsir_importance(toks, F.col("lang") == "en")
        got = {r["doc_id"]: r["n_tokens"] for r in out.collect()}
        assert got == {"a": 2, "b": 1}
