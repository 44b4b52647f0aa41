"""Token-budget selection (operators/selection.py) and version diff
(plans/dataset.py:version_diff)."""

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators.selection import budget_threshold, select_by_token_budget
from datagrowth_spark.plans.dataset import version_diff


@pytest.fixture(scope="module")
def scored(spark):
    # (doc, stratum, quality, tokens)
    rows = [
        (1, "en", 0.9, 100), (2, "en", 0.8, 150), (3, "en", 0.7, 100),
        (4, "en", 0.6, 50),
        (5, "de", 0.95, 300), (6, "de", 0.5, 10),
    ]
    return spark.createDataFrame(rows, "doc_id long, lang string, q double, toks long")


class TestBudgetSelect:
    def test_inclusive_budget_per_stratum(self, scored):
        out = {r["doc_id"]: r["kept"] for r in
               select_by_token_budget(scored, ["lang"], "q", "toks",
                                      budget=260, tiebreak_col="doc_id").collect()}
        # en: 100 (doc1) + 150 (doc2) = 250 <= 260; doc3 would reach 350 -> out
        assert out == {1: True, 2: True, 3: False, 4: False, 5: False, 6: False}
        # de: best doc alone (300) exceeds the budget -> nothing kept

    def test_whole_documents_only(self, scored):
        out = {r["doc_id"]: r["kept"] for r in
               select_by_token_budget(scored, ["lang"], "q", "toks",
                                      budget=100, tiebreak_col="doc_id").collect()}
        assert out[1] is True and out[2] is False  # doc2 doesn't fit partially

    def test_tiebreak_deterministic(self, spark):
        ties = spark.createDataFrame(
            [(2, "en", 0.5, 60), (1, "en", 0.5, 60)],
            "doc_id long, lang string, q double, toks long")
        out = {r["doc_id"]: r["kept"] for r in
               select_by_token_budget(ties, ["lang"], "q", "toks",
                                      budget=60, tiebreak_col="doc_id").collect()}
        assert out == {1: True, 2: False}  # lower doc_id wins the tie


class TestShardedConstruction:
    def test_sharded_equals_single_window(self, spark):
        """r9 sharded rewrite: the sharded exact construction must be
        row-for-row identical to the plain per-stratum window on a
        skewed fixture (one hot stratum, score ties, NULL scores)."""
        import random
        rng = random.Random(7)
        rows = []
        for i in range(400):
            stratum = "hot" if i % 4 else f"s{i % 3}"
            score = None if i % 97 == 0 else round(rng.random() * 0.2, 2)
            rows.append((i, stratum, score, rng.randint(10, 200)))
        df = spark.createDataFrame(
            rows, "doc_id long, lang string, q double, toks long")
        kw = dict(strata_cols=["lang"], score_col="q", tokens_col="toks",
                  budget=3000, tiebreak_col="doc_id")
        sharded = {r["doc_id"]: r["kept"] for r in select_by_token_budget(
            df.repartition(7), num_shards=16, **kw).collect()}
        plain = {r["doc_id"]: r["kept"] for r in select_by_token_budget(
            df, num_shards=1, **kw).collect()}
        assert sharded == plain
        assert any(plain.values()) and not all(plain.values())

    def test_more_shards_than_distinct_scores(self, spark):
        df = spark.createDataFrame(
            [(i, "en", float(i % 2), 50) for i in range(10)],
            "doc_id long, lang string, q double, toks long")
        out = {r["doc_id"]: r["kept"] for r in select_by_token_budget(
            df, ["lang"], "q", "toks", budget=150, tiebreak_col="doc_id",
            num_shards=64).collect()}
        # top scores (q=1.0: ids 1,3,5,7,9) fill 150 tokens -> 3 kept
        assert [k for k, v in sorted(out.items()) if v] == [1, 3, 5]


class TestBudgetThreshold:
    def test_cut_approximates_budget(self, spark):
        # 100 docs, quality = i/100, 10 tokens each; budget 200 tokens
        # -> exact answer keeps the top 20 scores (cut 0.80).
        rows = [(i, "en", i / 100.0, 10) for i in range(100)]
        df = spark.createDataFrame(rows, "doc_id long, lang string, q double, toks long")
        cut = budget_threshold(df, ["lang"], "q", "toks", budget=200, bins=100)
        got = cut.collect()[0]["score_cut"]
        assert got == pytest.approx(0.80, abs=0.011)
        kept_toks = df.where(F.col("q") >= got).agg(F.sum("toks")).collect()[0][0]
        assert kept_toks <= 200 + 10  # overshoot bounded by one bucket


class TestVersionDiff:
    def test_statuses(self, spark):
        v1 = spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string")
        v2 = spark.createDataFrame(
            [(1, "a"), (2, "B"), (4, "d")], "doc_id long, text string")
        got = {r["key"]: r["status"] for r in
               version_diff(v1, v2, key="doc_id", fingerprint=F.md5("text")).collect()}
        assert got == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}
