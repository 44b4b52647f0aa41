"""Unit tests for functions/text.py helpers whose main check is the
sf0.01 oracle (edge cases the corpus doesn't exercise)."""

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.functions.text import hashed_features, hashed_linear_score


@pytest.fixture()
def texts(spark):
    return spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "single"), (3, ""), (4, "Alpha  beta")],
        "doc_id long, text string",
    )


class TestHashedLinear:
    def test_feature_space(self, texts):
        rows = {r["doc_id"]: r["f"] for r in
                texts.select("doc_id", hashed_features("text").alias("f")).collect()}
        assert rows[1] == ["alpha", "beta", "gamma", "alpha_beta", "beta_gamma"]
        assert rows[2] == ["single"]  # no bigrams for a single token
        assert rows[3] == []
        # lowercased + whitespace runs collapse
        assert rows[4] == ["alpha", "beta", "alpha_beta"]

    def test_score_deterministic_and_bounded(self, texts):
        out = texts.select("doc_id", hashed_linear_score("text").alias("s")).collect()
        scores = {r["doc_id"]: r["s"] for r in out}
        assert scores[3] == 0.0  # empty text -> guarded denominator
        assert all(-0.5 <= s <= 0.5 for s in scores.values())
        again = {r["doc_id"]: r["s"] for r in
                 texts.select("doc_id", hashed_linear_score("text").alias("s")).collect()}
        assert scores == again
