"""Degenerate-vector hardening for the embedding operator family:
zero vectors (cosine divides by zero norm), constant vectors (zero
quantization range), and single-member clusters. Asserts no crash and
contract-respecting outputs — real embedding dumps contain all three."""

import math

import pytest

from pyspark.sql import functions as F

VECS = [
    (1, [1.0, 0.0, 0.0, 0.0], "a"),
    (2, [0.0, 0.0, 0.0, 0.0], "a"),   # zero vector
    (3, [0.5, 0.5, 0.5, 0.5], "b"),
    (4, [-1.0, 0.0, 0.0, 0.0], "c"),  # single-member label
    (5, [2.0, 2.0, 2.0, 2.0], "b"),   # collinear with 3
]


@pytest.fixture()
def emb(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>, label string")


def test_cosine_topk_zero_vectors_dont_crash_or_rank(spark, emb):
    from datagrowth_spark.operators.similarity import cosine_topk

    queries = emb.where(F.col("vec_id") == 1).select(
        F.col("vec_id").alias("query_id"), F.col("embedding"))
    got = cosine_topk(emb, queries, k=5).collect()
    # ANSI mode: a bare divide would abort the job on the zero vector;
    # try_divide yields NULL, which must rank BELOW every real score
    by_rank = sorted(got, key=lambda r: r["rank"])
    assert by_rank[0]["vec_id"] == 3 and by_rank[0]["cos_sim"] == 0.5
    zero_row = [r for r in got if r["vec_id"] == 2]
    assert zero_row and zero_row[0]["cos_sim"] is None
    assert zero_row[0]["rank"] == max(r["rank"] for r in got)


def test_quantize_constant_and_zero_vectors(spark, emb):
    from datagrowth_spark.operators.similarity import quantize_embeddings

    got = {r["vec_id"]: r for r in quantize_embeddings(emb).collect()}
    assert len(got) == len(VECS)
    q2 = got[2]          # zero vector: scale must not be NaN/inf
    for v in q2["q"]:
        assert v == 0
    q5 = got[5]          # constant vector quantizes to full-scale codes
    assert len(set(q5["q"])) == 1


def test_single_member_centroid_assignment(spark, emb):
    from datagrowth_spark.operators import clustering as CL

    cents = CL.centroid_vectors(CL.label_centroids(emb, "label"), "label")
    assigned = {r["vec_id"]: r["assigned"]
                for r in CL.assign_to_centroids(emb, cents, keep_cols=("label",)).collect()}
    assert assigned[4] == "c"     # its own singleton centroid wins exactly
    assert assigned[1] == "a"


def test_mix_rebalance_zero_weight_source_drops_not_crashes(spark):
    from datagrowth_spark.operators.mixing import mixture_rates

    df = spark.createDataFrame(
        [(i, "a" if i % 2 else "b") for i in range(100)], "doc_id long, source string")
    rates = {r["source"]: r["rate_permille"]
             for r in mixture_rates(df, {"a": 1.0, "b": 0.0}, source_col="source").collect()}
    assert rates["b"] == 0          # zero weight = dropped, not DIVIDE_BY_ZERO
    assert rates["a"] == 1000
