"""IVF (KMeans coarse quantizer + multi-probe) similarity tests.

The exactness bar for an ANN index is recall against brute force —
deterministic here via seeded KMeans and fixed test data.
"""

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators.similarity import (
    build_ivf_index,
    cosine_topk,
    cosine_topk_ivf_probe,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def test_index_assigns_every_vector(spark, emb):
    indexed, centroids = build_ivf_index(emb, n_clusters=8)
    assert indexed.count() == emb.count()
    assert len(centroids) == 8 and all(len(c) == 64 for c in centroids)
    assert indexed.where(F.col("cluster").isNull()).count() == 0
    # deterministic under the same seed
    indexed2, centroids2 = build_ivf_index(emb, n_clusters=8)
    assert centroids2 == centroids


def test_probe_recall_vs_brute_force(spark, emb):
    queries = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding")
    brute = cosine_topk(emb, queries, k=10)
    indexed, centroids = build_ivf_index(emb, n_clusters=8)
    approx = cosine_topk_ivf_probe(indexed, centroids, queries, k=10, nprobe=3)

    def as_sets(df):
        out = {}
        for r in df.collect():
            out.setdefault(r.query_id, set()).add(r.vec_id)
        return out

    b, a = as_sets(brute), as_sets(approx)
    recalls = [len(b[q] & a.get(q, set())) / len(b[q]) for q in b]
    assert sum(recalls) / len(recalls) >= 0.6, recalls
    # probing ALL clusters must reproduce brute force exactly
    full = cosine_topk_ivf_probe(indexed, centroids, queries, k=10, nprobe=8)
    assert as_sets(full) == b


class TestHyperplaneLsh:
    @pytest.fixture()
    def corpus_with_dups(self, spark, emb):
        """200 base vectors + 30 planted near-duplicates (tiny
        perturbation -> cos ~0.999): the workload LSH exists for."""
        base = emb.select("vec_id", "embedding").where(F.col("vec_id") < 200)
        dups = base.where(F.col("vec_id") < 30).select(
            (F.col("vec_id") + 10000).alias("vec_id"),
            F.transform(
                "embedding",
                lambda x, i: x + F.when(i == 0, F.lit(0.01)).otherwise(F.lit(0.0)),
            ).alias("embedding"),
        )
        return base.unionByName(dups)

    def test_lsh_near_dups_precision_exact_recall_high(self, spark, corpus_with_dups):
        from datagrowth_spark.operators.similarity import (
            embedding_near_dup_pairs,
            embedding_near_dup_pairs_lsh,
        )

        exact = {
            (r.id_a, r.id_b): r.cos_sim
            for r in embedding_near_dup_pairs(
                corpus_with_dups, threshold=0.95, cluster_col=None).collect()
        }
        approx = {
            (r.id_a, r.id_b): r.cos_sim
            for r in embedding_near_dup_pairs_lsh(
                corpus_with_dups, threshold=0.95, n_bits=12, n_tables=6).collect()
        }
        # the planted pairs dominate the ground truth
        assert len(exact) >= 30
        # precision 1.0 with EXACT scores (rescoring uses the same fold)
        for pair, sim in approx.items():
            assert pair in exact and exact[pair] == sim
        recall = len(approx) / len(exact)
        assert recall >= 0.9, (recall, len(exact), len(approx))

    def test_lsh_deterministic(self, spark, emb):
        from datagrowth_spark.operators.similarity import embedding_near_dup_pairs_lsh

        one = sorted((r.id_a, r.id_b) for r in
                     embedding_near_dup_pairs_lsh(emb, 0.35, seed=7).collect())
        two = sorted((r.id_a, r.id_b) for r in
                     embedding_near_dup_pairs_lsh(emb, 0.35, seed=7).collect())
        assert one == two
