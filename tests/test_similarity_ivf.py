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
