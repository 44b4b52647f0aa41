"""Similarity query family.

Split from the single-module queries.py by scripts/split_queries.py (r12); definitions are verbatim.
"""

from __future__ import annotations
import os
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from datagrowth_spark.core.session import ensure_ts_readable
from datagrowth_spark.functions import text as TX
from datagrowth_spark.operators import dedup as DD
from datagrowth_spark.operators import multimodal as MM
from datagrowth_spark.operators import similarity as SIM
from datagrowth_spark.sources import testclient as TC
from datagrowth_spark.core.caching import persist_registered as _persist
from datagrowth_spark.core.caching import register as _register_cache
from datagrowth_spark.core.caching import release as release_caches
from datagrowth_spark.queries._shared import _PR_DAMPING, _PR_ITERS, _PR_KNUTH, _PR_STEP, _t  # noqa: E501



# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

def _cos_sql(a: str = "a_vec", b: str = "b_vec") -> str:
    dot = f"list_sum(list_transform(generate_series(1, len({a})), i -> {a}[i] * {b}[i]))"
    na = f"sqrt(list_sum(list_transform({a}, x -> x * x)))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> x * x)))"
    return f"round({dot} / ({na} * {nb}), 6)"



def q_similarity_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 for 5 fixed query vectors."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    return SIM.cosine_topk(emb, queries, k=10)



SQL_SIMILARITY_TOPK = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS a_vec FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS b_vec FROM embeddings
), scored AS (
  SELECT query_id, vec_id, {_cos_sql("a_vec", "b_vec")} AS cos_sim
  FROM q CROSS JOIN c
  WHERE vec_id != query_id
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 10
"""



def q_similarity_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style top-10: probe only the query's own cluster (label)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.where(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), F.col("embedding"), F.col("label")
    )
    return SIM.cosine_topk_ivf(emb, queries, k=10)



SQL_SIMILARITY_TOPK_IVF = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS a_vec, label FROM embeddings WHERE vec_id < 5
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS b_vec, label FROM embeddings
), scored AS (
  SELECT query_id, vec_id, {_cos_sql("a_vec", "b_vec")} AS cos_sim
  FROM q JOIN c ON q.label = c.label
  WHERE vec_id != query_id
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 10
"""



def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate vectors within label blocks, cosine >= 0.35
    (threshold sits at the top ~0.1% of this synthetic corpus's
    similarity distribution)."""
    return SIM.embedding_near_dup_pairs(_t(spark, sf_dir, "embeddings"), threshold=0.35)



def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-shaped semantic dedup END TO END: cluster-blocked
    embedding near-dup pairs (cosine >= 0.35) → connected components →
    per-vector keep verdict (canonical = min id of the component;
    singletons keep themselves). The oracle replays the whole chain
    with an exhaustive pair join + recursive CTE, so a hash match
    proves the blocked pair search AND the distributed component
    resolution both lose nothing."""
    from datagrowth_spark.operators.graph import dedup_clusters

    emb = _t(spark, sf_dir, "embeddings")
    pairs = SIM.embedding_near_dup_pairs(emb, threshold=0.35)
    clusters = dedup_clusters(pairs.select("id_a", "id_b")) \
        .withColumnRenamed("doc_id", "vec_id")
    return (
        emb.select("vec_id").join(clusters, "vec_id", "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id")).alias("cluster_id"),
            F.coalesce("cluster_size", F.lit(1)).cast("long").alias("cluster_size"),
            F.coalesce("is_canonical", F.lit(True)).alias("keep"),
        )
    )



def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 symmetric quantization of every embedding (the ANN-index
    memory cut) with reconstruction-error audit. Map-only, no shuffle;
    the quantized code is compared via order-insensitive checksums
    (L1 and signed sums) plus the rounded scale and rmse."""
    q = SIM.quantize_embeddings(_t(spark, sf_dir, "embeddings"))
    return q.select(
        "vec_id", "scale", "rmse",
        F.aggregate(F.transform("q", lambda x: F.abs(x)), F.lit(0),
                    lambda a, x: a + x).cast("long").alias("q_l1"),
        F.aggregate("q", F.lit(0), lambda a, x: a + x).cast("long").alias("q_sum"),
    )



SQL_EMBEDDING_QUANTIZE = """
WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
m AS (
  SELECT vec_id, v,
         list_max(list_transform(v, x -> abs(x))) / 127.0 AS scale
  FROM e
),
q AS (
  SELECT vec_id, v, scale,
         list_transform(v, x -> CAST(round(x / greatest(scale, 1e-30)) AS INT)) AS qv
  FROM m
)
SELECT vec_id,
       round(scale, 6) AS scale,
       round(sqrt(list_sum(list_transform(generate_series(1, len(v)),
                                          i -> pow(v[i] - qv[i] * scale, 2)))
                  / greatest(len(v), 1)), 6) AS rmse,
       CAST(list_sum(list_transform(qv, x -> abs(x))) AS BIGINT) AS q_l1,
       CAST(list_sum(qv) AS BIGINT) AS q_sum
FROM q
"""



# Raw-dot / norm-product — the exact expression shape of
# SIM.embedding_near_dup_pairs (scalar norms, no normalized arrays).
_NDOT_SQL = ("round(list_sum(list_transform(generate_series(1, len(a.vec)), "
             "i -> a.vec[i] * b.vec[i])) / (a.nrm * b.nrm), 6)")


SQL_EMBEDDING_NEAR_DUPS = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS vec,
         sqrt(list_sum(list_transform(embedding::DOUBLE[], x -> x * x))) AS nrm,
         label
  FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_NDOT_SQL} AS cos_sim
FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id
WHERE {_NDOT_SQL} >= 0.35
"""



SQL_SEMANTIC_DEDUP = f"""
WITH RECURSIVE pairs AS ({SQL_EMBEDDING_NEAR_DUPS}),
edges AS (
  SELECT id_a AS u, id_b AS v FROM pairs
  UNION
  SELECT id_b AS u, id_a AS v FROM pairs
),
reach(node, comp) AS (
  SELECT DISTINCT u, u FROM edges
  UNION
  SELECT e.v, r.comp FROM reach r JOIN edges e ON e.u = r.node
),
components AS (SELECT node, MIN(comp) AS cluster_id FROM reach GROUP BY node),
sizes AS (SELECT cluster_id, COUNT(*) AS cluster_size FROM components GROUP BY cluster_id)
SELECT v.vec_id,
       COALESCE(c.cluster_id, v.vec_id) AS cluster_id,
       CAST(COALESCE(s.cluster_size, 1) AS BIGINT) AS cluster_size,
       COALESCE(c.node = c.cluster_id, TRUE) AS keep
FROM embeddings v
LEFT JOIN components c ON c.node = v.vec_id
LEFT JOIN sizes s ON s.cluster_id = c.cluster_id
"""



def q_link_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-graph quality propagation (CommonCrawl-curation shape):
    PageRank over a deterministic synthetic doc-link graph (every doc
    links to 3 arithmetic neighbors), 5 fixed power iterations. The
    oracle unrolls the exact same steps as chained CTEs, so a value
    match proves the iterative join+aggregate loop — including the
    per-round checkpointed lineage — computes the textbook recurrence.
    Output rank is scaled by N (values ~1) and rounded to 6dp."""
    from datagrowth_spark.operators.graph import pagerank

    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    d = F.col("doc_id")
    dsts = [((d * _PR_KNUTH + k * _PR_STEP) % n).alias(f"d{k}") for k in range(3)]
    edges = docs.select(d.alias("src"), F.explode(F.array(*dsts)).alias("dst"))
    ranks = pagerank(edges, iterations=_PR_ITERS, damping=_PR_DAMPING)
    return ranks.select(
        F.col("node").cast("long").alias("doc_id"),
        F.round(F.col("rank") * n, 6).alias("rank_n"),
    )



def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding centroids, flat (label, pos, value) form —
    the k-means M-step / class-prototype computation over an
    array<float> column. posexplode → one hash aggregate keyed
    (label, pos): the array never round-trips through Python and the
    shuffle carries scalars. Exact-decimal sums make the mean
    order-independent (bit-identical on any partitioning).
    """
    emb = _t(spark, sf_dir, "embeddings")
    flat = emb.select("label", F.posexplode("embedding").alias("pos", "val"))
    return (
        flat.groupBy("label", "pos")
        .agg(
            F.round(
                (F.sum(F.col("val").cast("decimal(18,9)")).cast("double")
                 / F.count(F.lit(1))),
                6,
            ).alias("centroid")
        )
    )



SQL_EMBEDDING_CENTROIDS = """
WITH flat AS (
  SELECT label, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
         unnest(embedding) AS val
  FROM embeddings
)
SELECT label, pos,
       round(CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*), 6) AS centroid
FROM flat GROUP BY label, pos
"""



def q_embedding_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lloyd's E-step as a relational plan: assign every embedding to its
    nearest per-label centroid (from q_embedding_centroids' M-step) and
    report the label × assigned confusion counts. The centroid frame is
    k rows → broadcast; the corpus side never shuffles before the final
    tiny count aggregate. See operators/clustering.py for the
    determinism contract (6dp distance rounding, id tiebreak).
    """
    from datagrowth_spark.operators import clustering as CL

    emb = _t(spark, sf_dir, "embeddings")
    cents = CL.centroid_vectors(CL.label_centroids(emb, "label"), "label")
    assigned = CL.assign_to_centroids(emb, cents, id_col="vec_id", keep_cols=("label",))
    return assigned.groupBy("label", "assigned").agg(F.count(F.lit(1)).alias("n_vecs"))



SQL_EMBEDDING_ASSIGN = """
WITH flat AS (
  SELECT vec_id, label, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
         unnest(embedding) AS val
  FROM embeddings
),
cent AS (
  SELECT label AS centroid_id, pos,
         CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS centroid
  FROM flat GROUP BY 1, 2
),
dists AS (
  SELECT f.vec_id, f.label, c.centroid_id,
         round(SUM((CAST(f.val AS DOUBLE) - c.centroid) ^ 2), 6) AS d2
  FROM flat f JOIN cent c USING (pos)
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, label, centroid_id AS assigned,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
  FROM dists
)
SELECT label, assigned, COUNT(*) AS n_vecs
FROM best WHERE rn = 1 GROUP BY 1, 2
"""



def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distance-to-centroid outlier pruning: the 25 embeddings farthest
    from their assigned per-label centroid — the standard "drop the
    mislabeled / off-distribution tail" signal in embedding-space data
    curation (the flip side of SemDeDup's keep-closest).

    Same map-only plan as q_embedding_assign (k centroids pack into one
    broadcast row; the corpus never shuffles) plus a TakeOrdered top-k —
    no global sort. Distances round to 6dp before ranking; ties break
    on vec_id.
    """
    from datagrowth_spark.operators import clustering as CL

    emb = _t(spark, sf_dir, "embeddings")
    cents = CL.centroid_vectors(CL.label_centroids(emb, "label"), "label")
    assigned = CL.assign_to_centroids(
        emb, cents, id_col="vec_id", keep_cols=("label",), with_distance=True
    )
    return assigned.select("vec_id", "label", "assigned", "d2").orderBy(
        F.desc("d2"), F.asc("vec_id")
    ).limit(25)



SQL_EMBEDDING_OUTLIERS = """
WITH flat AS (
  SELECT vec_id, label, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
         unnest(embedding) AS val
  FROM embeddings
),
cent AS (
  SELECT label AS centroid_id, pos,
         CAST(SUM(CAST(val AS DECIMAL(18,9))) AS DOUBLE) / COUNT(*) AS centroid
  FROM flat GROUP BY 1, 2
),
dists AS (
  SELECT f.vec_id, f.label, c.centroid_id,
         round(SUM((CAST(f.val AS DOUBLE) - c.centroid) ^ 2), 6) AS d2
  FROM flat f JOIN cent c USING (pos)
  GROUP BY 1, 2, 3
),
best AS (
  SELECT vec_id, label, centroid_id AS assigned, d2,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, centroid_id) AS rn
  FROM dists
)
SELECT vec_id, label, assigned, d2
FROM best WHERE rn = 1
ORDER BY d2 DESC, vec_id ASC
LIMIT 25
"""



def q_link_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting over the same synthetic doc-link graph as
    q_link_pagerank — the local-clustering signal (spam farms and
    boilerplate rings are triangle-dense; organic link neighborhoods
    are sparse).

    Canonical-direction trick: edges orient low→high once, so each
    triangle {a<b<c} is found exactly once by joining (a,b)⨝(b,c) and
    closing with (a,c) — two shuffle joins on vertex keys, no
    double-counting correction pass. Degree-bounded graphs (≤6 here)
    keep the wedge explosion linear; at web scale the standard
    refinement (orient by degree, not id) caps wedges at hub nodes —
    same plan shape.
    """
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    d = F.col("doc_id")
    dsts = [((d * _PR_KNUTH + k * _PR_STEP) % n).alias(f"d{k}") for k in range(3)]
    directed = docs.select(d.alias("src"), F.explode(F.array(*dsts)).alias("dst"))
    und = (
        directed.where(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    e2 = und.select(F.col("a").alias("b2"), F.col("b").alias("c"))
    e3 = und.select(F.col("a").alias("a3"), F.col("b").alias("c3"))
    tri = (
        und.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .select("a", "b", "c")
    )
    per_node = (
        tri.select(F.explode(F.array("a", "b", "c")).alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy(F.desc("n_triangles"), F.asc("doc_id"))
        .limit(20)
    )
    return per_node



def q_embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for 10 fixed query vectors: top-5 cosine
    neighbors with a DIFFERENT label (operators/similarity.py
    cosine_hard_negatives — broadcast queries, corpus never shuffles)."""
    emb = _t(spark, sf_dir, "embeddings")
    queries_df = emb.where(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), "embedding", "label")
    return SIM.cosine_hard_negatives(emb, queries_df, k=5)



SQL_EMBEDDING_HARD_NEGATIVES = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS a_vec, label AS q_label
  FROM embeddings WHERE vec_id < 10
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS b_vec, label AS c_label FROM embeddings
), scored AS (
  SELECT query_id, vec_id, {_cos_sql("a_vec", "b_vec")} AS cos_sim
  FROM q CROSS JOIN c
  WHERE c_label <> q_label
), ranked AS (
  SELECT query_id, vec_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id ASC) AS rank
  FROM scored
)
SELECT query_id, vec_id, cos_sim, rank FROM ranked WHERE rank <= 5
"""

