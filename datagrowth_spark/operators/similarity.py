"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the correctness baseline, and an IVF-style
partition-pruned variant as the scale path: embeddings carry a cluster
id (here the ``label`` column; in production the coarse-quantizer
assignment), queries probe only their own cluster's partition — the
relational form of an IVF index, where partition pruning does the work
an ANN index would.

All arithmetic is sequential left-to-right array-fold summation over
doubles (F.aggregate / F.zip_with). Similarities are rounded before
thresholding/ranking so cross-engine float summation differences
cannot flip comparisons. Pairwise plans carry scalar norms next to
raw vectors rather than normalized arrays — see the
projection-collapse warning on :func:`unit_normalize`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _to_double(col: Column) -> Column:
    return F.transform(col, lambda x: x.cast("double"))


def dot(a: Column, b: Column) -> Column:
    """Sequential fold dot product.

    Measured note: statically unrolling this into a 64-term
    element_at expression tree was tried and is ~2x SLOWER than the
    interpreted fold at dim 64 (giant codegen'd expressions hit janino
    compile cost and codegen size limits) — the fold is the right
    default; the real per-pair cost lever is NOT re-deriving array
    columns per pair (see embedding_near_dup_pairs).
    """
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def _cosine_cast_free(a: Column, b: Column, decimals: int = 6) -> Column:
    """:func:`cosine` body without the input casts — for callers that
    pre-cast the vectors to ``array<double>`` in their own projections
    (r12, guide §2.4): ``cosine`` derives the cast array FOUR times per
    pair (dot + both norms), so a pairwise join paid 4·O(d) cast builds
    per pair; a pre-cast column on each join input is built once per
    ROW and the folds here read O(1) attributes. Arithmetic and NULL
    semantics identical — float→double widening is exact, so casting
    before the join is the same op sequence per element."""
    return F.round(F.try_divide(dot(a, b), norm(a) * norm(b)), decimals)


def cosine(a: Column, b: Column, decimals: int = 6) -> Column:
    """NULL (not an error, not NaN) when either norm is zero: under
    Spark's ANSI mode a bare divide throws DIVIDE_BY_ZERO, so ONE
    zero-norm embedding in the corpus would kill an entire top-k job;
    try_divide degrades it to a NULL similarity, which sorts after
    every real score in the DESC rankings every caller uses."""
    return _cosine_cast_free(_to_double(a), _to_double(b), decimals)


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Brute-force cosine top-k for each query vector.

    queries: (query_id, embedding). The corpus side stays partitioned;
    the query side is broadcast (queries are small by construction).
    Ties broken by corpus id for full determinism.
    Output: (query_id, vec_id, cos_sim, rank).
    """
    # both sides pre-cast to double BELOW the join (r12): the cast runs
    # once per input row instead of 4x per (corpus, query) pair inside
    # cosine — see _cosine_cast_free.
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("q_vec")
    ))
    scored = (
        embeddings.select(F.col(id_col).alias("vec_id"),
                          _to_double(F.col(vec_col)).alias("c_vec"))
        .crossJoin(q)
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", _cosine_cast_free(F.col("c_vec"), F.col("q_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def cosine_topk_ivf(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF-style top-k: probe only the query's own cluster partition.

    The equi-join on cluster id replaces the cross join — at scale this
    is the difference between reading the whole corpus per query and
    reading one partition per query (cluster id is the partition key of
    the stored embedding table, so partition pruning applies).
    Output: (query_id, vec_id, cos_sim, rank).
    """
    # pre-cast below the join, once per input row (see _cosine_cast_free)
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("q_vec"),
        F.col(cluster_col).alias("q_cluster"),
    ))
    scored = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            _to_double(F.col(vec_col)).alias("c_vec"),
            F.col(cluster_col).alias("c_cluster"),
        )
        .join(q, F.col("c_cluster") == F.col("q_cluster"))
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", _cosine_cast_free(F.col("c_vec"), F.col("q_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def cosine_hard_negatives(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Hard-negative mining: per query, the top-k most similar corpus
    vectors carrying a DIFFERENT label — the contrastive-training
    negative-selection step (highest-similarity wrong-class neighbors
    are the informative negatives).

    Scale shape mirrors :func:`cosine_topk`: the query set broadcasts,
    the corpus streams past it (no corpus shuffle), the label
    inequality prunes before scoring, and the per-query window is a
    map-side WindowGroupLimit top-k. Ties broken by corpus id.
    Output: (query_id, vec_id, cos_sim, rank).
    """
    # pre-cast below the join, once per input row (see _cosine_cast_free)
    q = F.broadcast(queries.select(
        F.col(query_id_col).alias("query_id"),
        _to_double(F.col(vec_col)).alias("q_vec"),
        F.col(label_col).alias("q_label"),
    ))
    scored = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            _to_double(F.col(vec_col)).alias("c_vec"),
            F.col(label_col).alias("c_label"),
        )
        .crossJoin(q)
        .where(F.col("c_label") != F.col("q_label"))
        .withColumn("cos_sim", _cosine_cast_free(F.col("c_vec"), F.col("q_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def unit_normalize(vec: Column) -> Column:
    """L2-normalize a vector column.

    WARNING: do not feed this into a pairwise join and then access the
    result per pair — Catalyst collapses projections, so the transform
    (and the norm inside it) is re-derived every time the array column
    is consumed downstream. For pairwise work carry the raw vector plus
    a scalar norm instead (embedding_near_dup_pairs).
    """
    v = _to_double(vec)
    n = norm(v)
    # try_divide: a zero vector normalizes to NULL components instead of
    # throwing DIVIDE_BY_ZERO under ANSI mode (one bad row, whole job).
    return F.transform(v, lambda x: F.try_divide(x, n))


def quantize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bits: int = 8,
) -> DataFrame:
    """Per-vector symmetric int quantization — the 4x (int8) memory cut
    a 100 TB ANN index takes before anything else: scale = max|x| /
    (2^(bits-1) - 1), q_i = round(x_i / scale). Returns the quantized
    array plus audit columns (scale, rmse of reconstruction q·scale vs
    x) so a pipeline can gate on quantization error before swapping the
    index over.

    Pure Catalyst array arithmetic, map-only, no shuffle; rounding is
    half-away-from-zero in both Spark and DuckDB, so the quantized
    values are oracle-comparable. All-zero vectors get scale 0 and an
    all-zero code (division guarded).

    The cast vector and the scale are materialized as COLUMNS before
    any lambda uses them (r12, guide §1.1/§4.1): a scalar expression
    referenced inside a ``transform``/``zip_with`` lambda is
    re-evaluated PER ELEMENT, and ``scale`` contains the O(d) absmax
    fold — inlining it made the whole operator O(d²) per row (measured
    2.7 s for 2000×64 vectors at sf0.1; 0.1 s with attributes). The
    multi-consumer aliases are expensive expressions, which is the case
    CollapseProject refuses to inline back.
    """
    qmax = float((1 << (bits - 1)) - 1)
    based = embeddings.select(
        F.col(id_col), _to_double(F.col(vec_col)).alias("__v"))
    scaled = based.select(
        id_col, "__v",
        (F.array_max(F.transform("__v", lambda x: F.abs(x)))
         / F.lit(qmax)).alias("__scale"))
    # greatest(attr, lit) is cheap — fine if the optimizer inlines it
    # into the lambda; __scale itself stays an attribute (O(1)/element).
    safe = F.greatest(F.col("__scale"), F.lit(1e-30))
    quant = scaled.select(
        id_col, "__v", "__scale",
        F.transform("__v", lambda x: F.round(x / safe).cast("int"))
        .alias("__q"))
    err2 = F.aggregate(
        F.zip_with("__v", "__q",
                   lambda x, c: (x - c * F.col("__scale"))
                   * (x - c * F.col("__scale"))),
        F.lit(0.0), lambda acc, x: acc + x,
    )
    rmse = F.sqrt(err2 / F.greatest(F.size("__v"), F.lit(1)))
    return quant.select(
        F.col(id_col),
        F.col("__q").alias("q"),
        F.round(F.col("__scale"), 6).alias("scale"),
        F.round(rmse, 6).alias("rmse"),
    )


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.99,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cluster_col: str | None = "label",
) -> DataFrame:
    """Near-duplicate vector pairs by cosine ≥ threshold.

    With a cluster column, pairs are only formed within a cluster
    (blocking); without, a full self-join (only for small corpora).
    Output: (id_a, id_b, cos_sim) with id_a < id_b.

    The per-pair cosine runs in ONE Arrow-batched numpy stage after the
    blocked join (r12, guide §4.2): the interpreted zip_with/aggregate
    fold cost O(pairs·d) lambda dispatches (the pair stage dominated the
    query at sf0.1 — 2.07 s vs 1.55 s with numpy). Bit-equality with
    the JVM fold is preserved by construction and pinned by tests:
    ``cumsum`` is a strictly sequential left-to-right sum (same IEEE op
    order as the fold), float→double widening is exact, and the 6dp
    ROUNDING STAYS IN THE JVM (``F.round`` is HALF_UP on the exact
    decimal expansion; numpy's round is half-even) — Python returns the
    raw double, identical to what the fold would produce, so
    ``embedding_near_dup_pairs_lsh``'s JVM rescore still produces
    byte-identical scores. NULL/zero-norm/empty vectors yield a NULL
    cos (as try_divide did) and are dropped by the threshold. Vectors
    must share one dimensionality (the ANN-corpus contract).
    """
    from pyspark.sql import types as T

    cols = [F.col(id_col).alias("id"), F.col(vec_col).alias("vec")]
    if cluster_col:
        cols.append(F.col(cluster_col).alias("cluster"))
    base = embeddings.select(*cols)
    a = base.alias("a")
    b = base.alias("b")
    cond = F.col("a.id") < F.col("b.id")
    if cluster_col:
        cond = cond & (F.col("a.cluster") == F.col("b.cluster"))
    joined = a.join(b, cond).select(
        F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
        F.col("a.vec").alias("__va"), F.col("b.vec").alias("__vb"))

    schema = T.StructType([
        T.StructField("id_a", joined.schema["id_a"].dataType),
        T.StructField("id_b", joined.schema["id_b"].dataType),
        T.StructField("cos_raw", T.DoubleType()),
    ])

    def rescore(batches):
        import numpy as np
        import pandas as pd

        for batch in batches:
            n = len(batch)
            cos = np.full(n, np.nan)
            ok = (~batch["__va"].isna() & ~batch["__vb"].isna()).to_numpy()
            if ok.any():
                va = np.stack([np.asarray(v, dtype=np.float64)
                               for v in batch["__va"][ok]])
                vb = np.stack([np.asarray(v, dtype=np.float64)
                               for v in batch["__vb"][ok]])
                if va.shape[1]:
                    # cumsum = sequential left-to-right summation — the
                    # exact op order of the JVM fold (np.sum would be
                    # pairwise and could differ in the last ulp)
                    dot = np.cumsum(va * vb, axis=1)[:, -1]
                    na = np.sqrt(np.cumsum(va * va, axis=1)[:, -1])
                    nb = np.sqrt(np.cumsum(vb * vb, axis=1)[:, -1])
                    with np.errstate(divide="ignore", invalid="ignore"):
                        c = dot / (na * nb)
                    c[~np.isfinite(c)] = np.nan  # zero norm ⇒ NULL
                    cos[ok] = c
            yield pd.DataFrame({"id_a": batch["id_a"],
                                "id_b": batch["id_b"], "cos_raw": cos})

    return (joined.mapInPandas(rescore, schema)
            .select("id_a", "id_b", F.round("cos_raw", 6).alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


# ---------------------------------------------------------------------------
# IVF with a real coarse quantizer (MLlib KMeans) + multi-probe search.
# cosine_topk_ivf above is the exact-within-partition primitive; these
# build the partitioning a production ANN index would: kmeans centroids
# as the inverted-file lists, queries probing their nprobe nearest lists.
# At scale: write the indexed corpus partitioned by `cluster` so a probe
# reads only nprobe partitions (partition pruning = the inverted index).
# ---------------------------------------------------------------------------

def build_ivf_index(
    embeddings: DataFrame,
    n_clusters: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    max_iter: int = 10,
):
    """KMeans-assign every vector to a coarse cluster.

    Returns (indexed_df with a `cluster` column, centroids) where
    centroids is a small driver-side list[list[float]] (one per
    cluster) — the only state a query needs, broadcast-sized by
    construction.
    """
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    feats = embeddings.withColumn("__features", array_to_vector(_to_double(F.col(vec_col))))
    model = KMeans(k=n_clusters, seed=seed, maxIter=max_iter,
                   featuresCol="__features", predictionCol="cluster").fit(feats)
    indexed = model.transform(feats).drop("__features")
    centroids = [list(map(float, c)) for c in model.clusterCenters()]
    return indexed, centroids


def cosine_topk_ivf_probe(
    indexed: DataFrame,
    centroids: list[list[float]],
    queries: DataFrame,
    k: int = 10,
    nprobe: int = 3,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: each query scores only its nprobe nearest
    centroids' inverted lists.

    The query→centroid assignment is a tiny cross join against the
    broadcast centroid table (n_clusters rows); the corpus side then
    joins on `cluster`, so the scan covers ~nprobe/n_clusters of the
    corpus — with the corpus written partitioned-by-cluster, that is
    literal partition pruning. Output: (query_id, vec_id, cos_sim, rank).
    """
    spark = indexed.sparkSession
    cent = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centroids)], ["cluster", "centroid"]
    )
    # q_vec pre-cast once here (centroid is already array<double> from
    # createDataFrame); both downstream cosines read attributes — see
    # _cosine_cast_free.
    q = queries.select(F.col(query_id_col).alias("query_id"),
                       _to_double(F.col(vec_col)).alias("q_vec"))
    probe_rank = Window.partitionBy("query_id").orderBy(
        F.desc("c_sim"), F.asc("cluster"))
    probes = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("c_sim", _cosine_cast_free(F.col("q_vec"), F.col("centroid")))
        .withColumn("__pr", F.row_number().over(probe_rank))
        .where(F.col("__pr") <= nprobe)
        .select("query_id", "q_vec", "cluster")
    )
    scored = (
        indexed.select(F.col(id_col).alias("vec_id"),
                       _to_double(F.col(vec_col)).alias("c_vec"),
                       "cluster")
        .join(F.broadcast(probes), "cluster")
        .where(F.col("vec_id") != F.col("query_id"))
        .withColumn("cos_sim", _cosine_cast_free(F.col("c_vec"), F.col("q_vec")))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cos_sim", "rank")
    )


def embedding_near_dup_pairs_lsh(
    embeddings: DataFrame,
    threshold: float = 0.8,
    n_bits: int = 12,
    n_tables: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Near-dup pairs WITHOUT a blocking column: random-hyperplane LSH.

    When no natural cluster/label exists, the all-pairs join is O(n²) —
    this is the scale path: ``n_tables`` independent sign-bit sketches
    (``n_bits`` seeded hyperplanes each) bucket the corpus; candidate
    pairs come only from shared buckets, then are RESCORED EXACTLY with
    the same fold arithmetic as :func:`embedding_near_dup_pairs`, so
    precision is 1.0 and only recall is approximate (higher thresholds →
    fewer differing bits → higher recall; more tables → higher recall).

    Bucketing runs in one Arrow-batched mapInPandas stage (numpy matrix
    multiply per batch — the bucket ids are candidate-generation only,
    so float summation order cannot affect result VALUES, just which
    pairs get rescored). One shuffle groups by (table, bucket); the
    per-bucket pair explosion mirrors the posting-list dedup plan.
    Output: (id_a, id_b, cos_sim) with id_a < id_b, exact cos ≥ threshold.
    """
    import random as _random

    from pyspark.sql import types as T

    rng = _random.Random(seed)
    # hyperplanes drawn once driver-side; shipped in the closure
    dim_probe = len(embeddings.select(vec_col).limit(1).collect()[0][0])
    planes = [
        [[rng.gauss(0.0, 1.0) for _ in range(dim_probe)] for _ in range(n_bits)]
        for _ in range(n_tables)
    ]

    bucket_schema = T.StructType([
        T.StructField("id", T.LongType()),
        T.StructField("table", T.IntegerType()),
        T.StructField("bucket", T.LongType()),
    ])

    def bucketize(batches):
        import numpy as np
        import pandas as pd

        mats = [np.array(p).T for p in planes]  # (dim, n_bits) each
        weights = 1 << np.arange(n_bits, dtype=np.int64)
        for batch in batches:
            vecs = np.stack(batch[vec_col].map(
                lambda v: np.asarray(v, dtype=np.float64)))
            ids = batch[id_col].to_numpy()
            frames = []
            for t, mat in enumerate(mats):
                bits = (vecs @ mat) > 0
                buckets = (bits * weights).sum(axis=1)
                frames.append(pd.DataFrame(
                    {"id": ids, "table": t, "bucket": buckets}))
            yield pd.concat(frames, ignore_index=True)

    buckets = embeddings.select(id_col, vec_col).mapInPandas(bucketize, bucket_schema)
    posts = (
        buckets.groupBy("table", "bucket")
        .agg(F.sort_array(F.collect_list("id")).alias("ids"))
        .where(F.size("ids") > 1)
    )
    candidates = posts.select(
        F.explode(
            F.expr(
                "flatten(transform(ids, (x, i) -> "
                "transform(slice(ids, i + 2, size(ids)), y -> struct(x AS id_a, y AS id_b))))"
            )
        ).alias("p")
    ).select("p.id_a", "p.id_b").distinct()

    raw = F.col(vec_col)
    raw_norm = F.sqrt(F.aggregate(
        raw, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double")
    ))
    side = embeddings.select(F.col(id_col).alias("id"), raw.alias("vec"),
                             raw_norm.alias("nrm"))
    a = side.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"),
                    F.col("nrm").alias("nrm_a"))
    b = side.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"),
                    F.col("nrm").alias("nrm_b"))
    rescored_dot = F.aggregate(
        F.zip_with(F.col("vec_a"), F.col("vec_b"),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return (
        candidates.join(a, "id_a").join(b, "id_b")
        .withColumn("cos_sim", F.round(F.try_divide(rescored_dot, F.col("nrm_a") * F.col("nrm_b")), 6))
        .where(F.col("cos_sim") >= threshold)
        .select("id_a", "id_b", "cos_sim")
    )
