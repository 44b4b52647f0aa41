"""Deterministic corpus sampling — hash-bucket, no RNG, no shuffle.

`randomSplit`/`sample` are seed-reproducible only for a fixed partition
layout; a repartition or a scale-up silently changes the sample. For
training-data pipelines the sampling decision must be a PURE FUNCTION of
the row key so that (a) re-runs, retries and incremental growth see the
same decision, (b) the sample is identical on 1 executor or 1000, and
(c) an oracle engine can replay it exactly. The standard trick: bucket
each key by a salted md5 and keep buckets below the per-stratum rate.

Plan shape: a single projection + filter — embarrassingly parallel,
pushdown-friendly, zero shuffles at any scale.

Beyond-reference surface (the reference's `Collection.split` uses DB
RNG, SURVEY C6 — the engine keeps that API for parity and adds this as
the scale path). Oracle-checked via the `corpus_sample` query.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagrowth_spark.functions.text import md5_long


def hash_bucket(key: Column | str, buckets: int = 100, salt: str = "sample") -> Column:
    """Deterministic bucket in [0, buckets) from a salted md5 of the key.

    DuckDB mirror: ``CAST(('0x'||substr(md5(salt||':'||CAST(k AS VARCHAR)),1,8)) AS BIGINT) % buckets``.
    """
    key = F.col(key) if isinstance(key, str) else key
    salted = F.concat(F.lit(f"{salt}:"), key.cast("string"))
    return (md5_long(salted) % F.lit(buckets)).cast("int")


def weighted_sample(
    df: DataFrame,
    weight_col: Column | str,
    key_col: str,
    k: int,
    salt: str = "wsample",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: take ``k``
    rows with probability proportional to ``weight_col`` (Efraimidis-
    Spirakis A-Res order statistics: key = u^(1/w) with u uniform, keep
    the k largest keys).

    The uniform draw is a pure function of the row key — a salted md5
    mapped into (0, 1) — so the sample is identical across re-runs,
    partition layouts and engines (the same reproducibility contract as
    :func:`stratified_sample`, which this generalizes from Bernoulli to
    weighted top-k). Rows with weight <= 0 are excluded (they would
    need key 0, i.e. never sampled).

    Plan shape: one projection computes the key, then a global top-k —
    Spark executes ORDER BY ... LIMIT k as per-partition top-k + a
    k-row driver merge (TakeOrderedAndProject), NOT a full sort
    shuffle; linear scan at any corpus size for bench-sized k.

    Output: input columns + ``sample_key`` (rounded to 9dp), ordered by
    key descending — slice-stable for pagination or unioning shards.
    """
    weight = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    key = F.col(key_col)
    salted = F.concat(F.lit(f"{salt}:"), key.cast("string"))
    # (h + 0.5) / 2^32 in (0, 1): never exactly 0 or 1, engine-portable.
    u = (md5_long(salted).cast("double") + F.lit(0.5)) / F.lit(float(1 << 32))
    sample_key = F.round(F.pow(u, F.lit(1.0) / weight.cast("double")), 9)
    return (
        df.where(weight > 0)
        .withColumn("sample_key", sample_key)
        .orderBy(F.desc("sample_key"), key)
        .limit(k)
    )


def stratified_sample(
    df: DataFrame,
    rates: dict[str, int],
    strata_col: str,
    key_col: str,
    default_rate: int = 0,
    buckets: int = 100,
    salt: str = "sample",
) -> DataFrame:
    """Keep rows whose hash bucket falls under their stratum's rate.

    ``rates`` maps stratum value → percentage (out of ``buckets``) to
    keep; unlisted strata get ``default_rate``. Adds a ``bucket`` column
    so downstream stages (and tests) can audit the decision.
    """
    rate = F.lit(default_rate)
    # Deterministic construction order for the CASE chain.
    for value in sorted(rates):
        rate = F.when(F.col(strata_col) == value, F.lit(rates[value])).otherwise(rate)
    out = df.withColumn("bucket", hash_bucket(key_col, buckets, salt))
    return out.where(F.col("bucket") < rate)


def dsir_importance(
    doc_tokens: DataFrame,
    is_target: Column,
    n_buckets: int = 1024,
    id_col: str = "doc_id",
    token_col: str = "token",
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how much more likely its hashed-feature profile is
    under a TARGET distribution than under the raw corpus, so raw data
    can be resampled toward the target domain.

    ``doc_tokens`` is the exploded (id, token) frame; ``is_target``
    marks the rows belonging to the target sample (e.g. a trusted
    high-quality subset) and must be constant per document — membership
    is a document property, which is what lets the single corpus
    aggregate below serve both distributions. Tokens hash into ``n_buckets`` features
    (DSIR's hashed n-gram generative model); each bucket's
    log-likelihood ratio uses add-one smoothing, and a document's
    importance is its average per-token LLR.

    Scale shape: the corpus is exploded and shuffled exactly ONCE, into
    per-(doc, bucket) counts (map-side combine; persisted + registered
    with the session release hook, since the distribution fold and the
    LLR join both read it); both feature distributions fold from those
    counts into ``n_buckets``-row aggregates joined back by BROADCAST,
    so the hot-bucket key can never skew a join (the bucket table is
    dimension-sized by construction).

    Cross-engine determinism (house rule): each bucket's LLR is rounded
    to 6dp then cast to DECIMAL(20,6), the per-document sum is exact
    and order-independent, and only the final per-token average returns
    to double.
    """
    from datagrowth_spark.functions.text import md5_long

    bucketed = doc_tokens.select(
        F.col(id_col).alias("__id"),
        (md5_long(F.col(token_col)) % n_buckets).alias("bucket"),
        is_target.cast("int").alias("__t"),
    )
    # ONE corpus aggregate feeds both the per-doc counts and the two
    # feature distributions: a document is wholly target or not, so
    # its flag survives the (doc, bucket) group and the bucket
    # distributions fold from the pre-aggregated counts — the corpus
    # is exploded and shuffled exactly once.
    from datagrowth_spark.core.caching import persist_registered

    per_doc = persist_registered(bucketed.groupBy("__id", "bucket").agg(
        F.count(F.lit(1)).alias("tf"), F.max("__t").alias("__t")))
    dist = per_doc.groupBy("bucket").agg(
        F.sum(F.col("tf") * F.col("__t")).alias("c_t"),
        F.sum("tf").alias("c_r"),
    )
    totals = dist.agg(F.sum("c_t").alias("n_t"), F.sum("c_r").alias("n_r"))
    # smoothed log( p_target(b) / p_raw(b) ), one row per bucket
    llr = (dist.crossJoin(F.broadcast(totals))
           .select("bucket", F.round(
               F.log((F.col("c_t") + 1) / (F.col("n_t") + n_buckets))
               - F.log((F.col("c_r") + 1) / (F.col("n_r") + n_buckets)),
               6).cast("decimal(20,6)").alias("llr")))
    return (per_doc.join(F.broadcast(llr), "bucket")
            .groupBy("__id")
            .agg(F.sum("tf").alias("n_tokens"),
                 F.round((F.sum(F.col("tf") * F.col("llr")).cast("double")
                          / F.sum("tf")), 6).alias("importance"))
            .withColumnRenamed("__id", id_col))
