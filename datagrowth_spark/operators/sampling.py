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
