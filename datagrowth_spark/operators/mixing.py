"""Corpus mixture rebalancing — hit target source weights by downsampling.

Training recipes prescribe a mixture (e.g. 60% web, 30% books, 10%
code). Given per-source target weights and the actual per-source counts,
the largest corpus honoring the mixture without upsampling has total
``T = min_s(n_s / w_s)``; each source then keeps ``w_s * T / n_s`` of
its rows. Keep decisions are deterministic hash buckets (per-mille,
floored) so the sample is a pure function of the row key — replayable,
partition-independent, and incrementally stable as sources grow (see
operators/sampling.py for why seed-based sampling can't promise this).

Plan shape: one column-pruned scan for the per-source counts (a
dimension-sized aggregate), the rate computation on that tiny frame, a
broadcast join of rates back onto the corpus, and a bucket filter —
no corpus-sized shuffle anywhere, so the plan is scan-bound at 100 TB.

Beyond-reference surface (the reference has no notion of corpus
composition; closest is `Collection.split`, SURVEY C6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datagrowth_spark.operators.sampling import hash_bucket


def mixture_rates(
    df: DataFrame, weights: dict[str, float], source_col: str = "source"
) -> DataFrame:
    """Per-source keep rates (per-mille) for the target mixture.

    Sources absent from ``weights`` get rate 0 (dropped). Returns a
    k-row frame ``(source, n_docs, rate_permille)`` where
    ``rate_permille = floor(1000 * w_s * T / n_s)`` and
    ``T = min_s(n_s / w_s)`` over weighted sources.
    """
    w = F.lit(None).cast("double")
    for src in sorted(weights):
        w = F.when(F.col(source_col) == src, F.lit(float(weights[src]))).otherwise(w)
    counts = (
        df.groupBy(source_col)
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("weight", w)
    )
    # weight > 0, not isNotNull: an explicit 0.0 weight means "drop this
    # source" (rate 0) — including it in the t_max ratio would divide by
    # zero, which ABORTS the job under Spark's ANSI mode.
    total = counts.where(F.col("weight") > 0).agg(
        F.min(F.col("n_docs") / F.col("weight")).alias("t_max")
    )
    return counts.crossJoin(F.broadcast(total)).select(
        source_col,
        "n_docs",
        F.when(
            F.col("weight") > 0,
            F.floor(F.lit(1000.0) * F.col("weight") * F.col("t_max") / F.col("n_docs")),
        )
        .otherwise(F.lit(0))
        .cast("int")
        .alias("rate_permille"),
    )


def temperature_rates(
    df: DataFrame, alpha: float = 0.3, source_col: str = "source"
) -> DataFrame:
    """Temperature-flattened mixture weights (mBERT/XLM-R style):
    ``q_s ∝ p_s^alpha`` with ``p_s`` the source's corpus share.

    ``alpha < 1`` upweights low-resource sources relative to their raw
    share — the standard recipe for multilingual/multi-domain sampling.
    Plan: one dimension-sized aggregate over a column-pruned scan, then
    two one-row broadcasts (total count, normalizer); nothing
    corpus-sized moves. Cross-engine determinism: the powered weights
    round to 6dp and normalize through exact DECIMAL sums, so the
    normalizer is order-independent; only final ratios return to double.

    Returns ``(source, n_docs, p, mix_rate)``.
    """
    counts = df.groupBy(source_col).agg(F.count(F.lit(1)).alias("n_docs"))
    total = counts.agg(F.sum("n_docs").alias("n_total"))
    powed = counts.crossJoin(F.broadcast(total)).select(
        source_col,
        "n_docs",
        F.round(F.col("n_docs") / F.col("n_total"), 6).alias("p"),
        F.round(F.pow(F.col("n_docs") / F.col("n_total"), F.lit(float(alpha))), 6)
        .cast("decimal(20,6)")
        .alias("w"),
    )
    z = powed.agg(F.sum("w").alias("z"))
    return powed.crossJoin(F.broadcast(z)).select(
        source_col,
        "n_docs",
        "p",
        F.round(F.col("w").cast("double") / F.col("z").cast("double"), 6).alias("mix_rate"),
    )


def rebalance(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Downsample to the target mixture; adds the audit columns
    ``bucket`` (hash per-mille) and ``rate_permille``."""
    rates = mixture_rates(df, weights, source_col)
    return (
        df.join(F.broadcast(rates.select(source_col, "rate_permille")), source_col)
        .withColumn("bucket", hash_bucket(key_col, 1000, salt))
        .where(F.col("bucket") < F.col("rate_permille"))
    )
