"""Data selection under a token budget — DCLM/FineWeb-style curation.

Given per-document quality scores and token counts, keep the
highest-quality documents per stratum (usually language or source)
until a token budget is exhausted — the selection step a training-data
pipeline runs after scoring and before packing.

Plan shape: one shuffle on the stratum key, then a partition-local sort
for the running token total (inclusive prefix sum over the quality
ranking). Strata process in parallel; the cost center at 100 TB is the
largest stratum's sort. For corpora where one stratum dominates, use
:func:`budget_threshold` — a two-pass rank-free variant that finds the
quality cut with ``approxQuantile``-style aggregation instead of a full
sort (exactness traded for a bounded token-budget overshoot).

Beyond-reference surface (the reference selects documents only by
predicate filters, never under a global budget).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def select_by_token_budget(
    df: DataFrame,
    strata_cols: list[str],
    score_col: Column | str,
    tokens_col: Column | str,
    budget: int,
    tiebreak_col: str | None = None,
) -> DataFrame:
    """Exact budget selection: per stratum, rank by score descending and
    keep rows while the running token total stays within ``budget``.

    The running total is INCLUSIVE: a document is kept only if it fits
    entirely (no partial documents). Ties rank deterministically via
    ``tiebreak_col`` (required for oracle-stable output when scores
    collide). Adds ``n_tokens`` and ``kept`` columns.
    """
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    order = [score.desc()] + ([F.col(tiebreak_col)] if tiebreak_col else [])
    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df.withColumn("n_tokens", toks.cast("long"))
    return out.withColumn("kept", F.sum("n_tokens").over(w) <= F.lit(int(budget)))


def budget_threshold(
    df: DataFrame,
    strata_cols: list[str],
    score_col: Column | str,
    tokens_col: Column | str,
    budget: int,
    bins: int = 1024,
) -> DataFrame:
    """Approximate rank-free budget cut: per stratum, histogram tokens
    over ``bins`` quality buckets (one aggregation, no sort) and pick
    the lowest bucket whose cumulative-from-the-top token total still
    fits ``budget``. Returns ``(strata..., score_cut)``; filtering
    ``score >= score_cut`` keeps at most one bucket's tokens beyond the
    budget. The 100 TB path when a stratum is too large to sort.
    """
    score = F.col(score_col) if isinstance(score_col, str) else score_col
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    bucket = F.least(F.floor(score * bins).cast("int"), F.lit(bins - 1))
    hist = (
        df.groupBy(*strata_cols, bucket.alias("__bucket"))
        .agg(F.sum(toks.cast("long")).alias("__toks"))
    )
    # cumulative tokens from the TOP bucket downwards (tiny frame:
    # strata × bins rows)
    w = (
        Window.partitionBy(*strata_cols)
        .orderBy(F.desc("__bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("__cum", F.sum("__toks").over(w))
    return (
        cum.where(F.col("__cum") <= budget)
        .groupBy(*strata_cols)
        .agg((F.min("__bucket").cast("double") / bins).alias("score_cut"))
    )
