"""Distributed exact ranking — global rank / ntile without a global sort.

A bare ``Window.orderBy(...)`` funnels the whole frame through ONE task
(WindowExec warns, the plan grows an ``Exchange SinglePartition``) — the
classic 100 TB scale-killer. Exact global ranks don't need a global
sort: shard the frame on quantile-derived cuts of the sort key (one
bounded ``approxQuantile`` pass), rank WITHIN each shard, and shift each
shard's local ranks by the row count of the shards before it. The only
single-partition work is the per-shard-count prefix sum — one row per
shard, never corpus-sized. Same two-pass shape as the packing prefix
sum (operators/packing.py:54); shard boundaries cancel out of the final
ranks, so quantile approximation error affects only balance, never
values.

Shard ids are derived from the DATA (cut comparisons), not from
``spark_partition_id()`` — a partition-id scheme would break the moment
AQE coalesces the two plan branches differently; data-derived shards
are invariant to physical partitioning.

Ties on the primary key land in the SAME shard (cut comparison can't
split equal values), so the within-shard window sees every tie group
whole and ``tiebreaks`` fully determine the rank. With a non-total
ordering, tied rows get an arbitrary-but-valid rank permutation —
exactly the contract of a single global window.

The reference has no ranking operators (Django ORM querysets); this
serves the repo's own segmentation queries (RFM quartiles) at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datagrowth_spark.operators.packing import _SHARDABLE_KEY_TYPES, _quantile_key


def _sort_exprs(key: str, tiebreaks: tuple, descending: bool) -> list[Column]:
    head = F.col(key).desc() if descending else F.col(key).asc()
    return [head, *[F.col(t).asc() for t in tiebreaks]]


def add_global_rank(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    descending: bool = False,
    out: str = "rank",
    total_out: str | None = None,
    num_shards: int | None = None,
) -> DataFrame:
    """Exact 1-based global rank of every row under
    ``ORDER BY key [DESC], tiebreaks...`` — sharded, no global sort.

    ``key`` must be numeric or temporal (quantile-shardable); NULL keys
    rank where Spark's default null ordering puts them (FIRST for
    ascending, LAST for descending). ``total_out`` optionally also
    attaches the frame's total row count (needed by :func:`add_ntile`).
    """
    spark = df.sparkSession
    if num_shards is None:
        num_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    key_type = df.schema[key].dataType.simpleString()
    if key_type not in _SHARDABLE_KEY_TYPES:
        raise TypeError(
            f"add_global_rank needs a numeric/temporal key, got {key}:{key_type}")

    order = _sort_exprs(key, tiebreaks, descending)
    # Signed shadow: ascending in qkey == the requested global order.
    qkey = _quantile_key(key, key_type)
    if descending:
        qkey = -qkey
    with_q = df.withColumn("_dg_qkey", qkey)

    # Shard cuts are a LAZY 1-row percentile_approx aggregate broadcast
    # back onto the frame — not a driver-side approxQuantile action.
    # Lazy matters: chained rank passes (e.g. three RFM metrics) stay
    # ONE Catalyst plan, so upstream exchanges are computed once and
    # reused instead of being re-executed per driver action.
    probs = [i / num_shards for i in range(1, num_shards)]
    if probs:
        cuts_df = with_q.agg(
            F.array_sort(F.array_distinct(F.filter(
                F.percentile_approx(
                    "_dg_qkey", F.array(*[F.lit(p) for p in probs]), F.lit(10000)),
                lambda c: ~F.isnan(c),
            ))).alias("_dg_cuts"))
        with_q = with_q.crossJoin(F.broadcast(cuts_df))
    else:
        with_q = with_q.withColumn(
            "_dg_cuts", F.array().cast("array<double>"))

    # Shard = number of cuts strictly below the shadow key — monotone in
    # the requested order, equal keys share a shard. NULL keys: FIRST
    # for ascending (shard -1), LAST for descending (shard num_shards + 1,
    # past every cut-derived shard), matching Spark's default window
    # null ordering. NaN keys need their own branch: Spark orders NaN
    # as the LARGEST value, but the descending trick (negated shadow
    # key) cannot express that — -NaN is still NaN, which would land
    # "largest first" rows in the LAST shard. So: descending → NaN
    # shard -1 (before every real value, ahead of nothing else since
    # NULLs go last), ascending → shard num_shards (after every real
    # value, before the nothing that follows; NULLs went first).
    null_shard = num_shards + 1 if descending else -1
    nan_shard = -1 if descending else num_shards
    from_cuts = F.aggregate(
        F.coalesce(F.col("_dg_cuts"), F.array().cast("array<double>")),
        F.lit(0),
        lambda acc, c: acc + (F.col("_dg_qkey") > c).cast("int"))
    shard = F.when(F.col("_dg_qkey").isNull(), F.lit(null_shard))
    if key_type in ("float", "double"):
        shard = shard.when(F.isnan(F.col("_dg_qkey")), F.lit(nan_shard))
    shard = shard.otherwise(from_cuts)
    sharded = with_q.withColumn("_dg_shard", shard).drop("_dg_qkey", "_dg_cuts")

    local = sharded.withColumn(
        "_dg_rn",
        F.row_number().over(Window.partitionBy("_dg_shard").orderBy(*order)))
    # Tiny frame: one row per shard. Its cumulative window is the only
    # single-partition stage — bounded by num_shards, never the corpus.
    # Shard counts come from the RANKED frame (max row_number == count),
    # not from a second aggregate over the input: both consumers then
    # share the window's shuffle exchange instead of re-reading the
    # whole upstream lineage.
    offsets = (
        local.groupBy("_dg_shard").agg(F.max("_dg_rn").alias("_dg_cnt"))
        .select(
            "_dg_shard",
            F.coalesce(
                F.sum("_dg_cnt").over(
                    Window.orderBy("_dg_shard")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("_dg_off"),
            F.sum("_dg_cnt").over(
                Window.orderBy("_dg_shard")
                .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("_dg_total"),
        )
    )
    ranked = (
        local.join(F.broadcast(offsets), "_dg_shard")
        .withColumn(out, F.col("_dg_off") + F.col("_dg_rn"))
    )
    if total_out:
        ranked = ranked.withColumn(total_out, F.col("_dg_total"))
    return ranked.drop("_dg_shard", "_dg_rn", "_dg_off", "_dg_total")


def add_percent_rank(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    descending: bool = False,
    out: str = "percent_rank",
    num_shards: int | None = None,
) -> DataFrame:
    """Exact ``PERCENT_RANK() OVER (ORDER BY key [DESC], tiebreaks...)``
    without a single-partition window: ``(rank - 1) / (N - 1)``, 0.0
    for a single-row frame (the SQL contract).

    Built on the row_number-based sharded rank, so it equals SQL
    PERCENT_RANK exactly when the ordering is total (the operator's
    standing contract); under ties SQL's rank()-based version would
    assign tied rows equal values, this one breaks them arbitrarily.
    """
    ranked = add_global_rank(
        df, key, tiebreaks, descending=descending,
        out="_dg_rank", total_out="_dg_n", num_shards=num_shards)
    pr = F.when(F.col("_dg_n") > 1,
                (F.col("_dg_rank") - 1).cast("double") / (F.col("_dg_n") - 1)
                ).otherwise(F.lit(0.0))
    return ranked.withColumn(out, pr).drop("_dg_rank", "_dg_n")


def add_ntile(
    df: DataFrame,
    n: int,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    descending: bool = False,
    out: str = "tile",
    num_shards: int | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY key [DESC], tiebreaks...)``
    without a single-partition window.

    Standard SQL ntile semantics (identical in Spark and DuckDB): with
    N rows, the first ``N % n`` tiles hold ``N div n + 1`` rows, the
    rest ``N div n``. Computed from the sharded exact rank — integer
    arithmetic only, no float division.
    """
    ranked = add_global_rank(
        df, key, tiebreaks, descending=descending,
        out="_dg_rank", total_out="_dg_n", num_shards=num_shards)
    # base = N div n; rem = N % n; big = rem * (base + 1) rows live in
    # the widened tiles. ceil(a/b) == (a + b - 1) div b for positive
    # ints. The base=0 branch of the otherwise() is unreachable (then
    # rem == N so every rank <= big) and never evaluated by CASE WHEN.
    tile = F.expr(
        f"CASE WHEN _dg_rank <= (_dg_n % {n}) * (_dg_n div {n} + 1) "
        f"THEN (_dg_rank + (_dg_n div {n})) div (_dg_n div {n} + 1) "
        f"ELSE (_dg_n % {n}) + (_dg_rank - (_dg_n % {n}) * (_dg_n div {n} + 1) "
        f"     + (_dg_n div {n}) - 1) div (_dg_n div {n}) END"
    )
    return ranked.withColumn(out, tile.cast("int")).drop("_dg_rank", "_dg_n")
