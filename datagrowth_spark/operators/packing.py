"""Sequence packing — the pack-then-chunk layout for LLM pre-training.

Training consumes fixed-size contexts, not documents. The standard
GPT-style layout concatenates all documents (in a deterministic order)
into one token stream and cuts it every ``ctx`` tokens; a document can
straddle a chunk boundary. The layout is therefore fully described by
each document's start offset in the stream — an inclusive prefix sum of
token counts — from which the chunks it touches follow arithmetically.

Plan shape: a TWO-PASS sharded prefix sum — quantile-derived range cuts
split the key space into shards, each shard does an independent window
prefix sum, and a tiny per-shard-total aggregate (one row per shard)
turns local sums into global offsets via a broadcast join. Then a
per-row ``sequence`` explode (documents rarely span more than a couple
of chunks) and one hash aggregate keyed by chunk. No Python anywhere.

100 TB note: the layout is globally deterministic (a pure function of
the key ordering — shard boundaries cancel out of the arithmetic), yet
no stage ever sorts more than one shard: the only single-partition work
is the shard-offset aggregate over ``num_shards`` rows. Passing
``partition_col`` (e.g. a pre-existing shard id) skips the cut
computation entirely and lays out each shard independently.

Beyond-reference surface (the reference has no notion of token budgets;
closest is batching by document count, `datagrowth/utils/iterators.py:6-39`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_SHARDABLE_KEY_TYPES = {"tinyint", "smallint", "int", "bigint", "float", "double",
                        "date", "timestamp", "timestamp_ntz"}


def _quantile_key(key_col: str, key_type: str) -> Column:
    """Numeric shadow of the key for ``approxQuantile``/cut comparison.

    ``approxQuantile`` only accepts numeric columns (it raises for
    date/timestamp), so temporal keys are mapped to an epoch integer —
    a strictly monotone mapping, which is all the sharding needs (shard
    boundaries cancel out of the final offsets).
    """
    if key_type == "date":
        return F.unix_date(F.col(key_col)).cast("double")
    if key_type in ("timestamp", "timestamp_ntz"):
        # ntz→timestamp under the session's fixed zone is monotone.
        return F.unix_micros(F.col(key_col).cast("timestamp")).cast("double")
    return F.col(key_col).cast("double")


def _global_prefix_sum(base: DataFrame, key_col: str, num_shards: int | None) -> DataFrame:
    """Globally-ordered inclusive prefix sum of ``n_tokens`` by ``key_col``
    without a global-sort window.

    Shard cuts come from ``approxQuantile`` (one bounded pass; the
    collected cut list is ``num_shards - 1`` scalars). Shard offsets are
    a one-row-per-shard aggregate windowed on that tiny frame, broadcast
    back. The result is invariant to where the cuts land, so quantile
    approximation error affects only balance, never values.

    NULL keys sort first (shard ``-1``), matching the global window's
    default NULLS FIRST ordering — they are packed at the head of the
    stream, never dropped.
    """
    spark = base.sparkSession
    if num_shards is None:
        num_shards = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    key_type = base.schema[key_col].dataType.simpleString()
    if key_type not in _SHARDABLE_KEY_TYPES:
        # Orderable-but-not-quantile-able key (e.g. string): fall back
        # to the global window (range-partitioned sort).
        w = Window.orderBy(key_col)
        return base.withColumn("stream_end", F.sum("n_tokens").over(w))

    qkey = _quantile_key(key_col, key_type)
    with_q = base.withColumn("_qkey", qkey)
    probs = [i / num_shards for i in range(1, num_shards)]
    cuts = sorted(set(with_q.stat.approxQuantile("_qkey", probs, 0.001))) if probs else []
    if not cuts:
        w = Window.orderBy(key_col)
        return base.withColumn("stream_end", F.sum("n_tokens").over(w))

    # _shard = number of cuts strictly below the key — monotone in the
    # key, so per-shard order ++ shard order == global order. NULL keys
    # get shard -1 (NULLS FIRST).
    cut_arr = F.array(*[F.lit(c) for c in cuts])
    sharded = with_q.withColumn(
        "_shard",
        F.when(F.col("_qkey").isNull(), F.lit(-1)).otherwise(
            F.aggregate(
                cut_arr, F.lit(0),
                lambda acc, c: acc + (F.col("_qkey") > c).cast("int"),
            )
        ),
    ).drop("_qkey")
    local = sharded.withColumn(
        "_local_end",
        F.sum("n_tokens").over(Window.partitionBy("_shard").orderBy(key_col)),
    )
    offsets = (
        sharded.groupBy("_shard")
        .agg(F.sum("n_tokens").alias("_shard_toks"))
        .withColumn(
            "_offset",
            F.coalesce(
                F.sum("_shard_toks").over(
                    Window.orderBy("_shard")
                    .rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select("_shard", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_shard")
        .withColumn("stream_end", F.col("_local_end") + F.col("_offset"))
        .drop("_shard", "_local_end", "_offset")
    )


def pack_layout(
    df: DataFrame,
    key_col: str,
    tokens_col: Column | str,
    ctx: int,
    partition_col: str | None = None,
    num_shards: int | None = None,
) -> DataFrame:
    """Per-document placement in the packed token stream.

    Returns the input keyed columns plus ``n_tokens``, ``start`` (offset
    of the document's first token), ``first_chunk``/``last_chunk`` (the
    ``ctx``-token chunks the document touches) and ``n_chunks``.
    Zero-token documents are dropped (they occupy no stream positions).
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    base = (
        df.select(
            *( [partition_col] if partition_col else [] ),
            F.col(key_col),
            toks.cast("long").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
    )
    if partition_col:
        w = Window.partitionBy(partition_col).orderBy(key_col)
        out = base.withColumn("stream_end", F.sum("n_tokens").over(w))
    else:
        out = _global_prefix_sum(base, key_col, num_shards)
    out = out.withColumn("start", F.col("stream_end") - F.col("n_tokens"))
    return (
        out.withColumn("first_chunk", F.expr(f"start div {ctx}"))
        .withColumn("last_chunk", F.expr(f"(stream_end - 1) div {ctx}"))
        .withColumn("n_chunks", F.col("last_chunk") - F.col("first_chunk") + 1)
        .drop("stream_end")
    )


def chunk_stats(layout: DataFrame, ctx: int) -> DataFrame:
    """Per-chunk occupancy of a :func:`pack_layout` frame.

    Explodes each document over the chunks it touches and aggregates:
    ``n_docs`` documents overlapping the chunk, ``n_starts`` documents
    whose first token lands in it, and ``n_tokens`` stream positions it
    holds (== ``ctx`` for every chunk but the last — a built-in
    consistency check).
    """
    doc_end = F.col("start") + F.col("n_tokens")
    chunk_lo = F.col("chunk_id") * ctx
    chunk_hi = (F.col("chunk_id") + 1) * ctx
    overlap = F.least(doc_end, chunk_hi) - F.greatest(F.col("start"), chunk_lo)
    return (
        layout.select(
            "start",
            "n_tokens",
            "first_chunk",
            F.explode(F.sequence("first_chunk", "last_chunk")).alias("chunk_id"),
        )
        .groupBy("chunk_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("first_chunk") == F.col("chunk_id")).cast("long")).alias("n_starts"),
            F.sum(overlap).alias("n_tokens"),
        )
    )
