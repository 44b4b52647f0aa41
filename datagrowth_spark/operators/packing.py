"""Sequence packing — the pack-then-chunk layout for LLM pre-training.

Training consumes fixed-size contexts, not documents. The standard
GPT-style layout concatenates all documents (in a deterministic order)
into one token stream and cuts it every ``ctx`` tokens; a document can
straddle a chunk boundary. The layout is therefore fully described by
each document's start offset in the stream — an inclusive prefix sum of
token counts — from which the chunks it touches follow arithmetically.

Plan shape: one global-sort window for the prefix sum (Spark range-
partitions the sort, so this distributes), then a per-row ``sequence``
explode (documents rarely span more than a couple of chunks) and one
hash aggregate keyed by chunk. No Python anywhere.

100 TB note: a single global ordering is the honest cost of a globally
deterministic layout. Real pipelines shard first — pass
``partition_col`` (e.g. a shard id) and the window becomes
``partitionBy(shard).orderBy(key)``: embarrassingly parallel prefix
sums, one layout per shard, no global sort. The oracle query uses the
global form so DuckDB can replay it exactly.

Beyond-reference surface (the reference has no notion of token budgets;
closest is batching by document count, `datagrowth/utils/iterators.py:6-39`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def pack_layout(
    df: DataFrame,
    key_col: str,
    tokens_col: Column | str,
    ctx: int,
    partition_col: str | None = None,
) -> DataFrame:
    """Per-document placement in the packed token stream.

    Returns the input keyed columns plus ``n_tokens``, ``start`` (offset
    of the document's first token), ``first_chunk``/``last_chunk`` (the
    ``ctx``-token chunks the document touches) and ``n_chunks``.
    Zero-token documents are dropped (they occupy no stream positions).
    """
    toks = F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    w = (
        Window.partitionBy(partition_col).orderBy(key_col)
        if partition_col
        else Window.orderBy(key_col)
    )
    out = (
        df.select(
            *( [partition_col] if partition_col else [] ),
            F.col(key_col),
            toks.cast("long").alias("n_tokens"),
        )
        .where(F.col("n_tokens") > 0)
        .withColumn("stream_end", F.sum("n_tokens").over(w))
        .withColumn("start", F.col("stream_end") - F.col("n_tokens"))
    )
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
