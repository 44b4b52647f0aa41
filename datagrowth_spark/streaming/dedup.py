"""Streaming exact deduplication — stateful dropDuplicates over a
document stream.

The streaming twin of ``operators/dedup.exact_dedup``: as document files
land, each row is keyed by a content hash and only first occurrences
pass through. State is one 16-byte hash per distinct key, hash-
partitioned across executors; on an unbounded ingest feed you bound it
with ``dropDuplicatesWithinWatermark`` on the ingest timestamp —
exposed via the ``watermark``/``ts_col`` arguments. For backlog drains
(availableNow) the un-watermarked form is the right tool: state lives
for the drain only.

Oracle-checked via the `streaming_dedup_exact` query: the streamed
dedup must reproduce the batch COUNT(DISTINCT text) per language.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

DOCUMENTS_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
    T.StructField("lang", T.StringType()),
    T.StructField("source", T.StringType()),
    T.StructField("n_chars", T.LongType()),
])


def read_documents_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    """File-source stream over documents parquet (directory or file)."""
    reader = spark.readStream.schema(DOCUMENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if os.path.isfile(path):
        path = path + "*"  # file source wants a dir/glob
    return reader.parquet(path)


def exact_dedup_stream(
    docs: DataFrame,
    key_cols: list[str] | None = None,
    text_col: str = "text",
    ts_col: str | None = None,
    watermark: str | None = None,
) -> DataFrame:
    """First-occurrence-wins streaming dedup on a content hash.

    ``key_cols`` scopes the dedup (e.g. ``["lang"]`` dedupes within each
    language — deterministic output partitioning, since cross-scope
    first-arrival races can't change which scope keeps the row). With
    ``ts_col`` + ``watermark`` set, uses dropDuplicatesWithinWatermark
    so state is evicted as event time advances (the unbounded-feed
    mode).
    """
    key_cols = key_cols or []
    hashed = docs.withColumn("content_hash", F.md5(F.encode(F.col(text_col), "utf-8")))
    keys = [*key_cols, "content_hash"]
    if ts_col is not None and watermark is not None:
        return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return hashed.dropDuplicates(keys)
