"""Annotation data model: human labels joined to documents by reference.

Mirrors the reference's ``Annotation`` (``datagrowth/datatypes/
annotations/base.py:6-22``): a label row carries ``user``, the
document ``reference`` it attaches to, a ``name``, and a value that is
a float XOR a string (the ``annotation`` property picks whichever is
set). Collection-side joins (C10 semi-join, C11 anti-join sampling)
live on :class:`~datagrowth_spark.datatypes.collection.Collection`.

At scale annotations are a skinny table joined on ``reference`` — keep
it broadcastable or bucketed on reference next to the documents table.
"""

from __future__ import annotations

from typing import Any, Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

ANNOTATION_SCHEMA = T.StructType([
    T.StructField("user", T.StringType()),
    T.StructField("reference", T.StringType(), False),
    T.StructField("name", T.StringType(), False),
    T.StructField("value", T.DoubleType()),
    T.StructField("string", T.StringType()),
    T.StructField("created_at", T.TimestampType()),
])


def make_annotations(spark: SparkSession, rows: Iterable[dict[str, Any]]) -> DataFrame:
    """Build the annotations frame; enforces the value-XOR-string rule."""
    prepared = []
    for row in rows:
        value, string = row.get("value"), row.get("string")
        if (value is None) == (string is None):
            raise ValueError(
                f"annotation needs exactly one of value/string — got {row!r}")
        prepared.append((
            row.get("user"), str(row["reference"]), row["name"],
            None if value is None else float(value), string,
            row.get("created_at"),
        ))
    return spark.createDataFrame(prepared, ANNOTATION_SCHEMA)


def annotation_col() -> Column:
    """The reference's ``annotation`` property: value if set else string."""
    return F.coalesce(F.col("value").cast("string"), F.col("string"))


def annotate_documents(
    documents: DataFrame, annotations: DataFrame, name: str,
) -> DataFrame:
    """Left-join one named annotation onto documents by reference.

    Multiple annotations of the same name for a reference resolve to the
    most recent (created_at, then value) — deterministic last-writer-wins.
    """
    from pyspark.sql.window import Window

    w = Window.partitionBy("reference").orderBy(
        F.desc_nulls_last("created_at"), F.desc("value"), F.desc("string"))
    latest = (
        annotations.where(F.col("name") == name)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("reference", annotation_col().alias(f"annotation_{name}"))
    )
    return documents.join(F.broadcast(latest), "reference", "left")
