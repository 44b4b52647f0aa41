"""Multimodal query family.

Split from the single-module queries.py by scripts/split_queries.py (r12); definitions are verbatim.
"""

from __future__ import annotations
import os
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from datagrowth_spark.core.session import ensure_ts_readable
from datagrowth_spark.functions import text as TX
from datagrowth_spark.operators import dedup as DD
from datagrowth_spark.operators import multimodal as MM
from datagrowth_spark.operators import similarity as SIM
from datagrowth_spark.sources import testclient as TC
from datagrowth_spark.core.caching import persist_registered as _persist
from datagrowth_spark.core.caching import register as _register_cache
from datagrowth_spark.core.caching import release as release_caches
from datagrowth_spark.queries._shared import _t  # noqa: E501



# ---------------------------------------------------------------------------
# Multimodal (binary assets: decode / resize / frame-sample / featurize)
#
# Assets are synthesized deterministically from documents.text (ASCII, so
# byte offsets == char offsets and every byte computation has an exact SQL
# oracle); the decode step is the documented fake codec — the *plumbing*
# (binary columns, metadata struct pruning, Arrow-batched mapInPandas,
# JVM-side frame slicing) is the real deliverable. See operators/multimodal.py.
# ---------------------------------------------------------------------------

def _media(spark: SparkSession, sf_dir: str, kind: str = MM.IMAGE) -> DataFrame:
    return MM.synthesize_media(
        _t(spark, sf_dir, "documents"), text_col="text", id_col="doc_id", kind=kind
    )



def q_media_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob → pixel stats via Arrow-batched mapInPandas (narrow stage,
    no shuffle; blob bytes cross into Python exactly once)."""
    return MM.decode_images(_media(spark, sf_dir))



SQL_MEDIA_DECODE = """
SELECT doc_id AS asset_id,
       64 + octet_length(encode(text)) % 512 AS width,
       64 + (octet_length(encode(text)) * 7) % 512 AS height,
       CAST(3 AS BIGINT) AS channels,
       CAST(concat('0x', substr(md5(text), 1, 8)) AS BIGINT) % 256 AS mean_pixel
FROM documents
"""



def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize (fake re-encode to a 24x24 byte budget) with metadata
    recomputed honestly from the new content."""
    resized = MM.resize_images(_media(spark, sf_dir), 24, 24)
    return resized.select(
        "asset_id",
        F.col("media.size_bytes").alias("size_bytes"),
        F.decode("content", "utf-8").alias("content_str"),
    )



SQL_MEDIA_RESIZE = """
SELECT doc_id AS asset_id,
       least(octet_length(encode(text)), 576) AS size_bytes,
       substr(text, 1, 576) AS content_str
FROM documents
"""



def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 4th 64-byte frame of each 'video' — pure JVM explode
    (sequence → posexplode → substring), zero Python."""
    frames = MM.sample_frames(_media(spark, sf_dir, kind=MM.VIDEO), frame_size=64, every=4)
    return frames.select(
        "asset_id", "frame_no", F.decode("frame", "utf-8").alias("frame")
    )



SQL_MEDIA_FRAMES = """
WITH f AS (
  SELECT doc_id, text,
         unnest(generate_series(0, octet_length(encode(text)) // 64 - 1, 4)) AS fn
  FROM documents
)
SELECT doc_id AS asset_id, fn AS frame_no,
       substr(text, CAST(fn * 64 + 1 AS BIGINT), 64) AS frame
FROM f
"""



def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blob → fixed-dim feature vector (the embed step), exploded to
    (asset, dim, value) rows for exact cross-engine comparison."""
    feats = MM.media_features(_media(spark, sf_dir), dim=8)
    return feats.select("asset_id", F.posexplode("features")).select(
        "asset_id",
        F.col("pos").cast("long").alias("dim_no"),
        F.round("col", 6).alias("value"),
    )



SQL_MEDIA_FEATURES = """
WITH f AS (
  SELECT doc_id, text, unnest(generate_series(0, 7)) AS j FROM documents
)
SELECT doc_id AS asset_id, j AS dim_no,
       round(CAST(concat('0x', substr(md5(text || CAST(j // 4 AS VARCHAR)),
                                      1 + 8 * (j % 4), 8)) AS BIGINT)
             / 4294967296.0, 6) AS value
FROM f
"""

