"""Streaming query family.

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
from datagrowth_spark.queries._shared import _BANDS, _NUM_HASHES, _t  # noqa: E501
from datagrowth_spark.queries.pipeline import SQL_PIPELINE_SEED_MERGE  # noqa: E501



def q_streaming_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest near-dup (the continuous-crawl production
    shape): the same store/batch split as ``dedup_incremental``, but
    the new documents ARRIVE AS A STREAM in ascending-id micro-batches.
    Each micro-batch is banded-LSH-checked against the signature store
    — which grows by every earlier micro-batch's signatures, so
    cross-batch duplicates resolve through the store, never by
    re-shingling history — and the accumulated verdicts must hash-match
    the ONE-SHOT batch oracle exactly (store-path + micro-batching
    lose nothing)."""
    import os
    import tempfile
    import time

    from datagrowth_spark.streaming.dedup import StreamingNearDupIndex

    docs = _t(spark, sf_dir, "documents")
    store_docs = docs.where(F.col("doc_id") % 10 < 8)
    new_docs = docs.where(F.col("doc_id") % 10 >= 8).select("doc_id", "text")
    # Materialized signature TABLE stand-in (the store is parquet in
    # production; the corpus text is never touched again).
    store_sigs = DD.minhash_signature(
        store_docs, "text", "doc_id", num_hashes=_NUM_HASHES, n=3
    ).localCheckpoint(eager=True)

    # Backlog fixture: three ascending-id chunks, one file each, mtimes
    # pinning oldest-first so micro-batch order matches id order (what
    # makes streaming verdicts converge to the batch oracle's).
    hi = docs.agg(F.max("doc_id").alias("m")).collect()[0]["m"] + 1
    tmp = tempfile.mkdtemp(prefix="stream-neardup-")
    now, stamped = time.time(), set()
    for k in range(3):
        chunk = new_docs.where(
            (F.col("doc_id") >= k * hi // 3) & (F.col("doc_id") < (k + 1) * hi // 3))
        chunk.coalesce(1).write.mode("append").parquet(tmp)
        for name in os.listdir(tmp):
            path = os.path.join(tmp, name)
            if name.startswith("part-") and path not in stamped:
                os.utime(path, (now - 600 + 10 * k,) * 2)
                stamped.add(path)

    index = StreamingNearDupIndex(
        store_sigs, "text", "doc_id",
        num_hashes=_NUM_HASHES, bands=_BANDS, n=3, threshold=0.2,
        state_partitions=8)
    index.start(
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1).parquet(tmp)).stop()
    return index.verdicts.select(
        F.col("id").alias("doc_id"), "is_dup", "dup_of", "est_jaccard")



def q_streaming_seed_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured-Streaming form of the two-phase seeding pipeline:
    the same entity/detail fixture as ``pipeline_seed_merge`` arrives
    as a backlog of JSON page FILES drained micro-batch by micro-batch
    (``availableNow`` + ``maxFilesPerTrigger``), upserted by
    :class:`StreamingSeeder` with the batch seeder's delta semantics —
    new seeds insert, re-keyed seeds merge, ``state == deleted`` seeds
    REMOVE documents (the reference's delta contract,
    ``datagrowth/processors/input/seeding.py:168-213``). An extra
    entity is inserted in one micro-batch and tombstoned in a later
    one, so the delete genuinely crosses batch state; the drained
    result must hash-match the BATCH pipeline's oracle exactly.

    Scale design: per micro-batch the state update is one keyed join +
    one anti-join against a local-checkpointed snapshot (bounded plan
    depth across arbitrarily many batches); on a cluster the snapshot
    is a table MERGE — the operator structure is identical.
    """
    import json
    import os
    import tempfile
    import time

    from datagrowth_spark.datatypes.collection import Collection
    from datagrowth_spark.datatypes.document import prop_col
    from datagrowth_spark.streaming.seeding import StreamingSeeder

    root = tempfile.mkdtemp(prefix="stream-seed-")
    ent_dir = os.path.join(root, "entities")
    det_dir = os.path.join(root, "details")
    os.makedirs(ent_dir)
    os.makedirs(det_dir)
    now = time.time()

    def page(dir_: str, name: str, body: dict, age: float) -> None:
        path = os.path.join(dir_, name)
        with open(path, "w") as handle:
            handle.write(json.dumps(body))
        # Distinct mtimes pin the micro-batch order (the file source
        # processes oldest-first) — the insert-then-tombstone pair
        # below depends on it.
        os.utime(path, (now - age, now - age))

    total = TC.TOTAL
    for pg_start in range(0, total, TC.PAGE_SIZE):
        ids = range(pg_start, min(pg_start + TC.PAGE_SIZE, total))
        page(ent_dir, f"page{pg_start:04d}.json",
             {"results": [{"id": i, "name": f"entity {i}", "group": i % 3}
                          for i in ids]},
             age=600 - pg_start)
    # With maxFilesPerTrigger=2 over the 4+2 files below, the doomed
    # insert lands in micro-batch 2 and its tombstone in micro-batch 3
    # — the delete provably crosses checkpointed batch state.
    page(ent_dir, "page_extra.json",
         {"results": [{"id": total, "name": "doomed", "group": 0}]}, age=575)
    page(ent_dir, "page_tomb.json",
         {"results": [{"id": total, "state": "deleted"}]}, age=530)

    coll = Collection(spark, name="stream_entities", identifier="id")
    entity_seeder = StreamingSeeder(
        coll,
        {"@": "$.results", "id": "$.id", "name": "$.name",
         "group": "$.group", "state": "$.state"},
        body_col="value")
    entity_seeder.start(
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 2).text(ent_dir)).stop()

    # Phase 2 (merge strategy): detail pages stream in and shallow-merge
    # onto the live documents by id — incoming keys win, entity keys
    # (name/group) survive because the detail objective doesn't carry
    # them.
    for pg_start in range(0, total, TC.PAGE_SIZE):
        ids = range(pg_start, min(pg_start + TC.PAGE_SIZE, total))
        page(det_dir, f"page{pg_start:04d}.json",
             {"results": [{"id": i, "detail": f"detail {i}", "score": i / 10}
                          for i in ids]},
             age=500 - pg_start)
    # The merge phase drains in one micro-batch (no file cap): the
    # cross-batch delta machinery is already proven by phase 1, and one
    # batch is what a caught-up stream does anyway.
    detail_seeder = StreamingSeeder(
        coll,
        {"@": "$.results", "id": "$.id", "detail": "$.detail",
         "score": "$.score"},
        body_col="value")
    detail_seeder.start(
        spark.readStream.schema("value string").text(det_dir)).stop()

    return coll.df.select(
        prop_col("properties", "$.id").cast("long").alias("id"),
        prop_col("properties", "$.name").alias("name"),
        prop_col("properties", "$.group").cast("long").alias("grp"),
        prop_col("properties", "$.detail").alias("detail"),
        prop_col("properties", "$.score").cast("double").alias("score"),
    )



# Same fixture, same final state: the streaming drain must converge to
# the batch pipeline's result.
SQL_STREAMING_SEED_MERGE = SQL_PIPELINE_SEED_MERGE



# ---------------------------------------------------------------------------
# Structured Streaming (bounded drain -> same answer as the batch plan)
# ---------------------------------------------------------------------------

def q_streaming_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly tumbling-window counts computed BY THE STREAMING PATH:
    file-source readStream -> watermark -> windowed agg, drained with
    availableNow into a memory sink. Proves the streaming operators
    produce the exact batch answer on a bounded backlog (the reference's
    continuation-paged incremental seeding analogue, run as micro-batches).
    """
    from datagrowth_spark.streaming import read_events_stream, windowed_counts
    from datagrowth_spark.streaming.events import run_to_memory

    name = "stream_events_hourly"
    stream = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    # state_partitions: bounded drain over ~100k rows — state-store
    # count should track state size, not session default (see
    # run_to_memory docstring; a vanilla 200-partition session would
    # pay 25x the store overhead here).
    query = run_to_memory(
        windowed_counts(stream, window="1 hour", watermark="2 hours"),
        name, output_mode="complete", state_partitions=8,
    )
    query.stop()
    return spark.table(name)



SQL_STREAMING_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS window_start,
       date_trunc('hour', ts) + INTERVAL 1 HOUR AS window_end,
       event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2, 3
"""



def q_streaming_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup computed BY THE STREAMING PATH: file-source stream →
    stateful dropDuplicates on (lang, content-hash) → availableNow drain
    into a memory sink, then a batch count per language over the deduped
    rows. Must reproduce the batch COUNT(DISTINCT text) — proving the
    streaming dedup state machine loses nothing and passes no dup.
    """
    from datagrowth_spark.streaming.dedup import exact_dedup_stream, read_documents_stream
    from datagrowth_spark.streaming.events import run_to_memory

    name = "stream_dedup_exact"
    stream = read_documents_stream(spark, os.path.join(sf_dir, "documents.parquet"))
    query = run_to_memory(
        exact_dedup_stream(stream, key_cols=["lang"]), name, output_mode="append",
        state_partitions=8,
    )
    query.stop()
    return (
        spark.table(name)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )



SQL_STREAMING_DEDUP_EXACT = """
SELECT lang, CAST(COUNT(DISTINCT text) AS BIGINT) AS n_unique
FROM documents GROUP BY lang
"""



def q_streaming_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization computed BY THE STREAMING PATH: native
    ``session_window`` state (30-min inactivity gap) keyed by user,
    drained with availableNow, then rolled up per user. Semantics note
    the oracle mirrors: ``session_window`` opens a NEW session when the
    gap is exactly 30 minutes (boundary is ``>=``), while the batch
    lag() plan in q_events_sessionize uses strict ``>`` — the two agree
    everywhere except exact-boundary gaps.
    """
    from datagrowth_spark.streaming import read_events_stream, sessionize_stream
    from datagrowth_spark.streaming.events import run_to_memory

    name = "stream_sessionize"
    stream = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    query = run_to_memory(sessionize_stream(stream), name, output_mode="complete",
                          state_partitions=8)
    query.stop()
    return (
        spark.table(name)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum("n_events").alias("n_events"),
            F.sum(F.col("total_value").cast("decimal(18,2)")).cast("double").alias("total_value"),
        )
    )



SQL_STREAMING_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) >= INTERVAL 30 MINUTE
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM flagged
GROUP BY user_id
"""



def q_streaming_click_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-stream inner join BY THE STREAMING PATH: click events
    paired with same-user purchase events within the following hour,
    both sides watermarked so join state stays bounded (the canonical
    watermarked stream-stream join). Drained with availableNow; must
    reproduce the batch self-join exactly.
    """
    from datagrowth_spark.streaming import read_events_stream
    from datagrowth_spark.streaming.events import paired_events_stream, run_to_memory

    name = "stream_click_attr"
    path = os.path.join(sf_dir, "events.parquet")
    clicks = read_events_stream(spark, path)
    purchases = read_events_stream(spark, path)
    # Stream-stream join keeps FOUR state stores per partition; 8
    # partitions halve the measured micro-batch time vs 32 on this
    # backlog (see run_to_memory docstring).
    query = run_to_memory(
        paired_events_stream(clicks, purchases, "click", "purchase", within="1 hour"),
        name, output_mode="append", state_partitions=8,
    )
    query.stop()
    return spark.table(name).select("first_id", "second_id", "user_id")



SQL_STREAMING_CLICK_ATTRIBUTION = """
SELECT a.event_id AS first_id, b.event_id AS second_id, a.user_id
FROM events a JOIN events b ON a.user_id = b.user_id
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
  AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
"""



def q_streaming_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom stateful operator computed BY THE STREAMING PATH:
    ``applyInPandasWithState`` running per-user totals (exact_cents
    variant — integer-cent state, so the final totals are independent
    of how the backlog split into micro-batches), drained with
    availableNow, then reduced to each user's LAST update. Must
    reproduce the batch per-user aggregate exactly — proving the
    Arrow-batched state machine accumulates losslessly.

    The last update per user is the max-n_events row (the counter is
    strictly monotone across the batches a user appears in).
    """
    from datagrowth_spark.streaming import read_events_stream, stateful_user_stats
    from datagrowth_spark.streaming.events import run_to_memory

    name = "stream_user_stats"
    stream = read_events_stream(spark, os.path.join(sf_dir, "events.parquet"))
    query = run_to_memory(
        stateful_user_stats(stream, exact_cents=True), name,
        output_mode="update", state_partitions=8,
    )
    query.stop()
    w = Window.partitionBy("user_id").orderBy(F.desc("n_events"))
    return (
        spark.table(name)
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("user_id", "n_events", "value_cents")
    )



SQL_STREAMING_USER_STATS = """
SELECT user_id, COUNT(*) AS n_events,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
FROM events GROUP BY user_id
"""

