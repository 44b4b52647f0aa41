"""Structured Streaming tests.

Each test drains a bounded file-source stream with availableNow and
asserts the result equals the equivalent batch computation (windows,
session windows) or the reference's delta-seeding semantics (upsert +
tombstone, mirroring tests/django_project/processors/tests/seeding/
simple.py's delta expectations).
"""

import json
import os
import time

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.datatypes import Collection
from datagrowth_spark.streaming import (
    StreamingSeeder,
    read_events_stream,
    sessionize_stream,
    stateful_user_stats,
    windowed_counts,
)
from datagrowth_spark.streaming.events import run_to_memory


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    """Events subset rewritten as a 4-file parquet directory (so
    maxFilesPerTrigger yields real multi-batch streams)."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    path = str(tmp_path_factory.mktemp("events_stream"))
    df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df.repartition(4).write.mode("overwrite").parquet(path)
    return path


@pytest.fixture(scope="module")
def events_batch(spark, events_dir):
    df = spark.read.parquet(events_dir)
    if df.schema["ts"].dataType.simpleString() == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df.withColumn("ts", F.col("ts").cast("timestamp"))


def test_windowed_counts_matches_batch(spark, events_dir, events_batch):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    query = run_to_memory(windowed_counts(stream), "win_counts", output_mode="complete")
    try:
        got = {
            (r.window_start, r.event_type): (r.n_events, r.total_value)
            for r in spark.table("win_counts").collect()
        }
        expected = {
            (r.win.start, r.event_type): (r.n_events, r.total_value)
            for r in events_batch.groupBy(
                F.window("ts", "1 hour").alias("win"), "event_type"
            ).agg(
                F.count("*").alias("n_events"),
                F.sum(F.col("value").cast("decimal(18,2)")).cast("double").alias("total_value"),
            ).collect()
        }
        assert got == expected and len(got) > 10
    finally:
        query.stop()


def test_sessionize_stream_matches_batch(spark, events_dir, events_batch):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=2)
    query = run_to_memory(
        sessionize_stream(stream), "sessions", output_mode="complete"
    )
    try:
        got = {
            (r.user_id, r.session_start): (r.session_end, r.n_events)
            for r in spark.table("sessions").collect()
        }
        expected = {
            (r.user_id, r.sess.start): (r.sess.end, r.n_events)
            for r in events_batch.groupBy(
                F.session_window("ts", "30 minutes").alias("sess"), "user_id"
            ).agg(F.count("*").alias("n_events")).collect()
        }
        assert got == expected and len(got) > 10
    finally:
        query.stop()


def test_stateful_user_stats_accumulates_across_batches(spark, events_dir, events_batch):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    query = run_to_memory(stateful_user_stats(stream), "user_stats", output_mode="update")
    try:
        rows = spark.table("user_stats").collect()
        # final emission per user = the one with the highest batch count
        final = {}
        for r in rows:
            if r.user_id not in final or r.n_batches > final[r.user_id].n_batches:
                final[r.user_id] = r
        expected = {
            r.user_id: (r.n, round(r.tv, 2))
            for r in events_batch.groupBy("user_id").agg(
                F.count("*").alias("n"), F.sum("value").alias("tv")
            ).collect()
        }
        assert {u: (r.n_events, r.total_value) for u, r in final.items()} == expected
        # state genuinely crossed micro-batches (4 files, 1 per trigger)
        assert max(r.n_batches for r in rows) > 1
    finally:
        query.stop()


OBJECTIVE = {
    "@": "$.records",
    "id": "$.id",
    "title": "$.title",
    "state": "$.state",
}


def _write_page(path: str, name: str, records: list[dict], mtime: float) -> None:
    file_path = os.path.join(path, name)
    with open(file_path, "w") as handle:
        handle.write(json.dumps({"records": records}))
    os.utime(file_path, (mtime, mtime))


def test_streaming_seeder_upsert_and_tombstone(spark, tmp_path):
    src = str(tmp_path / "pages")
    os.makedirs(src)
    now = time.time()
    _write_page(src, "page1.json", [
        {"id": 1, "title": "one", "state": "active"},
        {"id": 2, "title": "two", "state": "active"},
    ], now - 60)
    _write_page(src, "page2.json", [
        {"id": 1, "state": "deleted"},                      # tombstone
        {"id": 2, "title": "two-v2", "state": "active"},    # merge
        {"id": 3, "title": "three", "state": "active"},     # insert
    ], now - 30)

    coll = Collection(spark, name="stream_seed", identifier="id")
    seeder = StreamingSeeder(coll, OBJECTIVE, body_col="value")
    stream = (
        spark.readStream.schema("value string")
        .option("maxFilesPerTrigger", 1)
        .text(src)
    )
    query = seeder.start(stream, timeout_s=120)
    query.stop()

    assert seeder.batches_processed == 2
    content = {d["id"]: d for d in coll.content()}
    assert set(content) == {2, 3}
    assert content[2]["title"] == "two-v2"
    assert content[2]["_id"] == "2"
    assert content[3]["title"] == "three"


def test_streaming_exact_dedup_first_occurrence_wins(spark, tmp_path):
    """Duplicate texts across files pass the stateful filter exactly once,
    scoped per language."""
    from datagrowth_spark.streaming.dedup import exact_dedup_stream, read_documents_stream
    from datagrowth_spark.streaming.events import run_to_memory

    src = str(tmp_path / "docs")
    rows1 = [(1, "alpha beta", "en", "s0", 10), (2, "gamma", "en", "s0", 5)]
    rows2 = [(3, "alpha beta", "en", "s1", 10),   # dup of doc 1 → dropped
             (4, "alpha beta", "de", "s1", 10),   # same text, other lang → kept
             (5, "delta", "en", "s1", 5)]
    schema = "doc_id long, text string, lang string, source string, n_chars long"
    spark.createDataFrame(rows1, schema).coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(rows2, schema).coalesce(1).write.mode("append").parquet(src)

    stream = read_documents_stream(spark, src, max_files_per_trigger=1)
    query = run_to_memory(exact_dedup_stream(stream, key_cols=["lang"]),
                          "t_stream_dedup", output_mode="append")
    query.stop()
    kept = spark.table("t_stream_dedup").select("text", "lang").collect()
    assert sorted((r["text"], r["lang"]) for r in kept) == [
        ("alpha beta", "de"), ("alpha beta", "en"), ("delta", "en"), ("gamma", "en"),
    ]


def test_stateful_user_stats_exact_cents_matches_batch(spark, events_dir, events_batch):
    stream = read_events_stream(spark, events_dir, max_files_per_trigger=1)
    query = run_to_memory(stateful_user_stats(stream, exact_cents=True),
                          "user_stats_cents", output_mode="update")
    try:
        rows = spark.table("user_stats_cents").collect()
        final = {}
        for r in rows:
            if r.user_id not in final or r.n_batches > final[r.user_id].n_batches:
                final[r.user_id] = r
        expected = {
            r.user_id: (r.n, r.cents)
            for r in events_batch.groupBy("user_id").agg(
                F.count("*").alias("n"),
                F.sum(F.round(F.col("value") * 100).cast("long")).alias("cents"),
            ).collect()
        }
        # integer-cent state: EXACT equality however the backlog split
        assert {u: (r.n_events, r.value_cents) for u, r in final.items()} == expected
        assert max(r.n_batches for r in rows) > 1
    finally:
        query.stop()


def test_streaming_neardup_index_matches_one_shot_batch(spark, tmp_path):
    """Micro-batched incremental near-dup must converge to the one-shot
    incremental verdicts: cross-micro-batch duplicates resolve through
    the growing signature store, same-batch ones by smaller-id-wins."""
    from datagrowth_spark.operators.dedup import (
        incremental_minhash_dedup, minhash_signature)
    from datagrowth_spark.streaming import StreamingNearDupIndex

    texts = {
        0: "the quick brown fox jumps over the lazy dog",
        1: "pack my box with five dozen liquor jugs",
        2: "sphinx of black quartz judge my vow",
    }
    store_rows = [(i, t) for i, t in texts.items()]
    new_rows = [
        (10, texts[0]),                                   # dup of store doc 0
        (11, "completely novel text one two three"),
        (20, texts[0]),                                   # dup, earliest match is store doc 0
        (21, "completely novel text one two three"),      # dup of NEW doc 11 (earlier batch)
        (22, "another novel sentence with words"),
    ]
    schema = "doc_id long, text string"
    store = spark.createDataFrame(store_rows, schema)
    store_sigs = store.transform(
        lambda d: minhash_signature(d, "text", "doc_id", num_hashes=16, n=3)
    ).localCheckpoint(eager=True)

    src = str(tmp_path / "newdocs")
    for k, lo, hi in ((0, 10, 20), (1, 20, 30)):
        batch = [r for r in new_rows if lo <= r[0] < hi]
        spark.createDataFrame(batch, schema).coalesce(1).write.mode("append").parquet(src)
        now = time.time()
        for name in os.listdir(src):
            if name.startswith("part-"):
                p = os.path.join(src, name)
                if os.path.getmtime(p) > now - 1:
                    os.utime(p, (now - 600 + 10 * k,) * 2)

    index = StreamingNearDupIndex(store_sigs, num_hashes=16, bands=4, n=3,
                                  threshold=0.2)
    index.start(spark.readStream.schema(schema)
                .option("maxFilesPerTrigger", 1).parquet(src)).stop()
    assert index.batches_processed == 2

    one_shot, _ = incremental_minhash_dedup(
        spark.createDataFrame(new_rows, schema), store_sigs,
        num_hashes=16, bands=4, n=3, threshold=0.2)
    got = {r["id"]: (r["is_dup"], r["dup_of"]) for r in index.verdicts.collect()}
    want = {r["id"]: (r["is_dup"], r["dup_of"]) for r in one_shot.collect()}
    assert got == want
    assert got[10] == (True, 0) and got[20] == (True, 0)
    assert got[21] == (True, 11)          # resolved via the APPENDED store sigs
    assert got[11][0] is False and got[22][0] is False


def test_available_now_drain_timeout_raises(spark, tmp_path):
    """An availableNow drain that can't finish in time must raise
    DrainTimeout (and stop the query), never hand back silently
    truncated state — the .start(...).stop() caller pattern would
    otherwise kill the query mid-drain."""
    from datagrowth_spark.streaming.base import DrainTimeout

    src = str(tmp_path / "pages")
    os.makedirs(src)
    now = time.time()
    for k in range(8):
        _write_page(src, f"p{k}.json",
                    [{"id": k, "title": f"t{k}", "state": "active"}],
                    now - 60 + k)

    coll = Collection(spark, name="timeout_seed", identifier="id")
    seeder = StreamingSeeder(coll, OBJECTIVE, body_col="value")
    stream = (spark.readStream.schema("value string")
              .option("maxFilesPerTrigger", 1).text(src))
    # 8 micro-batches (one file each, a keyed upsert + checkpoint
    # apiece) cannot finish inside 1s; awaitTermination requires a
    # positive timeout.
    with pytest.raises(DrainTimeout):
        seeder.start(stream, timeout_s=1)
