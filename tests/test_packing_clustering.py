"""Sequence packing (operators/packing.py) and clustering E/M steps
(operators/clustering.py)."""

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators import clustering as CL
from datagrowth_spark.operators import packing as PK


@pytest.fixture(scope="module")
def docs(spark):
    # (key, token count) — totals chosen to exercise straddling: stream
    # is 10+3+12+5 = 30 tokens, ctx=8 → chunks 0..3.
    return spark.createDataFrame(
        [(1, 10), (2, 3), (3, 12), (4, 5), (5, 0)], "doc_id long, n_toks long"
    )


def test_pack_layout_offsets(docs):
    rows = {r["doc_id"]: r for r in PK.pack_layout(docs, "doc_id", "n_toks", ctx=8).collect()}
    assert 5 not in rows  # zero-token doc dropped
    assert (rows[1]["start"], rows[1]["first_chunk"], rows[1]["last_chunk"]) == (0, 0, 1)
    assert (rows[2]["start"], rows[2]["first_chunk"], rows[2]["last_chunk"]) == (10, 1, 1)
    assert (rows[3]["start"], rows[3]["first_chunk"], rows[3]["last_chunk"]) == (13, 1, 3)
    assert rows[3]["n_chunks"] == 3
    assert (rows[4]["start"], rows[4]["first_chunk"], rows[4]["last_chunk"]) == (25, 3, 3)


def test_chunk_stats_conservation(docs):
    layout = PK.pack_layout(docs, "doc_id", "n_toks", ctx=8)
    stats = {r["chunk_id"]: r for r in PK.chunk_stats(layout, ctx=8).collect()}
    assert set(stats) == {0, 1, 2, 3}
    # Every chunk but the last holds exactly ctx stream positions.
    assert [stats[i]["n_tokens"] for i in range(4)] == [8, 8, 8, 6]
    assert sum(s["n_tokens"] for s in stats.values()) == 30
    # Chunk 1 is touched by docs 1 (tail), 2, 3 (head); only 2 and 3 start in it.
    assert (stats[1]["n_docs"], stats[1]["n_starts"]) == (3, 2)


def test_pack_layout_sharded(spark):
    df = spark.createDataFrame(
        [("a", 1, 5), ("a", 2, 5), ("b", 1, 7)], "shard string, doc_id long, n_toks long"
    )
    rows = {
        (r["shard"], r["doc_id"]): r["start"]
        for r in PK.pack_layout(df, "doc_id", "n_toks", ctx=4, partition_col="shard").collect()
    }
    # Prefix sums restart per shard — the embarrassingly-parallel form.
    assert rows == {("a", 1): 0, ("a", 2): 5, ("b", 1): 0}


def test_pack_layout_temporal_key_sharded(spark):
    # approxQuantile rejects temporal columns; the sharded path must map
    # them to epoch numerics instead of crashing (ADVICE r3).
    import datetime

    rows = [(datetime.datetime(2024, 1, 1, h), 4) for h in range(12)]
    df = spark.createDataFrame(rows, "ts timestamp, n_toks long")
    out = PK.pack_layout(df, "ts", "n_toks", ctx=8, num_shards=4)
    got = sorted((r["ts"], r["start"]) for r in out.collect())
    assert [s for _, s in got] == [4 * i for i in range(12)]

    date_rows = [(datetime.date(2024, 1, 1 + d), 3) for d in range(8)]
    ddf = spark.createDataFrame(date_rows, "d date, n_toks long")
    dout = PK.pack_layout(ddf, "d", "n_toks", ctx=8, num_shards=3)
    dgot = sorted((r["d"], r["start"]) for r in dout.collect())
    assert [s for _, s in dgot] == [3 * i for i in range(8)]


def test_pack_layout_null_keys_kept_first(spark):
    # NULL keys pack at the head of the stream (shard -1, NULLS FIRST),
    # matching the global-window fallback — never silently dropped.
    df = spark.createDataFrame(
        [(None, 5), (10, 3), (20, 4)], "doc_id int, n_toks long"
    )
    out = PK.pack_layout(df, "doc_id", "n_toks", ctx=8, num_shards=2)
    rows = {r["doc_id"]: r["start"] for r in out.collect()}
    assert rows == {None: 0, 10: 5, 20: 8}


def test_centroids_and_assignment(spark):
    emb = spark.createDataFrame(
        [
            (1, [0.0, 0.0], 0),
            (2, [1.0, 1.0], 0),   # label-0 centroid = (0.5, 0.5)
            (3, [10.0, 10.0], 1),
            (4, [12.0, 10.0], 1),  # label-1 centroid = (11, 10)
            (5, [9.0, 9.0], 0),   # mislabeled: nearest is centroid 1
        ],
        "vec_id long, embedding array<float>, label int",
    )
    flat = CL.label_centroids(emb, "label")
    cents = {(r["label"], r["pos"]): r["centroid"] for r in flat.collect()}
    assert cents[(1, 0)] == pytest.approx(11.0)
    assert cents[(0, 0)] == pytest.approx(10 / 3)
    assigned = CL.assign_to_centroids(
        emb, CL.centroid_vectors(flat, "label"), keep_cols=("label",)
    )
    got = {r["vec_id"]: r["assigned"] for r in assigned.collect()}
    assert got == {1: 0, 2: 0, 3: 1, 4: 1, 5: 1}


def test_assignment_tiebreak(spark):
    # A point equidistant from both centroids must pick the smaller id.
    emb = spark.createDataFrame([(1, [0.5, 0.5])], "vec_id long, embedding array<float>")
    cents = spark.createDataFrame(
        [(0, [0.0, 0.0]), (1, [1.0, 1.0])], "centroid_id int, centroid array<double>"
    )
    assert CL.assign_to_centroids(emb, cents).collect()[0]["assigned"] == 0


def test_char_pairs(spark):
    from datagrowth_spark.functions.text import char_pairs

    df = spark.range(1).select(
        char_pairs(F.lit("abc")).alias("p3"),
        char_pairs(F.lit("ab")).alias("p2"),
        char_pairs(F.lit("a")).alias("p1"),
    )
    row = df.collect()[0]
    assert row["p3"] == ["ab", "bc"]
    assert row["p2"] == ["ab"]
    assert row["p1"] == []
