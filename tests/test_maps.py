"""Conf-independence regression tests for map merges (round-3 verdict #1).

``pipeline_seed_merge`` failed the driver oracle because every
properties-merge used bare ``map_concat``, which only tolerates
duplicate keys under ``spark.sql.mapKeyDedupPolicy=LAST_WIN`` — a conf
the engine's own session factory set but the driver's vanilla oracle
session does not. The engine no longer sets the conf anywhere (see
``core/session.py``), so this whole suite runs under the default
EXCEPTION policy; these tests additionally pin the overlapping-key
paths explicitly so the regression cannot silently return.
"""

import json

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.datatypes.collection import Collection
from datagrowth_spark.datatypes.document import content_col, document_content
from datagrowth_spark.functions.maps import map_set, merge_maps_first_win, merge_maps_last_win


@pytest.fixture(autouse=True)
def _vanilla_policy(spark):
    # The guard itself: the shared test session must NOT carry the
    # LAST_WIN crutch, otherwise these tests prove nothing.
    assert spark.conf.get("spark.sql.mapKeyDedupPolicy") == "EXCEPTION"


def _one(spark, m1, m2):
    return spark.createDataFrame(
        [(m1, m2)], "m1 map<string,string>, m2 map<string,string>"
    )


class TestMergeHelpers:
    def test_last_win_overlap(self, spark):
        df = _one(spark, {"a": "1", "b": "2"}, {"b": "3", "c": "4"})
        out = df.select(merge_maps_last_win("m1", "m2").alias("m")).collect()[0]["m"]
        assert out == {"a": "1", "b": "3", "c": "4"}

    def test_first_win_overlap(self, spark):
        df = _one(spark, {"a": "1", "b": "2"}, {"b": "3", "c": "4"})
        out = df.select(merge_maps_first_win("m1", "m2").alias("m")).collect()[0]["m"]
        assert out == {"a": "1", "b": "2", "c": "4"}

    def test_null_sides(self, spark):
        df = _one(spark, None, {"x": "1"})
        assert df.select(merge_maps_last_win("m1", "m2").alias("m")).collect()[0]["m"] == {"x": "1"}
        assert df.select(merge_maps_last_win("m2", "m1").alias("m")).collect()[0]["m"] == {"x": "1"}

    def test_map_set_overwrites_existing_key(self, spark):
        df = _one(spark, {"a": "1", "b": "2"}, None)
        out = df.select(map_set("m1", "a", F.lit("9")).alias("m")).collect()[0]["m"]
        assert out == {"a": "9", "b": "2"}

    def test_map_set_null_base(self, spark):
        df = _one(spark, None, None)
        out = df.select(map_set("m1", "k", F.lit("v")).alias("m")).collect()[0]["m"]
        assert out == {"k": "v"}


class TestOverlappingKeyPaths:
    def test_collection_update_overlapping_properties(self, spark):
        # The C2 hot path: an upsert whose incoming batch shares keys
        # with existing properties is the NORMAL case.
        coll = Collection(spark, identifier="id")
        coll.add([{"id": 1, "name": "alpha", "size": 10}])
        coll.update([{"id": 1, "name": "beta", "extra": "x"}], by_property="id")
        rows = coll.content()
        assert len(rows) == 1
        assert rows[0]["name"] == "beta"
        assert rows[0]["size"] == 10
        assert rows[0]["extra"] == "x"

    def test_content_col_matches_driver_side_on_clashes(self, spark):
        # properties win over derivatives; among phases the FIRST
        # writer wins (document_content setdefault semantics).
        row = {
            "identity": "d1",
            "reference": None,
            "properties": {"a": json.dumps("props")},
            "derivatives": {
                "phase1": {"a": json.dumps("p1"), "b": json.dumps("p1")},
                "phase2": {"b": json.dumps("p2"), "c": json.dumps("p2")},
            },
            "task_results": None,
            "pending_at": None,
            "finished_at": None,
        }
        from datagrowth_spark.datatypes.document import DOCUMENT_SCHEMA

        df = spark.createDataFrame([row], DOCUMENT_SCHEMA)
        got = df.select(content_col().alias("c")).collect()[0]["c"]
        decoded = {k: json.loads(v) for k, v in got.items()}
        expected = document_content(row)
        expected.pop("_id", None)
        assert decoded == expected == {"a": "props", "b": "p1", "c": "p2"}

    def test_growth_task_results_rerun_same_phase(self, spark):
        # Re-running a phase overwrites its task_results entry instead
        # of raising DUPLICATED_MAP_KEY.
        df = spark.createDataFrame(
            [({"detail": json.dumps({"success": False})},)],
            "task_results map<string,string>",
        )
        out = df.select(
            map_set("task_results", "detail", F.lit(json.dumps({"success": True}))).alias("t")
        ).collect()[0]["t"]
        assert json.loads(out["detail"])["success"] is True
