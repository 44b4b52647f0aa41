"""Interval (range) join tests — grid-bucket plan vs broadcast plan,
boundary semantics, overlap multiplicity."""

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators.interval import interval_join


def _pts(spark, vals):
    return spark.createDataFrame([(i, float(v)) for i, v in enumerate(vals)],
                                 "pid long, x double")


def _ivals(spark, rows):
    return spark.createDataFrame([(n, float(a), float(b)) for n, a, b in rows],
                                 "name string, lo double, hi double")


class TestIntervalJoin:
    def test_bucketed_equals_broadcast(self, spark):
        pts = _pts(spark, [0.5, 3.0, 7.4, 12.0, 25.0])
        ivs = _ivals(spark, [("a", 0, 5), ("b", 3, 10), ("c", 20, 30)])
        want = {(r["pid"], r["name"]) for r in
                interval_join(pts, ivs, "x", "lo", "hi").collect()}
        got = {(r["pid"], r["name"]) for r in
               interval_join(pts, ivs, "x", "lo", "hi", bucket_width=4.0).collect()}
        assert got == want
        assert (1, "a") in got and (1, "b") in got  # overlap → two matches

    def test_closed_semantics(self, spark):
        pts = _pts(spark, [5.0])
        ivs = _ivals(spark, [("lohit", 5, 10), ("hihit", 0, 5)])
        both = {r["name"] for r in
                interval_join(pts, ivs, "x", "lo", "hi", bucket_width=3.0).collect()}
        left = {r["name"] for r in
                interval_join(pts, ivs, "x", "lo", "hi", bucket_width=3.0,
                              closed="left").collect()}
        right = {r["name"] for r in
                 interval_join(pts, ivs, "x", "lo", "hi", bucket_width=3.0,
                               closed="right").collect()}
        assert both == {"lohit", "hihit"}
        assert left == {"lohit"}
        assert right == {"hihit"}

    def test_equi_keys_scope_the_match(self, spark):
        pts = spark.createDataFrame([(1, "k1", 5.0), (2, "k2", 5.0)],
                                    "pid long, k string, x double")
        ivs = spark.createDataFrame([("k1", 0.0, 10.0)], "k string, lo double, hi double")
        got = interval_join(pts, ivs, "x", "lo", "hi", on=["k"], bucket_width=5.0).collect()
        assert [r["pid"] for r in got] == [1]

    def test_no_duplicate_rows_from_bucketing(self, spark):
        # A long interval spans many buckets; each contained point must
        # still match exactly once.
        pts = _pts(spark, [1.0, 9.0, 19.0])
        ivs = _ivals(spark, [("wide", 0, 20)])
        got = interval_join(pts, ivs, "x", "lo", "hi", bucket_width=2.0)
        assert got.count() == 3
        assert got.select("pid").distinct().count() == 3

    def test_point_outside_all_intervals_dropped(self, spark):
        pts = _pts(spark, [100.0])
        ivs = _ivals(spark, [("a", 0, 5)])
        assert interval_join(pts, ivs, "x", "lo", "hi", bucket_width=2.0).count() == 0

    def test_collision_suffix(self, spark):
        pts = spark.createDataFrame([(1, 2.0, "p")], "pid long, x double, tag string")
        ivs = spark.createDataFrame([(0.0, 5.0, "i")], "lo double, hi double, tag string")
        out = interval_join(pts, ivs, "x", "lo", "hi", bucket_width=2.0)
        row = out.collect()[0]
        assert row["tag"] == "p" and row["tag_i"] == "i"
