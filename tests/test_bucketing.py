"""Bucketed-table co-located joins: the pay-the-shuffle-once layout.

Asserts the PHYSICAL PLAN property that justifies bucketing at 100 TB:
a join of two tables bucketed on the same key with the same bucket
count contains NO Exchange on either side, while the same join over
plain parquet shuffles both sides.
"""

import pytest

from pyspark.sql import functions as F

from datagrowth_spark.sources.files import write_bucketed_table


@pytest.fixture()
def bucketed_pair(spark):
    a = spark.range(10_000).select(
        F.col("id").alias("k"), (F.col("id") % 7).alias("va"))
    b = spark.range(5_000).select(
        F.col("id").alias("k"), (F.col("id") % 3).alias("vb"))
    write_bucketed_table(a, "bt_a", ["k"], num_buckets=8, sort_cols=["k"])
    write_bucketed_table(b, "bt_b", ["k"], num_buckets=8, sort_cols=["k"])
    yield spark.table("bt_a"), spark.table("bt_b")
    spark.sql("DROP TABLE IF EXISTS bt_a")
    spark.sql("DROP TABLE IF EXISTS bt_b")


def _exec_plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    a, b = bucketed_pair
    # disable auto-broadcast so the join strategy is the bucket-aware
    # sort-merge, not a broadcast that would hide the exchange question
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        joined = a.join(b, "k")
        plan = _exec_plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan          # co-located: zero shuffles
        assert joined.count() == 5_000

        # control: the same frames as plain (non-bucketed) scans DO shuffle
        import os
        import tempfile
        d = tempfile.mkdtemp(prefix="bt-plain-")
        a.write.mode("overwrite").parquet(os.path.join(d, "a"))
        b.write.mode("overwrite").parquet(os.path.join(d, "b"))
        pa = spark.read.parquet(os.path.join(d, "a"))
        pb = spark.read.parquet(os.path.join(d, "b"))
        assert "Exchange" in _exec_plan(pa.join(pb, "k"))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


def test_bucketed_aggregation_skips_exchange(spark, bucketed_pair):
    a, _ = bucketed_pair
    old = spark.conf.get("spark.sql.adaptive.enabled")
    try:
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        agg = a.groupBy("k").agg(F.sum("va").alias("s"))
        assert "Exchange" not in _exec_plan(agg)   # grouping key == bucket key
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", old)
