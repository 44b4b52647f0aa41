"""As-of join operator tests — semantics pinned to pandas.merge_asof /
DuckDB ASOF JOIN (backward/forward, inclusive/strict, left outer)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.operators.asof import asof_join


def _frames(spark):
    left = spark.createDataFrame(
        [(1, datetime(2024, 1, 10), "e1"),
         (1, datetime(2024, 1, 20), "e2"),
         (2, datetime(2024, 1, 5), "e3")],
        "k long, lts timestamp, ev string")
    right = spark.createDataFrame(
        [(1, datetime(2024, 1, 10), 100.0),
         (1, datetime(2024, 1, 15), 150.0),
         (2, datetime(2024, 1, 8), 200.0)],
        "k long, rts timestamp, px double")
    return left, right


class TestAsofJoin:
    def test_backward_inclusive(self, spark):
        left, right = _frames(spark)
        got = {r["ev"]: r["px"] for r in
               asof_join(left, right, "k", "lts", "rts").collect()}
        # e1 matches the equal-ts right row (inclusive); e2 the latest
        # prior; e3 has no prior right row → null.
        assert got == {"e1": 100.0, "e2": 150.0, "e3": None}

    def test_backward_strict(self, spark):
        left, right = _frames(spark)
        got = {r["ev"]: r["px"] for r in
               asof_join(left, right, "k", "lts", "rts",
                         allow_exact_matches=False).collect()}
        assert got == {"e1": None, "e2": 150.0, "e3": None}

    def test_forward(self, spark):
        left, right = _frames(spark)
        got = {r["ev"]: r["px"] for r in
               asof_join(left, right, "k", "lts", "rts",
                         direction="forward").collect()}
        # e1 → equal-ts row; e2 → nothing after Jan 20; e3 → Jan 8 row.
        assert got == {"e1": 100.0, "e2": None, "e3": 200.0}

    def test_right_ts_column_carried(self, spark):
        left, right = _frames(spark)
        out = asof_join(left, right, "k", "lts", "rts")
        row = {r["ev"]: r["rts"] for r in out.collect()}
        assert row["e2"] == datetime(2024, 1, 15)

    def test_name_collision_gets_suffix(self, spark):
        left = spark.createDataFrame([(1, datetime(2024, 1, 2), 5.0)],
                                     "k long, ts timestamp, v double")
        right = spark.createDataFrame([(1, datetime(2024, 1, 1), 9.0)],
                                      "k long, rts timestamp, v double")
        out = asof_join(left, right, "k", "ts", "rts")
        assert "v" in out.columns and "v_r" in out.columns
        row = out.collect()[0]
        assert row["v"] == 5.0 and row["v_r"] == 9.0

    def test_every_left_row_survives(self, spark):
        left, right = _frames(spark)
        assert asof_join(left, right, "k", "lts", "rts").count() == left.count()

    def test_matches_pandas_merge_asof_on_random_data(self, spark):
        import pandas as pd

        lpdf = pd.DataFrame({
            "k": [i % 3 for i in range(60)],
            "lts": pd.to_datetime([1_700_000_000 + 977 * i for i in range(60)], unit="s"),
        })
        rpdf = pd.DataFrame({
            "k": [i % 3 for i in range(40)],
            "rts": pd.to_datetime([1_700_000_000 + 1_371 * i for i in range(40)], unit="s"),
            "val": [float(i) for i in range(40)],
        })
        expected = pd.merge_asof(
            lpdf.sort_values("lts"), rpdf.sort_values("rts"),
            left_on="lts", right_on="rts", by="k",
        ).sort_values(["k", "lts"]).reset_index(drop=True)
        got = (
            asof_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
                      "k", "lts", "rts")
            .orderBy("k", "lts").toPandas().reset_index(drop=True)
        )
        assert list(got["val"].fillna(-1)) == list(expected["val"].fillna(-1))
