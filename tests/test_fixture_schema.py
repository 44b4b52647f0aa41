"""Fixture schema-drift guard.

Round 2 failed on silent drift: the driver regenerated ``events.parquet``
with ``ts`` as TIMESTAMP(MICROS) where a previous generation was
TIMESTAMP(NANOS), and a reader that assumed one physical type broke 7
oracle queries, 3 streaming tests, and the whole bench. These tests fail
LOUDLY, with the offending column named, whenever the fixtures change in
a way the engine's readers do not handle.
"""

import os

import pytest
from pyspark.sql import functions as F

from datagrowth_spark.queries import _events, _t

SF_DIR = "/root/testdata/sf0.001"

# Columns the engine relies on, with the set of Spark dtypes the readers
# are known to handle. A new fixture dtype outside the set = loud failure
# pointing at the reader that must learn it.
EXPECTED = {
    "events": {
        "event_id": {"bigint"},
        # handled by _events' dtype branch (queries.py) and
        # read_events_stream (streaming/events.py)
        "ts": {"bigint", "timestamp", "timestamp_ntz"},
        "user_id": {"bigint"},
        "event_type": {"string"},
        "value": {"double"},
        "props": {"string"},
    },
    "lineitem": {
        "l_orderkey": {"bigint"},
        "l_quantity": {"double"},
        "l_extendedprice": {"double"},
        "l_discount": {"double"},
        "l_shipdate": {"timestamp", "timestamp_ntz", "date"},
        "l_returnflag": {"string"},
    },
    "orders": {
        "o_orderkey": {"bigint"},
        "o_custkey": {"bigint"},
        "o_totalprice": {"double"},
        "o_orderdate": {"timestamp", "timestamp_ntz", "date"},
        "o_orderpriority": {"string"},
    },
    "customer": {
        "c_custkey": {"bigint"},
        "c_nationkey": {"int", "bigint"},
        "c_acctbal": {"double"},
        "c_mktsegment": {"string"},
    },
    "documents": {
        "doc_id": {"bigint"},
        "text": {"string"},
        "lang": {"string"},
        "source": {"string"},
        "n_chars": {"bigint"},
    },
    "embeddings": {
        "vec_id": {"bigint"},
        "embedding": {"array<float>", "array<double>"},
        "label": {"int", "bigint"},
    },
}


@pytest.mark.parametrize("table", sorted(EXPECTED))
def test_fixture_dtypes_are_ones_the_readers_handle(spark, table):
    df = _t(spark, SF_DIR, table)
    actual = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    for col, allowed in EXPECTED[table].items():
        assert col in actual, (
            f"fixture drift: {table}.parquet lost column {col!r} "
            f"(has {sorted(actual)})"
        )
        assert actual[col] in allowed, (
            f"fixture drift: {table}.{col} now reads as {actual[col]!r}; "
            f"the engine's readers only handle {sorted(allowed)}. "
            f"Update the reader (and this test) for the new dtype."
        )


def test_events_reader_normalizes_ts_on_current_fixture(spark):
    """The dtype-branch reader must yield a usable timestamp whatever the
    fixture's physical type is this round."""
    ev = _events(spark, SF_DIR)
    assert ev.schema["ts"].dataType.simpleString() == "timestamp"
    row = ev.select(
        F.min("ts").alias("lo"), F.max("ts").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    assert row.n > 0 and row.lo is not None and row.lo <= row.hi
    # sanity: values are calendar-plausible, not 1970-epoch junk from a
    # mis-scaled integer division
    assert 1990 <= row.lo.year <= 2100, f"ts decoded implausibly: {row.lo}"


def test_all_tables_readable(spark):
    for table in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "events", "documents", "embeddings"):
        path = os.path.join(SF_DIR, f"{table}.parquet")
        assert os.path.exists(path), f"fixture missing: {path}"
        assert _t(spark, SF_DIR, table).limit(1).count() >= 0


class TestCacheHygiene:
    """r7 verdict item 6: query functions register their persisted
    intermediates; release_caches() returns the CacheManager to empty
    so a long-lived library session doesn't accumulate cached frames."""

    def test_release_caches_empties_cache_manager(self, spark):
        from datagrowth_spark.queries import q_customer_rfm, release_caches

        release_caches()  # isolate from other tests' leftovers
        q_customer_rfm(spark, "/root/testdata/sf0.001").collect()
        mgr = spark._jsparkSession.sharedState().cacheManager()
        assert not mgr.isEmpty()  # the RFM query persists its per-cust agg
        assert release_caches() >= 1
        assert mgr.isEmpty()
        # Released plans still execute (recompute instead of erroring).
        assert release_caches() == 0
