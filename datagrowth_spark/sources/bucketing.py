"""Bucketed-table layout for co-located (shuffle-free) joins.

The engine's hottest recurring join is upsert/enrichment by document
identity (C2/P8) and orders↔lineitem-shaped fact joins. At 100 TB the
shuffle on every run dominates; pre-bucketing both sides on the join
key trades one layout write for every future join's exchange:
sort-merge join reads bucket i of A against bucket i of B directly
(``spark.sql.sources.bucketing.enabled``), no Exchange in the plan.

Rules of thumb encoded here:
* bucket count is fixed at write time — size it so one bucket of the
  BIGGER table fits an executor core's working set (default 32 matches
  the local harness; at 100 TB think thousands);
* both join sides must agree on keys AND bucket count, or Spark
  shuffles the disagreeing side anyway;
* ``sortBy`` the same keys so the merge phase skips its sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    keys: str | list[str],
    buckets: int = 32,
    mode: str = "overwrite",
    sort: bool = True,
) -> None:
    """Write ``df`` as a parquet table bucketed (and sorted) by keys."""
    keys = [keys] if isinstance(keys, str) else list(keys)
    writer = df.write.mode(mode).format("parquet").bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str,
    on: str | list[str], how: str = "inner",
) -> DataFrame:
    """Join two same-bucketed tables; with matching layouts the plan has
    zero shuffle exchanges (verify with scripts/explain_audit.py)."""
    keys = [on] if isinstance(on, str) else list(on)
    return spark.table(left_table).join(spark.table(right_table), keys, how)
