#!/usr/bin/env python
"""Local mimic of the driver's correctness gate.

Runs every queries() entry on Spark and its oracle_sql() on DuckDB over
the same parquet tables, then compares row count, sorted column names,
and order-insensitive values. Usage:

    python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings")


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for col in df.columns:
        if str(df[col].dtype).startswith("datetime64"):
            df[col] = pd.to_datetime(df[col]).dt.tz_localize(None)
        elif df[col].dtype == object:
            df[col] = df[col].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def compare(name: str, spark_df: pd.DataFrame, duck_df: pd.DataFrame) -> list[str]:
    problems = []
    if sorted(spark_df.columns) != sorted(duck_df.columns):
        problems.append(f"columns differ: spark={sorted(spark_df.columns)} duck={sorted(duck_df.columns)}")
        return problems
    if len(spark_df) != len(duck_df):
        problems.append(f"row count: spark={len(spark_df)} duck={len(duck_df)}")
    s = normalize(spark_df.copy())
    d = normalize(duck_df.copy())
    if len(s) == len(d):
        for col in s.columns:
            sv, dv = s[col], d[col]
            if pd.api.types.is_float_dtype(sv) or pd.api.types.is_float_dtype(dv):
                sv = pd.to_numeric(sv, errors="coerce").astype(float)
                dv = pd.to_numeric(dv, errors="coerce").astype(float)
                both_nan = sv.isna() & dv.isna()
                diff = (sv - dv).abs()
                bad = ~both_nan & ~(diff.fillna(math.inf) == 0.0)
                if bad.any():
                    problems.append(
                        f"col {col}: {int(bad.sum())} value diffs, max abs diff "
                        f"{float(diff[bad & diff.notna()].max() if (bad & diff.notna()).any() else math.nan)}"
                    )
            else:
                neq = ~(sv.eq(dv) | (sv.isna() & dv.isna()))
                if neq.any():
                    i = int(neq.idxmax())
                    problems.append(f"col {col}: {int(neq.sum())} value diffs, e.g. row {i}: {sv[i]!r} != {dv[i]!r}")
    return problems


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]) else "/root/testdata/sf0.01"
    only = set(sys.argv[2:]) if len(sys.argv) > 2 else (
        set(sys.argv[1:]) if len(sys.argv) > 1 and not os.path.isdir(sys.argv[1]) else None
    )

    from datagrowth_spark.queries import oracle_sql, queries

    if os.environ.get("ORACLE_VANILLA"):
        # Mimic the driver's harness exactly: a bare SparkSession with
        # NO engine conf — catches any hidden dependence on the
        # engine's own session factory (the round-2/3 seed-merge trap).
        from pyspark.sql import SparkSession

        spark = (SparkSession.builder.appName("oracle-check-vanilla")
                 .master("local[8]").getOrCreate())
    else:
        from datagrowth_spark.core.session import get_spark

        spark = get_spark(app_name="oracle-check", master="local[8]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, sqls = queries(), oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            spark_pdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {type(exc).__name__}: {str(exc).splitlines()[0][:300]}")
            failures += 1
            continue
        t1 = time.time()
        if name not in sqls:
            print(f"WEAK {name}: no oracle, rows={len(spark_pdf)} ({t1-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.sql(sqls[name]).df()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {type(exc).__name__}: {str(exc).splitlines()[0][:300]}")
            failures += 1
            continue
        problems = compare(name, spark_pdf, duck_pdf)
        if problems:
            failures += 1
            print(f"FAIL {name}: rows={len(spark_pdf)} ({t1-t0:.1f}s)")
            for p in problems:
                print(f"     - {p}")
        else:
            print(f"OK   {name}: rows={len(spark_pdf)} ({t1-t0:.1f}s)")
    # Cache-hygiene gate (r7 verdict item 6): after releasing the
    # query functions' registered caches, the SQL CacheManager must be
    # back at baseline (empty) — a query that persists outside the
    # _persist registry fails the sweep here.
    from datagrowth_spark.queries import release_caches

    released = release_caches()
    cache_mgr = spark._jsparkSession.sharedState().cacheManager()
    if not cache_mgr.isEmpty():
        failures += 1
        print(f"FAIL cache-hygiene: CacheManager not empty after "
              f"release_caches() freed {released} frames")
    else:
        print(f"OK   cache-hygiene: {released} registered caches released, "
              f"CacheManager empty")
    spark.stop()
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
