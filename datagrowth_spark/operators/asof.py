"""As-of (nearest-timestamp) join — a union + running-fill window plan.

Spark has no built-in ASOF JOIN (DuckDB/Pandas/kdb do). The classic
scale-correct plan: union both sides tagged by origin, single shuffle on
the join key, one in-partition sort by (ts, origin), then a running
``last(right_payload, ignorenulls)`` window fills each left row with the
most recent right row at-or-before it. Cost = one exchange per side +
one sort — the same as a regular sort-merge join, with no range
explosion and no per-key driver work. Skewed keys behave like any other
windowed time-series op (AQE skew handling applies; a single pathological
key can additionally be range-salted upstream).

Semantics match ``pandas.merge_asof`` / DuckDB ``ASOF JOIN``:
``direction='backward'`` (default) picks the latest right row with
``right_ts <= left_ts``; ``'forward'`` the earliest with
``right_ts >= left_ts``; ``allow_exact_matches=False`` makes the
comparison strict. Right rows must be unique per (key, right_ts) —
pre-aggregate ties upstream, as any deterministic as-of contract
requires.

Beyond-reference operator (the reference has no join surface at all,
SURVEY §2.5); oracle-checked against DuckDB's native ASOF JOIN via the
`events_asof_orders` query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StructType
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    left_ts: str,
    right_ts: str,
    direction: str = "backward",
    allow_exact_matches: bool = True,
    suffix: str = "_r",
) -> DataFrame:
    """Left as-of join: every left row, plus the matched right row's
    columns (null when no right row qualifies).

    Right columns that collide with left column names get ``suffix``.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)

    left_payload = [c for c in left.columns if c not in keys]
    right_payload = [c for c in right.columns if c not in keys]
    l_struct_t = StructType([left.schema[c] for c in left_payload])
    r_struct_t = StructType([right.schema[c] for c in right_payload])

    l2 = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_is_left"),
        F.struct(*left_payload).alias("_l"),
        F.lit(None).cast(r_struct_t).alias("_r"),
    )
    r2 = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_is_left"),
        F.lit(None).cast(l_struct_t).alias("_l"),
        F.struct(*right_payload).alias("_r"),
    )
    u = l2.unionByName(r2)

    # Traversal order: the window walks rows so that every qualifying
    # right row precedes the left rows it may match. At equal timestamps
    # the origin tag breaks the tie — right-first for inclusive
    # matching, left-first for strict.
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    tie = F.col("_is_left").asc() if allow_exact_matches else F.col("_is_left").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, tie)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = u.withColumn("_match", F.last("_r", ignorenulls=True).over(w))

    out_cols = [F.col(k) for k in keys]
    out_cols += [F.col("_l")[c].alias(c) for c in left_payload]
    taken = set(keys) | set(left_payload)
    for c in right_payload:
        name = c if c not in taken else f"{c}{suffix}"
        out_cols.append(F.col("_match")[c].alias(name))
    return filled.where(F.col("_is_left") == 1).select(*out_cols)
