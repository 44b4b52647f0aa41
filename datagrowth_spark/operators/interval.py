"""Interval (range) join — point-in-interval matching without a
broadcast-nested-loop trap.

Spark compiles a bare ``p BETWEEN lo AND hi`` join into
BroadcastNestedLoopJoin (fine only when one side is tiny) or, with no
equi-key at all, a cartesian product. The scale-correct plan is grid
bucketing: explode each interval into the fixed-width buckets it
covers, bucket each point once, and equi-join on (keys…, bucket) before
re-checking the exact range predicate. Both sides shuffle ONCE on the
bucket key; the explode factor is ceil(interval_len / bucket_width) so
the operator stays linear for bounded-length intervals (pick
``bucket_width`` near the typical interval length). A point owns
exactly one bucket, so no post-join dedup is needed.

This is the standard range-join optimization Databricks exposes as a
hint and Flink/kdb implement natively; DuckDB plans the inequality join
directly (IEJoin), which makes it the oracle for the
`events_value_bands` query.

Beyond-reference operator (the reference has no join surface, SURVEY
§2.5).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    on: list[str] | None = None,
    bucket_width: float | None = None,
    closed: str = "both",
) -> DataFrame:
    """Inner-join each point row to every interval row containing it.

    ``on`` adds equi-keys (applied before the range check). ``closed``
    is 'both' (lo <= p <= hi), 'left' (lo <= p < hi) or 'right'
    (lo < p <= hi). With ``bucket_width`` the grid-bucket plan runs
    (one shuffle per side); without it the interval side is broadcast —
    only for dimension-table-sized interval sets.

    Output carries all point columns plus the interval's columns
    (collisions suffixed ``_i``).
    """
    keys = on or []

    def _range_pred(p: Column) -> Column:
        lo, hi = F.col(lo_col), F.col(hi_col)
        if closed == "both":
            return (p >= lo) & (p <= hi)
        if closed == "left":
            return (p >= lo) & (p < hi)
        if closed == "right":
            return (p > lo) & (p <= hi)
        raise ValueError(f"closed must be both|left|right, got {closed!r}")

    taken = set(points.columns)
    renames = {c: (f"{c}_i" if c in taken else c)
               for c in intervals.columns if c not in keys}
    ivals = intervals.select(
        *keys, *[F.col(c).alias(n) for c, n in renames.items()]
    )
    lo_col = renames.get(lo_col, lo_col)
    hi_col = renames.get(hi_col, hi_col)

    if bucket_width is None:
        cond = _range_pred(F.col(point_col))
        for k in keys:
            cond = (points[k] == ivals[k]) & cond
        joined = points.join(F.broadcast(ivals), cond)
        # Drop the duplicate key columns from the interval side.
        return joined.drop(*[ivals[k] for k in keys])

    w = float(bucket_width)
    exploded = ivals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    bucketed = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / w).cast("long")
    )
    joined = bucketed.join(exploded, [*keys, "__bucket"]).where(
        _range_pred(F.col(point_col))
    )
    return joined.drop("__bucket")
