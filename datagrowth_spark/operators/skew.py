"""Skew-mitigation utilities: salted joins and two-phase aggregation.

AQE's skew-join splitting (on in every session, see core/session.py)
handles most runtime skew; these are the explicit forms for the cases
AQE can't fix — a hot key so large that even split partitions overwhelm
one executor's build side, or a streaming/stateful stage where AQE
doesn't apply. Reference analogue: the engine's upsert/growth joins key
on document identity, and a harvested corpus routinely has pathological
keys (one journal id owning half the feed — exactly the back_fill
shape, seeding.py:74-77).

Both helpers preserve exact results: salting only re-routes rows; the
final combine is on the true key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str | list[str],
    how: str = "inner",
    salt: int = 16,
    salt_col: str = "__salt",
) -> DataFrame:
    """Equi-join with the left (large, skewed) side salted.

    Left rows get a uniform salt in [0, salt); the right side is
    replicated ``salt`` times via an exploded sequence (a narrow,
    JVM-side fan-out — fine when right is the smaller side, which is
    when you'd salt at all). The shuffle key becomes (key..., salt), so
    a hot key spreads over ``salt`` reducers instead of one.
    Result is exactly ``left.join(right, on, how)`` for inner/left joins.
    """
    keys = [on] if isinstance(on, str) else list(on)
    assert how in ("inner", "left", "left_outer"), (
        "salted_join re-routes rows only; semi/anti/right joins would "
        "change semantics under replication"
    )
    salted_left = left.withColumn(
        salt_col, (F.rand(seed=42) * salt).cast("int")
    )
    salted_right = right.withColumn(
        salt_col, F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    )
    return salted_left.join(salted_right, keys + [salt_col], how).drop(salt_col)


def salted_aggregate(
    df: DataFrame,
    keys: str | list[str],
    aggs: dict[str, tuple[str, Column | str]],
    salt: int = 16,
    salt_col: str = "__salt",
) -> DataFrame:
    """Two-phase aggregation for skewed group keys.

    Phase 1 groups by (keys..., salt) — the hot key's rows partial-
    aggregate on ``salt`` different reducers; phase 2 combines partials
    by the true key. ``aggs`` maps output name → (fn, column) where fn
    is one of the re-combinable family ``count|sum|min|max`` (count
    partials re-combine with sum). Spark's map-side partial aggregation
    does this per-partition already; the salt phase adds a re-shuffle
    level for when a single reducer's combine of one key is itself the
    bottleneck (e.g. huge rollups over one hot tenant).
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    first = {"count": F.count, "sum": F.sum, "min": F.min, "max": F.max}
    second = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}
    for name, (fn, _col) in aggs.items():
        assert fn in first, f"{name}: fn must be one of {sorted(first)} — got {fn!r}"
    partial = (
        df.withColumn(salt_col, (F.rand(seed=42) * salt).cast("int"))
        .groupBy(*keys, salt_col)
        .agg(*[first[fn](col).alias(name) for name, (fn, col) in aggs.items()])
    )
    return partial.groupBy(*keys).agg(
        *[second[fn](F.col(name)).alias(name) for name, (fn, _col) in aggs.items()]
    )
