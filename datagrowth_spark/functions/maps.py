"""Duplicate-safe map merge helpers.

The reference merges document payload dicts with plain ``dict.update``
(``datagrowth/datatypes/documents/db/document.py:73-100``) — incoming
keys silently overwrite. The naive Spark twin, ``F.map_concat``, only
matches that under ``spark.sql.mapKeyDedupPolicy=LAST_WIN``; on a
vanilla session (default ``EXCEPTION``) any overlapping key raises
``DUPLICATED_MAP_KEY``. The same applies to ``F.map_from_entries`` —
*every* map constructor in Spark routes through ``ArrayBasedMapBuilder``
and honors the session conf.

These helpers make merge semantics explicit in the expression itself
(filter the losing side's entries *before* constructing the map), so the
result is identical under either conf value. Everything stays inside
whole-stage codegen — ``map_entries``/``filter``/``array_contains``/
``map_from_entries`` are all Catalyst expressions; for payload-sized
maps (tens of keys) the O(|base|·|override|) membership scan is
negligible next to the shuffle/scan cost of any real pipeline stage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def merge_maps_last_win(base: Column | str, override: Column | str) -> Column:
    """``base`` ⊎ ``override`` where overlapping keys take ``override``'s
    value — ``dict.update`` / LAST_WIN semantics, independent of
    ``spark.sql.mapKeyDedupPolicy``. NULL-safe: a NULL side yields the
    other side. Works for any map value type (keys compared as-is)."""
    base, override = _col(base), _col(override)
    kept = F.filter(
        F.map_entries(base),
        lambda e: ~F.array_contains(F.map_keys(override), e["key"]),
    )
    merged = F.map_from_entries(F.concat(kept, F.map_entries(override)))
    return (
        F.when(base.isNull(), override)
        .when(override.isNull(), base)
        .otherwise(merged)
    )


def merge_maps_first_win(base: Column | str, override: Column | str) -> Column:
    """``base`` ⊎ ``override`` where overlapping keys keep ``base``'s
    value — ``dict.setdefault`` semantics (mirror of
    :func:`merge_maps_last_win`)."""
    return merge_maps_last_win(override, base)


def map_set(base: Column | str, key: str, value: Column) -> Column:
    """Set/overwrite one literal key in a map column, duplicate-safe.

    ``base[key] = value`` — the single-key special case of
    :func:`merge_maps_last_win`, with the membership scan reduced to one
    key comparison. NULL base yields a one-entry map."""
    base = _col(base)
    kept = F.filter(F.map_entries(base), lambda e: e["key"] != F.lit(key))
    merged = F.map_from_entries(
        F.concat(kept, F.array(F.struct(F.lit(key).alias("key"), value.alias("value"))))
    )
    return F.when(base.isNull(), F.create_map(F.lit(key), value)).otherwise(merged)
