"""Document row model and property-column helpers.

A Document (reference:
/root/reference/datagrowth/datatypes/documents/db/document.py:15-23) is
one schema-free JSON record plus identity metadata. Spark mapping: one
row with

* ``identity``   STRING — business key (from the collection identifier path)
* ``reference``  STRING — annotation key (from the referee path)
* ``properties`` MAP<STRING,STRING> — payload; each value is compact JSON,
  so arbitrary nested data survives while shallow dict-merge (the
  reference's update semantics, document.py:73-100) stays JVM-side via
  the duplicate-safe merges in :mod:`datagrowth_spark.functions.maps`
  (correct under any ``spark.sql.mapKeyDedupPolicy``)
* ``derivatives`` MAP<STRING, MAP<STRING,STRING>> — enrichment output per
  growth phase (values JSON-encoded the same way)
* ``task_results`` MAP<STRING,STRING> — per-task result JSON
  (``{"success": bool, ...}``)
* ``pending_at`` / ``finished_at`` TIMESTAMP — scheduling state

Why a map and not a struct: the reference merges arbitrary keys at
runtime; a struct would force a schema migration per new key. Pipelines
that *declare* an objective should convert to a typed struct frame
(:meth:`Collection.to_typed`) — that is the 100 TB scale path because
parquet then prunes and pushes down on real columns.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

PROPERTIES_TYPE = T.MapType(T.StringType(), T.StringType())

DOCUMENT_SCHEMA = T.StructType([
    T.StructField("identity", T.StringType(), True),
    T.StructField("reference", T.StringType(), True),
    T.StructField("properties", PROPERTIES_TYPE, True),
    T.StructField("derivatives", T.MapType(T.StringType(), PROPERTIES_TYPE), True),
    T.StructField("task_results", T.MapType(T.StringType(), T.StringType()), True),
    T.StructField("pending_at", T.TimestampType(), True),
    T.StructField("finished_at", T.TimestampType(), True),
])


def encode_properties(data: dict[str, Any]) -> dict[str, str]:
    """Encode a payload dict to the MAP<STRING,STRING> representation."""
    return {k: json.dumps(v, sort_keys=True, separators=(",", ":")) for k, v in data.items()}


def decode_properties(encoded: dict[str, str] | None) -> dict[str, Any]:
    if not encoded:
        return {}
    return {k: json.loads(v) for k, v in encoded.items()}


def prop_col(properties: Column | str, path: str) -> Column:
    """Column access into the encoded properties map via a ``$.a.b`` path.

    The first path segment keys the map; the remainder is resolved with
    ``get_json_object`` on the JSON-encoded value (still JVM-side).
    Scalars come back unquoted (get_json_object '$' semantics).
    """
    props = F.col(properties) if isinstance(properties, str) else properties
    assert path.startswith("$."), f"prop path must start with $. — got {path!r}"
    first, _, rest = path[2:].partition(".")
    value = props[first]
    if not rest:
        return F.get_json_object(value, "$")
    # integer segments are array indexes in get_json_object syntax: $.b[1]
    jpath = "$" + "".join(
        f"[{p}]" if p.lstrip("-").isdigit() else f".{p}" for p in rest.split(".")
    )
    return F.get_json_object(value, jpath)


def encode_value_col(col: Column) -> Column:
    """JVM-side JSON encoding of one scalar column (the Column twin of
    ``encode_properties`` for a single value).

    ``to_json`` only accepts complex types, so the scalar is wrapped in
    a one-element array and the brackets stripped — escaping comes out
    identical to ``json.dumps`` (nulls become ``null``).
    """
    wrapped = F.to_json(F.array(col))
    return wrapped.substr(F.lit(2), F.length(wrapped) - F.lit(2))


def properties_from_columns(*cols: str) -> Column:
    """Lift named table columns into an encoded properties map.

    Turns any relational frame into document payloads entirely JVM-side
    (no Python round-trip): ``df.select(properties_from_columns("a",
    "b").alias("properties"))`` conforms to ``DOCUMENT_SCHEMA`` via
    ``Collection._conform``.
    """
    pairs: list[Column] = []
    for name in cols:
        pairs.append(F.lit(name))
        pairs.append(encode_value_col(F.col(name)))
    return F.create_map(*pairs)


def document_content(row: dict[str, Any]) -> dict[str, Any]:
    """Driver-side content projection for one document row dict.

    Merge of properties + one-level-flattened derivatives (first writer
    wins on key clash), ``_``-prefixed keys hidden — mirrors
    ``Document.content`` (document.py:102-126).
    """
    content = {k: v for k, v in decode_properties(row.get("properties")).items()
               if not k.startswith("_")}
    for phase, contribution in (row.get("derivatives") or {}).items():
        for key, value in decode_properties(contribution).items():
            if key.startswith("_"):
                continue
            content.setdefault(key, value)
    if row.get("identity") is not None:
        content["_id"] = row["identity"]
    return content


def content_col(properties: Column | str = "properties",
                derivatives: Column | str = "derivatives") -> Column:
    """DataFrame-side content merge: properties win over derivatives.

    Produces MAP<STRING,STRING> (values still JSON-encoded). Derivative
    phase maps are folded onto properties with first-writer-wins
    semantics — properties take precedence, then earlier phases — the
    exact Column twin of :func:`document_content`'s ``setdefault`` loop.
    Duplicate-safe on any session (no ``mapKeyDedupPolicy`` dependence):
    each fold step filters clashing keys before building the map.
    """
    from datagrowth_spark.functions.maps import merge_maps_first_win

    props = F.col(properties) if isinstance(properties, str) else properties
    derivs = F.col(derivatives) if isinstance(derivatives, str) else derivatives
    merged = F.aggregate(
        F.map_values(derivs), props,
        lambda acc, phase_map: merge_maps_first_win(acc, phase_map),
    )
    return F.map_filter(
        F.when(derivs.isNull(), props).otherwise(merged),
        lambda k, _: ~F.startswith(k, F.lit("_")),
    )


def task_result_success(task_results: Column | str, task: str) -> Column:
    """Boolean Column: did task `task` succeed for this document row?

    NULL when the task never ran — callers distinguish "failed" from
    "not run" (growth filter semantics, resources/growth.py:40-47).
    """
    results = F.col(task_results) if isinstance(task_results, str) else task_results
    return F.get_json_object(results[task], "$.success").cast("boolean")
