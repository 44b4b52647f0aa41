"""Path language → Spark Column compiler, plus driver-side templating.

Two consumers of the ``$.a.b.0`` path language (see
:mod:`datagrowth_spark.core.reach`):

* :func:`path_col` / :func:`json_path_col` — compile one path into a
  Column over a struct/map column or a JSON string column. Struct access
  stays fully inside Catalyst (prunable, pushable); JSON strings go
  through ``get_json_object``.
* :func:`compile_output_spec` — compile the reference's output templating
  spec (args may be ``$``-paths, nested lists/dicts, literals; ``\\``
  escapes a literal ``$``) into a single Column, mirroring
  ``Document.output_from_content``
  (/root/reference/datagrowth/datatypes/documents/db/document.py:131-169).
* :func:`output_from_content` — the same spec evaluated driver-side over a
  plain dict (used for request templating in growth/seeding where the
  spec must run on collected rows).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column
from pyspark.sql import functions as F

from datagrowth_spark.core.reach import reach


def _split_path(path: str) -> list[str]:
    assert path.startswith("$"), f"path must start with $ — got {path!r}"
    body = path[2:] if path.startswith("$.") else path[1:]
    return [p for p in body.split(".") if p != ""]


def path_col(column: Column | str, path: str) -> Column:
    """Resolve a ``$.a.b.0`` path against a struct/array/map Column.

    Integer segments index arrays (0-based, via ``try_element_at`` which
    is 1-based, hence the +1); other segments access struct fields or map
    keys. Missing segments yield NULL (mirrors reach's default).
    """
    current = F.col(column) if isinstance(column, str) else column
    for part in _split_path(path):
        if part.lstrip("-").isdigit():
            idx = int(part)
            current = F.try_element_at(current, F.lit(idx + 1 if idx >= 0 else idx))
        else:
            current = current[part]
    return current


def json_path_col(column: Column | str, path: str) -> Column:
    """Resolve a path against a JSON *string* column via get_json_object."""
    current = F.col(column) if isinstance(column, str) else column
    parts = _split_path(path)
    jpath = "$" + "".join(f"[{p}]" if p.lstrip("-").isdigit() else f".{p}" for p in parts)
    return F.get_json_object(current, jpath)


def compile_output_spec(spec: Any, properties: Column | str = "properties",
                        replacement_character: str = "$") -> Column:
    """Compile an output-templating spec into one Column.

    Spec grammar (same as the reference's ``output_from_content``):
      * ``"$path"``-style strings (with the configured replacement char)
        → value lookup inside ``properties``
      * ``"\\$literal"`` → the literal string without the escape
      * list → array of compiled members
      * dict → struct of compiled values (keys become field names)
      * anything else → literal
    """
    props = F.col(properties) if isinstance(properties, str) else properties
    if isinstance(spec, str):
        if spec.startswith(replacement_character):
            path = spec.replace(replacement_character, "$", 1)
            return props if path == "$" else path_col(props, path)
        if spec.startswith("\\"):
            return F.lit(spec[1:])
        return F.lit(spec)
    if isinstance(spec, list):
        return F.array(*[compile_output_spec(s, props, replacement_character) for s in spec])
    if isinstance(spec, dict):
        return F.struct(*[
            compile_output_spec(v, props, replacement_character).alias(k)
            for k, v in spec.items()
        ])
    return F.lit(spec)


def output_from_content(content: dict, *args: Any, replacement_character: str = "$") -> Any:
    """Driver-side evaluation of the same spec over a plain dict.

    Returns a single value for one arg, else a list of values — matching
    ``Document.output_from_content`` semantics.
    """

    def _eval(spec: Any) -> Any:
        if not spec:
            return spec
        if isinstance(spec, str):
            if spec.startswith(replacement_character):
                return reach(spec.replace(replacement_character, "$", 1), content)
            if spec.startswith("\\"):
                return spec[1:]
            return spec
        if isinstance(spec, list):
            return [_eval(s) for s in spec]
        if isinstance(spec, dict):
            return {k: _eval(v) for k, v in spec.items()}
        return spec

    if len(args) == 1:
        return _eval(args[0])
    return [_eval(a) for a in args]
