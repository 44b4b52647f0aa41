"""JSON-Schema validation of document properties (E11).

Mirrors ``Document.validate`` / ``Collection.validate`` (reference
``datagrowth/datatypes/documents/db/document.py:45-71``,
``collection.py:61-74``): each document's decoded properties are
checked against a JSON Schema (draft-4 compatible via the ``jsonschema``
package) and violations raise — or, in the DataFrame-native form,
come back as an errors frame so the pipeline can quarantine bad rows
instead of dying (the at-scale behavior you actually want: route
invalid documents to a dead-letter table, keep the job running).

Scale: validation is an Arrow-batched ``mapInPandas`` stage — pure
per-row work, no shuffle; the validator object is compiled once per
partition, not per row.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

VALIDATION_ERROR_SCHEMA = T.StructType([
    T.StructField("identity", T.StringType()),
    T.StructField("error", T.StringType()),
])


class ValidationError(ValueError):
    pass


def validation_errors(
    df: DataFrame, schema: dict, properties_col: str = "properties"
) -> DataFrame:
    """(identity, error) rows for every schema violation; empty when valid."""

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:  # noqa: F821
        import pandas as pd

        try:
            from jsonschema import Draft4Validator
        except ImportError as exc:  # pragma: no cover — baked into the env
            raise NotImplementedError("jsonschema is not installed") from exc

        from datagrowth_spark.datatypes.document import decode_properties

        validator = Draft4Validator(schema)
        for batch in batches:
            rows = []
            for rec in batch.to_dict("records"):
                content = decode_properties(rec[properties_col])
                for err in validator.iter_errors(content):
                    path = ".".join(str(p) for p in err.absolute_path) or "$"
                    rows.append({"identity": rec.get("identity"),
                                 "error": f"{path}: {err.message}"})
            yield pd.DataFrame(rows, columns=["identity", "error"])

    cols = [properties_col] + (["identity"] if "identity" in df.columns else [])
    return df.select(*cols).mapInPandas(run, VALIDATION_ERROR_SCHEMA)


def validate(df: DataFrame, schema: dict, properties_col: str = "properties",
             max_errors_shown: int = 10) -> None:
    """Raise :class:`ValidationError` when any document violates the schema
    (the reference's raise-on-invalid form, document.py:45-71)."""
    errors = validation_errors(df, schema, properties_col).take(max_errors_shown)
    if errors:
        detail = "; ".join(f"{e.identity}: {e.error}" for e in errors)
        raise ValidationError(f"{len(errors)}+ document(s) failed validation: {detail}")
