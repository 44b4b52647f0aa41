"""Datetime parse/format parity (reference
``datagrowth/utils/datetime.py:6-30``).

The reference serializes datetimes into payloads as
``%Y%m%d%H%M%S%f`` strings (``DATAGROWTH_DATETIME_FORMAT``,
``datagrowth/datagrowth.yml:3``) and parses failures to epoch. Both a
driver-side form (for request templating / config) and a Column form
(JVM-side, codegen) are provided; the Spark pattern ``yyyyMMddHHmmssSSSSSS``
is the same 20-digit layout.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import Column
from pyspark.sql import functions as F

DATETIME_FORMAT = "%Y%m%d%H%M%S%f"
SPARK_DATETIME_PATTERN = "yyyyMMddHHmmssSSSSSS"
_EPOCH = datetime(1970, 1, 1)


def parse_datetime_string(time_str: str | None) -> datetime:
    """Parse the reference format; invalid input → epoch (same fallback)."""
    try:
        return datetime.strptime(time_str, DATETIME_FORMAT)
    except (ValueError, TypeError):
        return _EPOCH


def format_datetime(value: datetime) -> str:
    return value.strftime(DATETIME_FORMAT)


def parse_datetime_col(col: Column | str) -> Column:
    """Column form; epoch on failure — identical fallback semantics,
    fully JVM-side.

    Spark's datetime parser rejects a bare adjacent ``SSSSSS`` fraction
    field on parse (formatting works), so the seconds part and the
    6-digit micros are parsed separately and recombined with
    ``timestamp_micros`` — exact, no string rounding.
    """
    c = F.col(col) if isinstance(col, str) else col
    base = F.try_to_timestamp(F.substring(c, 1, 14), F.lit("yyyyMMddHHmmss"))
    micros = F.when(c.rlike(r"^\d{20}$"), F.substring(c, 15, 6).cast("long"))
    return F.coalesce(
        F.timestamp_micros(F.unix_micros(base) + micros),
        F.lit("1970-01-01 00:00:00").cast("timestamp"),
    )


def format_datetime_col(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.date_format(c, SPARK_DATETIME_PATTERN)
