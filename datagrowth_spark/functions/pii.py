"""PII detection / redaction columns — pure Catalyst regexp expressions.

Training-data curation needs a cheap PII pass before anything ships to a
model. These are JVM-side `regexp_count`/`regexp_replace` expressions —
no Python in the hot path, whole-stage codegen, and the patterns are
deliberately RE2-compatible (no lookarounds/backrefs) so the same
pattern strings run identically in Spark (Java regex) and DuckDB (RE2)
for oracle checking, and would also run in a downstream Trino/Flink
deployment unchanged.

Beyond-reference surface: the reference has no text-scrubbing operators
(SURVEY §2.5). Oracle-checked via the `pii_scan` query.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Order matters for redaction char accounting: emails first (they contain
# dots but no digit-dot runs, so they never collide with the later
# patterns), then IPv4, then dashed phone numbers.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"

PATTERNS: dict[str, str] = {"email": EMAIL_RE, "ipv4": IPV4_RE, "phone": PHONE_RE}


def _col(text: Column | str) -> Column:
    return F.col(text) if isinstance(text, str) else text


def pii_count(text: Column | str, kind: str) -> Column:
    """Occurrence count of one PII kind ('email' | 'ipv4' | 'phone')."""
    return F.regexp_count(_col(text), F.lit(PATTERNS[kind]))


def pii_counts(text: Column | str) -> dict[str, Column]:
    return {kind: pii_count(text, kind) for kind in PATTERNS}


def redact_pii(text: Column | str, token: str = "<PII>") -> Column:
    """Replace every PII match with ``token``, all kinds, all occurrences.

    Applied in the fixed PATTERNS order so character accounting is
    deterministic and mirror-able in SQL.
    """
    out = _col(text)
    for pattern in PATTERNS.values():
        out = F.regexp_replace(out, pattern, token)
    return out


def redact_sql(expr: str, token: str = "<PII>") -> str:
    """The DuckDB-equivalent redaction expression over a SQL expression
    string — same pattern order as :func:`redact_pii`."""
    out = expr
    for pattern in PATTERNS.values():
        escaped = pattern.replace("'", "''")
        out = f"regexp_replace({out}, '{escaped}', '{token}', 'g')"
    return out
