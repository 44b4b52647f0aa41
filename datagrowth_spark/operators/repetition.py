"""Repetition / diversity signals for training-data curation.

Gopher-style quality heuristics (Rae et al. 2021, §A1.1: "repetition"
filters) re-expressed as distributed Spark plans:

* ``ngram_repetition`` — per-document duplicate-n-gram occurrence
  fraction and most-frequent-n-gram character coverage. Plan: explode
  n-gram occurrences → one hash aggregate on (doc, n-gram) → one hash
  aggregate on doc. Two shuffles keyed by document id; partial
  aggregation does nearly all the work at 100 TB because the per-doc
  n-gram distribution collapses map-side.
* ``crossdoc_span_stats`` — fraction of a document's distinct n-gram
  spans that also occur in at least one OTHER document (the corpus-level
  near-substring-duplication signal used by RefinedWeb/CCNet-style line
  dedup, at n-gram granularity because this corpus has no line
  structure). Plan: distinct spans per doc → global span document
  frequency (one shuffle on the span hash) → join back → per-doc
  aggregate. The span-hash aggregate is the posting-list shape that
  survives scale; no pairwise work anywhere.

The reference has no corpus-analysis surface (SURVEY §2.5) — these are
beyond-reference training-pipeline primitives, oracle-checked via
`text_repetition` / `dedup_spans_crossdoc` in queries.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from datagrowth_spark.functions.text import shingles_from_tokens, tokens_col


def _occurrence_shingles(
    df: DataFrame, text_col: str, id_col: str, n: int, carry: dict | None = None
) -> DataFrame:
    """One row per n-gram OCCURRENCE (not distinct), carrying doc length
    plus any caller-supplied per-document scalar columns (``carry``).

    Tokenize into a real column first — shingle construction indexes the
    token array per position and an inlined tokenizer would re-evaluate
    per shingle (O(len²) per document).
    """
    carry = carry or {}
    toked = df.select(
        F.col(id_col).alias("id"),
        F.length(F.col(text_col)).alias("n_chars"),
        *[expr.alias(name) for name, expr in carry.items()],
        tokens_col(F.lower(F.col(text_col))).alias("toks"),
    )
    return toked.select(
        "id", "n_chars", *carry.keys(),
        F.explode(shingles_from_tokens(F.col("toks"), n)).alias("shingle"),
    )


def ngram_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 2,
    carry: dict | None = None,
) -> DataFrame:
    """Per-document n-gram repetition statistics.

    Returns one row per document::

        id, n_ngrams, dup_ngram_frac, top_ngram, top_ngram_count,
        top_ngram_char_frac

    * ``dup_ngram_frac`` — fraction of n-gram occurrences whose n-gram
      occurs more than once in the document (Gopher's
      "duplicate n-gram fraction").
    * ``top_ngram_char_frac`` — characters covered by the most frequent
      n-gram (count × length) over total characters (Gopher's
      "top n-gram character fraction"). Ties broken by longer n-gram,
      then lexicographically-larger — total order, deterministic under
      any partitioning.

    Documents shorter than ``n`` tokens produce no row (they have no
    n-grams to repeat); callers wanting them keep a left join.

    ``carry`` maps extra output names → per-document scalar Columns
    (evaluated on the input row, e.g. a language tag or diversity
    ratio). They ride through the two aggregates with ``first()`` — at
    scale this avoids the corpus-sized join a separate per-doc frame
    would need.
    """
    carry = carry or {}
    occ = _occurrence_shingles(df, text_col, id_col, n, carry)
    counts = occ.groupBy("id", "shingle").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.first("n_chars").alias("n_chars"),
        *[F.first(name).alias(name) for name in carry],
    )
    # Deterministic arg-max without a window: max over a struct ordered
    # (count, ngram length, ngram) — equivalent to ORDER BY cnt DESC,
    # len DESC, shingle DESC LIMIT 1 and cheaper than a row_number pass.
    top_struct = F.max(
        F.struct(
            F.col("cnt").alias("c"),
            F.length("shingle").alias("l"),
            F.col("shingle").alias("s"),
        )
    )
    per_doc = counts.groupBy("id").agg(
        F.sum("cnt").alias("n_ngrams"),
        F.sum(F.when(F.col("cnt") > 1, F.col("cnt")).otherwise(F.lit(0))).alias("dup_occ"),
        top_struct.alias("top"),
        F.first("n_chars").alias("n_chars"),
        *[F.first(name).alias(name) for name in carry],
    )
    return per_doc.select(
        "id",
        *carry.keys(),
        "n_ngrams",
        F.round(F.col("dup_occ") / F.col("n_ngrams"), 6).alias("dup_ngram_frac"),
        F.col("top.s").alias("top_ngram"),
        F.col("top.c").alias("top_ngram_count"),
        F.round(
            (F.col("top.c") * F.col("top.l")) / F.greatest(F.col("n_chars"), F.lit(1)),
            6,
        ).alias("top_ngram_char_frac"),
    )


def distinct_token_ratio(text_col) -> "F.Column":
    """Vocabulary-diversity column: distinct tokens / total tokens."""
    toks = tokens_col(F.lower(F.col(text_col) if isinstance(text_col, str) else text_col))
    return F.size(F.array_distinct(toks)) / F.greatest(F.size(toks), F.lit(1))


def crossdoc_span_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
) -> DataFrame:
    """Fraction of each document's distinct n-gram spans shared with
    OTHER documents.

    Returns ``id, n_spans, shared_spans, shared_frac`` per document that
    has at least one span. A planted near-duplicate shows
    ``shared_frac`` ≈ 1; organic documents sit near 0 for n ≥ 8.

    Scale shape: spans are xxhash64-hashed to 8-byte keys before the
    global document-frequency aggregate, so the shuffle carries longs,
    not strings; document frequency needs a plain COUNT because spans
    are already distinct per document.
    """
    toked = df.select(
        F.col(id_col).alias("id"),
        tokens_col(F.lower(F.col(text_col))).alias("toks"),
    )
    # Span identity is internal to this operator (outputs are counts),
    # so hash inside the array before exploding: the explode emits
    # longs, array_distinct compares longs, and the document-frequency
    # shuffle carries 8 bytes per span instead of an n-token string.
    spans = toked.select(
        "id",
        F.explode(F.array_distinct(F.transform(
            shingles_from_tokens(F.col("toks"), n), lambda s: F.xxhash64(s)))).alias("h"),
    )
    doc_freq = spans.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    joined = spans.join(doc_freq, "h")
    return (
        joined.groupBy("id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("df") > 1, 1).otherwise(0)).alias("shared_spans"),
        )
        .select(
            "id",
            "n_spans",
            "shared_spans",
            F.round(F.col("shared_spans") / F.col("n_spans"), 6).alias("shared_frac"),
        )
    )
