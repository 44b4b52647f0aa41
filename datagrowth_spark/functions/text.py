"""Text-analysis column functions — pure Catalyst expressions.

Everything here is built from pyspark.sql.functions only (JVM-side,
whole-stage codegen, no Python): token counting, quality scoring,
language-ID heuristics, fingerprints, shingling. Each function returns a
Column so operators compose them freely.

These are the "beyond-reference" training-data-pipeline primitives; the
reference's own scalar library is limited to path lookup + datetime
formatting (SURVEY §2.5).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multi-language stopword sets for the n-gram/stopword language
# heuristic. Deliberately small and deterministic: the operator's shape
# (per-language evidence scores → argmax) is what matters at scale.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is"),
    "es": ("el", "la", "de", "y", "que", "en", "un"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu"),
    "fr": ("le", "la", "de", "et", "un", "est", "que"),
}


def tokens_col(text: Column | str) -> Column:
    """Whitespace tokenization (empty strings filtered)."""
    text = F.col(text) if isinstance(text, str) else text
    return F.filter(F.split(text, r"\s+"), lambda t: t != F.lit(""))


def token_count(text: Column | str) -> Column:
    return F.size(tokens_col(text))


def word_regex_token_count(text: Column | str) -> Column:
    """BPE-ish subword proxy: count word/number/punctuation units.

    Uses a GPT-style pre-tokenizer regex family — alphabetic runs,
    digit runs, and single non-space punctuation each count as a token.
    """
    text = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(text, r"\s+", " ")
    words = F.size(F.filter(F.split(stripped, r"[^A-Za-z0-9]+"), lambda t: t != F.lit("")))
    punct = F.length(F.regexp_replace(stripped, r"[A-Za-z0-9\s]", ""))
    return words + punct


def char_count(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    return F.length(text)


def punct_ratio(text: Column | str) -> Column:
    text = F.col(text) if isinstance(text, str) else text
    punct = F.length(F.regexp_replace(text, r"[A-Za-z0-9\s]", ""))
    return punct / F.greatest(F.length(text), F.lit(1))


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = LANG_STOPWORDS["en"]) -> Column:
    toks = tokens_col(F.lower(F.col(text) if isinstance(text, str) else text))
    hits = F.size(F.filter(toks, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(toks), F.lit(1))


def mean_word_length(text: Column | str) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total / F.greatest(F.size(toks), F.lit(1))


def quality_score(text: Column | str) -> Column:
    """Composite document-quality heuristic in [0, 1].

    Mix of length band, stopword evidence, low punctuation noise and
    sane word lengths — the standard cheap pre-filter shape for
    training-data curation pipelines.
    """
    text = F.col(text) if isinstance(text, str) else text
    n = F.length(text)
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * 4, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - punct_ratio(text) * 5, F.lit(0.0))
    mwl = mean_word_length(text)
    word_len_score = F.when((mwl >= 3) & (mwl <= 10), F.lit(1.0)).otherwise(F.lit(0.5))
    return F.round(
        length_score * 0.3 + stop_score * 0.3 + punct_penalty * 0.2 + word_len_score * 0.2, 6
    )


def add_quality_score(df, text_col: str = "text", out: str = "quality",
                      ntoks_col: str | None = None):
    """Frame-level :func:`quality_score`: appends the 6dp-rounded
    composite quality score, tokenizing ONCE per token variant instead
    of four times (r12, the duplicated-expression defect class of
    ``add_language_id``). The scalar form's per-row cost: stopword_ratio
    tokenizes lower(text) twice (filter hits + size), mean_word_length
    tokenizes text twice (fold + size), and the mwl when-chain then
    duplicates the fold — ~5 tokenize passes plus 2 regex passes per
    row. Here the two token arrays (raw for word lengths, lowered for
    stopword hits) and the three component ratios live in their own
    projections — expensive multi-referenced aliases, which
    CollapseProject keeps — so each pass runs exactly once per row.
    Values are bit-identical to the scalar form (same sub-expressions,
    same operation order; pinned by test_frame_form_matches_scalar).

    ``ntoks_col``: optionally also emit ``token_count(text)`` — it is
    ``size`` of the raw token array this function already built, so
    consumers that select both (budget/pack queries) save one more
    tokenize pass. Intermediates are dropped; output schema is the
    input plus ``out`` (and ``ntoks_col`` when requested)."""
    text = F.col(text_col)
    toked = df.select(
        "*",
        tokens_col(text).alias("__qsT"),
        tokens_col(F.lower(text)).alias("__qsTL"))
    stop_ratio = (F.size(F.filter(F.col("__qsTL"),
                                  _isin_filter(LANG_STOPWORDS["en"])))
                  / F.greatest(F.size("__qsTL"), F.lit(1)))
    mwl = (F.aggregate(F.col("__qsT"), F.lit(0),
                       lambda acc, t: acc + F.length(t))
           / F.greatest(F.size("__qsT"), F.lit(1)))
    parts = toked.select(
        "*",
        stop_ratio.alias("__qsStop"),
        mwl.alias("__qsMwl"),
        punct_ratio(text).alias("__qsPunct"))
    n = F.length(text)
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    stop_score = F.least(F.col("__qsStop") * 4, F.lit(1.0))
    punct_penalty = F.greatest(F.lit(1.0) - F.col("__qsPunct") * 5, F.lit(0.0))
    word_len_score = F.when(
        (F.col("__qsMwl") >= 3) & (F.col("__qsMwl") <= 10),
        F.lit(1.0)).otherwise(F.lit(0.5))
    score = F.round(
        length_score * 0.3 + stop_score * 0.3
        + punct_penalty * 0.2 + word_len_score * 0.2, 6)
    result = parts.withColumn(out, score)
    if ntoks_col is not None:
        result = result.withColumn(ntoks_col, F.size("__qsT"))
    return result.drop("__qsT", "__qsTL", "__qsStop", "__qsMwl", "__qsPunct")


def _isin_filter(words: tuple[str, ...]):
    # NB: the returned lambda must take exactly ONE arg — pyspark's
    # higher-order filter() treats a two-arg lambda as (element, index).
    return lambda t: t.isin(*words)


def language_scores(text: Column | str) -> dict[str, Column]:
    """Per-language stopword-evidence scores (the n-gram-heuristic family)."""
    toks = tokens_col(F.lower(F.col(text) if isinstance(text, str) else text))
    denom = F.greatest(F.size(toks), F.lit(1))
    return {
        lang: F.size(F.filter(toks, _isin_filter(sw))) / denom
        for lang, sw in LANG_STOPWORDS.items()
    }


def language_id(text: Column | str, default: str = "und") -> Column:
    """argmax over language evidence scores; 'und' when no evidence.

    Single-Column convenience form. NOTE its cost shape: each when-step
    of the argmax embeds the previous best twice, so the expression
    duplicates earlier score subtrees ~2^k times and every score
    re-tokenizes the text — fine for one-off use, wrong in a hot
    projection. Hot paths use :func:`add_language_id`, which
    materializes the token array and the per-language scores as columns
    first (measured 0.93 → 0.33 s over 5k docs at sf0.1, r12)."""
    scores = language_scores(text)
    return _argmax_lang(scores, default)


def _argmax_lang(scores: dict[str, Column], default: str) -> Column:
    """Deterministic argmax: languages in sorted order, strict >."""
    best_lang = F.lit(default)
    best_score = F.lit(0.0)
    for lang in sorted(scores):
        is_better = scores[lang] > best_score
        best_lang = F.when(is_better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(is_better, scores[lang]).otherwise(best_score)
    return best_lang


def add_language_id(df, text_col: str = "text",
                    out: str = "pred_lang", default: str = "und"):
    """Frame-level :func:`language_id`: appends ``out`` and computes the
    SAME argmax, but tokenizes once and evaluates each language score
    once (r12, guide §4.1's duplicated-expression caveat applied to
    pure JVM expressions): the token array and the k evidence scores
    are materialized as columns in their own projections — expensive
    multi-referenced aliases, which CollapseProject keeps — so the
    argmax when-chain duplicates O(1) attribute reads instead of
    O(len·2^k) re-tokenizations. Intermediates are dropped; the output
    schema is the input plus ``out``. Values are bit-identical to the
    scalar form (same expressions, same strict-> order)."""
    toked = df.withColumn("__liToks",
                          tokens_col(F.lower(F.col(text_col))))
    denom = F.greatest(F.size("__liToks"), F.lit(1))
    score_cols = {
        lang: (F.size(F.filter(F.col("__liToks"), _isin_filter(sw)))
               / denom).alias(f"__liS_{lang}")
        for lang, sw in LANG_STOPWORDS.items()
    }
    scored = toked.select("*", *score_cols.values())
    best = _argmax_lang(
        {lang: F.col(f"__liS_{lang}") for lang in LANG_STOPWORDS}, default)
    return (scored.withColumn(out, best)
            .drop("__liToks", *[f"__liS_{lang}" for lang in LANG_STOPWORDS]))


def normalized_tokens(text: Column | str) -> Column:
    """Lowercased alpha-only tokens — the normalization for fingerprints."""
    text = F.col(text) if isinstance(text, str) else text
    cleaned = F.regexp_replace(F.lower(text), r"[^a-z\s]", "")
    return F.filter(F.split(cleaned, r"\s+"), lambda t: t != F.lit(""))


def fingerprint(text: Column | str) -> Column:
    """Order-insensitive document fingerprint: md5 of sorted distinct tokens.

    Collapses token-order permutations of the same vocabulary — the
    classic "fingerprint" dedup key (stronger than exact hash, cheaper
    than MinHash).
    """
    toks = F.array_sort(F.array_distinct(normalized_tokens(text)))
    return F.md5(F.encode(F.array_join(toks, " "), "utf-8"))


def normalize_text(text: Column | str) -> Column:
    """CCNet/Dolma-style dedup-key normalization, pure Catalyst:
    lowercase, replace every non-``[a-z0-9 ]`` char (punctuation,
    tabs, newlines — digits stay) with a space, collapse space runs,
    trim. Idempotent; NULL in → NULL out. Applied before exact
    paragraph/document dedup so case and whitespace variants of the
    same content share one hash key. Both regexes avoid
    engine-specific character classes (``' +'``, not ``'\\s+'``) so a
    DuckDB oracle replays them byte-for-byte."""
    text = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(F.lower(text), "[^a-z0-9 ]", " ")
    return F.trim(F.regexp_replace(stripped, " +", " "))


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Word n-gram shingles from a token-array column, 1-based construction
    identical to DuckDB's list indexing so oracle SQL can mirror it.

    ``toks`` MUST be a materialized column reference (not an inline
    tokenization expression): lambda bodies re-evaluate their inputs per
    element, so an inline split would turn this O(len) into O(len²).
    """
    count = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(count - (n - 1), F.lit(0)))
    return F.when(count < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            idx,
            lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j) for j in range(n)]),
        )
    )


def shingles(text: Column | str, n: int = 3) -> Column:
    """Word n-gram shingles straight from a text column.

    Convenience form; prefer tokenizing into a column first and calling
    :func:`shingles_from_tokens` in hot paths (see its note).
    """
    toks = tokens_col(F.lower(F.col(text) if isinstance(text, str) else text))
    return shingles_from_tokens(toks, n)


def winnow_fingerprints(grams: Column, window: int = 4) -> Column:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, the
    MOSS algorithm): from every sliding window of ``window`` consecutive
    k-gram hashes keep the minimum; the sorted distinct selected hashes
    are the document's fingerprint set. The guarantee that makes this
    the standard sparse-fingerprint scheme: any shared token run of
    ``window + k - 1`` tokens between two documents is caught by at
    least one shared fingerprint, while the expected density is only
    ``2 / (window + 1)`` of the grams — a tunable recall/size dial that
    whole-corpus shingle schemes don't have.

    Entirely in-row (transform / slice / array_min): fingerprinting a
    100 TB corpus is a map-only projection with zero shuffle and zero
    Python. Hash strings compare lexicographically, identical in Spark
    and DuckDB, so the min-selection is engine-portable bit-for-bit.

    ``grams`` MUST be a materialized column reference (not an inline
    expression): the lambda body references it per element — see the
    :func:`shingles_from_tokens` note. Documents shorter than one
    window contribute their single global minimum (standard winnowing
    edge rule); empty gram lists yield empty fingerprint sets.
    """
    g = F.size(grams)
    idx = F.sequence(F.lit(1), F.greatest(g - (window - 1), F.lit(0)))
    mins = (
        F.when(g >= window,
               F.transform(idx, lambda j: F.array_min(F.slice(grams, j, window))))
        .when(g > 0, F.array(F.array_min(grams)))
        .otherwise(F.array().cast("array<string>"))
    )
    return F.array_sort(F.array_distinct(mins))


def char_pairs(word: Column | str) -> Column:
    """Adjacent character pairs of a word — the unit the first BPE merge
    iteration counts. ``sequence`` is guarded for words shorter than 2
    chars (Spark's ``sequence(1, 0)`` would count DOWN, not empty).
    """
    word = F.col(word) if isinstance(word, str) else word
    idx = F.sequence(F.lit(1), F.length(word) - 1)
    return F.when(F.length(word) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: word.substr(i, F.lit(2)))
    )


def md5_long(col: Column, chars: int = 8) -> Column:
    """First `chars` hex digits of md5 as a BIGINT — the cross-engine
    deterministic hash primitive (DuckDB: CAST('0x'||substr(md5(x),1,8) AS BIGINT))."""
    return F.conv(F.substring(F.md5(F.encode(col, "utf-8")), 1, chars), 16, 10).cast("long")


def simhash(text: Column | str, bits: int = 32) -> Column:
    """SimHash over normalized tokens using md5-derived per-token hashes.

    bit j of the simhash is set when the majority of token hashes have
    bit j set. 32 bits keeps every intermediate in BIGINT range for both
    Spark and DuckDB.
    """
    def _bit_set(mask: int):
        return lambda h: h.bitwiseAND(F.lit(mask)) != 0

    toks = normalized_tokens(text)
    hashes = F.transform(toks, lambda t: md5_long(t))
    n = F.greatest(F.size(hashes), F.lit(1))
    result = F.lit(0).cast("long")
    for j in range(bits):
        ones = F.size(F.filter(hashes, _bit_set(1 << j)))
        result = result + F.when(ones * 2 > n, F.lit(1 << j)).otherwise(F.lit(0))
    return result


def hashed_features(text: Column | str) -> Column:
    """Unigram + bigram feature strings over lowercased whitespace
    tokens — the fastText-style feature space (bigrams joined with
    ``_``), pure Catalyst."""
    toks = tokens_col(F.lower(F.col(text) if isinstance(text, str) else text))
    n = F.size(toks)
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit("_"), b),
    )
    return F.concat(toks, bigrams)


def hashed_linear_score(text: Column | str, buckets: int = 4096) -> Column:
    """FastText-shaped linear quality scorer, entirely JVM-side.

    Each feature hashes (md5 → bucket) into a ``buckets``-dim weight
    vector whose weights are derived arithmetically from the bucket id
    (Knuth multiplicative hash → [-0.5, 0.5)) — the exact evaluation
    plan of a hashed-feature linear model with the weight table inlined
    as arithmetic, so there is no broadcast and the score is
    reproducible in any engine (oracle parity). Score = mean feature
    weight; a real deployment swaps the weight expression for an
    ``element_at`` into a broadcast literal array of trained weights —
    same plan shape, one map-only stage, no shuffle.
    """
    knuth = 2654435761
    feats = hashed_features(text)
    weights = F.transform(
        feats,
        lambda f: (
            (md5_long(f) % buckets) * knuth % 1000
        ).cast("double") / 1000.0 - 0.5,
    )
    n = F.greatest(F.size(weights), F.lit(1))
    return F.aggregate(weights, F.lit(0.0), lambda acc, w: acc + w) / n


def add_hashed_linear_score(df, text_col: str = "text",
                            buckets: int = 4096,
                            score_col: str = "score",
                            nfeat_col: str = "n_features"):
    """Frame-level :func:`hashed_linear_score`: appends the 6dp-rounded
    mean-weight score AND the feature count in one pass. The scalar
    form re-derives the feature array and the md5 weight transform per
    consumer (size + fold, and again per output column that references
    the score) — measured 1.97 s for 5k docs at sf0.1 where one
    evaluation costs 0.85 s (r12). Here feats, then weights, then the
    score each live in their own projection (expensive multi-referenced
    aliases — CollapseProject keeps them), so the md5 pass runs exactly
    once per row. Values are bit-identical (same expressions, same
    fold order); intermediates are dropped."""
    knuth = 2654435761
    featd = df.withColumn("__hlF", hashed_features(F.col(text_col)))
    weighted = featd.select(
        "*",
        F.size("__hlF").alias("__hlN"),
        F.transform(
            "__hlF",
            lambda f: ((md5_long(f) % buckets) * knuth % 1000)
            .cast("double") / 1000.0 - 0.5,
        ).alias("__hlW"))
    score = F.round(
        F.aggregate("__hlW", F.lit(0.0), lambda acc, w: acc + w)
        / F.greatest(F.col("__hlN"), F.lit(1)), 6)
    return (weighted
            .withColumn(nfeat_col, F.col("__hlN").cast("long"))
            .withColumn(score_col, score)
            .drop("__hlF", "__hlN", "__hlW"))
