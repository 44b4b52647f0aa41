"""Text query family.

Split from the single-module queries.py by scripts/split_queries.py (r12); definitions are verbatim.
"""

from __future__ import annotations
import os
from collections.abc import Callable
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window
from datagrowth_spark.core.session import ensure_ts_readable
from datagrowth_spark.functions import text as TX
from datagrowth_spark.operators import dedup as DD
from datagrowth_spark.operators import multimodal as MM
from datagrowth_spark.operators import similarity as SIM
from datagrowth_spark.sources import testclient as TC
from datagrowth_spark.core.caching import persist_registered as _persist
from datagrowth_spark.core.caching import register as _register_cache
from datagrowth_spark.core.caching import release as release_caches
from datagrowth_spark.queries._shared import _NORM_TOKS_SQL, _RAW_TOKS_SQL, _TOKS_SQL, _WINNOW_CTES, _t  # noqa: E501
from datagrowth_spark.queries.trainer import SQL_QUALITY_UNIGRAM_LM, q_quality_unigram_lm  # noqa: E501



# ---------------------------------------------------------------------------
# Documents: grouping, text analysis, fingerprints
# ---------------------------------------------------------------------------

def q_docs_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection.group_by (C5) as a relational plan: group docs by a
    property, materialize ordered member lists."""
    docs = _t(spark, sf_dir, "documents")
    return (
        docs.groupBy("lang")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
            F.array_join(F.array_sort(F.collect_list(F.lpad(F.col("doc_id").cast("string"), 10, "0"))), ",")
            .alias("doc_ids"),
        )
    )



SQL_DOCS_BY_LANG = """
SELECT lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
       STRING_AGG(lpad(CAST(doc_id AS VARCHAR), 10, '0'), ',' ORDER BY lpad(CAST(doc_id AS VARCHAR), 10, '0')) AS doc_ids
FROM documents
GROUP BY lang
"""



def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting: whitespace tokens + BPE-ish word/punct units."""
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        TX.token_count("text").alias("ws_tokens"),
        TX.word_regex_token_count("text").alias("unit_tokens"),
        TX.char_count("text").alias("chars"),
    )



SQL_TEXT_STATS = f"""
SELECT doc_id,
       len({_RAW_TOKS_SQL}) AS ws_tokens,
       len(list_filter(string_split_regex(regexp_replace(text, '\\s+', ' ', 'g'), '[^A-Za-z0-9]+'), t -> t <> ''))
         + length(regexp_replace(regexp_replace(text, '\\s+', ' ', 'g'), '[A-Za-z0-9\\s]', '', 'g')) AS unit_tokens,
       length(text) AS chars
FROM documents
"""



def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    # frame form: one tokenize pass per token variant (r12; bit-equal
    # to the scalar form, pinned by test_frame_form_matches_scalar)
    return TX.add_quality_score(docs, out="quality").select(
        "doc_id", "quality")



def q_docs_quality_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact global rank of every document by quality score — the
    sharded distributed rank (operators/ranking.py) instead of a
    single-partition ``ROW_NUMBER`` window. (quality DESC, doc_id) is a
    total order, so the rank is unique and the oracle's global window
    reproduces it bit-for-bit; the plan never funnels the corpus
    through one task (cuts sketch + per-shard windows + shard-count
    prefix, each SinglePartition stage carrying partial-agg rows only).
    """
    from datagrowth_spark.operators.ranking import add_global_rank

    docs = _t(spark, sf_dir, "documents")
    # Persist the scored frame (house pattern for chained rank passes):
    # the eager sharded rank's bounded driver collects (cuts sketch,
    # offset counts) would otherwise re-run the full quality-scoring
    # pipeline once per action.
    scored = _persist(TX.add_quality_score(docs, out="quality").select(
        "doc_id", "quality"))
    ranked = add_global_rank(scored, "quality", ("doc_id",), descending=True,
                             out="rank")
    return ranked.select("doc_id", "quality",
                         F.col("rank").cast("long").alias("rank"))



SQL_TEXT_QUALITY = f"""
WITH t AS (
  SELECT doc_id, text,
         {_TOKS_SQL} AS toks,
         length(text) AS n
  FROM documents
), m AS (
  SELECT doc_id, n,
         least(n / 500.0, 1.0) AS length_score,
         least((len(list_filter(toks, x -> x IN ('the','a','of','and','to','in','is')))
                / CAST(greatest(len(toks), 1) AS DOUBLE)) * 4, 1.0) AS stop_score,
         greatest(1.0 - (length(regexp_replace(text, '[A-Za-z0-9\\s]', '', 'g'))
                / CAST(greatest(length(text), 1) AS DOUBLE)) * 5, 0.0) AS punct_penalty,
         list_sum(list_transform({_RAW_TOKS_SQL}, x -> length(x)))
           / CAST(greatest(len({_RAW_TOKS_SQL}), 1) AS DOUBLE) AS mwl
  FROM t
)
SELECT doc_id,
       round(length_score * 0.3 + stop_score * 0.3 + punct_penalty * 0.2
             + (CASE WHEN mwl >= 3 AND mwl <= 10 THEN 1.0 ELSE 0.5 END) * 0.2, 6) AS quality
FROM m
"""



SQL_DOCS_QUALITY_RANK = f"""
SELECT doc_id, quality,
       ROW_NUMBER() OVER (ORDER BY quality DESC, doc_id ASC) AS rank
FROM ({SQL_TEXT_QUALITY}) q
"""



def q_docs_length_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percent-rank of every document by length — the sharded
    distributed rank's PERCENT_RANK form (operators/ranking.py). With
    the (n_chars, doc_id) total order this equals SQL PERCENT_RANK
    bit-for-bit: both engines compute (rank-1)/(N-1) on integer ranks,
    an IEEE-exact division."""
    from datagrowth_spark.operators.ranking import add_percent_rank

    docs = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return add_percent_rank(docs, "n_chars", ("doc_id",), out="len_pr")



SQL_DOCS_LENGTH_PERCENTILE = """
SELECT doc_id, n_chars,
       PERCENT_RANK() OVER (ORDER BY n_chars ASC, doc_id ASC) AS len_pr
FROM documents
"""



def q_text_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    # Frame form (r12): tokenizes once and materializes the 4 evidence
    # scores as columns — the scalar argmax chain re-derived them
    # ~2^k-fold (0.93 → 0.33 s at sf0.1); identical values.
    docs = _t(spark, sf_dir, "documents")
    return TX.add_language_id(docs, "text", out="pred_lang") \
        .select("doc_id", "pred_lang")



def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary fingerprint per document + dup-group stats."""
    docs = _t(spark, sf_dir, "documents")
    return DD.fingerprint_dedup(docs, "text", "doc_id")



SQL_TEXT_FINGERPRINT = f"""
SELECT md5(array_to_string(list_sort(list_distinct({_NORM_TOKS_SQL})), ' ')) AS fp,
       MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
FROM documents
GROUP BY 1
"""



# ---------------------------------------------------------------------------
# Repetition / corpus-duplication signals (Gopher-style quality filters)
# ---------------------------------------------------------------------------

def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition filter signals per document.

    duplicate-2-gram occurrence fraction, top-2-gram character coverage,
    vocabulary diversity, and the resulting keep/drop decision. Plan:
    explode 2-gram occurrences → (doc, gram) hash agg → doc hash agg;
    the arg-max is a struct max, not a window, so there is no sort, and
    the per-doc scalars (lang, diversity) ride the aggregation via
    carry-first instead of a corpus-sized join-back.
    """
    from datagrowth_spark.operators import repetition as RT

    docs = _t(spark, sf_dir, "documents")
    out = RT.ngram_repetition(
        docs, "text", "doc_id", n=2,
        carry={
            "lang": F.col("lang"),
            "diversity": F.round(RT.distinct_token_ratio("text"), 6),
        },
    ).withColumnRenamed("id", "doc_id")
    keep = (
        (F.col("dup_ngram_frac") <= 0.6)
        & (F.col("top_ngram_char_frac") <= 0.2)
        & (F.col("diversity") >= 0.05)
    )
    return out.select(
        "doc_id", "lang", "n_ngrams", "dup_ngram_frac",
        "top_ngram", "top_ngram_count", "top_ngram_char_frac",
        "diversity",
        keep.cast("int").alias("keep"),
    )



SQL_TEXT_REPETITION = f"""
WITH toks AS (
  SELECT doc_id AS id, lang, len(text) AS n_chars, {_TOKS_SQL} AS t FROM documents
),
grams AS (
  SELECT id, n_chars, unnest(
    CASE WHEN len(t) < 2 THEN []
         ELSE list_transform(generate_series(1, len(t) - 1),
              i -> concat_ws(' ', t[i], t[i+1])) END) AS g
  FROM toks
),
occ AS (SELECT id, g, COUNT(*) AS cnt, MAX(n_chars) AS n_chars FROM grams GROUP BY id, g),
agg AS (
  SELECT id, CAST(SUM(cnt) AS BIGINT) AS n_ngrams,
         CAST(SUM(CASE WHEN cnt > 1 THEN cnt ELSE 0 END) AS BIGINT) AS dup_occ,
         MAX(n_chars) AS n_chars
  FROM occ GROUP BY id
),
top AS (
  SELECT id, g, cnt,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY cnt DESC, len(g) DESC, g DESC) AS rn
  FROM occ
),
div AS (
  SELECT id, round(len(list_distinct(t)) / CAST(greatest(len(t), 1) AS DOUBLE), 6) AS diversity,
         lang
  FROM toks
)
SELECT a.id AS doc_id, d.lang, a.n_ngrams,
       round(a.dup_occ / CAST(a.n_ngrams AS DOUBLE), 6) AS dup_ngram_frac,
       t.g AS top_ngram, t.cnt AS top_ngram_count,
       round(t.cnt * len(t.g) / CAST(greatest(a.n_chars, 1) AS DOUBLE), 6) AS top_ngram_char_frac,
       d.diversity,
       CAST(round(a.dup_occ / CAST(a.n_ngrams AS DOUBLE), 6) <= 0.6
            AND round(t.cnt * len(t.g) / CAST(greatest(a.n_chars, 1) AS DOUBLE), 6) <= 0.2
            AND d.diversity >= 0.05 AS INT) AS keep
FROM agg a
JOIN top t ON t.id = a.id AND t.rn = 1
JOIN div d ON d.id = a.id
"""



# ---------------------------------------------------------------------------
# PII scrubbing + deterministic sampling
# ---------------------------------------------------------------------------

def q_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII detection + redaction over the corpus — pure regexp Catalyst
    expressions (no Python, codegen-friendly, zero shuffles).

    The synthetic corpus contains no PII, so the query first plants
    deterministic email/IP/phone strings keyed off doc_id (both engines
    compute the identical augmentation); counts and the redacted length
    then exercise the real patterns.
    """
    from datagrowth_spark.functions import pii as PII

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    aug = F.concat(
        F.col("text"),
        F.when(d % 5 == 0, F.concat(F.lit(" contact user"), d.cast("string"),
                                    F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(d % 7 == 0, F.concat(F.lit(" from 10.0."), (d % 256).cast("string"),
                                    F.lit("."), (d % 100).cast("string"))).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.lit(" call 555-867-5309")).otherwise(F.lit("")),
    )
    base = docs.select("doc_id", aug.alias("aug"))
    counts = PII.pii_counts(F.col("aug"))
    total = counts["email"] + counts["ipv4"] + counts["phone"]
    return base.select(
        "doc_id",
        counts["email"].cast("long").alias("n_emails"),
        counts["ipv4"].cast("long").alias("n_ips"),
        counts["phone"].cast("long").alias("n_phones"),
        (total > 0).cast("int").alias("has_pii"),
        F.length(PII.redact_pii(F.col("aug"))).cast("long").alias("redacted_len"),
    )



def _sql_pii_scan() -> str:
    from datagrowth_spark.functions import pii as PII

    aug = (
        "concat(text,"
        " CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS VARCHAR)"
        " || '@example.com' ELSE '' END,"
        " CASE WHEN doc_id % 7 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR)"
        " || '.' || CAST(doc_id % 100 AS VARCHAR) ELSE '' END,"
        " CASE WHEN doc_id % 11 = 0 THEN ' call 555-867-5309' ELSE '' END)"
    )
    n = {k: f"len(regexp_extract_all(aug, '{p}'))" for k, p in PII.PATTERNS.items()}
    return f"""
WITH aug AS (SELECT doc_id, {aug} AS aug FROM documents)
SELECT doc_id,
       CAST({n['email']} AS BIGINT) AS n_emails,
       CAST({n['ipv4']} AS BIGINT) AS n_ips,
       CAST({n['phone']} AS BIGINT) AS n_phones,
       CAST({n['email']} + {n['ipv4']} + {n['phone']} > 0 AS INT) AS has_pii,
       CAST(length({PII.redact_sql('aug')}) AS BIGINT) AS redacted_len
FROM aug
"""



SQL_PII_SCAN = _sql_pii_scan()



def q_quality_threshold_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language quality-percentile filter: the P25 quality score of
    each language is the cut, documents below it drop. The threshold is
    RANK-based (the value at row ceil(0.25·n) in (score, doc_id) order)
    rather than interpolated, so both engines select the same stored
    value — no cross-engine float interpolation to drift. One window
    over (lang) + one broadcast join of the 5-row threshold frame.
    """
    docs = TX.add_quality_score(
        _t(spark, sf_dir, "documents"), out="q").select(
        "doc_id", "lang", "q")  # q is 6dp-rounded inside the frame form
    w = Window.partitionBy("lang").orderBy("q", "doc_id")
    ranked = docs.withColumn("rn", F.row_number().over(w)).withColumn(
        "k", F.greatest(F.lit(1), F.ceil(F.lit(0.25) * F.count(F.lit(1)).over(Window.partitionBy("lang"))))
    )
    thr = ranked.groupBy("lang").agg(
        F.max(F.when(F.col("rn") == F.col("k"), F.col("q"))).alias("threshold")
    )
    return (
        docs.join(F.broadcast(thr), "lang")
        .groupBy("lang", "threshold")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("q") >= F.col("threshold")).cast("long")).alias("n_kept"),
        )
    )



SQL_QUALITY_THRESHOLD_BY_LANG = f"""
WITH scored AS (
  SELECT d.doc_id, d.lang, q.quality AS q
  FROM documents d JOIN ({SQL_TEXT_QUALITY}) q USING (doc_id)
),
ranked AS (
  SELECT lang, q,
         ROW_NUMBER() OVER (PARTITION BY lang ORDER BY q, doc_id) AS rn,
         GREATEST(1, CEIL(0.25 * COUNT(*) OVER (PARTITION BY lang))) AS k
  FROM scored
),
thr AS (
  SELECT lang, MAX(CASE WHEN rn = k THEN q END) AS threshold FROM ranked GROUP BY lang
)
SELECT s.lang, t.threshold, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN s.q >= t.threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
FROM scored s JOIN thr t USING (lang)
GROUP BY 1, 2
"""



# ---------------------------------------------------------------------------
# Corpus analytics & curation additions (round 4, second pass)
# ---------------------------------------------------------------------------

def q_text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 5-gram novelty — the "how much of this document has
    the corpus already seen" curation signal (the inverse of the
    RefinedWeb/Gopher duplication signals: high novelty = fresh content
    worth keeping, near-zero novelty = recombined boilerplate).

    A gram's "owner" is the smallest doc_id containing it; a document's
    novelty is the fraction of its distinct 5-grams it owns.

    Scale shape: grams shuffle ONCE on a fixed-width md5 key (never the
    variable-length gram text), the first-occurrence table is a
    map-side-combinable min aggregate, and the join back is on the same
    key — AQE co-partitions the two sides, no second full shuffle of
    the exploded frame. Raw text is touched exactly once.
    """
    return DD.ngram_novelty(_t(spark, sf_dir, "documents"), "text", "doc_id", n=5)



SQL_TEXT_NGRAM_NOVELTY = f"""
WITH t AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
g AS (
  SELECT doc_id, md5(gram) AS gh FROM (
    SELECT doc_id, unnest(list_distinct(
      CASE WHEN len(toks) < 5 THEN []
           ELSE list_transform(generate_series(1, len(toks) - 4),
                i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4]))
      END)) AS gram
    FROM t
  )
),
first AS (SELECT gh, MIN(doc_id) AS first_doc FROM g GROUP BY gh)
SELECT doc_id, COUNT(*) AS n_grams,
       CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       round(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS novelty
FROM g JOIN first USING (gh)
GROUP BY doc_id
"""



_BM25_TERMS = ("spark", "join", "window")

_BM25_K1 = 1.2

_BM25_B = 0.75



def q_search_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 keyword search over the corpus (Okapi, k1=1.2, b=0.75):
    top-20 documents for a fixed 3-term query.

    Scale shape: the token explode is filtered to the query terms
    BEFORE any aggregation, so the shuffled frame is |terms|-bounded
    per document, not vocabulary-sized; document lengths come from a
    map-only projection; df and avgdl are term-count / one-row frames
    that broadcast. Per-term scores round to 6dp then sum exactly
    (DECIMAL) so the top-k order is engine-independent; ties break on
    doc_id.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.tokens_col(F.lower(F.col("text"))).alias("toks"))
    lens = toks.select("doc_id", F.size("toks").alias("dl"))
    totals = lens.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    terms = F.array(*[F.lit(t) for t in _BM25_TERMS])
    tf = (
        toks.select(
            "doc_id",
            F.explode(F.filter(F.col("toks"), lambda t: F.array_contains(terms, t))).alias("token"),
        )
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("token").agg(F.count(F.lit(1)).alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5)) / (F.col("df") + F.lit(0.5))
    )
    denom = F.col("tf") + F.lit(_BM25_K1) * (
        F.lit(1.0) - F.lit(_BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl")
    )
    term_score = F.round(idf * F.col("tf") * F.lit(_BM25_K1 + 1.0) / denom, 6)
    return (
        tf.join(F.broadcast(dfreq), "token")
        .join(lens, "doc_id")
        .crossJoin(F.broadcast(totals))
        .select("doc_id", term_score.cast("decimal(20,6)").alias("_ts"))
        .groupBy("doc_id")
        .agg(F.sum("_ts").cast("double").alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(20)
    )



SQL_SEARCH_BM25 = f"""
WITH toks AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
lens AS (SELECT doc_id, len(toks) AS dl FROM toks),
totals AS (
  SELECT COUNT(*) AS n_docs, CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl FROM lens
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM (
    SELECT doc_id, unnest(list_filter(toks, t -> t IN ('spark', 'join', 'window'))) AS token
    FROM toks
  ) GROUP BY 1, 2
),
dfreq AS (SELECT token, COUNT(*) AS df FROM tf GROUP BY 1),
scored AS (
  SELECT tf.doc_id,
         CAST(round(
           ln(1.0 + (t.n_docs - d.df + 0.5) / (d.df + 0.5))
           * tf.tf * {_BM25_K1 + 1.0}
           / (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * l.dl / t.avgdl)),
         6) AS DECIMAL(20,6)) AS ts
  FROM tf JOIN dfreq d USING (token) JOIN lens l ON l.doc_id = tf.doc_id, totals t
)
SELECT doc_id, CAST(SUM(ts) AS DOUBLE) AS score
FROM scored GROUP BY doc_id
ORDER BY score DESC, doc_id ASC
LIMIT 20
"""



def q_text_self_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITHIN-document repetition rewrite: split each document into
    consecutive 8-token blocks, drop every repeat of an
    already-seen-in-this-doc block, and fingerprint the cleaned text —
    the in-doc complement of the cross-doc span rewrite (chatbot loops,
    scraped pagination artifacts, template stutter).

    One shuffle keyed by (doc_id, block) for first-occurrence election,
    one by doc_id for reassembly — both on per-document keys, so the
    plan is embarrassingly document-parallel at any corpus size.
    Reassembly preserves original block order via the position column.
    """
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", TX.tokens_col(F.lower(F.col("text"))).alias("toks")
    ).where(F.size("toks") > 0)  # sequence(0, -1) would run DESCENDING
    nblocks = (F.size("toks") + F.lit(7)) / F.lit(8)
    blocks = toked.select(
        "doc_id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), nblocks.cast("int") - 1),
                lambda i: F.array_join(F.slice(F.col("toks"), i * 8 + 1, 8), " "),
            )
        ).alias("pos", "block"),
    )
    w = Window.partitionBy("doc_id", "block").orderBy("pos")
    firsts = blocks.withColumn("_rn", F.row_number().over(w))
    return (
        firsts.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_blocks"),
            F.sum((F.col("_rn") > 1).cast("int")).alias("n_dropped"),
            F.md5(
                F.encode(
                    F.array_join(
                        F.transform(
                            F.array_sort(
                                F.collect_list(
                                    F.when(F.col("_rn") == 1, F.struct("pos", "block"))
                                )
                            ),
                            lambda s: s["block"],
                        ),
                        " ",
                    ),
                    "utf-8",
                )
            ).alias("cleaned_md5"),
        )
    )



SQL_TEXT_SELF_DEDUP = f"""
WITH toked AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
),
blocks AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(toks, (i - 1) * 8 + 1, (i - 1) * 8 + 8), ' ') AS block
  FROM toked, LATERAL unnest(generate_series(1, CAST(ceil(len(toks) / 8.0) AS INT))) t(i)
  WHERE len(toks) > 0
),
ranked AS (
  SELECT doc_id, pos, block,
         ROW_NUMBER() OVER (PARTITION BY doc_id, block ORDER BY pos) AS rn
  FROM blocks
)
SELECT doc_id, COUNT(*) AS n_blocks,
       CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dropped,
       md5(string_agg(CASE WHEN rn = 1 THEN block END, ' ' ORDER BY pos)) AS cleaned_md5
FROM ranked
GROUP BY doc_id
"""



def q_text_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-distribution Shannon entropy per document — the
    gibberish/base64-blob detector (natural language sits ~4 bits/char;
    random alphanumerics ~5.9; single-char runs ~0).

    Map-only per document, O(n log n) in-row: sort the char array once,
    find run boundaries (one pass of element_at comparisons), and read
    the histogram off the run lengths — no explode-shuffle of one row
    per character, and no O(distinct × len) re-scan per distinct char
    (the first cut did exactly that and was the slowest query in the
    bench at 8.4 s; this shape runs ~0.7 s). Entropy contributions
    round to 6dp then sum exactly as decimals so engines agree.
    """
    docs = _t(spark, sf_dir, "documents")
    chars = F.array_sort(F.split(F.col("text"), ""))
    # Filter on length(text), not size(split): Spark splits "" into [""]
    # (size 1), so a size guard would smuggle empty documents in while
    # the oracle's len(text) > 0 excludes them (caught by the
    # adversarial-input suite; the fixtures have no empty docs).
    base = docs.where(F.length("text") > 0).select(
        "doc_id", chars.alias("cs"), F.size(chars).alias("n")
    )
    # run starts: 1-based indices where the sorted array changes value
    starts = F.filter(
        F.sequence(F.lit(1), F.col("n")),
        lambda i: (i == 1)
        | (F.element_at(F.col("cs"), i) != F.element_at(F.col("cs"), i - 1)),
    )
    with_runs = base.select("doc_id", "n", starts.alias("starts"))
    # run length k = next start − this start (last run ends at n+1)
    run_lens = F.zip_with(
        F.col("starts"),
        F.concat(F.slice(F.col("starts"), 2, F.size(F.col("starts"))), F.array(F.col("n") + 1)),
        lambda a, b: b - a,
    )
    contrib = F.transform(
        run_lens,
        lambda k: F.round(
            -(k / F.col("n")) * F.log2(k / F.col("n")), 6
        ).cast("decimal(20,6)"),
    )
    return with_runs.select(
        "doc_id",
        F.col("n").cast("long").alias("n_chars_tok"),
        F.size("starts").cast("long").alias("n_distinct_chars"),
        F.aggregate(
            contrib, F.lit(0).cast("decimal(28,6)"),
            lambda a, x: (a + x).cast("decimal(28,6)"),
        ).cast("double").alias("char_entropy"),
    )



SQL_TEXT_CHAR_ENTROPY = """
WITH chars AS (
  SELECT doc_id, string_split(text, '') AS cs FROM documents WHERE len(text) > 0
),
contrib AS (
  SELECT doc_id, len(cs) AS n, len(list_distinct(cs)) AS nd,
         list_transform(
           list_distinct(cs),
           c -> CAST(round(
                  -(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / len(cs))
                  * log2(CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE) / len(cs)),
                6) AS DECIMAL(20,6))
         ) AS parts
  FROM chars
)
SELECT doc_id, CAST(n AS BIGINT) AS n_chars_tok, CAST(nd AS BIGINT) AS n_distinct_chars,
       CAST(list_sum(parts) AS DOUBLE) AS char_entropy
FROM contrib
"""



# ---------------------------------------------------------------------------
# Round 6, second pass: crawl governance / sparse fingerprints / drift
# ---------------------------------------------------------------------------

# Synthetic raw-URL column (both engines build the identical string from
# doc_id/source arithmetic): scheme case, host case, a leading www., a
# default :80, unsorted params and a fragment all vary so that multiple
# raw forms collapse onto one canonical URI.
_RAW_URL_SQL = """
  (CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || '://' ||
  (CASE WHEN doc_id % 3 = 0 THEN 'WWW.' || upper(source) || '.Example.COM'
        ELSE source || '.example.com' END) ||
  (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE '' END) ||
  '/p/' || CAST(doc_id % 7 AS VARCHAR) ||
  (CASE WHEN doc_id % 5 > 0
        THEN '?b=' || CAST(doc_id % 5 AS VARCHAR) || '&a=' || CAST(doc_id % 7 AS VARCHAR)
        ELSE '' END) ||
  (CASE WHEN doc_id % 4 = 0 THEN '#sec' ELSE '' END)
"""



def q_url_canonicalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization + per-URI rollup — the reference's
    ``uri_from_url`` cache-key normalization
    (``datagrowth/resources/http/generic.py:631-642``: strip protocol,
    sort query params) lifted to a corpus-scale relational operator,
    extended with the standard crawl rules (host lowercase, ``www.``
    and default-port strip, fragment drop). The canonicalization is a
    map-only whole-stage-codegen projection (functions/urls.py — string
    and array built-ins only, zero Python, zero shuffle); the rollup is
    one hash aggregate, so at 100 TB the query is scan-bound. Raw URLs
    are synthesized from doc arithmetic so several raw variants provably
    collapse per URI."""
    from datagrowth_spark.functions.urls import canonical_host, canonical_uri

    docs = _t(spark, sf_dir, "documents")
    d = F.col("doc_id")
    url = F.concat(
        F.when(d % 2 == 0, F.lit("HTTP")).otherwise(F.lit("https")), F.lit("://"),
        F.when(d % 3 == 0,
               F.concat(F.lit("WWW."), F.upper("source"), F.lit(".Example.COM")))
         .otherwise(F.concat(F.col("source"), F.lit(".example.com"))),
        F.when(d % 2 == 0, F.lit(":80")).otherwise(F.lit("")),
        F.lit("/p/"), (d % 7).cast("string"),
        F.when(d % 5 > 0,
               F.concat(F.lit("?b="), (d % 5).cast("string"),
                        F.lit("&a="), (d % 7).cast("string")))
         .otherwise(F.lit("")),
        F.when(d % 4 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )
    urls = docs.select("doc_id", url.alias("url"))
    canon = urls.select(
        "doc_id", "url",
        canonical_uri("url").alias("uri"),
        canonical_host("url").alias("host"),
    )
    return canon.groupBy("uri", "host").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("url").alias("n_raw_forms"),
        F.min("doc_id").alias("min_doc_id"),
    )



SQL_URL_CANONICALIZE = f"""
WITH u AS (SELECT doc_id, {_RAW_URL_SQL} AS url FROM documents),
p AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.\\-]*)://', 1)) AS scheme,
         regexp_replace(regexp_replace(url, '^[A-Za-z][A-Za-z0-9+.\\-]*://', ''),
                        '#.*$', '') AS defragged
  FROM u),
q AS (
  -- query = everything after the FIRST '?' (mirrors functions/urls.py)
  SELECT *, split_part(defragged, '?', 1) AS auth_path,
         CASE WHEN contains(defragged, '?')
              THEN substr(defragged, length(split_part(defragged, '?', 1)) + 2)
              ELSE '' END AS raw_query
  FROM p),
r AS (
  -- userinfo stripped before host/port handling
  SELECT *, lower(regexp_replace(split_part(auth_path, '/', 1),
                                 '^[^@]*@', '')) AS host_port,
         substr(auth_path, length(split_part(auth_path, '/', 1)) + 1) AS path
  FROM q),
s AS (
  -- port = trailing ':digits' only (IPv6 brackets stay in the host)
  SELECT *, regexp_replace(host_port, ':[0-9]+$', '') AS hostname,
         regexp_extract(host_port, ':([0-9]+)$', 1) AS port
  FROM r),
v AS (
  SELECT doc_id, url,
         CASE WHEN hostname LIKE 'www.%' THEN substr(hostname, 5)
              ELSE hostname END AS norm_host,
         CASE WHEN (scheme = 'http' AND port = '80')
                OR (scheme = 'https' AND port = '443') OR port = ''
              THEN '' ELSE ':' || port END AS norm_port,
         CASE WHEN path = '' THEN '/' ELSE path END AS norm_path,
         -- array_to_string([]) is NULL in DuckDB ('' in Spark): coalesce
         coalesce(array_to_string(list_sort(list_filter(string_split(raw_query, '&'),
                                                        x -> x <> '')), '&'),
                  '') AS sorted_query
  FROM s)
SELECT norm_host || norm_port || norm_path ||
         (CASE WHEN sorted_query = '' THEN '' ELSE '?' || sorted_query END) AS uri,
       norm_host AS host,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT url) AS BIGINT) AS n_raw_forms,
       MIN(doc_id) AS min_doc_id
FROM v
GROUP BY 1, 2
"""



def q_text_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) sparse fingerprints per document: the minimum
    3-gram hash of every sliding window of 4 grams, deduplicated — the
    classic recall-guaranteed sparse alternative to full shingle sets
    (any shared 6-token run is caught; expected density 2/(w+1)).
    Entirely in-row (functions/text.py ``winnow_fingerprints``):
    fingerprinting is a map-only projection, zero shuffle, zero Python —
    the selection dial full-shingle schemes (``dedup_ngram_jaccard``)
    lack at 100 TB."""
    docs = _t(spark, sf_dir, "documents")
    toked = docs.select(
        "doc_id", TX.tokens_col(F.lower(F.col("text"))).alias("toks"))
    grammed = toked.select(
        "doc_id",
        F.transform(TX.shingles_from_tokens(F.col("toks"), 3),
                    lambda s: F.md5(F.encode(s, "utf-8"))).alias("grams"))
    fps = grammed.select(
        "doc_id", F.size("grams").alias("n_grams"),
        TX.winnow_fingerprints(F.col("grams"), 4).alias("fps"))
    return fps.select(
        "doc_id",
        F.col("n_grams").cast("long").alias("n_grams"),
        F.size("fps").cast("long").alias("n_fingerprints"),
        F.when(F.size("fps") > 0, F.element_at("fps", 1)).alias("fp_min"),
    )


SQL_TEXT_WINNOW_FINGERPRINTS = f"""
WITH {_WINNOW_CTES}
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(len(list_distinct(mins)) AS BIGINT) AS n_fingerprints,
       list_sort(list_distinct(mins))[1] AS fp_min
FROM w
"""



def q_boilerplate_prefixes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style leading-boilerplate detection: documents sharing their
    first two normalized tokens with other documents (prefix document
    frequency) get flagged — the cheap screen that catches cookie
    banners / nav headers repeated across a crawl.

    Scale shape: one shuffle on the (short, fixed-width) prefix string
    for the window count; no joins, no distinct over a hot key.
    """
    docs = _t(spark, sf_dir, "documents")
    pref = docs.select(
        "doc_id",
        F.array_join(F.slice(TX.normalized_tokens(F.col("text")), 1, 2), " ")
        .alias("prefix"))
    w = Window.partitionBy("prefix")
    return (
        pref.withColumn("prefix_docs", F.count(F.lit(1)).over(w))
        .select("doc_id", "prefix", "prefix_docs",
                (F.col("prefix_docs") >= 2).alias("is_boilerplate"))
        .orderBy("doc_id")
    )



SQL_BOILERPLATE_PREFIXES = f"""
WITH t AS (SELECT doc_id, {_NORM_TOKS_SQL} AS toks FROM documents),
p AS (
  SELECT doc_id, coalesce(array_to_string(toks[1:2], ' '), '') AS prefix
  FROM t
),
c AS (
  SELECT doc_id, prefix,
         COUNT(*) OVER (PARTITION BY prefix) AS prefix_docs
  FROM p
)
SELECT doc_id, prefix, CAST(prefix_docs AS BIGINT) AS prefix_docs,
       prefix_docs >= 2 AS is_boilerplate
FROM c ORDER BY doc_id
"""



def q_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style rule bundle (Rae et al. 2021 §A1.1, simplified to
    the SQL-expressible core): per document — word count bounds, mean
    word length bounds, alphabetic-character ratio, and a stopword-hit
    minimum; ``keep`` is the conjunction. Pure Catalyst, zero shuffles
    beyond the final deterministic sort.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"),
                    lambda t: t != F.lit(""))
    n_words = F.size("toks")
    char_sum = F.aggregate("toks", F.lit(0),
                           lambda acc, t: acc + F.length(t))
    mean_len = F.round(char_sum.cast("double") / n_words, 6)
    alpha_chars = F.length(
        F.regexp_replace(F.lower(F.col("text")), "[^a-z ]", ""))
    alpha_ratio = F.round(
        alpha_chars.cast("double") / F.length("text"), 6)
    stops = F.array(*[F.lit(s) for s in
                      ("the", "be", "to", "of", "and", "a", "in", "that")])
    stop_hits = F.size(F.array_intersect(F.array_distinct(F.col("toks")),
                                         stops))
    out = (
        docs.where(F.length("text") > 0)
        .select("doc_id", "text", toks.alias("toks"))
        .select(
            "doc_id",
            n_words.cast("long").alias("n_words"),
            mean_len.alias("mean_word_len"),
            alpha_ratio.alias("alpha_ratio"),
            stop_hits.cast("long").alias("stop_hits"))
    )
    keep = ((F.col("n_words") >= 50) & (F.col("n_words") <= 100000)
            & (F.col("mean_word_len") >= 3) & (F.col("mean_word_len") <= 10)
            & (F.col("alpha_ratio") >= 0.8) & (F.col("stop_hits") >= 2))
    return out.withColumn("keep", keep).orderBy("doc_id")



SQL_GOPHER_QUALITY_RULES = f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS_SQL} AS toks FROM documents
  WHERE len(text) > 0
),
m AS (
  SELECT doc_id,
         CAST(len(toks) AS BIGINT) AS n_words,
         round(CAST(list_sum(list_transform(toks, x -> len(x))) AS DOUBLE)
               / len(toks), 6) AS mean_word_len,
         round(CAST(len(regexp_replace(lower(text), '[^a-z ]', '', 'g'))
                    AS DOUBLE) / len(text), 6) AS alpha_ratio,
         CAST(len(list_intersect(list_distinct(toks),
              ['the', 'be', 'to', 'of', 'and', 'a', 'in', 'that']))
              AS BIGINT) AS stop_hits
  FROM t
)
SELECT doc_id, n_words, mean_word_len, alpha_ratio, stop_hits,
       (n_words >= 50 AND n_words <= 100000
        AND mean_word_len >= 3 AND mean_word_len <= 10
        AND alpha_ratio >= 0.8 AND stop_hits >= 2) AS keep
FROM m ORDER BY doc_id
"""



def q_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet's head/middle/tail corpus bucketing: score every document
    with the in-corpus unigram LM, cut the corpus into 3 exact
    perplexity terciles, and report each bucket's size and score range
    — the aggregate that drives CCNet's per-bucket sampling rates.

    The tercile is the SHARDED exact ntile (operators/ranking.py), not
    a single-partition NTILE window; (avg_logprob DESC, doc_id) is a
    total order so the oracle's global NTILE reproduces it exactly.
    """
    from datagrowth_spark.operators.ranking import add_ntile

    scored = _persist(q_quality_unigram_lm(spark, sf_dir))
    tiled = add_ntile(scored, 3, "avg_logprob", ("doc_id",),
                      descending=True, out="bucket")
    return (
        tiled.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.max("avg_logprob").alias("best_logprob"),
             F.min("avg_logprob").alias("worst_logprob"))
        .select(F.col("bucket").cast("int").alias("bucket"),
                "n_docs", "best_logprob", "worst_logprob")
        .orderBy("bucket")
    )



SQL_CCNET_PERPLEXITY_BUCKETS = f"""
WITH scored AS ({SQL_QUALITY_UNIGRAM_LM}),
tiled AS (
  SELECT doc_id, avg_logprob,
         NTILE(3) OVER (ORDER BY avg_logprob DESC, doc_id) AS bucket
  FROM scored
)
SELECT CAST(bucket AS INT) AS bucket, CAST(COUNT(*) AS BIGINT) AS n_docs,
       MAX(avg_logprob) AS best_logprob, MIN(avg_logprob) AS worst_logprob
FROM tiled GROUP BY bucket ORDER BY bucket
"""

