"""Trainer query family.

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
from datagrowth_spark.queries._shared import _NORM_TOKS_SQL, _SQL_SPLIT_CTES, _TOKS_SQL, _leakage_safe_split_frame, _t  # noqa: E501



def q_bpe_pair_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The first BPE merge iteration: collapse the corpus to word
    frequencies (one shuffle over the word distribution — tiny after
    map-side combine), then count adjacent character pairs weighted by
    word frequency. Two hash aggregates, zero Python; at 100 TB the
    second aggregate's input is the VOCABULARY (millions of rows), not
    the corpus, which is why BPE training factors through word counts.
    Full deterministic top-k tiebreak.
    """
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(F.explode(TX.normalized_tokens(F.col("text"))).alias("w"))
    wf = words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    pairs = wf.where(F.length("w") >= 2).select(
        F.explode(TX.char_pairs(F.col("w"))).alias("pair"), "freq"
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("freq").alias("pair_count"))
        .orderBy(F.desc("pair_count"), F.asc("pair"))
        .limit(50)
    )



SQL_BPE_PAIR_COUNTS = f"""
WITH words AS (
  SELECT unnest({_NORM_TOKS_SQL}) AS w FROM documents
),
wf AS (
  SELECT w, COUNT(*) AS freq FROM words GROUP BY w
),
pairs AS (
  SELECT substr(w, CAST(g.i AS INT), 2) AS pair, freq
  FROM wf, LATERAL unnest(generate_series(1, len(w) - 1)) AS g(i)
  WHERE len(w) >= 2
)
SELECT pair, CAST(SUM(freq) AS BIGINT) AS pair_count
FROM pairs GROUP BY pair
ORDER BY pair_count DESC, pair ASC
LIMIT 50
"""



_BPE_K = 3  # merge rounds the oracle unrolls



def _bpe_word_freq(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(F.explode(TX.normalized_tokens(F.col("text"))).alias("w"))
    return words.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))



def q_bpe_trainer_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative BPE trainer (r7 verdict item 3): run ``_BPE_K`` full
    merge rounds — pair count, deterministic top-pair pick
    (count DESC, symbols ASC), greedy left-to-right rewrite of every
    word's symbol sequence — and emit the merge table. The rewrite is
    pure Catalyst (a literal ``replace`` on a separator-encoded symbol
    string, see operators/bpe.py); each round costs one vocabulary-
    sized pair aggregate plus a 1-row driver collect, flat in the round
    number. The oracle unrolls the same three rounds as DuckDB CTEs."""
    from datagrowth_spark.operators import bpe as BPE

    res = BPE.bpe_train(_bpe_word_freq(spark, sf_dir), k=_BPE_K)
    for _c in res.caches:
        _register_cache(_c)
    return res.merges



def q_bpe_trainer_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Final symbol vocabulary after the ``_BPE_K`` BPE merge rounds of
    ``bpe_trainer_merges``: word-frequency-weighted counts of every
    symbol in the trained segmentation, top 100 with a full
    deterministic tiebreak."""
    from datagrowth_spark.operators import bpe as BPE

    res = BPE.bpe_train(_bpe_word_freq(spark, sf_dir), k=_BPE_K)
    for _c in res.caches:
        _register_cache(_c)
    return (res.vocab
            .orderBy(F.desc("freq"), F.asc("symbol"))
            .limit(100))



def _bpe_rounds_sql(k: int) -> str:
    """Shared unrolled-CTE prefix: r0 (char symbols) .. r<k>, with p<i>
    the round-i winning pair. Symbol sequences are separator-encoded
    strings and the merge is a literal replace — byte-for-byte the
    operator's formulation (operators/bpe.py), so greedy non-overlap
    and boundary anchoring match exactly."""
    parts = [f"""
WITH words AS (
  SELECT unnest({_NORM_TOKS_SQL}) AS w FROM documents
),
wf AS (
  SELECT w, COUNT(*) AS freq FROM words GROUP BY w
),
r0 AS (
  -- 'gs' mirrors the operator's (?s) DOTALL (ADVICE r8): '.' must match
  -- every character, newlines included, so no byte escapes the encoding.
  SELECT w, regexp_replace(w, '(.)', chr(31) || '\\1' || chr(31), 'gs') AS repr, freq FROM wf
)"""]
    for i in range(1, k + 1):
        parts.append(f""",
s{i} AS (
  SELECT string_split(substr(repr, 2, length(repr) - 2), chr(31) || chr(31)) AS syms, freq
  FROM r{i - 1}
),
pairs{i} AS (
  SELECT syms[CAST(g.i AS INT)] AS l, syms[CAST(g.i AS INT) + 1] AS r, freq
  FROM s{i}, LATERAL unnest(generate_series(1, len(syms) - 1)) AS g(i)
),
p{i} AS (
  SELECT l, r, CAST(SUM(freq) AS BIGINT) AS c
  FROM pairs{i} GROUP BY l, r
  ORDER BY c DESC, l ASC, r ASC LIMIT 1
),
r{i} AS (
  -- LEFT JOIN (ADVICE r8): an empty p{i} (corpus fully merged before
  -- round {i}) must pass words through unchanged, matching the Spark
  -- trainer's early stop — a cross join would empty every later CTE.
  SELECT w,
         CASE WHEN p{i}.l IS NULL THEN repr
              ELSE replace(repr,
                           chr(31) || p{i}.l || chr(31) || chr(31) || p{i}.r || chr(31),
                           chr(31) || p{i}.l || p{i}.r || chr(31))
         END AS repr,
         freq
  FROM r{i - 1} LEFT JOIN p{i} ON TRUE
)""")
    return "".join(parts)



SQL_BPE_TRAINER_MERGES = _bpe_rounds_sql(_BPE_K) + "\n" + "\nUNION ALL\n".join(
    f"SELECT {i} AS step, l AS lhs, r AS rhs, l || r AS merged, c AS pair_count FROM p{i}"
    for i in range(1, _BPE_K + 1)
)



def q_bpe_encode_lengths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer apply (train -> encode round trip): train the
    ``_BPE_K``-merge table, then ENCODE the corpus with
    ``operators.bpe.bpe_encode`` — merge-replay as chained literal
    replaces over the DISTINCT word vocabulary (vocabulary-sized work;
    the corpus only pays a word join) — and report each document's
    word and BPE-token counts. The oracle replays the same rounds in
    CTEs and joins the per-word symbol lengths back to the exploded
    corpus."""
    from datagrowth_spark.operators import bpe as BPE

    res = BPE.bpe_train(_bpe_word_freq(spark, sf_dir), k=_BPE_K)
    for _c in res.caches:
        _register_cache(_c)
    merge_list = [(r["lhs"], r["rhs"]) for r in res.merges.collect()]
    docs = _t(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id", F.explode(TX.normalized_tokens(F.col("text"))).alias("w"))
    wlen = BPE.bpe_encode(doc_words.select("w").distinct(), merge_list) \
        .select("w", F.size("syms").alias("n_sym"))
    return (doc_words.join(F.broadcast(wlen), "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sym").alias("bpe_tokens")))



SQL_BPE_ENCODE_LENGTHS = _bpe_rounds_sql(_BPE_K) + f""",
wlen AS (
  SELECT w, len(string_split(substr(repr, 2, length(repr) - 2), chr(31) || chr(31))) AS n_sym
  FROM r{_BPE_K}
),
docw AS (
  SELECT doc_id, unnest({_NORM_TOKS_SQL}) AS w FROM documents
)
SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_sym) AS BIGINT) AS bpe_tokens
FROM docw JOIN wlen USING (w)
GROUP BY doc_id
"""



def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer quality evaluation: per-language FERTILITY
    (subword tokens per word) and compression (chars per token) of the
    trained ``_BPE_K``-merge BPE tokenizer — the standard metrics for
    comparing tokenizers across languages (a language with fertility
    ≫ 1 is under-served by the vocabulary). Same vocabulary-sized
    encode as ``bpe_encode_lengths`` (distinct words, broadcast
    join-back); the rollup is language-cardinality-sized."""
    from datagrowth_spark.operators import bpe as BPE

    res = BPE.bpe_train(_bpe_word_freq(spark, sf_dir), k=_BPE_K)
    for _c in res.caches:
        _register_cache(_c)
    merge_list = [(r["lhs"], r["rhs"]) for r in res.merges.collect()]
    docs = _t(spark, sf_dir, "documents")
    doc_words = docs.select(
        "lang", F.explode(TX.normalized_tokens(F.col("text"))).alias("w"))
    wstat = BPE.bpe_encode(doc_words.select("w").distinct(), merge_list) \
        .select("w", F.size("syms").alias("n_sym"),
                F.length("w").alias("n_chars"))
    return (doc_words.join(F.broadcast(wstat), "w")
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sym").alias("n_tokens"),
                 F.sum("n_chars").alias("n_chars"),
                 F.round(F.sum("n_sym").cast("double")
                         / F.count(F.lit(1)), 6).alias("fertility"),
                 F.round(F.sum("n_chars").cast("double")
                         / F.sum("n_sym"), 6).alias("chars_per_token")))



SQL_TOKENIZER_FERTILITY = _bpe_rounds_sql(_BPE_K) + f""",
wlen AS (
  SELECT w,
         len(string_split(substr(repr, 2, length(repr) - 2), chr(31) || chr(31))) AS n_sym,
         length(w) AS n_chars
  FROM r{_BPE_K}
),
docw AS (
  SELECT lang, unnest({_NORM_TOKS_SQL}) AS w FROM documents
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(n_sym) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       round(CAST(SUM(n_sym) AS DOUBLE) / COUNT(*), 6) AS fertility,
       round(CAST(SUM(n_chars) AS DOUBLE) / SUM(n_sym), 6) AS chars_per_token
FROM docw JOIN wlen USING (w)
GROUP BY lang
"""



_WP_K = 3  # WordPiece merge rounds the oracle unrolls



def q_wordpiece_trainer_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WordPiece trainer (likelihood-scored merges): run ``_WP_K``
    rounds picking the pair that maximizes
    ``count(l,r) / (count(l) * count(r))`` — the BERT-tokenizer merge
    criterion — over ``##``-continuation symbols, and emit the merge
    table with each round's pair count and 6dp score. Same flat
    per-round cost as the BPE trainer (operators/bpe.py): two
    vocabulary-sized aggregates + a 1-row collect per round, merge
    rewrite as a pure-Catalyst literal replace. The oracle unrolls the
    same three rounds as DuckDB CTEs with IEEE-identical score
    arithmetic."""
    from datagrowth_spark.operators import bpe as BPE

    res = BPE.wordpiece_train(_bpe_word_freq(spark, sf_dir), k=_WP_K)
    for _c in res.caches:
        _register_cache(_c)
    return res.merges



def _wordpiece_rounds_sql(k: int) -> str:
    """Unrolled-CTE prefix for the WordPiece trainer: r0 (first char
    bare, later chars ##-prefixed, separator-encoded) .. r<k>, with
    p<i> the round-i winning pair by likelihood score. Byte-for-byte
    the operator's formulation (operators/bpe.py wordpiece_train)."""
    parts = [f"""
WITH words AS (
  SELECT unnest({_NORM_TOKS_SQL}) AS w FROM documents
),
wf AS (
  SELECT w, COUNT(*) AS freq FROM words GROUP BY w
),
wpfull AS (
  -- every char ##-prefixed and separator-wrapped; 'gs' = the
  -- operator's (?s) DOTALL
  SELECT w, regexp_replace(w, '(.)', chr(31) || '##' || '\\1' || chr(31), 'gs') AS fullr, freq
  FROM wf WHERE len(w) > 0 AND w NOT LIKE '%#%'
),
r0 AS (
  -- drop the first symbol's '##' (bytes 2-3 of the encoding): first
  -- char bare, continuations keep the prefix
  SELECT w, chr(31) || substr(fullr, 4) AS repr, freq FROM wpfull
)"""]
    for i in range(1, k + 1):
        parts.append(f""",
s{i} AS (
  SELECT string_split(substr(repr, 2, length(repr) - 2), chr(31) || chr(31)) AS syms, freq
  FROM r{i - 1}
),
u{i} AS (
  SELECT s, SUM(freq) AS uc
  FROM (SELECT unnest(syms) AS s, freq FROM s{i}) GROUP BY s
),
pc{i} AS (
  SELECT syms[CAST(g.i AS INT)] AS l, syms[CAST(g.i AS INT) + 1] AS r,
         CAST(SUM(freq) AS BIGINT) AS c
  FROM s{i}, LATERAL unnest(generate_series(1, len(syms) - 1)) AS g(i)
  GROUP BY 1, 2
),
p{i} AS (
  -- likelihood score in the operator's exact IEEE op order:
  -- double(c) / (double(c_l) * double(c_r))
  SELECT pc.l AS l, pc.r AS r, pc.c AS c,
         CAST(pc.c AS DOUBLE) / (CAST(ul.uc AS DOUBLE) * CAST(ur.uc AS DOUBLE)) AS score,
         pc.l || CASE WHEN pc.r LIKE '##%' THEN substr(pc.r, 3) ELSE pc.r END AS merged
  FROM pc{i} pc
  JOIN u{i} ul ON pc.l = ul.s
  JOIN u{i} ur ON pc.r = ur.s
  ORDER BY score DESC, pc.l ASC, pc.r ASC LIMIT 1
),
r{i} AS (
  SELECT w,
         CASE WHEN p{i}.l IS NULL THEN repr
              ELSE replace(repr,
                           chr(31) || p{i}.l || chr(31) || chr(31) || p{i}.r || chr(31),
                           chr(31) || p{i}.merged || chr(31))
         END AS repr,
         freq
  FROM r{i - 1} LEFT JOIN p{i} ON TRUE
)""")
    return "".join(parts)



SQL_WORDPIECE_TRAINER_MERGES = _wordpiece_rounds_sql(_WP_K) + "\n" + "\nUNION ALL\n".join(
    f"SELECT {i} AS step, l AS lhs, r AS rhs, merged, c AS pair_count, "
    f"round(score, 6) AS score FROM p{i}"
    for i in range(1, _WP_K + 1)
)



_DSIR_BUCKETS = 1024



def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance resampling scores (Xie et al. 2023): hashed-
    unigram feature model, target = the 'en' subset, raw = the whole
    corpus; per-document importance = average per-token smoothed
    log-likelihood ratio, top-50 with a full deterministic tiebreak.
    Both feature distributions are 1024-row broadcast dims — the
    corpus shuffles once, on (doc, bucket)."""
    from datagrowth_spark.operators.sampling import dsir_importance

    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.explode(TX.normalized_tokens(F.col("text"))).alias("token"))
    scored = dsir_importance(toks, F.col("lang") == "en",
                             n_buckets=_DSIR_BUCKETS)
    return (scored.orderBy(F.desc("importance"), F.asc("doc_id"))
            .limit(50))



SQL_DSIR_IMPORTANCE = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({_NORM_TOKS_SQL}) AS token FROM documents
),
bucketed AS (
  SELECT doc_id,
         CAST(('0x' || substr(md5(token), 1, 8)) AS BIGINT) % {_DSIR_BUCKETS} AS bucket,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS t
  FROM toks
),
per_doc AS (
  SELECT doc_id, bucket, COUNT(*) AS tf FROM bucketed GROUP BY 1, 2
),
dist AS (
  SELECT bucket, SUM(t) AS c_t, COUNT(*) AS c_r FROM bucketed GROUP BY 1
),
totals AS (SELECT SUM(c_t) AS n_t, SUM(c_r) AS n_r FROM dist),
llr AS (
  SELECT bucket,
         CAST(round(ln((c_t + 1) / CAST(n_t + {_DSIR_BUCKETS} AS DOUBLE))
                    - ln((c_r + 1) / CAST(n_r + {_DSIR_BUCKETS} AS DOUBLE)), 6)
              AS DECIMAL(20,6)) AS llr
  FROM dist, totals
)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       round(CAST(SUM(tf * llr) AS DOUBLE) / SUM(tf), 6) AS importance
FROM per_doc JOIN llr USING (bucket)
GROUP BY doc_id
ORDER BY importance DESC, doc_id ASC
LIMIT 50
"""



SQL_BPE_TRAINER_VOCAB = _bpe_rounds_sql(_BPE_K) + f""",
final_syms AS (
  SELECT string_split(substr(repr, 2, length(repr) - 2), chr(31) || chr(31)) AS syms, freq
  FROM r{_BPE_K}
)
SELECT symbol, CAST(SUM(freq) AS BIGINT) AS freq
FROM (SELECT unnest(syms) AS symbol, freq FROM final_syms)
GROUP BY symbol
ORDER BY freq DESC, symbol ASC
LIMIT 100
"""



_UNI_K = 2        # EM rounds the oracle unrolls

_UNI_MULTI = 300  # multi-char seed-vocab cap

_UNI_MAXP = 4

_UNI_MAXW = 16



def _uni_train_result(spark: SparkSession, sf_dir: str):
    from datagrowth_spark.operators.unigram import unigram_train

    res = unigram_train(_bpe_word_freq(spark, sf_dir), k=_UNI_K,
                        vocab_multi=_UNI_MULTI, maxp=_UNI_MAXP,
                        maxw=_UNI_MAXW)
    for _c in res.caches:
        _register_cache(_c)
    return res



def q_unigram_lm_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM (SentencePiece-style) tokenizer trainer (r8 verdict
    item 4 — the EM complement to ``bpe_trainer_merges``): seed vocab
    from substring counts, then ``_UNI_K`` EM rounds — E: Viterbi-
    segment the distinct-word table under current integer micro-log
    scores (a pure Catalyst fold, zero joins/shuffles); M: one
    vocab-sized piece-count aggregate + model-sized driver collect.
    The DuckDB oracle replays both rounds exactly (unrolled DP +
    smallest-piece-first backtrack CTE chains). Output: pieces of the
    final segmentation with counts and re-estimated log-probs."""
    res = _uni_train_result(spark, sf_dir)
    return (res.pieces_df(spark)
            .orderBy(F.desc("cnt"), F.asc("piece"))
            .limit(100))



def q_unigram_lm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-apply half of ``unigram_lm_pieces``: Viterbi-segment
    the 50 most frequent training words under the final trained model
    — the segmentation the oracle reconstructs with the same fixed
    smallest-piece-first backtrack rule."""
    from datagrowth_spark.operators.unigram import unigram_train  # noqa: F401

    res = _uni_train_result(spark, sf_dir)
    base = res.caches[0]
    top = (base.orderBy(F.desc("freq"), F.asc("w")).limit(50))
    return (res.segment(top)
            .select("w", F.col("freq").cast("long").alias("freq"),
                    F.array_join("pieces", " ").alias("seg")))



def q_unigram_lm_segments_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unigram_lm_segments`` with the candidate-JOIN E-step forced
    on end-to-end (r9 verdict item 1): every training round and the
    final segmentation broadcast-HASH-join the (piece, score) frame
    against the once-built (word, start, plen) candidate layout and
    Viterbi-fold over DENSE per-word score arrays (O(1) array
    lookups) — the plan shape a real 32k–250k sentencepiece vocab
    requires, because map-column lookups are linear scans (measured
    r10, see the unigram/classifier module docstrings). The integer
    DP is identical on both paths, so this shares
    ``unigram_lm_segments``'s oracle verbatim. (The forced flag is
    what keeps this JVM join plan pinned: auto selection at this
    vocab size — 228 pieces ≤ MAP_BCAST_THRESHOLD — takes the literal
    map, and auto for large vocabs takes the r12 Arrow carrier, so
    no default-path query exercises the join E-step.)"""
    from datagrowth_spark.operators.unigram import unigram_train

    res = unigram_train(_bpe_word_freq(spark, sf_dir), k=_UNI_K,
                        vocab_multi=_UNI_MULTI, maxp=_UNI_MAXP,
                        maxw=_UNI_MAXW, use_broadcast=True)
    for _c in res.caches:
        _register_cache(_c)
    base = res.caches[0]
    top = (base.orderBy(F.desc("freq"), F.asc("w")).limit(50))
    return (res.segment(top, use_broadcast=True)
            .select("w", F.col("freq").cast("long").alias("freq"),
                    F.array_join("pieces", " ").alias("seg")))



def _uni_dp_sql(tag: str, prev_scores: str) -> str:
    """One Viterbi chain (forward DP + backtrack) as chained CTEs:
    ``mp{tag}`` (score map), ``d{tag}_0..MAXW``, ``bt{tag}_0..MAXW`` —
    the exact SQL mirror of operators/unigram.py ``_forward`` /
    ``_backtrack`` (max over exact integer path sums; reconstruction
    takes the smallest piece length achieving the optimum)."""
    P, W = _UNI_MAXP, _UNI_MAXW
    parts = [f""",
mp{tag} AS (
  SELECT map_from_entries(list(struct_pack(k := piece, v := s6))) AS pm
  FROM {prev_scores}
),
d{tag}_0 AS (
  SELECT w, freq, pm, [CAST(0 AS BIGINT)] AS bests
  FROM words CROSS JOIN mp{tag}
)"""]
    for i in range(1, W + 1):
        cands = []
        for p in range(1, min(P, i) + 1):
            start = i - p + 1
            cands.append(
                f"bests[{start}] + map_extract(pm, substr(w, {start}, {p}))[1]")
        best = cands[0] if len(cands) == 1 else \
            "greatest(" + ", ".join(cands) + ")"
        parts.append(f""",
d{tag}_{i} AS (
  SELECT w, freq, pm,
         bests || [CASE WHEN {i} <= len(w) THEN {best} END] AS bests
  FROM d{tag}_{i - 1}
)""")
    parts.append(f""",
bt{tag}_0 AS (
  SELECT w, freq, pm, bests, len(w) AS pos, CAST([] AS VARCHAR[]) AS pieces
  FROM d{tag}_{W}
)""")
    arms = []
    for p in range(1, P + 1):
        v = f"map_extract(pm, substr(w, pos - {p} + 1, {p}))[1]"
        arms.append(
            f"WHEN {p} <= pos AND {v} IS NOT NULL"
            f" AND bests[greatest(pos - {p} + 1, 1)] + {v} = bests[pos + 1]"
            f" THEN {p}")
    chosen = "CASE " + " ".join(arms) + " END"
    for j in range(1, W + 1):
        parts.append(f""",
bt{tag}_{j} AS (
  SELECT w, freq, pm, bests,
         CASE WHEN pos <= 0 THEN pos ELSE pos - cp END AS pos,
         CASE WHEN pos <= 0 THEN pieces
              ELSE pieces || [substr(w, pos - cp + 1, cp)] END AS pieces
  FROM (SELECT *, {chosen} AS cp FROM bt{tag}_{j - 1})
)""")
    return "".join(parts)



def _unigram_sql(k: int, with_segments: bool) -> str:
    sql = f"""
WITH words0 AS (
  SELECT w, COUNT(*) AS freq
  FROM (SELECT unnest({_NORM_TOKS_SQL}) AS w FROM documents)
  GROUP BY w
),
words AS (
  SELECT w, freq FROM words0 WHERE len(w) BETWEEN 1 AND {_UNI_MAXW}
),
subs AS (
  SELECT substr(w, CAST(a.i AS INT), CAST(b.p AS INT)) AS piece, freq
  FROM words,
       LATERAL unnest(generate_series(1, len(w))) AS a(i),
       LATERAL unnest(generate_series(1, least({_UNI_MAXP}, len(w) - CAST(a.i AS INT) + 1))) AS b(p)
),
sc AS (SELECT piece, SUM(freq) AS c FROM subs GROUP BY piece),
sel AS (
  SELECT piece, c FROM (
    SELECT piece, c FROM sc WHERE len(piece) >= 2
    ORDER BY c DESC, piece LIMIT {_UNI_MULTI})
  UNION ALL
  SELECT piece, c FROM sc WHERE len(piece) = 1
),
tot0 AS (SELECT SUM(c) AS t, COUNT(*) AS v FROM sel),
vv AS (SELECT COUNT(*) AS v FROM sel),
p0 AS (
  SELECT piece,
         CAST(round(ln((c + 1) / CAST(t + v AS DOUBLE)) * 1000000.0) AS BIGINT) AS s6
  FROM sel CROSS JOIN tot0
)"""
    for r in range(1, k + 1):
        sql += _uni_dp_sql(str(r), f"p{r - 1}")
        sql += f""",
c{r} AS (
  SELECT piece, SUM(freq) AS c
  FROM (SELECT freq, unnest(pieces) AS piece FROM bt{r}_{_UNI_MAXW})
  GROUP BY piece
),
tot{r} AS (SELECT SUM(c) AS t FROM c{r}),
p{r} AS (
  SELECT p.piece,
         CAST(round(ln((COALESCE(c.c, 0) + 1) / CAST(tot{r}.t + vv.v AS DOUBLE)) * 1000000.0) AS BIGINT) AS s6
  FROM p{r - 1} p LEFT JOIN c{r} c ON c.piece = p.piece
  CROSS JOIN tot{r} CROSS JOIN vv
)"""
    if with_segments:
        sql += _uni_dp_sql("s", f"p{k}")
    return sql



SQL_UNIGRAM_LM_PIECES = _unigram_sql(_UNI_K, False) + f"""
SELECT c.piece, CAST(c.c AS BIGINT) AS cnt, p.s6 / 1000000.0 AS logprob
FROM c{_UNI_K} c JOIN p{_UNI_K} p ON p.piece = c.piece
WHERE c.c > 0
ORDER BY cnt DESC, c.piece
LIMIT 100
"""



SQL_UNIGRAM_LM_SEGMENTS = _unigram_sql(_UNI_K, True) + f"""
SELECT w, CAST(freq AS BIGINT) AS freq,
       array_to_string(list_reverse(pieces), ' ') AS seg
FROM (SELECT w, freq, pieces FROM bts_{_UNI_MAXW}
      ORDER BY freq DESC, w LIMIT 50)
ORDER BY freq DESC, w
"""



def q_quality_unigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style unigram language-model quality score per document.

    Train a unigram LM on the corpus itself (token → count / total) and
    score each document by its average token log-probability — the
    classic perplexity filter for pre-training data (low avg_logprob =
    rare-token soup = likely junk; CCNet buckets corpora by exactly
    this signal, with a 5-gram KenLM where we use the SQL-expressible
    unigram).

    Scale shape: the corpus collapses to per-(doc, token) counts (one
    shuffle with map-side combine), the vocabulary is tiny relative to
    the corpus (millions of rows at 100 TB), and the score join
    shuffles on token — the inherent key. The total-token count is a
    one-row broadcast. Nothing touches raw text after the first
    aggregate.

    Cross-engine determinism: each token's log-probability is rounded
    to 6dp THEN cast to DECIMAL(20,6), so the per-document sum is exact
    and order-independent; only the final division returns to double.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(TX.normalized_tokens(F.col("text"))).alias("token")
    )
    tf = toks.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("token").agg(F.sum("tf").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("n_corpus"))
    contrib = (
        F.col("tf")
        * F.round(F.log(F.col("cnt") / F.col("n_corpus")), 6).cast("decimal(20,6)")
    )
    return (
        tf.join(vocab, "token")
        .crossJoin(F.broadcast(total))
        .select("doc_id", "tf", contrib.alias("contrib"))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.round(F.sum("contrib").cast("double") / F.sum("tf"), 6).alias("avg_logprob"),
        )
    )



SQL_QUALITY_UNIGRAM_LM = f"""
WITH toks AS (
  SELECT doc_id, unnest({_NORM_TOKS_SQL}) AS token FROM documents
),
tf AS (
  SELECT doc_id, token, COUNT(*) AS tf FROM toks GROUP BY 1, 2
),
vocab AS (
  SELECT token, SUM(tf) AS cnt FROM tf GROUP BY 1
),
total AS (SELECT SUM(cnt) AS n_corpus FROM vocab)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
       round(CAST(SUM(tf * CAST(round(ln(cnt / n_corpus), 6) AS DECIMAL(20,6))) AS DOUBLE)
             / SUM(tf), 6) AS avg_logprob
FROM tf JOIN vocab USING (token), total
GROUP BY doc_id
"""



def q_quality_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM quality score per document — one order up from the
    unigram filter toward the KenLM n-gram scorer: score = average
    log P(w2 | w1) over the document's bigram positions, with the
    conditional estimated from the corpus itself (bigram count /
    context count). Same factored scale shape as the unigram: corpus →
    per-(doc, bigram) counts once, then everything joins on the bigram
    / context keys; raw text is never touched again. Same decimal
    contribution trick for order-independent sums. Documents with
    fewer than two tokens have no bigram positions and emit no row.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.normalized_tokens(F.col("text")).alias("t"))
    # greatest(size-1, 0) replaces the old where(size >= 2) guard: the
    # pushed-down filter substituted the tokenizer alias and re-split
    # every document a second time at the scan (r12, guide §2.4); a
    # zero-length slice explodes to no rows for 0/1-token and NULL
    # docs, which is exactly what the filter produced.
    bigrams = toks.select(
        "doc_id",
        F.explode(F.expr(
            "transform(slice(t, 1, greatest(size(t) - 1, 0)), (w, i) -> "
            "struct(w AS w1, t[i + 1] AS w2))"
        )).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    tf = bigrams.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    bg_counts = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("bg_cnt"))
    ctx_counts = bg_counts.groupBy("w1").agg(F.sum("bg_cnt").alias("ctx_cnt"))
    contrib = (
        F.col("tf")
        * F.round(F.log(F.col("bg_cnt") / F.col("ctx_cnt")), 6).cast("decimal(20,6)")
    )
    return (
        tf.join(bg_counts, ["w1", "w2"]).join(ctx_counts, "w1")
        .select("doc_id", "tf", contrib.alias("contrib"))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(F.sum("contrib").cast("double") / F.sum("tf"), 6).alias("avg_logprob"),
        )
    )



SQL_QUALITY_BIGRAM_LM = f"""
WITH t AS (
  SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents
),
bigrams AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM t, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
tf AS (
  SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bigrams GROUP BY 1, 2, 3
),
bg AS (SELECT w1, w2, SUM(tf) AS bg_cnt FROM tf GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(bg_cnt) AS ctx_cnt FROM bg GROUP BY 1)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       round(CAST(SUM(tf * CAST(round(ln(bg_cnt / ctx_cnt), 6) AS DECIMAL(20,6))) AS DOUBLE)
             / SUM(tf), 6) AS avg_logprob
FROM tf JOIN bg USING (w1, w2) JOIN ctx USING (w1)
GROUP BY doc_id
"""



def q_quality_kn_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interpolated Kneser-Ney bigram-LM quality score per document —
    the smoothing a production n-gram scorer (KenLM) actually uses,
    one step past ``quality_bigram_lm``'s MLE conditional:

        P(w2|w1) = (c(w1,w2) - D) / c(w1·)
                   + D · N1+(w1,·) / c(w1·) · N1+(·,w2) / |bigram types|

    with the standard fixed discount D = 0.75. All four count tables
    (bigram, context, forward/backward continuation fan-out) fold from
    the SAME per-(doc, bigram) aggregate, so the corpus shuffles once;
    everything downstream joins on vocabulary-sized keys and the
    |types| normalizer is a 1-row broadcast. Same DECIMAL contribution
    trick as the MLE variant for order-independent per-doc sums, and
    the probability arithmetic is written in one IEEE op order shared
    with the oracle."""
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select("doc_id", TX.normalized_tokens(F.col("text")).alias("t"))
    # greatest(size-1, 0) replaces the old where(size >= 2) guard: the
    # pushed-down filter substituted the tokenizer alias and re-split
    # every document a second time at the scan (r12, guide §2.4); a
    # zero-length slice explodes to no rows for 0/1-token and NULL
    # docs, which is exactly what the filter produced.
    bigrams = toks.select(
        "doc_id",
        F.explode(F.expr(
            "transform(slice(t, 1, greatest(size(t) - 1, 0)), (w, i) -> "
            "struct(w AS w1, t[i + 1] AS w2))"
        )).alias("bg"),
    ).select("doc_id", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    tf = bigrams.groupBy("doc_id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf"))
    bg = tf.groupBy("w1", "w2").agg(F.sum("tf").alias("bg_cnt"))
    ctx = bg.groupBy("w1").agg(F.sum("bg_cnt").alias("ctx_cnt"),
                               F.count(F.lit(1)).alias("n1p_fwd"))
    cont = bg.groupBy("w2").agg(F.count(F.lit(1)).alias("n1p_bwd"))
    types = bg.agg(F.count(F.lit(1)).alias("t_types"))
    p_kn = (
        (F.col("bg_cnt") - F.lit(0.75)) / F.col("ctx_cnt")
        + F.lit(0.75) * F.col("n1p_fwd") / F.col("ctx_cnt")
        * (F.col("n1p_bwd") / F.col("t_types"))
    )
    # Integer NANO-unit contributions (the s6 micro-unit pattern of the
    # unigram-LM oracles, one scale finer): a decimal(…,9) product here
    # silently truncates to Spark's Decimal(38,6) — re-rounding every
    # contribution — and the surface's usual round(ln,6) leaves a
    # ~1e-9-per-value chance of an ln() last-ulp flipping a 6dp
    # boundary (observed once at sf0.1). long×long is exact in both
    # engines, and a nano-boundary flip needs the ln ulp within 1e-9 of
    # a boundary AND the doc average within 1e-9/n of the OUTPUT round.
    n9 = F.round(F.log(p_kn) * F.lit(1000000000.0)).cast("long")
    contrib = F.col("tf") * n9
    return (
        tf.join(bg, ["w1", "w2"]).join(ctx, "w1").join(cont, "w2")
        .crossJoin(F.broadcast(types))
        .select("doc_id", "tf", contrib.alias("contrib"))
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.round(F.sum("contrib").cast("double")
                    / (F.lit(1000000000.0) * F.sum("tf")), 6).alias("avg_logprob"),
        )
    )



SQL_QUALITY_KN_BIGRAM_LM = f"""
WITH t AS (
  SELECT doc_id, {_NORM_TOKS_SQL} AS t FROM documents
),
bigrams AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM t, unnest(generate_series(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 2
),
tf AS (
  SELECT doc_id, w1, w2, COUNT(*) AS tf FROM bigrams GROUP BY 1, 2, 3
),
bg AS (SELECT w1, w2, SUM(tf) AS bg_cnt FROM tf GROUP BY 1, 2),
ctx AS (SELECT w1, SUM(bg_cnt) AS ctx_cnt, COUNT(*) AS n1p_fwd FROM bg GROUP BY 1),
cont AS (SELECT w2, COUNT(*) AS n1p_bwd FROM bg GROUP BY 1),
tt AS (SELECT COUNT(*) AS t_types FROM bg)
SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_bigrams,
       round(CAST(SUM(tf * CAST(round(ln(
                 (bg_cnt - 0.75) / ctx_cnt
                 + 0.75 * n1p_fwd / ctx_cnt * (n1p_bwd / t_types)
             ) * 1000000000.0) AS BIGINT)) AS DOUBLE)
             / (1000000000.0 * SUM(tf)), 6) AS avg_logprob
FROM tf JOIN bg USING (w1, w2) JOIN ctx USING (w1) JOIN cont USING (w2), tt
GROUP BY doc_id
"""



def q_quality_linear_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FastText-shaped hashed-feature linear scoring per document:
    unigram+bigram features → md5 hash buckets → inlined weight
    arithmetic → mean score + keep decision. One map-only JVM stage, no
    shuffle, no broadcast — the plan a trained hashed linear model runs
    at 100 TB (with the weight arithmetic swapped for an element_at
    into a broadcast weights array).
    """
    docs = _t(spark, sf_dir, "documents")
    # Frame form (r12): feature array, md5 weights and the score are
    # materialized columns, so the md5 pass runs once per row — the
    # scalar form re-derived it for n_features, score AND keep
    # (1.97 → 0.85 s at sf0.1); identical values.
    scored = TX.add_hashed_linear_score(docs, "text")
    return scored.select(
        "doc_id", "n_features", "score",
        (F.col("score") > 0).alias("keep"),
    )



SQL_QUALITY_LINEAR_CLASSIFIER = f"""
WITH t AS (
  SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
), f AS (
  SELECT doc_id,
         list_concat(
           toks,
           list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i + 1])
         ) AS feats
  FROM t
), s AS (
  SELECT doc_id, len(feats) AS n_features,
         list_sum(list_transform(feats, ft ->
           CAST((CAST(CONCAT('0x', substr(md5(ft), 1, 8)) AS BIGINT) % 4096)
                * 2654435761 % 1000 AS DOUBLE) / 1000.0 - 0.5
         )) / greatest(len(feats), 1) AS raw
  FROM f
)
SELECT doc_id, CAST(n_features AS BIGINT) AS n_features,
       round(raw, 6) AS score, round(raw, 6) > 0 AS keep
FROM s
"""



_CLF_BUCKETS = 1024

_CLF_K = 3         # GD steps the oracle unrolls

_CLF_LR = 300.0    # full-batch rate for mean-normalized features



def _clf_train_result(spark: SparkSession, sf_dir: str):
    from datagrowth_spark.operators.classifier import logreg_train

    docs = _t(spark, sf_dir, "documents")
    res = logreg_train(docs, F.col("lang") == "en",
                       k=_CLF_K, n_buckets=_CLF_BUCKETS, lr=_CLF_LR)
    for _c in res.caches:
        _register_cache(_c)
    return res



def q_quality_clf_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed training of the hashed-feature quality classifier
    (r8 verdict item 1 — the missing half of ``hashed_linear_score``):
    ``_CLF_K`` full-batch logistic-regression steps on unigram+bigram
    hash features, label = (lang = 'en'). Per step: one narrow
    margin/residual projection against the current weights (a literal
    map — the model is a driver constant) + ONE mergeable per-bucket
    gradient aggregate; the driver collects ≤ n_buckets rows/step.
    Integer micro/nano units make every sum exact, so the DuckDB
    oracle replays training bit-for-bit as unrolled CTEs. Output: the
    non-zero trained weights."""
    res = _clf_train_result(spark, sf_dir)
    return res.weights_df(spark).orderBy("bucket")



def q_quality_clf_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the freshly-trained classifier back to the corpus:
    6dp-quantized probability per document, top 50 with doc_id
    tiebreak. Uses the expression-level ``probability()`` apply path
    (the literal weight-map carrier) — kept on that path explicitly
    so the oracle gate keeps exercising the literal carrier after the
    r11 threshold change made the broadcast join the auto-selected
    default at 1024 buckets (``quality_clf_scores_bcast`` pins the
    join side; the two are bit-equal)."""
    res = _clf_train_result(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    p = res.model.probability(F.col("text"))
    return (docs
            .where(F.size(TX.hashed_features(F.col("text"))) > 0)
            .select("doc_id",
                    (F.col("lang") == "en").cast("int").alias("y"),
                    p.alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(50))



def _logreg_sql(k: int, pre: str = "", extra: str = "",
                pd_train: str = "pd", dt_train: str = "dt") -> str:
    """Unrolled-CTE oracle prefix for the logistic trainer: the hashed
    feature matrix (pd/dt), all-zero w0 over the full bucket range, and
    per step i the margin (m{i}), nano-residual (r{i}), per-bucket
    gradient (g{i}) and weight update (w{i}) — integer-exact
    throughout, mirroring operators/classifier.py formula for formula.

    ``pre`` injects CTEs between WITH and the feature matrix (e.g. the
    leakage-safe split chain; start it with RECURSIVE if needed);
    ``extra`` appends CTEs after the matrix (e.g. train-subset views);
    ``pd_train``/``dt_train`` name the frames the GD steps run on, so
    a held-out oracle trains on a subset while the full matrix stays
    available for eval scoring."""
    b, lr = _CLF_BUCKETS, _CLF_LR
    parts = [f"""
WITH {pre}t AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         {_TOKS_SQL} AS toks
  FROM documents
),
f AS (
  SELECT doc_id, y,
         list_concat(
           toks,
           list_transform(range(1, len(toks)), i -> toks[i] || '_' || toks[i + 1])
         ) AS feats
  FROM t
),
fb AS (
  SELECT doc_id, y,
         CAST(('0x' || substr(md5(ft), 1, 8)) AS BIGINT) % {b} AS bucket
  FROM (SELECT doc_id, y, unnest(feats) AS ft FROM f)
),
pd AS (
  SELECT doc_id, y, bucket, CAST(COUNT(*) AS BIGINT) AS tf
  FROM fb GROUP BY 1, 2, 3
),
dt AS (
  SELECT doc_id, y, SUM(tf) AS n FROM pd GROUP BY 1, 2
),
w0 AS (SELECT range AS bucket, CAST(0 AS BIGINT) AS w6 FROM range({b})){extra},
nn AS (SELECT COUNT(*) AS N FROM {dt_train})"""]
    for i in range(1, k + 1):
        parts.append(f""",
m{i} AS (
  SELECT pd.doc_id, SUM(pd.tf * w.w6) AS num
  FROM {pd_train} pd JOIN w{i - 1} w USING (bucket)
  GROUP BY pd.doc_id
),
r{i} AS (
  SELECT dt.doc_id,
         CAST(round((CAST(round(1000000.0 / (1.0 + exp(-(COALESCE(m{i}.num, 0)
                                                         / (1000000.0 * dt.n))))) AS BIGINT)
                     - 1000000 * dt.y) * 1000.0 / dt.n) AS BIGINT) AS r9
  FROM {dt_train} dt LEFT JOIN m{i} USING (doc_id)
),
g{i} AS (
  SELECT pd.bucket, SUM(pd.tf * r.r9) AS g9
  FROM {pd_train} pd JOIN r{i} r USING (doc_id)
  GROUP BY pd.bucket
),
w{i} AS (
  SELECT w.bucket,
         CAST(round(w.w6 - {lr} * COALESCE(g.g9, 0) / (1000.0 * nn.N)) AS BIGINT) AS w6
  FROM w{i - 1} w LEFT JOIN g{i} g USING (bucket) CROSS JOIN nn
)""")
    return "".join(parts)



SQL_QUALITY_CLF_TRAIN = _logreg_sql(_CLF_K) + f"""
SELECT bucket, w6 / 1000000.0 AS w
FROM w{_CLF_K}
WHERE w6 <> 0
ORDER BY bucket
"""



SQL_QUALITY_CLF_SCORES = _logreg_sql(_CLF_K) + f""",
final_m AS (
  SELECT pd.doc_id, SUM(pd.tf * w.w6) AS num
  FROM pd JOIN w{_CLF_K} w USING (bucket)
  GROUP BY pd.doc_id
)
SELECT dt.doc_id, dt.y,
       CAST(round(1000000.0 / (1.0 + exp(-(COALESCE(final_m.num, 0)
                                           / (1000000.0 * dt.n))))) AS BIGINT)
       / 1000000.0 AS score
FROM dt LEFT JOIN final_m USING (doc_id)
ORDER BY score DESC, doc_id
LIMIT 50
"""



def q_quality_clf_scores_bcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``quality_clf_scores`` with the BROADCAST-JOIN model carrier
    forced on end-to-end (r9 verdict item 1): each training step
    broadcast-HASH-joins the (bucket, w6) weight frame against the
    pre-partitioned exploded feature rows, and the apply pass scores
    through ``LogRegModel.score_docs(use_broadcast=True)`` — the plan
    shape a fastText-production model (2M buckets) requires, because a
    literal OR map-column carrier costs O(|model|) per lookup (Spark's
    ``element_at`` on maps is a linear scan — measured r10, see the
    classifier module docstring). Integer arithmetic is identical on
    both carriers, so this shares ``quality_clf_scores``'s oracle
    verbatim."""
    from datagrowth_spark.operators.classifier import logreg_train

    docs = _t(spark, sf_dir, "documents")
    res = logreg_train(docs, F.col("lang") == "en", k=_CLF_K,
                       n_buckets=_CLF_BUCKETS, lr=_CLF_LR,
                       use_broadcast=True)
    for _c in res.caches:
        _register_cache(_c)
    return (res.model.score_docs(
                docs.where(F.size(TX.hashed_features(F.col("text"))) > 0),
                use_broadcast=True)
            .select("doc_id",
                    (F.col("lang") == "en").cast("int").alias("y"),
                    "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(50))



_CLF_ES_K = 5       # early-stop step budget (k_max)

_CLF_ES_NUM = 9     # stop when norm_i * 10 >= norm_{i-1} * 9

_CLF_ES_DEN = 10



def q_quality_clf_earlystop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Convergence-monitored training (r9 verdict item 7 — makes
    ``grad_norms`` load-bearing): run up to ``_CLF_ES_K`` GD steps and
    STOP once a step removes < 10% of the gradient norm — the
    exact-integer rule ``norm_i · 10 ≥ norm_{i-1} · 9``, deterministic
    because norms are exact nano-unit integer sums in both engines.
    Output: one row per EXECUTED step with its norm and whether the
    stop rule fired there; the DuckDB oracle unrolls all ``_CLF_ES_K``
    steps, computes the same norms, and windows down to the executed
    prefix."""
    from datagrowth_spark.operators.classifier import logreg_train

    docs = _t(spark, sf_dir, "documents")
    res = logreg_train(docs, F.col("lang") == "en", k=_CLF_ES_K,
                       n_buckets=_CLF_BUCKETS, lr=_CLF_LR,
                       stop_num=_CLF_ES_NUM, stop_den=_CLF_ES_DEN)
    for _c in res.caches:
        _register_cache(_c)
    rows = [(i + 1, n,
             1 if (res.stopped_early and i == len(res.grad_norms) - 1) else 0)
            for i, n in enumerate(res.grad_norms)]
    return (spark.createDataFrame(
                rows, "step INT, grad_norm9 BIGINT, stopped INT")
            .orderBy("step"))



def _clf_earlystop_sql() -> str:
    norm_rows = " UNION ALL ".join(
        f"SELECT {i} AS step, CAST(SUM(ABS(g9)) AS BIGINT) AS grad_norm9 "
        f"FROM g{i}" for i in range(1, _CLF_ES_K + 1))
    return _logreg_sql(_CLF_ES_K) + f""",
norms AS ({norm_rows}),
flagged AS (
  SELECT step, grad_norm9,
         CASE WHEN step >= 2
                AND grad_norm9 * {_CLF_ES_DEN}
                    >= LAG(grad_norm9) OVER (ORDER BY step) * {_CLF_ES_NUM}
              THEN 1 ELSE 0 END AS fired
  FROM norms
),
first_stop AS (
  SELECT COALESCE(MIN(CASE WHEN fired = 1 THEN step END), {_CLF_ES_K}) AS s
  FROM flagged
)
SELECT step, grad_norm9,
       CASE WHEN fired = 1 AND step = s THEN 1 ELSE 0 END AS stopped
FROM flagged, first_stop
WHERE step <= s
ORDER BY step
"""



SQL_QUALITY_CLF_EARLYSTOP = _clf_earlystop_sql()



def q_quality_clf_heldout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out evaluation wired through the LEAKAGE-SAFE splitter
    (r9 verdict item 7's second half): train the classifier on the
    group-aware 'train' split only, score the held-out (val+test)
    documents, and report their exact Mann-Whitney ROC-AUC — the
    honest generalization number, immune to near-duplicate leakage by
    construction because every near-dup cluster lives entirely on one
    side of the split. Plan shape: the split is the
    ``corpus_split_leakage_safe`` composition (banded jaccard pairs →
    components → salted hash), training is the standard bounded-
    collect GD loop on the train subset, eval is the sharded exact
    rank-sum (no single-partition window). Output: one row
    (n_train, npos, nneg, auc)."""
    from datagrowth_spark.operators.classifier import logreg_train
    from datagrowth_spark.operators.ranking import add_global_rank

    docs = _t(spark, sf_dir, "documents")
    splits = _leakage_safe_split_frame(spark, sf_dir).select(
        "doc_id", "split").persist()
    _register_cache(splits)
    train_docs = docs.join(
        splits.where(F.col("split") == "train").select("doc_id"), "doc_id")
    res = logreg_train(train_docs, F.col("lang") == "en", k=_CLF_K,
                       n_buckets=_CLF_BUCKETS, lr=_CLF_LR)
    for _c in res.caches:
        _register_cache(_c)
    heldout = (docs.join(
        splits.where(F.col("split") != "train").select("doc_id"), "doc_id")
        .where(F.size(TX.hashed_features(F.col("text"))) > 0))
    scored = heldout.select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("y"),
        res.model.probability(F.col("text")).alias("score")).persist()
    _register_cache(scored)
    ranked = add_global_rank(scored, "score", tiebreaks=("doc_id",), out="rn")
    groups = ranked.groupBy("score").agg(
        F.sum("y").alias("npos_g"),
        F.min("rn").alias("min_rn"),
        F.max("rn").alias("max_rn"))
    totals = ranked.agg(F.sum("y").alias("npos"),
                        F.count(F.lit(1)).alias("n"))
    rpos2 = groups.agg(
        F.sum(F.col("npos_g") * (F.col("min_rn") + F.col("max_rn")))
        .alias("rpos2"))
    return (rpos2.crossJoin(F.broadcast(totals))
            .select(
                F.lit(res.n_docs).cast("long").alias("n_train"),
                F.col("npos"),
                (F.col("n") - F.col("npos")).alias("nneg"),
                F.round(
                    (F.col("rpos2") - F.col("npos") * (F.col("npos") + 1))
                    .cast("double")
                    / (F.lit(2.0) * (F.col("npos")
                                     * (F.col("n") - F.col("npos")))),
                    6).alias("auc")))



_SQL_CLF_TRAIN_SUBSET = """,
pd_tr AS (
  SELECT pd.* FROM pd JOIN splits s ON s.doc_id = pd.doc_id
  WHERE s.split = 'train'
),
dt_tr AS (
  SELECT dt.* FROM dt JOIN splits s ON s.doc_id = dt.doc_id
  WHERE s.split = 'train'
)"""


SQL_QUALITY_CLF_HELDOUT = _logreg_sql(
    _CLF_K, pre=_SQL_SPLIT_CTES + ",\n",
    extra=_SQL_CLF_TRAIN_SUBSET, pd_train="pd_tr", dt_train="dt_tr",
) + f""",
final_m AS (
  SELECT pd.doc_id, SUM(pd.tf * w.w6) AS num
  FROM pd JOIN w{_CLF_K} w USING (bucket)
  GROUP BY pd.doc_id
),
scored AS (
  SELECT dt.doc_id, dt.y,
         CAST(round(1000000.0 / (1.0 + exp(-(COALESCE(final_m.num, 0)
                                             / (1000000.0 * dt.n))))) AS BIGINT)
         / 1000000.0 AS score
  FROM dt JOIN splits s ON s.doc_id = dt.doc_id
  LEFT JOIN final_m ON final_m.doc_id = dt.doc_id
  WHERE s.split <> 'train'
),
auc_ranked AS (
  SELECT y, score, ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rn FROM scored
),
auc_grp AS (
  SELECT score, SUM(y) AS npos_g, MIN(rn) AS min_rn, MAX(rn) AS max_rn
  FROM auc_ranked GROUP BY score
),
auc_tot AS (SELECT CAST(SUM(y) AS BIGINT) AS npos, COUNT(*) AS n FROM auc_ranked),
auc_r2 AS (SELECT CAST(SUM(npos_g * (min_rn + max_rn)) AS BIGINT) AS rpos2 FROM auc_grp)
SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM dt_tr) AS n_train,
       npos, (n - npos) AS nneg,
       round(CAST(rpos2 - npos * (npos + 1) AS DOUBLE)
             / (2.0 * (npos * (n - npos))), 6) AS auc
FROM auc_r2, auc_tot
"""



def _clf_scored(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, y, score) for the freshly-trained classifier over the
    corpus — shared by the AUC and calibration eval queries. Persisted
    (and registered for release) because the rank pass runs bounded
    construction jobs over it."""
    res = _clf_train_result(spark, sf_dir)
    docs = _t(spark, sf_dir, "documents")
    p = res.model.probability(F.col("text"))
    scored = (docs
              .where(F.size(TX.hashed_features(F.col("text"))) > 0)
              .select("doc_id",
                      (F.col("lang") == "en").cast("int").alias("y"),
                      p.alias("score"))).persist()
    _register_cache(scored)
    return scored



_SQL_CLF_SCORED = f""",
final_m AS (
  SELECT pd.doc_id, SUM(pd.tf * w.w6) AS num
  FROM pd JOIN w{_CLF_K} w USING (bucket)
  GROUP BY pd.doc_id
),
scored AS (
  SELECT dt.doc_id, dt.y,
         CAST(round(1000000.0 / (1.0 + exp(-(COALESCE(final_m.num, 0)
                                             / (1000000.0 * dt.n))))) AS BIGINT)
         / 1000000.0 AS score
  FROM dt LEFT JOIN final_m USING (doc_id)
)"""



def q_quality_clf_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the trained classifier (Mann-Whitney rank-sum
    form) WITHOUT a single-partition window: ranks come from the
    sharded exact global rank (operators/ranking.py), tie groups are
    contiguous runs of row numbers so the tie-AVERAGED rank sum folds
    to integer arithmetic — ``Σ n_pos_group · (min_rn + max_rn)`` is
    twice the averaged positive rank sum. Everything after the rank
    pass is score-cardinality-sized; the final AUC is one row of exact
    integer numerators divided once in IEEE doubles."""
    from datagrowth_spark.operators.ranking import add_global_rank

    scored = _clf_scored(spark, sf_dir)
    ranked = add_global_rank(scored, "score", tiebreaks=("doc_id",), out="rn")
    groups = ranked.groupBy("score").agg(
        F.sum("y").alias("npos_g"),
        F.min("rn").alias("min_rn"),
        F.max("rn").alias("max_rn"))
    totals = ranked.agg(F.sum("y").alias("npos"),
                        F.count(F.lit(1)).alias("n"))
    rpos2 = groups.agg(
        F.sum(F.col("npos_g") * (F.col("min_rn") + F.col("max_rn"))).alias("rpos2"))
    return (rpos2.crossJoin(F.broadcast(totals))
            .select(
                F.col("npos"),
                (F.col("n") - F.col("npos")).alias("nneg"),
                F.round(
                    (F.col("rpos2") - F.col("npos") * (F.col("npos") + 1)).cast("double")
                    / (F.lit(2.0) * (F.col("npos") * (F.col("n") - F.col("npos")))),
                    6).alias("auc")))



SQL_QUALITY_CLF_AUC = _logreg_sql(_CLF_K) + _SQL_CLF_SCORED + """,
auc_ranked AS (
  SELECT y, score, ROW_NUMBER() OVER (ORDER BY score, doc_id) AS rn FROM scored
),
auc_grp AS (
  SELECT score, SUM(y) AS npos_g, MIN(rn) AS min_rn, MAX(rn) AS max_rn
  FROM auc_ranked GROUP BY score
),
auc_tot AS (SELECT CAST(SUM(y) AS BIGINT) AS npos, COUNT(*) AS n FROM auc_ranked),
auc_r2 AS (SELECT CAST(SUM(npos_g * (min_rn + max_rn)) AS BIGINT) AS rpos2 FROM auc_grp)
SELECT npos, (n - npos) AS nneg,
       round(CAST(rpos2 - npos * (npos + 1) AS DOUBLE)
             / (2.0 * (npos * (n - npos))), 6) AS auc
FROM auc_r2, auc_tot
"""



def q_quality_clf_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability diagram for the trained classifier: decile buckets
    of the 6dp-quantized probability vs observed positive rate — the
    calibration check run before using a filter score as a sampling
    weight. One map stage + one 10-row aggregate; bucket arithmetic
    runs on the identical IEEE score doubles in both engines."""
    scored = _clf_scored(spark, sf_dir)
    bucket = F.least(F.floor(F.col("score") * 10), F.lit(9)).cast("int")
    return (scored.groupBy(bucket.alias("bucket"))
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("y").alias("n_pos"),
                 F.round(F.sum("y").cast("double")
                         / F.count(F.lit(1)), 6).alias("pos_rate"),
                 F.round(F.sum(F.col("score").cast("decimal(18,6)")).cast("double")
                         / F.count(F.lit(1)), 6).alias("mean_score")))



SQL_QUALITY_CLF_CALIBRATION = _logreg_sql(_CLF_K) + _SQL_CLF_SCORED + """
SELECT CAST(least(floor(score * 10), 9) AS INT) AS bucket,
       COUNT(*) AS n_docs,
       CAST(SUM(y) AS BIGINT) AS n_pos,
       round(CAST(SUM(y) AS DOUBLE) / COUNT(*), 6) AS pos_rate,
       round(CAST(SUM(CAST(score AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 6) AS mean_score
FROM scored
GROUP BY 1
"""



# ---------------------------------------------------------------------------
# Round 7: tokenizer induction, hard-negative mining, boilerplate prefixes,
# token-budget mixture planning, held-out LM scoring
# ---------------------------------------------------------------------------


def q_token_bigram_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE merge step's statistics: the 100 most frequent ADJACENT
    token pairs across the corpus (pair_count) with their document
    frequency — the core aggregate a distributed tokenizer-induction
    loop re-runs per merge.

    Scale shape: pairs are built per row from the token array (zero
    shuffle), then aggregated TWICE — per-(doc, pair) first, so the hot
    pairs ("of the"-class) never funnel a distinct-set onto one reduce
    task, then per-pair with map-side combine on pre-counted rows. The
    global top-100 is TakeOrderedAndProject (no single-partition
    window); the rank attaches on the 100-row result only.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", TX.normalized_tokens(F.col("text")).alias("toks"))
    pairs = F.when(
        F.size("toks") >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size("toks") - 1),
            lambda i: F.concat_ws(" ", F.element_at("toks", i),
                                  F.element_at("toks", i + 1)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    per_doc = (
        toks.select("doc_id", F.explode(pairs).alias("pair"))
        .groupBy("doc_id", "pair").agg(F.count(F.lit(1)).alias("c"))
    )
    agg = per_doc.groupBy("pair").agg(
        F.sum("c").alias("pair_count"),
        F.count(F.lit(1)).alias("doc_count"))
    top = agg.orderBy(F.desc("pair_count"), F.asc("pair")).limit(100)
    w = Window.orderBy(F.desc("pair_count"), F.asc("pair"))  # 100 rows
    return top.withColumn("rnk", F.row_number().over(w))



SQL_TOKEN_BIGRAM_TOPK = f"""
WITH t AS (
  SELECT doc_id, {_NORM_TOKS_SQL} AS toks FROM documents
),
p AS (
  SELECT doc_id, unnest(CASE WHEN len(toks) < 2 THEN []::VARCHAR[]
         ELSE list_transform(generate_series(1, len(toks) - 1),
              i -> concat_ws(' ', toks[i], toks[i + 1])) END) AS pair
  FROM t
),
d AS (SELECT doc_id, pair, COUNT(*) AS c FROM p GROUP BY doc_id, pair),
a AS (SELECT pair, CAST(SUM(c) AS BIGINT) AS pair_count,
             CAST(COUNT(*) AS BIGINT) AS doc_count FROM d GROUP BY pair),
r AS (SELECT pair, pair_count, doc_count,
             ROW_NUMBER() OVER (ORDER BY pair_count DESC, pair ASC) AS rnk
      FROM a)
SELECT pair, pair_count, doc_count, rnk FROM r WHERE rnk <= 100
"""



def q_lm_heldout_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out cross-entropy per language under an add-one-smoothed
    unigram LM trained on the other 80% of documents — the
    train/validation form of the CCNet perplexity filter
    (quality_unigram_lm scores in-corpus; this one scores documents
    the model never saw, the right shape for contamination-free
    quality gates).

    Scale shape: two passes over the token stream (train counts, held
    -out term frequencies), both collapsing to per-token aggregates
    with map-side combine before any join; the score join shuffles on
    token (vocabulary-sized, tiny vs corpus). Determinism: per-token
    log-probs and per-document averages round to 6dp then cast
    DECIMAL(20,6) so the cross-document sums are exact.
    """
    docs = _t(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", "lang",
        F.explode(TX.normalized_tokens(F.col("text"))).alias("token"))
    train = (toks.where(F.col("doc_id") % 5 != 0)
             .groupBy("token").agg(F.count(F.lit(1)).alias("cnt")))
    nv = train.agg(F.sum("cnt").alias("n_train"),
                   F.count(F.lit(1)).alias("v"))
    held = (toks.where(F.col("doc_id") % 5 == 0)
            .groupBy("doc_id", "lang", "token")
            .agg(F.count(F.lit(1)).alias("tf")))
    lp = F.round(
        F.log((F.coalesce(F.col("cnt"), F.lit(0)) + 1)
              / (F.col("n_train") + F.col("v")).cast("double")), 6
    ).cast("decimal(20,6)")
    per_doc = (
        held.join(train, "token", "left")
        .crossJoin(F.broadcast(nv))
        .select("doc_id", "lang", "tf", (F.col("tf") * lp).alias("contrib"))
        .groupBy("doc_id", "lang")
        .agg(F.round(
            F.sum("contrib").cast("double") / F.sum("tf"), 6
        ).cast("decimal(20,6)").alias("avg_lp"))
    )
    return (
        per_doc.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"),
             F.round(-F.sum("avg_lp").cast("double") / F.count(F.lit(1)), 6)
             .alias("cross_entropy"))
        .orderBy("lang")
    )



SQL_LM_HELDOUT_PERPLEXITY = f"""
WITH toks AS (
  SELECT doc_id, lang, unnest({_NORM_TOKS_SQL}) AS token FROM documents
),
train AS (
  SELECT token, COUNT(*) AS cnt FROM toks WHERE doc_id % 5 <> 0 GROUP BY token
),
nv AS (SELECT SUM(cnt) AS n_train, COUNT(*) AS v FROM train),
held AS (
  SELECT doc_id, lang, token, COUNT(*) AS tf
  FROM toks WHERE doc_id % 5 = 0 GROUP BY doc_id, lang, token
),
j AS (
  SELECT h.doc_id, h.lang, h.tf,
         CAST(round(ln((coalesce(t.cnt, 0) + 1)
                       / CAST(n_train + v AS DOUBLE)), 6)
              AS DECIMAL(20,6)) AS lp
  FROM held h LEFT JOIN train t USING (token), nv
),
d AS (
  SELECT doc_id, lang,
         CAST(round(CAST(SUM(tf * lp) AS DOUBLE) / SUM(tf), 6)
              AS DECIMAL(20,6)) AS avg_lp
  FROM j GROUP BY doc_id, lang
)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       round(-CAST(SUM(avg_lp) AS DOUBLE) / COUNT(*), 6) AS cross_entropy
FROM d GROUP BY lang ORDER BY lang
"""



# ---------------------------------------------------------------------------
# Round 12: model persistence — score/segment/encode with RELOADED models
# (operators/modelstore.py). Each query trains via the shared helper,
# saves the model to a scratch artifact, loads it into a FRESH object
# (signature-verified), deletes the artifact (reloaded models are
# driver-side constants), and applies it. Scores/segmentations/encodes
# are bit-equal to the in-session variants, so each shares its oracle
# SQL verbatim.
# ---------------------------------------------------------------------------


def _reload_round_trip(save, load):
    """Save → load → rm scratch dir; returns the reloaded object."""
    import shutil
    import tempfile

    tmp = tempfile.mkdtemp(prefix="dgs-model-")
    try:
        path = os.path.join(tmp, "artifact")
        save(path)
        return load(path)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def q_quality_clf_scores_reloaded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``quality_clf_scores`` through a persistence round trip (r11
    verdict item 1): train, save the LogReg artifact, load it into a
    fresh model object, score the corpus with the RELOADED model on
    the auto-selected carrier (the broadcast hash join at
    ``_CLF_BUCKETS`` = 1024 — the path a cross-session scoring job
    takes). Bit-equal scores ⇒ shares ``SQL_QUALITY_CLF_SCORES``
    verbatim."""
    from datagrowth_spark.operators import modelstore as MS

    res = _clf_train_result(spark, sf_dir)
    model = _reload_round_trip(
        lambda p: MS.save_logreg_model(res.model, p),
        MS.load_logreg_model)
    docs = _t(spark, sf_dir, "documents")
    scored = model.score_docs(
        docs.where(F.size(TX.hashed_features(F.col("text"))) > 0),
        text_col="text", out="score", id_col="doc_id")
    return (scored
            .select("doc_id",
                    (F.col("lang") == "en").cast("int").alias("y"),
                    "score")
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(50))


def q_unigram_lm_segments_reloaded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``unigram_lm_segments`` through a persistence round trip: the
    trained unigram model (scores/counts/totals/maxp) survives
    save/load as a sentencepiece.model-style artifact; the reloaded
    object Viterbi-segments the same top-50 training words bit-equally
    ⇒ shares ``SQL_UNIGRAM_LM_SEGMENTS`` verbatim."""
    from datagrowth_spark.operators import modelstore as MS

    res = _uni_train_result(spark, sf_dir)
    loaded = _reload_round_trip(
        lambda p: MS.save_unigram_model(res, p),
        MS.load_unigram_model)
    base = res.caches[0]
    top = (base.orderBy(F.desc("freq"), F.asc("w")).limit(50))
    return (loaded.segment(top)
            .select("w", F.col("freq").cast("long").alias("freq"),
                    F.array_join("pieces", " ").alias("seg")))


def q_bpe_encode_reloaded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``bpe_encode_lengths`` through a persistence round trip: the
    merge table (a merges.txt equivalent) plus the vocabulary parquet
    survive save/load with signature/fingerprint verification; encode
    replays the RELOADED merges ⇒ shares ``SQL_BPE_ENCODE_LENGTHS``
    verbatim."""
    from datagrowth_spark.operators import bpe as BPE
    from datagrowth_spark.operators import modelstore as MS

    res = BPE.bpe_train(_bpe_word_freq(spark, sf_dir), k=_BPE_K)
    for _c in res.caches:
        _register_cache(_c)
    loaded = _reload_round_trip(
        lambda p: MS.save_bpe_model(res, p),
        lambda p: MS.load_bpe_model(spark, p))
    merge_list = MS.merges_list(loaded.merges)
    docs = _t(spark, sf_dir, "documents")
    doc_words = docs.select(
        "doc_id", F.explode(TX.normalized_tokens(F.col("text"))).alias("w"))
    wlen = BPE.bpe_encode(doc_words.select("w").distinct(), merge_list) \
        .select("w", F.size("syms").alias("n_sym"))
    return (doc_words.join(F.broadcast(wlen), "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum("n_sym").alias("bpe_tokens")))
