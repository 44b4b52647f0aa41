"""Iterative BPE-merge training over a distributed corpus.

The classic byte-pair-encoding trainer (Sennrich et al., "Neural
Machine Translation of Rare Words with Subword Units", ACL 2016)
factors through WORD FREQUENCIES: after one corpus-sized aggregation,
every merge round runs on the vocabulary table (millions of rows at
100 TB corpus scale, not trillions). Each round:

1. count adjacent symbol pairs weighted by word frequency (one hash
   aggregate — the only shuffle, on the pair key);
2. pick the most frequent pair (count DESC, then left/right symbol
   ASC — a total order, so training is deterministic on any cluster
   layout);
3. rewrite every word's symbol sequence, merging occurrences of that
   pair left-to-right non-overlapping.

Step 3 is the part engines usually push to Python; here it stays pure
Catalyst via a STRING encoding of the symbol sequence: each symbol is
wrapped in a separator char that alpha-only words can never contain
(``\\x1f``), so the sequence ``[a, b, c]`` is stored as
``\\x1fa\\x1f\\x1fb\\x1f\\x1fc\\x1f``. Merging pair ``(l, r)`` is then a
literal ``replace(repr, SEP+l+SEP+SEP+r+SEP, SEP+lr+SEP)`` — both
Spark's ``StringReplace`` and ANSI ``replace()`` scan left-to-right
and never rescan replaced text, which is exactly BPE's greedy
non-overlapping merge (``aaa`` + pair ``(a,a)`` -> ``[aa, a]``). The
separator anchors both symbols, so a pattern can never match a symbol
suffix/prefix. Zero Python rows, zero UDFs, whole-stage codegen end
to end.

Per-round cost is FLAT in the round number: the pair aggregate reads
the persisted vocabulary once, the rewrite is a narrow projection, and
the driver collects exactly one row per round. Rewrites chain as
nested ``replace`` expressions; every ``checkpoint_rounds`` rounds the
frame is re-persisted (and the previous cache dropped) so neither the
expression tree nor the recompute depth grows unboundedly for large
``k``.

Scale design (100 TB): the corpus-sized work is ONE groupBy(word)
with map-side combine; everything after is vocabulary-sized. Hot
pairs ("th", "e ") never skew — the pair aggregate's input is one row
per (word, position), already collapsed by word frequency.

Reference behavior anchor: the single-step pair statistics this
iterates are ``q_bpe_pair_counts`` / ``q_token_bigram_topk``
(queries.py); the reference engine has no BPE trainer — this is part
of the LLM-training-data surface the brief adds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Symbol separator — unit separator control char; normalized (alpha-
#: only) words can never contain it, so symbol boundaries are exact.
SEP = "\x1f"


class BPETrainResult:
    """Result handle for :func:`bpe_train`.

    * ``merges`` — one row per merge round:
      (step, lhs, rhs, merged, pair_count); driver-built (k rows).
    * ``vocab`` — final symbol vocabulary: (symbol, freq) where freq
      is the word-frequency-weighted occurrence count.
    * ``word_symbols`` — final segmentation: (w, freq, syms); ``None``
      on artifacts reloaded from disk (``operators/modelstore.py`` —
      re-derive by replaying ``merges`` with :func:`bpe_encode`).
    * ``caches`` — persisted frames the trainer created; callers own
      their lifetime (``cleanup()`` or register with a session hook).
    """

    __slots__ = ("merges", "vocab", "word_symbols", "caches")

    def __init__(self, merges: DataFrame, vocab: DataFrame,
                 word_symbols: DataFrame, caches: list[DataFrame]) -> None:
        self.merges = merges
        self.vocab = vocab
        self.word_symbols = word_symbols
        self.caches = caches

    def cleanup(self, blocking: bool = False) -> None:
        for frame in self.caches:
            frame.unpersist(blocking)
        self.caches = []


def _initial_repr(word) -> "F.Column":
    """``\\x1fc\\x1f`` per character — each char becomes one symbol.

    ``(?s)`` DOTALL (ADVICE r8): without it, newline characters escape
    the wrapping and glue onto neighbor symbols. The one character the
    encoding can NEVER carry is :data:`SEP` itself — a hard input
    contract enforced by the callers (``bpe_train`` filters such words
    out of training; ``bpe_encode`` passes them through unsegmented).
    """
    return F.regexp_replace(word, "(?s)(.)", f"{SEP}$1{SEP}")


def _symbols(repr_col) -> "F.Column":
    """Split a separator-encoded sequence back into its symbol array."""
    inner = F.substring(repr_col, 2, F.length(repr_col) - 2)
    return F.split(inner, SEP + SEP)


def _pairs(syms) -> "F.Column":
    """Adjacent (l, r) symbol pairs — ALL of them, overlapping included
    (the counting convention of the reference BPE trainer)."""
    n = F.size(syms)
    return F.when(n < 2, F.array().cast("array<struct<l:string,r:string>>")) \
        .otherwise(F.zip_with(
            F.slice(syms, 1, n - 1), F.slice(syms, 2, n - 1),
            lambda a, b: F.struct(a.alias("l"), b.alias("r"))))


def bpe_train(word_freq: DataFrame, k: int, word_col: str = "w",
              freq_col: str = "freq",
              checkpoint_rounds: int = 16) -> BPETrainResult:
    """Run ``k`` BPE merge rounds over a (word, freq) vocabulary frame.

    ``word_freq`` is the output of the corpus word-count aggregate
    (callers build it with their tokenizer of choice so the trainer
    composes with any normalization). Rounds with an empty pair table
    (every word fully merged) stop early.

    Input contract (ADVICE r8): a word may contain any character EXCEPT
    the symbol separator ``\\x1f`` — such words would fake symbol
    boundaries, so they are filtered out of training here (a map-only
    predicate; real tokenizers never emit control chars).
    """
    spark = word_freq.sparkSession
    base = word_freq.where(~F.col(word_col).contains(SEP)).select(
        _initial_repr(F.col(word_col)).alias("repr"),
        F.col(freq_col).cast("long").alias("freq"),
    ).persist()
    caches = [base]

    cur = base
    merges: list[tuple] = []
    for step in range(1, k + 1):
        pair_counts = (
            cur.select(F.explode(_pairs(_symbols(F.col("repr")))).alias("p"), "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
        )
        top = (pair_counts.orderBy(F.desc("c"), F.asc("l"), F.asc("r"))
               .limit(1).collect())
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], top[0]["c"]
        merges.append((step, l, r, l + r, int(c)))
        cur = cur.select(
            F.replace(F.col("repr"),
                      F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                      F.lit(f"{SEP}{l}{r}{SEP}")).alias("repr"),
            "freq",
        )
        if step % checkpoint_rounds == 0 and step < k:
            # Bound expression-tree depth and per-round recompute: cache
            # the rewritten frame, materialize it, drop the previous
            # cache (the base stays for lineage recovery semantics —
            # callers release everything via the result handle).
            nxt = cur.persist()
            nxt.count()
            if len(caches) > 1:
                caches[-1].unpersist()
                caches.pop()
            caches.append(nxt)
            cur = nxt

    merges_df = spark.createDataFrame(
        merges, "step INT, lhs STRING, rhs STRING, merged STRING, pair_count BIGINT")
    word_symbols = cur.select(
        _symbols(F.col("repr")).alias("syms"), "freq")
    # adjacent merges only concatenate, so the symbols re-join to the
    # original word — carried for callers that join segmentations back
    # to a corpus without re-tokenizing
    word_symbols = word_symbols.withColumn("w", F.array_join("syms", ""))
    vocab = (word_symbols
             .select(F.explode("syms").alias("symbol"), "freq")
             .groupBy("symbol").agg(F.sum("freq").alias("freq")))
    return BPETrainResult(merges_df, vocab, word_symbols, caches)


def wordpiece_train(word_freq: DataFrame, k: int, word_col: str = "w",
                    freq_col: str = "freq",
                    checkpoint_rounds: int = 16) -> BPETrainResult:
    """Run ``k`` WordPiece merge rounds over a (word, freq) vocabulary.

    Same distributed shape as :func:`bpe_train` — one corpus-sized
    word count upstream, then every round is vocabulary-sized — but
    the merge criterion is the WordPiece LIKELIHOOD score (Schuster &
    Nakajima 2012; the BERT trainer): pick the pair maximizing
    ``count(l, r) / (count(l) * count(r))``, i.e. the merge that most
    increases corpus likelihood under a unigram piece model. Each
    round therefore runs TWO vocabulary-sized aggregates (pair counts
    and unit counts) joined on the symbol key, still zero UDFs and one
    1-row driver collect.

    Symbols follow the ``##`` continuation convention: the first
    character of a word is a bare symbol, every later character is
    ``##``-prefixed, and merging ``(l, r)`` produces ``l`` + ``r``
    stripped of its ``##`` (the right element of an adjacent pair is
    always a continuation symbol). Input words must be ``#``-free and
    separator-free — both enforced by a map-only filter here; the
    alpha-only normalization (functions/text.py ``normalized_tokens``)
    guarantees it for the query surface.

    Determinism contract: the score is evaluated as
    ``double(c) / (double(c_l) * double(c_r))`` — identical IEEE-754
    operations in Spark and the DuckDB oracle — ordered score DESC,
    then l ASC, r ASC, a total order.
    """
    spark = word_freq.sparkSession
    base = word_freq.where(
        (F.length(word_col) > 0)
        & ~F.col(word_col).contains(SEP) & ~F.col(word_col).contains("#")
    ).select(
        _wordpiece_repr(F.col(word_col)).alias("repr"),
        F.col(freq_col).cast("long").alias("freq"),
    ).persist()
    caches = [base]

    cur = base
    merges: list[tuple] = []
    for step in range(1, k + 1):
        syms = cur.select(_symbols(F.col("repr")).alias("syms"), "freq")
        units = (syms.select(F.explode("syms").alias("s"), "freq")
                 .groupBy("s").agg(F.sum("freq").alias("uc")))
        pair_counts = (
            syms.select(F.explode(_pairs(F.col("syms"))).alias("p"), "freq")
            .groupBy("p.l", "p.r")
            .agg(F.sum("freq").alias("c"))
        )
        scored = (
            pair_counts
            .join(units.select(F.col("s").alias("l"), F.col("uc").alias("cl")), "l")
            .join(units.select(F.col("s").alias("r"), F.col("uc").alias("cr")), "r")
            .select("l", "r", "c",
                    (F.col("c").cast("double")
                     / (F.col("cl").cast("double") * F.col("cr").cast("double"))
                     ).alias("score"))
        )
        top = (scored
               .orderBy(F.desc("score"), F.asc("l"), F.asc("r"))
               .limit(1)
               # quantize IN the engine: Python round() is banker's
               # rounding and flips exact 6dp halves (1/128 →
               # 0.007812) where SQL round (Spark F.round == DuckDB
               # round, half away from zero) gives 0.007813
               .withColumn("score6", F.round(F.col("score"), 6))
               .collect())
        if not top:
            break
        l, r, c = top[0]["l"], top[0]["r"], top[0]["c"]
        merged = l + (r[2:] if r.startswith("##") else r)
        merges.append((step, l, r, merged, int(c), float(top[0]["score6"])))
        cur = cur.select(
            F.replace(F.col("repr"),
                      F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                      F.lit(f"{SEP}{merged}{SEP}")).alias("repr"),
            "freq",
        )
        if step % checkpoint_rounds == 0 and step < k:
            nxt = cur.persist()
            nxt.count()
            if len(caches) > 1:
                caches[-1].unpersist()
                caches.pop()
            caches.append(nxt)
            cur = nxt

    merges_df = spark.createDataFrame(
        merges,
        "step INT, lhs STRING, rhs STRING, merged STRING, "
        "pair_count BIGINT, score DOUBLE")
    word_symbols = cur.select(_symbols(F.col("repr")).alias("syms"), "freq")
    word_symbols = word_symbols.withColumn(
        "w", F.array_join(F.transform(
            "syms", lambda s: F.regexp_replace(s, "^##", "")), ""))
    vocab = (word_symbols
             .select(F.explode("syms").alias("symbol"), "freq")
             .groupBy("symbol").agg(F.sum("freq").alias("freq")))
    return BPETrainResult(merges_df, vocab, word_symbols, caches)


def _wordpiece_repr(word) -> "F.Column":
    """WordPiece initial segmentation: first char bare, later chars
    ``##``-prefixed, separator-encoded like :func:`_initial_repr`.
    Built by ##-prefixing EVERY char then dropping the first symbol's
    ``##`` (bytes 2-3 of the encoding) — one regexp + one substring,
    mirrored byte-for-byte by the oracle SQL."""
    full = F.regexp_replace(word, "(?s)(.)", f"{SEP}##$1{SEP}")
    return F.concat(F.lit(SEP), full.substr(F.lit(4), F.length(full)))


def bpe_encode(words: DataFrame, merges: list[tuple[str, str]],
               word_col: str = "w", out: str = "syms") -> DataFrame:
    """Segment words with a TRAINED merge table — the tokenizer-apply
    half of :func:`bpe_train`.

    ``merges`` is the ordered (lhs, rhs) merge list (bounded: the
    trained vocabulary size, a driver-side constant of the tokenizer,
    exactly like the merges.txt file a production BPE tokenizer ships).
    Encoding replays the merges in training order as chained literal
    ``replace`` expressions over the separator encoding — pure
    whole-stage-codegen, no shuffle, no UDF; at corpus scale callers
    encode the DISTINCT word vocabulary and join back, so the encode
    cost is vocabulary-sized.

    Matches the trainer exactly on trained words: replaying the merge
    sequence on a word reproduces ``word_symbols`` (BPE encode is
    defined as merge-replay, Sennrich et al. 2016 §3.2).

    Input contract (ADVICE r8): words containing the separator
    ``\\x1f`` cannot be represented in the encoding — they pass through
    as a single unsegmented symbol instead of corrupting neighbors."""
    word = F.col(word_col)
    col = _initial_repr(word)
    for l, r in merges:
        col = F.replace(col, F.lit(f"{SEP}{l}{SEP}{SEP}{r}{SEP}"),
                        F.lit(f"{SEP}{l}{r}{SEP}"))
    return words.withColumn(
        out, F.when(word.contains(SEP), F.array(word)).otherwise(_symbols(col)))
