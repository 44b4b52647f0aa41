"""Unigram-LM (SentencePiece-style) tokenizer trainer — the EM
complement to ``operators/bpe.py``'s merge trainer.

Kudo 2018 ("Subword Regularization") trains a unigram language model
over subword pieces: E-step Viterbi-segments the corpus under current
piece log-probabilities, M-step re-estimates the probabilities from
the segmentation counts. Like the BPE trainer, everything factors
through WORD FREQUENCIES: after one corpus word-count aggregate, every
EM round runs on the distinct-word table.

Per-round plan shape (the ``operators/classifier.py`` pattern):

* The piece model is a bounded driver-side constant (exactly like a
  shipped sentencepiece.model): scores travel as ONE map column, so
  the E-step is a NARROW projection — the Viterbi DP is a pure
  Catalyst fold (``F.aggregate`` over the position sequence), no
  joins on the hot path, no Python, no shuffle. The map column has
  two physical carriers with identical semantics: ≤
  ``MAP_BCAST_THRESHOLD`` pieces inline as a literal
  ``map_from_arrays``; above it the scores ship as a ONE-ROW
  broadcast frame cross-joined in (``BroadcastNestedLoopJoin`` of a
  single row), so a real 32k–250k sentencepiece vocab never builds a
  vocab-sized Catalyst expression tree. Auto-selected;
  ``use_broadcast`` overrides. The Viterbi fold itself is NOT
  unrolled per position — ``F.aggregate`` evaluates one O(maxp)
  lambda iteratively at runtime — so expression size is O(maxp),
  independent of word length and vocab.

  HONEST LIMIT (measured r10, see operators/classifier.py): Spark
  evaluates ``element_at`` on a map column as a LINEAR key scan, and
  higher-order-function bodies ALWAYS run interpreted — so EITHER
  carrier costs O(|vocab|) string comparisons per candidate inside
  the fold. The carrier switch removes only the expression-size
  cliff (the plan compiles at any vocab); the lookup cost is real:
  an 8k-piece E-step over a 500k-distinct-word table ran >19 min
  without finishing one of 32 tasks (r10 smoke, stack-dump
  confirmed), while the default ~350-piece vocab is fine. A
  production 8k–250k vocab therefore REQUIRES the candidate-JOIN
  E-step (explode (position, length) substring candidates,
  broadcast-hash-join the piece frame — O(1)/candidate — then fold
  positions over the joined scores) — designed, not yet built; the
  classifier's join path (``classifier.py logreg_train
  use_broadcast``) is the pattern to follow.
* The M-step is one ``groupBy(piece)`` aggregate whose map-side
  combine collapses each task's output to ≤ vocab rows, then a
  model-sized driver collect. Per-round cost is flat in the round
  number and the vocab size, linear in the distinct-word count.

Determinism (house rule — a DuckDB oracle replays training exactly):

* Piece scores are integer MICRO-log-units (``round(ln(p)·1e6)``), so
  every Viterbi path value is an exact integer sum — no float-order
  dependence, layout-independent.
* Viterbi forward is a max over exact integers; ties cannot corrupt
  it (max of equal values is the value). The BACKTRACK applies a
  fixed rule — at each position take the SMALLEST piece length that
  achieves the optimum — so the chosen segmentation is a total
  deterministic function of the scores, identical in any engine,
  even on tied paths.
* M-step re-estimation divides exact integers once and rounds
  half-away back to micro-units.

Reference behavior anchor: the reference engine has no tokenizer —
this is the LLM-training-data surface the brief adds (see
``operators/bpe.py`` for the merge-based half).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagrowth_spark.operators.classifier import (
    MAP_BCAST_THRESHOLD,
    _map_frame,
    _round_half_away,
)

#: default structural bounds — words longer than MAX_WORD_LEN are
#: excluded from training (documented contract; tails are rare), and
#: pieces are at most MAX_PIECE_LEN chars.
MAX_WORD_LEN = 16
MAX_PIECE_LEN = 4


def _score6(c: int, t: int, v: int) -> int:
    """Add-one-smoothed micro-log-prob: ``round(ln((c+1)/(t+v))·1e6)``
    — the single place train-time float math happens (driver-side;
    the oracle's ``ln`` agrees at micro rounding)."""
    return _round_half_away(math.log((c + 1) / (t + v)) * 1000000.0)


def _piece_map(scores6: dict[str, int]) -> Column:
    pieces = sorted(scores6)
    return F.map_from_arrays(
        F.array(*[F.lit(p) for p in pieces]),
        F.array(*[F.lit(scores6[p]).cast("long") for p in pieces]),
    )


def _with_piece_map(df: DataFrame, scores6: dict[str, int],
                    use_broadcast: bool | None) -> DataFrame:
    """Attach the piece-score map as the ``__pm`` column via the
    carrier the model size calls for: a literal expression for small
    vocabs, a one-row broadcast frame above
    :data:`MAP_BCAST_THRESHOLD` (``use_broadcast`` forces either).
    Downstream Viterbi expressions reference ``F.col("__pm")`` and are
    identical on both paths, so segmentations are bit-equal."""
    if use_broadcast is None:
        use_broadcast = len(scores6) > MAP_BCAST_THRESHOLD
    if not use_broadcast:
        return df.withColumn("__pm", _piece_map(scores6))
    pmf = _map_frame(df.sparkSession,
                     sorted(scores6.items()), "STRING", "__pm")
    return df.crossJoin(F.broadcast(pmf))


def _forward(w: Column, pm: Column, maxp: int) -> Column:
    """Viterbi forward pass: ``bests[i+1]`` = best exact-integer path
    value segmenting the first ``i`` chars (1-indexed array; position
    0 seeds with 0). A pure fold over the char positions."""
    def step(acc: Column, i: Column) -> Column:
        cands = []
        for p in range(1, maxp + 1):
            v = F.element_at(pm, F.substring(w, i - p + 1, p))
            # NULL when p > i or the piece is out of vocab; greatest()
            # skips NULLs in both Spark and DuckDB. p=1 always hits
            # (every training char is a vocab piece), so a real value
            # exists at every position. The index clamp never changes
            # a selected value (the when() guard is false there) — it
            # only keeps ANSI element_at from throwing on index 0 if
            # an unselected branch is evaluated eagerly.
            prev = F.element_at(acc, F.greatest(i - p + 1, F.lit(1)))
            cands.append(F.when(F.lit(p) <= i, prev + v))
        return F.concat(acc, F.array(F.greatest(*cands)))

    # the init array MUST be nullable-element (array<bigint> parses as
    # containsNull=true): with a non-null literal's array<bigint,false>
    # accumulator, an unreachable position's NULL would silently coerce
    # to 0 and beat every real (negative) path value.
    return F.aggregate(
        F.sequence(F.lit(1), F.length(w)),
        F.array(F.lit(0).cast("long")).cast("array<bigint>"),
        step,
    )


def _backtrack(w: Column, pm: Column, bests: Column, maxp: int) -> Column:
    """Reconstruct the Viterbi segmentation: walk from the last
    position, taking at each step the SMALLEST piece length whose
    predecessor value + piece score equals the position's optimum —
    a fixed total rule, so both engines pick the same pieces even on
    tied paths. A fold with (pos, pieces) struct state; each step
    consumes ≥ 1 char, so ``length(w)`` iterations always finish."""
    def step(st: Column, _i: Column) -> Column:
        pos = st["pos"]
        sel = None
        for p in range(1, maxp + 1):
            piece = F.substring(w, pos - p + 1, p)
            v = F.element_at(pm, piece)
            # index clamps as in _forward: the `p <= pos` conjunct makes
            # the arm false whenever the clamp would matter
            prev = F.element_at(bests, F.greatest(pos - p + 1, F.lit(1)))
            ok = ((F.lit(p) <= pos) & v.isNotNull()
                  & ((prev + v) == F.element_at(bests,
                                                F.greatest(pos + 1, F.lit(1)))))
            choice = F.struct(F.lit(p).alias("p"), piece.alias("piece"))
            sel = F.when(ok, choice) if sel is None else sel.when(ok, choice)
        nxt = F.struct(
            (pos - sel["p"]).alias("pos"),
            F.concat(st["pieces"], F.array(sel["piece"])).alias("pieces"),
        )
        return F.when(pos <= 0, st).otherwise(nxt)

    init = F.struct(
        F.length(w).alias("pos"),
        F.array().cast("array<string>").alias("pieces"),
    )
    # the walk collects pieces from the END of the word — reverse for
    # the natural left-to-right segmentation
    return F.reverse(F.aggregate(
        F.sequence(F.lit(1), F.length(w)), init, step)["pieces"])


class UnigramTrainResult:
    """Result handle for :func:`unigram_train`.

    * ``scores6`` — final piece → micro-log-prob (the model; a bounded
      driver constant like a sentencepiece.model file).
    * ``counts`` — final E-step piece → freq-weighted count.
    * ``totals`` — per-round (t, v) normalization pairs, k+1 entries
      (seed first), for diagnostics.
    * ``caches`` — persisted frames; callers own their lifetime.
    """

    __slots__ = ("scores6", "counts", "totals", "caches", "_maxp")

    def __init__(self, scores6: dict[str, int], counts: dict[str, int],
                 totals: list[tuple[int, int]], caches: list[DataFrame],
                 maxp: int) -> None:
        self.scores6 = scores6
        self.counts = counts
        self.totals = totals
        self.caches = caches
        self._maxp = maxp

    def pieces_df(self, spark) -> DataFrame:
        """Pieces used by the final segmentation: (piece, cnt,
        logprob) — logprob back in real units."""
        rows = [(p, c, self.scores6[p] / 1000000.0)
                for p, c in self.counts.items() if c > 0]
        return spark.createDataFrame(
            rows, "piece STRING, cnt BIGINT, logprob DOUBLE")

    def segment(self, words: DataFrame, word_col: str = "w",
                out: str = "pieces",
                use_broadcast: bool | None = None) -> DataFrame:
        """Viterbi-segment ``word_col`` under the trained model (the
        tokenizer-apply half). Words containing characters the model
        never saw yield NULL pieces — the caller's contract.
        ``use_broadcast`` picks the score-map carrier (see
        :func:`_with_piece_map`); segmentations are bit-equal on
        either path."""
        w = F.col(word_col)
        reachable = F.element_at(F.col("__bests"), F.length(w) + 1).isNotNull()
        return (_with_piece_map(words, self.scores6, use_broadcast)
                .withColumn("__bests", _forward(w, F.col("__pm"), self._maxp))
                .withColumn(out, F.when(reachable,
                                        _backtrack(w, F.col("__pm"),
                                                   F.col("__bests"),
                                                   self._maxp)))
                .drop("__pm", "__bests"))

    def cleanup(self, blocking: bool = False) -> None:
        for frame in self.caches:
            frame.unpersist(blocking)
        self.caches = []


def unigram_train(
    word_freq: DataFrame,
    k: int = 2,
    vocab_multi: int = 300,
    word_col: str = "w",
    freq_col: str = "freq",
    maxp: int = MAX_PIECE_LEN,
    maxw: int = MAX_WORD_LEN,
    use_broadcast: bool | None = None,
) -> UnigramTrainResult:
    """Run ``k`` EM rounds of unigram-LM training over a (word, freq)
    vocabulary frame (the same input contract as ``bpe_train``).

    Seeding: all substrings up to ``maxp`` chars are counted with
    word-frequency-weighted multiplicity (one vocabulary-sized
    aggregate); the seed vocab is the top ``vocab_multi`` multi-char
    substrings by (count DESC, piece ASC) plus EVERY single char (so
    any training word stays segmentable); seed scores are the smoothed
    log-frequencies. Each round then Viterbi-segments every distinct
    word (E) and re-estimates piece scores from the freq-weighted
    piece counts (M). The vocab set is FIXED after seeding — unused
    pieces keep their smoothed floor score rather than being pruned,
    which keeps every round's normalization well-defined.

    ``use_broadcast`` picks the E-step score-map carrier (literal vs
    one-row broadcast frame; ``None`` auto-selects on the vocab size)
    — identical integer DP either way, so the trained model is
    bit-equal on both paths.
    """
    w = F.col(word_col)
    base = (word_freq
            .where((F.length(w) >= 1) & (F.length(w) <= maxw))
            .select(w.alias("w"), F.col(freq_col).cast("long").alias("freq"))
            .persist())
    caches = [base]

    n = F.length("w")
    subs = F.flatten(F.transform(
        F.sequence(F.lit(1), n),
        lambda i: F.transform(
            F.sequence(F.lit(1), F.least(F.lit(maxp), n - i + 1)),
            lambda p: F.substring(F.col("w"), i, p)),
    ))
    sub_counts = (base.select(F.explode(subs).alias("piece"), "freq")
                  .groupBy("piece").agg(F.sum("freq").alias("c")))
    multi = (sub_counts.where(F.length("piece") >= 2)
             .orderBy(F.desc("c"), F.asc("piece"))
             .limit(vocab_multi).collect())          # model-sized
    singles = sub_counts.where(F.length("piece") == 1).collect()
    counts = {r["piece"]: int(r["c"]) for r in multi}
    counts.update({r["piece"]: int(r["c"]) for r in singles})
    t, v = sum(counts.values()), len(counts)
    scores6 = {p: _score6(c, t, v) for p, c in counts.items()}
    totals = [(t, v)]

    for _round in range(k):
        seg = (_with_piece_map(base, scores6, use_broadcast)
               .withColumn("__bests", _forward(F.col("w"), F.col("__pm"), maxp))
               .withColumn("pieces", _backtrack(F.col("w"), F.col("__pm"),
                                                F.col("__bests"), maxp)))
        rows = (seg.select(F.explode("pieces").alias("piece"), "freq")
                .groupBy("piece").agg(F.sum("freq").alias("c"))
                .collect())                           # model-sized
        counts = {p: 0 for p in scores6}
        counts.update({r["piece"]: int(r["c"]) for r in rows})
        t = sum(counts.values())
        scores6 = {p: _score6(c, t, v) for p, c in counts.items()}
        totals.append((t, v))

    return UnigramTrainResult(scores6, counts, totals, caches, maxp)
