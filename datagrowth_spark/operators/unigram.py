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
  shipped sentencepiece.model), and the Viterbi DP is either a pure
  Catalyst fold (``F.aggregate`` over the position sequence — never
  unrolled per position, so expression size is O(maxp) regardless of
  word length or vocab) or, on the r12 Arrow carrier, the same
  integer DP in one ``mapInPandas`` stage. Three carriers with
  bit-identical semantics, auto-selected on ``MAP_BCAST_THRESHOLD``
  (``carrier`` / the legacy ``use_broadcast`` flag override):

  - trivial vocabs (≤ 256 pieces): a literal ``map_from_arrays``
    score map, looked up per candidate — zero joins, zero shuffles.
    Spark's map lookup is a LINEAR key scan and HOF bodies run
    interpreted (measured r10: an 8k-piece map-carrier E-step over a
    500k-distinct-word table ran >19 min without finishing one of 32
    tasks, stack-dump confirmed; the r11 crossover probe traced the
    curve — map E-step 36/60/183/381 s at 512/1024/2048/4096 pieces
    vs a flat ~15 s on the join path, BENCH_NOTES r11), so this path
    survives only below the smallest measured point, where per-round
    JOB count rather than per-row cost dominates.
  - large vocabs (auto since r12): the ARROW carrier — one
    ``mapInPandas`` stage per E-step/segmentation running
    :func:`_segment_word_py` (the exact-integer DP as O(len·maxp)
    dict lookups on native ints), model shipped as a SparkContext
    broadcast. Zero joins, zero shuffles, no layout persist; measured
    at the 10M/8k-vocab cliff decade vs the join carrier (r12 A/B,
    OPTIMIZATION_r12.md).
  - ``use_broadcast=True`` / ``carrier='join'``: the candidate-ID
    JVM E-step (early r12; the ``*_bcast`` queries pin this plan). A
    (word, start, plen) candidate layout is broadcast-HASH-joined
    against the (piece, id) frame and folded into a DENSE per-word
    PIECE-ID array — ONCE per training, because positions,
    substrings and the vocab SET are all fixed after seeding. Each
    round then attaches only the round's score VECTOR (a one-row
    ``array<long>`` broadcast in sorted-piece order) and the Viterbi
    fold does two O(1) ``element_at`` reads per lookup (slot → piece
    id → score). Per-round distributed work: one one-row broadcast —
    no join, no regroup, no corpus shuffle (before r12 every round
    re-joined the (piece, score) frame and re-built per-word score
    arrays with collect_list + array_sort; the join E-step was
    MEASURED at the cliff decade, SCALE_SMOKE_r11
    ``unigram_train_k{1,2}_v8k_join``: 8192 pieces over the
    10M-doc/~500k-word smoke corpus, ~17 s seed+round / ~12.7 s
    marginal per round — the same E-step whose map carrier could not
    finish ONE of 32 tasks in >19 min, r10 stack-dump).
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
    _kv_frame,
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


def _candidate_layout(df: DataFrame, word_col: str, maxp: int,
                      carry: list[str]) -> DataFrame:
    """Join-E-step layout: one row per (word, start, plen) — the
    candidate substring, NULL when start+plen-1 overruns the word —
    so the per-round score array is DENSE in (start, plen) order
    (index = (start-1)·maxp + plen). Positions never change between
    rounds, so the trainer builds this once and persists it
    pre-partitioned by word; only the scores join varies per round."""
    w = F.col(word_col)
    return (df
            .select(word_col, *carry,
                    F.explode(F.sequence(F.lit(1), F.length(w)))
                    .alias("__i"))
            .select(word_col, *carry, "__i",
                    F.explode(F.sequence(F.lit(1), F.lit(maxp)))
                    .alias("__p"))
            .select(word_col, *carry, "__i", "__p",
                    F.when(F.col("__i") + F.col("__p") - 1 <= F.length(w),
                           w.substr(F.col("__i"), F.col("__p")))
                    .alias("__piece")))


def _indexed_candidate_arrays(cands: DataFrame, pieces: list[str],
                              word_col: str, carry: list[str]) -> DataFrame:
    """One broadcast HASH join of the (piece, id) frame against the
    candidate layout, folded to a dense ``__ids`` PIECE-ID array per
    word (ids are 1-based positions in the SORTED piece list). NULL
    slots (invalid start/plen or out-of-vocab piece) reproduce the
    map-miss semantics exactly. Built ONCE per training/segmentation:
    the vocab SET is fixed after seeding, so only the SCORE VECTOR
    changes between EM rounds (r12 — the old per-round
    ``_scored_candidate_arrays`` re-joined the (piece, score) frame
    and re-built the per-word arrays with collect_list + array_sort
    every round, paying the join and the regroup k+1 times for a
    layout that never changes)."""
    pkv = _kv_frame(cands.sparkSession,
                    [(p, i + 1) for i, p in enumerate(pieces)],
                    "STRING", "__piece", "__pid")
    return (cands.join(F.broadcast(pkv), "__piece", "left")
            .groupBy(word_col, *carry)
            .agg(F.transform(
                F.array_sort(F.collect_list(
                    F.struct("__i", "__p", "__pid"))),
                # int ids: element_at wants an INT index, and int
                # arrays halve the persisted layout bytes (guide §2.3)
                lambda s: s["__pid"].cast("int")).alias("__ids")))


def _sv_frame(spark, scores6: dict[str, int],
              pieces: list[str]) -> DataFrame:
    """The round's score VECTOR in sorted-piece order as a ONE-ROW
    ``array<long>`` frame, attached by broadcast cross join: the
    vector is DATA (no vocab-sized expression tree — a 250k-piece
    literal would bloat analysis), every task holds exactly one copy,
    and ``element_at(vector, id)`` is an O(1) indexed read — so the
    per-round model swap touches no candidate row and re-plans
    nothing but this one-row broadcast."""
    values = [scores6[p] for p in pieces]
    if len(values) > 50_000:
        # Arrow batch transfer: a 250k-entry vector serializes in one
        # columnar pass instead of 250k pickled ints through Py4J
        import pandas as pd
        return spark.createDataFrame(
            pd.DataFrame({"__sv": [values]}), schema="__sv ARRAY<BIGINT>")
    return spark.createDataFrame([(values,)], "__sv ARRAY<BIGINT>")


def _id_score_at(ids: Column, sv: Column, maxp: int):
    """Piece-score lookup through the dense ``__ids`` piece-id array:
    two O(1) indexed reads ((start-1)·maxp + plen slot → piece id →
    score); NULL ids (invalid/OOV slots) propagate to NULL scores,
    matching the old per-round score-array semantics exactly. The
    index clamp mirrors the fold's prev-clamp: the ``p <= i`` guard
    is false wherever the clamp would matter."""
    def score_at(i: Column, p: int) -> Column:
        return F.element_at(
            sv, F.element_at(ids, F.greatest((i - p) * maxp + p, F.lit(1))))
    return score_at




def _map_score_at(w: Column, pm: Column):
    """Piece-score lookup against the ``__pm`` map column — O(|vocab|)
    per lookup (linear map scan; module HONEST LIMIT)."""
    def score_at(i: Column, p: int) -> Column:
        return F.element_at(pm, F.substring(w, i - p + 1, p))
    return score_at


def _segment_word_py(w: str | None, scores: dict[str, int],
                     maxp: int) -> list[str] | None:
    """Pure-Python replica of ``_forward`` + ``_backtrack`` + the
    reachability guard, for the Arrow carrier (r12, guide §4.2). The
    DP is EXACT-INTEGER (piece scores are micro-log ints, path values
    Python ints), the forward max skips missing/unreachable candidates
    exactly as ``greatest`` skips NULLs, and the backtrack applies the
    same fixed smallest-piece-first rule — so segmentations are
    bit-equal to the JVM folds on every input (pinned by
    TestArrowCarrier). ``None`` for NULL words and for words containing
    characters the model never saw (the segment() contract the JVM
    path expresses as ``when(reachable, ...)``)."""
    if w is None:
        return None
    n = len(w)
    if n == 0:
        # the JVM fold on an empty word yields bests=[0,...] with
        # reachable TRUE and an empty backtrack walk
        return []
    bests: list[int | None] = [0] + [None] * n
    for i in range(1, n + 1):
        best = None
        for p in range(1, min(maxp, i) + 1):
            prev = bests[i - p]
            if prev is None:
                continue
            v = scores.get(w[i - p:i])
            if v is None:
                continue
            s = prev + v
            if best is None or s > best:
                best = s
        bests[i] = best
    if bests[n] is None:
        return None
    pieces: list[str] = []
    pos = n
    while pos > 0:
        target = bests[pos]
        for p in range(1, min(maxp, pos) + 1):
            prev = bests[pos - p]
            if prev is None:
                continue
            v = scores.get(w[pos - p:pos])
            if v is not None and prev + v == target:
                pieces.append(w[pos - p:pos])
                pos -= p
                break
    pieces.reverse()
    return pieces


def _segment_python(df: DataFrame, word_col: str, out: str,
                    scores6: dict[str, int], maxp: int) -> DataFrame:
    """Arrow-carrier E-step/segmenter: ONE ``mapInPandas`` stage that
    appends the Viterbi segmentation (``array<string>``, NULL when
    unreachable) to ``df``. The model rides a SparkContext broadcast
    (one copy per executor, not per task closure); per word the DP is
    O(len·maxp) dict lookups on native Python ints — versus the JVM
    fold's interpreted per-candidate expression trees, and versus the
    join carrier's persisted (word × len × maxp) candidate layout,
    which this path does not build at all. Map-only: zero joins, zero
    shuffles, no layout persist; only the input's own columns cross
    the Arrow boundary (callers project first per guide §4.2)."""
    from pyspark.sql.types import ArrayType, StringType, StructField, StructType

    schema = StructType(list(df.schema.fields)
                        + [StructField(out, ArrayType(StringType()), True)])
    bc = df.sparkSession.sparkContext.broadcast(scores6)

    def run(batches):
        scores = bc.value
        for pdf in batches:
            pdf = pdf.copy()
            pdf[out] = [_segment_word_py(w, scores, maxp)
                        for w in pdf[word_col]]
            yield pdf

    return df.mapInPandas(run, schema)


def _forward(w: Column, score_at, maxp: int) -> Column:
    """Viterbi forward pass: ``bests[i+1]`` = best exact-integer path
    value segmenting the first ``i`` chars (1-indexed array; position
    0 seeds with 0). A pure fold over the char positions;
    ``score_at(i, p)`` supplies the score of the p-char piece ENDING
    at position i (NULL when invalid/OOV)."""
    def step(acc: Column, i: Column) -> Column:
        cands = []
        for p in range(1, maxp + 1):
            v = score_at(i, p)
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


def _backtrack(w: Column, score_at, bests: Column, maxp: int) -> Column:
    """Reconstruct the Viterbi segmentation: walk from the last
    position, taking at each step the SMALLEST piece length whose
    predecessor value + piece score equals the position's optimum —
    a fixed total rule, so both engines pick the same pieces even on
    tied paths. A fold with (pos, pieces) struct state; each step
    consumes ≥ 1 char, so ``length(w)`` iterations always finish.
    ``score_at`` as in :func:`_forward` (the piece TEXT always comes
    from ``substring(w, ...)`` — only the score lookup varies)."""
    def step(st: Column, _i: Column) -> Column:
        pos = st["pos"]
        sel = None
        for p in range(1, maxp + 1):
            piece = F.substring(w, pos - p + 1, p)
            v = score_at(pos, p)
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


def _resolve_carrier(use_broadcast: bool | None, carrier: str | None,
                     n_pieces: int) -> str:
    """E-step/segmenter carrier selection: ``carrier`` wins when given
    ('map' | 'join' | 'arrow'); else the legacy ``use_broadcast`` flag
    forces a JVM carrier (True → 'join', False → 'map'); else AUTO —
    the literal score map below :data:`MAP_BCAST_THRESHOLD` (tiny
    vocabs, where per-round JOB count dominates), the Arrow carrier
    above it (r12: measured faster than the join carrier at every
    vocab size — the join path stays reachable via the forced flag,
    which the ``*_bcast`` queries and plan-shape tests pin)."""
    if carrier is not None:
        if carrier not in ("map", "join", "arrow"):
            raise ValueError(f"unknown carrier {carrier!r}")
        return carrier
    if use_broadcast is not None:
        return "join" if use_broadcast else "map"
    return "map" if n_pieces <= MAP_BCAST_THRESHOLD else "arrow"


class UnigramTrainResult:
    """Result handle for :func:`unigram_train`.

    * ``scores6`` — final piece → micro-log-prob (the model; a bounded
      driver constant like a sentencepiece.model file).
    * ``counts`` — final E-step piece → freq-weighted count.
    * ``totals`` — per-round (t, v) normalization pairs, k+1 entries
      (seed first), for diagnostics.
    * ``caches`` — persisted frames; callers own their lifetime.
    * ``carrier`` — the E-step carrier training used ('map' | 'join'
      | 'arrow'); the observable the carrier-selection tests pin.
    """

    __slots__ = ("scores6", "counts", "totals", "caches", "_maxp",
                 "carrier")

    def __init__(self, scores6: dict[str, int], counts: dict[str, int],
                 totals: list[tuple[int, int]], caches: list[DataFrame],
                 maxp: int, carrier: str = "map") -> None:
        self.scores6 = scores6
        self.counts = counts
        self.totals = totals
        self.caches = caches
        self._maxp = maxp
        self.carrier = carrier

    def pieces_df(self, spark) -> DataFrame:
        """Pieces used by the final segmentation: (piece, cnt,
        logprob) — logprob back in real units."""
        rows = [(p, c, self.scores6[p] / 1000000.0)
                for p, c in self.counts.items() if c > 0]
        return spark.createDataFrame(
            rows, "piece STRING, cnt BIGINT, logprob DOUBLE")

    def segment(self, words: DataFrame, word_col: str = "w",
                out: str = "pieces",
                use_broadcast: bool | None = None,
                carrier: str | None = None) -> DataFrame:
        """Viterbi-segment ``word_col`` under the trained model (the
        tokenizer-apply half). Words containing characters the model
        never saw yield NULL pieces — the caller's contract.
        Carrier selection per :func:`_resolve_carrier` (``carrier``
        wins, then the legacy ``use_broadcast`` flag, then auto):
        literal score map / candidate-JOIN layout / Arrow
        ``mapInPandas`` — segmentations are bit-equal on all three
        paths (pinned by TestBroadcastCarrier / TestArrowCarrier)."""
        mode = _resolve_carrier(use_broadcast, carrier, len(self.scores6))
        if mode == "arrow":
            return _segment_python(words, word_col, out,
                                   self.scores6, self._maxp)
        w = F.col(word_col)
        reachable = F.element_at(F.col("__bests"), F.length(w) + 1).isNotNull()
        if mode == "map":
            base = words.withColumn("__pm", _piece_map(self.scores6))
            score_at = _map_score_at(w, F.col("__pm"))
            drops = ("__pm", "__bests")
        else:
            pieces = sorted(self.scores6)
            distinct_w = words.select(
                F.col(word_col).alias("__cw")).distinct()
            cands = _candidate_layout(distinct_w, "__cw", self._maxp, [])
            ids = _indexed_candidate_arrays(cands, pieces, "__cw", [])
            sv = _sv_frame(words.sparkSession, self.scores6, pieces)
            base = (words.join(ids, words[word_col] == ids["__cw"],
                               "left").drop("__cw")
                    .crossJoin(F.broadcast(sv)))
            score_at = _id_score_at(F.col("__ids"), F.col("__sv"),
                                    self._maxp)
            drops = ("__ids", "__sv", "__bests")
        return (base
                .withColumn("__bests", _forward(w, score_at, self._maxp))
                .withColumn(out, F.when(reachable,
                                        _backtrack(w, score_at,
                                                   F.col("__bests"),
                                                   self._maxp)))
                .drop(*drops))

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
    carrier: str | None = None,
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

    E-step carrier per :func:`_resolve_carrier` (``carrier`` wins,
    then the legacy ``use_broadcast`` flag, then auto on the vocab
    size): the literal score map for tiny vocabs, the Arrow
    ``mapInPandas`` segmenter for large ones (r12 auto default), with
    the candidate-JOIN layout (module docstring) reachable via
    ``use_broadcast=True`` / ``carrier='join'`` — identical integer
    DP on all three paths, so the trained model is bit-equal
    regardless of carrier.
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

    mode = _resolve_carrier(use_broadcast, carrier, len(scores6))
    pieces_sorted = sorted(scores6)
    layout = None
    if mode == "join":
        # piece-ID layout, built once (r12): positions/substrings AND
        # the vocab SET never change between rounds — only the score
        # VECTOR does — so the candidate join and the per-word regroup
        # happen exactly once; every round after that is a pure map
        # over the persisted (w, freq, __ids) frame plus one one-row
        # score-vector broadcast.
        layout = _indexed_candidate_arrays(
            _candidate_layout(base, "w", maxp, ["freq"]),
            pieces_sorted, "w", ["freq"]).persist()
        layout.count()
        caches.append(layout)

    for _round in range(k):
        if mode == "arrow":
            # one mapInPandas stage over the persisted (w, freq) base;
            # no candidate layout, no per-round join — the model rides
            # an executor broadcast (r12, guide §4.2)
            seg = _segment_python(base, "w", "pieces", scores6, maxp)
        elif mode == "join":
            sv = _sv_frame(word_freq.sparkSession, scores6, pieces_sorted)
            score_at = _id_score_at(F.col("__ids"), F.col("__sv"), maxp)
            seg = (layout.crossJoin(F.broadcast(sv))
                   .withColumn("__bests",
                               _forward(F.col("w"), score_at, maxp))
                   .withColumn("pieces",
                               _backtrack(F.col("w"), score_at,
                                          F.col("__bests"), maxp)))
        else:
            stepped = base.withColumn("__pm", _piece_map(scores6))
            score_at = _map_score_at(F.col("w"), F.col("__pm"))
            seg = (stepped
                   .withColumn("__bests",
                               _forward(F.col("w"), score_at, maxp))
                   .withColumn("pieces",
                               _backtrack(F.col("w"), score_at,
                                          F.col("__bests"), maxp)))
        rows = (seg.select(F.explode("pieces").alias("piece"), "freq")
                .groupBy("piece").agg(F.sum("freq").alias("c"))
                .collect())                           # model-sized
        counts = {p: 0 for p in scores6}
        counts.update({r["piece"]: int(r["c"]) for r in rows})
        t = sum(counts.values())
        scores6 = {p: _score6(c, t, v) for p, c in counts.items()}
        totals.append((t, v))

    return UnigramTrainResult(scores6, counts, totals, caches, maxp, mode)
