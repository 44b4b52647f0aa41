"""Distributed training of the hashed-feature linear quality classifier.

The missing half of ``functions/text.py hashed_linear_score`` (which
only APPLIES weights): a fastText-shaped logistic-regression trainer
(Joulin et al. 2016, "Bag of Tricks for Efficient Text Classification")
over the same hashed unigram+bigram feature space, run as ``k``
full-batch gradient-descent steps shaped like ``operators/bpe.py``'s
trainer — a driver loop whose per-step work is ONE mergeable aggregate
over the corpus feature frame.

Scale design (100 TB):

* The feature build is MAP-ONLY (r12, guide §2.4): each row is one
  document (``doc_id`` unique by contract), so its bucket sequence,
  label and feature count are per-row expressions — the pre-r12
  explode → groupBy(doc, bucket) → groupBy(doc) pair shuffled the
  corpus twice to compute what each row already determines. The
  persisted per-doc frame costs ZERO shuffles; the join carrier's
  flat per-occurrence layout is derived from it with exactly ONE
  corpus shuffle (the pre-partition by document that every step's
  aggregation and join-back then reuse).
* The model has TWO physical carriers with identical semantics (same
  integer arithmetic, bit-identical results):

  - ``n_buckets`` ≤ :data:`MAP_BCAST_THRESHOLD` → the DENSE weight
    vector as a literal ``F.array`` expression, folded over the
    per-row bucket array with O(1) ``element_at`` indexed reads
    (r12 — the old literal-MAP carrier paid an O(non-zero entries)
    linear scan per lookup). The fold is a higher-order function and
    runs interpreted, which is why this carrier is capped at trivial
    expression sizes where per-step JOB count, not per-row cost,
    dominates.
  - above it → the weights ship as a small (bucket, w6) frame
    BROADCAST-HASH-JOINED against the flat per-occurrence feature
    frame, then one per-doc aggregation and one co-partitioned
    join-back. This fixes BOTH large-model cliffs at once: no
    model-sized Catalyst expression tree, and O(1) HASHED lookup per
    feature inside WholeStageCodegen. Measured r10: map-column
    ``element_at`` is a LINEAR SCAN (``GetMapValueUtil.getValueEval``)
    and runs interpreted inside a higher-order ``aggregate``, so any
    map carrier costs O(|model|) per lookup — a 65536-bucket step at
    10M docs ran >55 min without finishing one task. Measured r12:
    a dense-ARRAY fold carrier (one-row broadcast array, O(1) per
    lookup) is still 4–8× slower than this join at sf0.1 — the
    interpreted-HOF per-element overhead, not the lookup complexity,
    is the bottleneck, so the per-step work must stay inside
    codegen'd join/aggregate operators. Auto-selected;
    ``use_broadcast`` overrides.
* On the join path each step's per-doc margin aggregation and the
  residual join-back reuse the flat frame's document partitioning —
  per-step shuffle work is exactly ONE bounded per-bucket gradient
  exchange (map-side combine collapses every task's output to
  ≤ ``n_buckets`` rows), the same as the literal path. The driver
  collects ≤ ``n_buckets`` gradient rows per step — bounded by the
  model size, not the data.
* Hot buckets cannot skew: the gradient aggregate's key space is the
  fixed bucket range and partials combine map-side.

Cross-engine determinism (the house rule, so a DuckDB oracle can
replay training bit-for-bit): weights live in integer MICRO-units and
gradients in NANO-units, so every sum is exact integer arithmetic with
no float-order dependence. Doubles appear only in three fixed-shape
per-row expressions — the margin division, the sigmoid, and the two
roundings back to integer units — each a deterministic IEEE op
identical on any engine. The gradient sum is cast to DECIMAL(38,0) so
it cannot overflow at any corpus size.

Reference behavior anchor: the reference engine has no trainer — this
is part of the LLM-training-data surface the brief adds (the apply
path mirrors ``hashed_linear_score``; CCNet/DSIR-style selection is
``operators/sampling.py:dsir_importance``).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from datagrowth_spark.functions.text import hashed_features, md5_long

#: integer unit scales: weights in micro (1e-6), residuals in nano (1e-9)
MICRO = 1_000_000

#: above this many buckets the plan switches from the literal
#: dense-array expression to the broadcast-hash-JOIN carrier. Set from
#: the measured r11 crossover probe (``scripts/carrier_crossover.py``,
#: 10M rows; full curve in BENCH_NOTES r11): the literal map carrier's
#: per-lookup LINEAR scan made its cost double with every model-size
#: doubling (unigram map E-step 36 → 60 → 183 → 381 s at 512 → 4096
#: pieces; classifier map step 57 → 257 s at 1024 → 16384 buckets)
#: while the join path is FLAT (15-30 s at every size, both trainers).
#: No crossover was found: the join also won both sf0.1 bench pairs at
#: the SMALLEST real model sizes (633-weight scorer 5.2 vs 9.7 s;
#: ~340-piece segmenter 3.4 vs 3.9 s). 256 keeps the literal
#: expression only for trivial models, where per-step JOB count (the
#: join path runs a broadcast + an extra aggregate per step), not
#: per-row cost, dominates — below the smallest measured point, so the
#: literal path there is a convenience, not a performance claim.
#: r12 re-confirmed the join side from the other direction: a one-row
#: broadcast dense-ARRAY fold carrier (O(1)/lookup, no join) measured
#: 4–8× SLOWER than the join at sf0.1 because higher-order folds run
#: interpreted — so the threshold is a codegen boundary, not a lookup-
#: complexity one. Bit-equality of the two carriers is pinned by
#: pytest at 64/256-bucket and maxp=8/4k-piece configs.
MAP_BCAST_THRESHOLD = 256


def _kv_frame(spark, entries: list[tuple], key_type: str,
              key_name: str, val_name: str) -> DataFrame:
    """Driver-side model entries as a small (key, value) frame — the
    broadcast-HASH-join carrier for large models."""
    schema = f"{key_name} {key_type}, {val_name} BIGINT"
    if len(entries) > 50_000:
        # Arrow batch transfer: a 2M-entry model serializes in one
        # columnar pass instead of 2M pickled tuples through Py4J
        import pandas as pd
        return spark.createDataFrame(
            pd.DataFrame(entries, columns=[key_name, val_name]),
            schema=schema)
    return spark.createDataFrame(entries, schema)


def _warr_literal(values: list[int]) -> Column:
    """Dense integer vector as a literal ``F.array`` expression —
    constant-folded by Catalyst to a single array Literal, so
    ``element_at`` is an O(1) indexed read. Small vectors only (the
    pre-folding expression tree is ``len(values)`` nodes)."""
    return F.array(*[F.lit(int(v)).cast("long") for v in values])


def _margin_from_array(text: Column, warr: Column,
                       n_buckets: int) -> Column:
    """Mean feature weight against a DENSE weight array (micro-units):
    per-feature O(1) ``element_at`` (bucket indices are always in
    [1, n_buckets], so ANSI element_at cannot throw), exact integer
    fold, one division. NULL text propagates to a NULL margin; an
    empty feature list folds to 0 → margin 0."""
    feats = hashed_features(text)
    num = F.aggregate(
        feats, F.lit(0).cast("long"),
        lambda acc, ft: acc + F.element_at(
            warr, (md5_long(ft) % n_buckets).cast("int") + F.lit(1)))
    n = F.greatest(F.size(feats), F.lit(1))
    return num / (F.lit(1000000.0) * n)


def _round_half_away(x: float) -> int:
    """SQL ``round()`` semantics (half away from zero) — Python's
    built-in ``round`` is banker's rounding and would diverge from the
    engines on exact .5 boundaries."""
    return int(math.floor(x + 0.5)) if x >= 0 else int(math.ceil(x - 0.5))


class LogRegModel:
    """Trained hashed-feature logistic model: ``w6`` is the full
    ``n_buckets``-long weight vector in micro-units — a driver-side
    constant of the model, like a shipped merges.txt."""

    __slots__ = ("w6", "n_buckets")

    def __init__(self, w6: list[int], n_buckets: int) -> None:
        self.w6 = w6
        self.n_buckets = n_buckets

    def margin(self, text: Column | str) -> Column:
        """Mean feature weight (the raw linear score), as the same
        map-only JVM expression ``hashed_linear_score`` promises for a
        trained model: per-feature O(1) ``element_at`` into the DENSE
        literal weight array (r12 — the old literal-MAP carrier paid
        an O(non-zero entries) linear scan per feature lookup), exact
        integer sum, one division. Literal-expression carrier, so
        small models only (the expression is ``n_buckets`` literals);
        large models go through :meth:`score_docs`'s broadcast hash
        join. NULL text yields a NULL margin (propagation — including
        for an all-zero model); empty text yields 0."""
        tcol = F.col(text) if isinstance(text, str) else text
        return _margin_from_array(tcol, _warr_literal(self.w6),
                                  self.n_buckets)

    def probability(self, text: Column | str) -> Column:
        """``round(sigmoid(margin) * 1e6) / 1e6`` — the 6dp-quantized
        probability, bit-identical across engines."""
        p6 = F.round(
            F.lit(1000000.0)
            / (F.lit(1.0) + F.exp(-self.margin(text)))
        ).cast("long")
        return p6 / F.lit(1000000.0)

    def score_docs(self, docs: DataFrame, text_col: str = "text",
                   out: str = "score",
                   use_broadcast: bool | None = None,
                   id_col: str = "doc_id") -> DataFrame:
        """Append the 6dp probability column — the DataFrame-level
        apply path that picks the model carrier on ``n_buckets``
        (``use_broadcast`` forces either): the literal dense-array
        expression for small models, a broadcast HASH join of the
        (bucket, w6) weight frame against the exploded feature rows
        above :data:`MAP_BCAST_THRESHOLD` (the join path keys docs by
        ``id_col``, which must be unique — a NULL id is tolerated for
        at most one row: the join-back matches null-safely via
        ``eqNullSafe``, so a NULL-id row scores identically on both
        carriers, ADVICE r11). Both paths compute identical integer
        expressions, so scores are bit-equal — including for NULL
        ``text_col``, which yields a NULL score on both (the join path
        explodes no feature rows for a NULL text, so the 0.5 backfill
        is explicitly gated on text being non-null; an EMPTY text is
        0.5 on both). The join path's exploded projection and hashed
        probe run inside WholeStageCodegen — measured 4–5× faster at
        sf0.1 than folding a broadcast dense array per row, because
        higher-order folds run interpreted (module docstring)."""
        if use_broadcast is None:
            use_broadcast = self.n_buckets > MAP_BCAST_THRESHOLD
        text = F.col(text_col)
        if not use_broadcast:
            return docs.withColumn(out, self.probability(text))
        entries = [(b, w) for b, w in enumerate(self.w6) if w != 0]
        wkv = _kv_frame(docs.sparkSession, entries, "BIGINT",
                        "bucket", "__w6")
        flat = docs.select(
            F.col(id_col).alias("__sid"),
            F.explode(hashed_features(text)).alias("__ft"),
        ).select("__sid",
                 (md5_long(F.col("__ft")) % self.n_buckets).alias("bucket"))
        per_doc = (flat.join(F.broadcast(wkv), "bucket", "left")
                   .groupBy("__sid")
                   .agg(F.sum(F.coalesce(F.col("__w6"),
                                         F.lit(0).cast("long"))).alias("__num"),
                        F.count(F.lit(1)).alias("__nf")))
        margin = F.col("__num") / (F.lit(1000000.0) * F.col("__nf"))
        p6 = F.round(F.lit(1000000.0)
                     / (F.lit(1.0) + F.exp(-margin))).cast("long")
        scores = per_doc.select("__sid", (p6 / F.lit(1000000.0)).alias("__p"))
        return (docs.join(scores,
                          docs[id_col].eqNullSafe(scores["__sid"]), "left")
                # feature-less docs never reach the aggregation: their
                # margin is 0 by contract → exactly 0.5 — but a NULL
                # text must stay NULL (the literal path's NULL margin
                # propagates; backfilling 0.5 here would silently
                # diverge between the two carriers)
                .withColumn(out, F.when(text.isNull(),
                                        F.lit(None).cast("double"))
                            .otherwise(F.coalesce(F.col("__p"),
                                                  F.lit(0.5))))
                .drop("__sid", "__p"))


class LogRegTrainResult:
    """Result handle for :func:`logreg_train`.

    * ``model`` — the trained :class:`LogRegModel`.
    * ``grad_norms`` — per-step sum of \\|gradient\\| in nano-units
      (driver-built, one row per EXECUTED step) for convergence
      monitoring and the early-stop rule.
    * ``stopped_early`` — True iff the relative-improvement stop rule
      fired (training ran fewer than ``k`` steps, or fired exactly on
      step ``k``).
    * ``n_docs`` — number of feature-bearing training documents (the
      GD normalizer N; docs with zero features are excluded).
    * ``caches`` — persisted frames the trainer created; callers own
      their lifetime (``cleanup()`` or register with a session hook).
    """

    __slots__ = ("model", "grad_norms", "stopped_early", "n_docs",
                 "caches", "carrier")

    def __init__(self, model: LogRegModel, grad_norms: list[int],
                 caches: list[DataFrame],
                 stopped_early: bool = False,
                 n_docs: int = 0,
                 carrier: str = "literal") -> None:
        self.model = model
        self.grad_norms = grad_norms
        self.stopped_early = stopped_early
        self.n_docs = n_docs
        self.caches = caches
        #: which weight carrier the training steps used — "literal"
        #: (dense-array expression) or "broadcast" (hash-joined weight
        #: frame); the auto-selection observable the boundary tests pin
        self.carrier = carrier

    def weights_df(self, spark) -> DataFrame:
        """Non-zero trained weights as (bucket, w) — w back in real
        units. Driver-built: the model is a bounded constant."""
        rows = [(b, w / MICRO) for b, w in enumerate(self.model.w6) if w != 0]
        return spark.createDataFrame(rows, "bucket BIGINT, w DOUBLE")

    def cleanup(self, blocking: bool = False) -> None:
        for frame in self.caches:
            frame.unpersist(blocking)
        self.caches = []


def logreg_train(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_buckets: int = 1024,
    lr: float = 300.0,
    use_broadcast: bool | None = None,
    stop_num: int | None = None,
    stop_den: int = 10,
) -> LogRegTrainResult:
    """Run ``k`` full-batch logistic-regression GD steps over hashed
    unigram+bigram features of ``text_col``; ``label`` is the 0/1
    target column (e.g. ``F.col("lang") == "en"``).

    Step math (all integer units, see module docstring):

    * ``margin_d = (Σ_b tf_db · w6_b) / (1e6 · n_d)``
    * ``p6_d = round(1e6 · sigmoid(margin_d))``
    * ``r9_d = round((p6_d − 1e6·y_d) · 1e3 / n_d)`` — the per-doc
      residual pre-divided by the doc's feature count
    * ``grad9_b = Σ_d tf_db · r9_d``  (exact, DECIMAL(38,0) sum)
    * ``w6_b ← round_half_away(w6_b − lr · grad9_b / (1e3 · N))``

    Documents with no features are excluded (they carry no gradient).

    ``lr`` note: with MEAN-normalized features (margin = Σ tf·w / n)
    each occurrence contributes ~``lr/n²`` to the next margin, so the
    nominal rate must be large — the default 300 moves margins by
    O(0.1–1) per step on ~500-token documents, the right scale for a
    few full-batch steps. This is the standard parameterization gap
    between per-sample SGD rates (fastText's 0.1) and full-batch GD on
    averaged features.

    ``use_broadcast`` picks the weight carrier per step (literal
    dense-array expression vs broadcast-hash-joined (bucket, w6)
    frame; ``None`` auto-selects on :data:`MAP_BCAST_THRESHOLD`) — the
    arithmetic is identical, so the trained weights are bit-equal on
    either path. On the join path ``id_col`` keys the per-doc
    aggregation and must be unique; the literal path never reads it.

    Driver memory bound: ``w6`` is materialized dense
    (``[0] * n_buckets`` Python ints, ~28 B each → ~56 MB at
    fastText's 2M buckets) and the join path rebuilds the non-zero
    (bucket, w6) frame each step via one Arrow batch (~16 MB at 2M
    entries) — both bounded by the MODEL size, never the corpus;
    measured fine at 65536 buckets (SCALE_SMOKE_r11
    ``logreg_train_k2_b65536_join``, 26.7 s at 10M docs; the join
    carrier's per-step marginal at 1024 buckets is 0.43 s vs the old
    map default's 15.1 s — the r11 crossover probe's flat curve).

    Early stop: with ``stop_num`` set, training halts after step ``i``
    (≥ 2) when ``norm_i · stop_den ≥ norm_{i-1} · stop_num`` — the
    exact-integer relative-improvement rule (e.g. ``stop_num=9,
    stop_den=10`` stops once a step removes < 10% of the gradient
    norm). Integer norms make the stop step a deterministic function
    of the data, replayable by a SQL oracle.
    """
    spark = docs.sparkSession
    text = F.col(text_col)
    buckets = F.transform(hashed_features(text),
                          lambda ft: (md5_long(ft) % n_buckets).cast("int"))
    # MAP-ONLY feature build (r12, guide §2.4): each row is one
    # document, so its bucket sequence, label and feature count are
    # per-row expressions — the old explode → groupBy(doc, bucket) →
    # groupBy(doc) pair shuffled the corpus twice for nothing. All
    # sums run per OCCURRENCE (Σ w over occurrences ≡ Σ tf·w over
    # distinct buckets, exact integers), so per-(doc, bucket) tf
    # pre-aggregation is unnecessary. int buckets halve the persisted
    # bytes vs long (guide §2.3).
    base = (docs
            .select(F.col(id_col).alias("__id"),
                    label.cast("int").alias("y"), buckets.alias("bk"))
            .where(F.size("bk") > 0)
            .select("__id", "y", F.size("bk").cast("long").alias("n"), "bk")
            .persist())
    n_docs = base.count()
    caches = [base]
    if use_broadcast is None:
        use_broadcast = n_buckets > MAP_BCAST_THRESHOLD
    flat = None
    if use_broadcast:
        # join-path layout: the per-OCCURRENCE (doc, bucket) frame,
        # derived from the persisted base (features hashed once) and
        # persisted PRE-PARTITIONED by document so every step's
        # per-doc aggregation and residual join-back reuse the
        # partitioning — the setup's ONLY corpus shuffle, and no
        # per-step corpus shuffle at all
        flat = (base.select("__id", "y", "n",
                            F.explode("bk").alias("bucket"))
                .repartition("__id")
                .persist())
        flat.count()
        caches.append(flat)
    w6 = [0] * n_buckets
    grad_norms: list[int] = []
    stopped = False

    for _step in range(k):
        if use_broadcast:
            # broadcast HASH join of the weight frame: O(1) hashed
            # lookup per feature row inside WholeStageCodegen (a map
            # column would linear-scan the model per lookup — the
            # measured r10 cliff — and a dense-array fold would run
            # interpreted — the measured r12 4–8× regression; module
            # docstring)
            entries = [(b, w) for b, w in enumerate(w6) if w != 0]
            wkv = _kv_frame(spark, entries, "BIGINT", "bucket", "__w6")
            num_df = (flat.join(F.broadcast(wkv), "bucket", "left")
                      .groupBy("__id", "y", "n")
                      .agg(F.sum(F.coalesce(
                          F.col("__w6"), F.lit(0).cast("long"))).alias("num")))
            margin = F.col("num") / (F.lit(1000000.0) * F.col("n"))
            p6 = F.round(F.lit(1000000.0)
                         / (F.lit(1.0) + F.exp(-margin))).cast("long")
            r9 = F.round(
                (p6 - F.col("y").cast("long") * MICRO)
                * F.lit(1000.0) / F.col("n")).cast("long")
            grad_src = (flat.join(num_df.select("__id", r9.alias("__r9")),
                                  "__id")
                        .select("bucket", "__r9"))
        else:
            # literal dense-array fold (O(1) indexed reads; the fold
            # itself is interpreted — trivial models only)
            warr = _warr_literal(w6)
            num = F.aggregate(
                F.col("bk"), F.lit(0).cast("long"),
                lambda acc, b: acc + F.element_at(warr, b + F.lit(1)))
            margin = num / (F.lit(1000000.0) * F.col("n"))
            p6 = F.round(
                F.lit(1000000.0) / (F.lit(1.0) + F.exp(-margin))).cast("long")
            r9 = F.round(
                (p6 - F.col("y").cast("long") * MICRO)
                * F.lit(1000.0) / F.col("n")).cast("long")
            grad_src = (base.select(r9.alias("__r9"),
                                    F.explode("bk").alias("bucket")))
        grad_rows = (
            grad_src.groupBy("bucket")
            # Σ r9 over occurrences ≡ Σ tf·r9 over distinct buckets;
            # DECIMAL(38,0): exact and overflow-proof at any corpus size
            .agg(F.sum(F.col("__r9").cast("decimal(38,0)")).alias("g9"))
            .collect()  # ≤ n_buckets rows — bounded by the MODEL size
        )
        norm = 0
        for row in grad_rows:
            g9 = int(row["g9"])
            norm += abs(g9)
            b = int(row["bucket"])
            w6[b] = _round_half_away(w6[b] - lr * g9 / (1000.0 * n_docs))
        grad_norms.append(norm)
        if (stop_num is not None and len(grad_norms) >= 2
                and grad_norms[-1] * stop_den >= grad_norms[-2] * stop_num):
            stopped = True
            break

    return LogRegTrainResult(
        LogRegModel(w6, n_buckets), grad_norms, caches,
        stopped_early=stopped, n_docs=n_docs,
        carrier="broadcast" if use_broadcast else "literal")
