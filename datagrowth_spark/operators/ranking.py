"""Distributed exact ranking — global rank / ntile without a global sort.

A bare ``Window.orderBy(...)`` funnels the whole frame through ONE task
(WindowExec warns, the plan grows an ``Exchange SinglePartition``) — the
classic 100 TB scale-killer. Exact global ranks don't need a global
sort: shard the frame on quantile-derived cuts of the sort key (one
bounded ``percentile_approx`` pass), rank WITHIN each shard, and shift
each shard's local ranks by the row count of the shards before it. The
only single-partition work is the per-shard-count prefix sum — one row
per shard, never corpus-sized. Same two-pass shape as the packing
prefix sum (operators/packing.py:54); shard boundaries cancel out of
the final ranks, so quantile approximation error affects only balance,
never values.

Shard ids are derived from the DATA (cut comparisons), not from
``spark_partition_id()`` — a partition-id scheme would break the moment
AQE coalesces the two plan branches differently; data-derived shards
are invariant to physical partitioning.

Ties on the primary key compare equal to every cut the same way, so a
single-level scheme necessarily lands a whole tie group in ONE shard —
and a low-cardinality key (5 distinct quality buckets over 10^9 rows)
would collapse the sharding back into the single-task window this
operator exists to kill. The fix is TIE-GROUP SUB-SHARDING, and the
detector is free: ``percentile_approx`` returns observed data values,
so a key owning more than ``1/num_shards`` of the mass appears MULTIPLE
times in the raw (pre-distinct) cut array, and its multiplicity ``m``
is a direct estimate of how many shards its tie group deserves. Heavy
keys are then split ``m + 1`` ways:

- **Tiebreaks given, first tiebreak quantile-shardable** (numeric /
  temporal): a second lazy aggregate computes per-heavy-key percentile
  cuts of the FIRST TIEBREAK over just that tie group; sub-shard =
  position among those cuts. Sub-shards are ordered consistently with
  the tiebreak, so ranks stay EXACT (equal ``(key, tb1)`` pairs still
  share a sub-shard — deeper tiebreaks resolve inside one window, the
  same contract as the primary key). When no key is heavy, AQE prunes
  the empty broadcast join and the refinement costs nothing at runtime.
- **No tiebreaks**: rank within a tie group is an arbitrary-but-valid
  permutation (the global-window contract for a non-total ordering), so
  heavy groups are split by a deterministic ``xxhash64`` of the whole
  row — any split is valid. Fully identical rows hash together; a
  corpus that is one row duplicated a billion times stays one task
  (documented limit; give a tiebreak to avoid it).
- **First tiebreak not shardable** (e.g. string): no sub-sharding —
  the tie group stays whole so the tiebreak ordering stays exact.
  Callers with low-cardinality keys and string tiebreaks should order
  by a shardable tiebreak first. Documented contract, not silent:
  balance can be asserted with :func:`tie_shard_counts`.

Remaining un-split cases: NULL and NaN keys route through their own
explicit shards (percentile sketches can't see them) — a frame that is
mostly NULL-keyed keeps a fat shard.

Shadow-collision guard: the quantile shadow is a ``double``, so 64-bit
keys beyond 2^53 can collide distinct values into one shadow — and a
collided "tie group" must NOT be sub-split (the split would reorder
genuinely different keys; shard assignment itself stays correct because
collided rows always land in one shard and the within-shard window
sorts by the ORIGINAL columns). For bigint/timestamp keys each flagged
heavy group is therefore verified with an exact ``min(key) == max(key)``
check before any split; unverified groups stay whole. Dense giant-int
keys that need split balance should be rescaled under 2^53.

The reference has no ranking operators (Django ORM querysets); this
serves the repo's own segmentation queries (RFM quartiles) at scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datagrowth_spark.operators.packing import _SHARDABLE_KEY_TYPES, _quantile_key

_ACCURACY = 10000
# Working-column namespace; asserted absent from the input so a caller
# column can never be silently overwritten and dropped (ADVICE r4).
_WORK_COLS = ("_dg_qkey", "_dg_qtb", "_dg_shard", "_dg_sub", "_dg_rn",
              "_dg_off", "_dg_total", "_dg_rawcuts", "_dg_cuts",
              "_dg_hv", "_dg_hm", "_dg_subcuts", "_dg_p",
              "_dg_rank", "_dg_n")


def _default_num_shards(spark) -> int:
    # The conf can be non-numeric on some platforms ("auto" under
    # Databricks AQE) — fall back rather than raise (ADVICE r4).
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except (ValueError, TypeError):
        return 200


def _assert_work_cols_free(df: DataFrame) -> None:
    clash = [c for c in _WORK_COLS if c in df.columns]
    if clash:
        raise ValueError(
            f"add_global_rank uses reserved working columns {clash}; "
            "rename them in the input frame")


def _sort_exprs(key: str, tiebreaks: tuple, descending: bool) -> list[Column]:
    head = F.col(key).desc() if descending else F.col(key).asc()
    return [head, *[F.col(t).asc() for t in tiebreaks]]


def _grid_probs(num_shards: int) -> list[float]:
    return [i / num_shards for i in range(1, num_shards)]


def _count_below(cuts: Column, value: Column) -> Column:
    """Number of cut values strictly below ``value`` — the shard index.

    Monotone in the ordering (Spark compares NaN as the largest value,
    so NaN rows count above every finite cut when the caller hasn't
    routed them elsewhere)."""
    return F.aggregate(
        F.coalesce(cuts, F.array().cast("array<double>")),
        F.lit(0),
        lambda acc, c: acc + (value > c).cast("int"))


def raw_cut_sketch(df: DataFrame, key: str, descending: bool = False,
                   num_shards: int | None = None,
                   out: str = "_dg_rawcuts") -> DataFrame:
    """One-row frame with the RAW percentile array of the (sign-adjusted)
    key shadow — ``num_shards - 1`` values, duplicates preserved.

    Chained rank passes over the same frame (e.g. the three RFM
    metrics) should compute all their sketches in ONE aggregate — build
    each with this function and join the 1-row frames (or agg multiple
    expressions) — then hand the shared frame to :func:`add_global_rank`
    via ``raw_cuts=(frame, column)``. One corpus pass instead of one
    per metric.
    """
    spark = df.sparkSession
    if num_shards is None:
        num_shards = _default_num_shards(spark)
    key_type = df.schema[key].dataType.simpleString()
    if key_type not in _SHARDABLE_KEY_TYPES:
        raise TypeError(
            f"rank sharding needs a numeric/temporal key, got {key}:{key_type}")
    return df.agg(raw_cut_expr(key, key_type, descending, num_shards).alias(out))


def raw_cut_expr(key: str, key_type: str, descending: bool,
                 num_shards: int) -> Column:
    """The aggregate expression behind :func:`raw_cut_sketch`, for
    callers batching several sketches into one ``agg(...)``."""
    qkey = _quantile_key(key, key_type)
    if descending:
        qkey = -qkey
    probs = _grid_probs(num_shards)
    if not probs:
        return F.array().cast("array<double>")
    return F.percentile_approx(
        qkey, F.array(*[F.lit(p) for p in probs]), F.lit(_ACCURACY))


def _count_below_lit(cut_values: list[float], value: Column) -> Column:
    """Literal-cuts variant of :func:`_count_below` — no 1-row frame,
    no broadcast join, just an in-row fold over a constant array."""
    if not cut_values:
        return F.lit(0)
    return F.aggregate(
        F.array(*[F.lit(float(c)) for c in cut_values]),
        F.lit(0),
        lambda acc, c: acc + (value > c).cast("int"))


def _eager_shard_exprs(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...],
    descending: bool,
    num_shards: int,
    raw_cuts: list[float] | None = None,
    stats_df: DataFrame | None = None,
    qkey_col: str = "_dg_qkey",
) -> tuple[Column, Column, Column]:
    """Eager core: collect the bounded percentile sketch driver-side
    (``num_shards - 1`` doubles — the same eager sampling Spark's own
    RangePartitioner does) and build the ``(qkey, shard, sub)``
    assignments as LITERAL-only column expressions. The returned shard
    and sub expressions reference only the input's column names plus
    ``qkey_col`` (attach the returned qkey under that name first), so
    callers can apply them to any row-equivalent frame — that is what
    lets the offsets collect run against a cached stats frame, and a
    per-pass ``qkey_col`` lets SEVERAL passes' expressions coexist in
    one combined counts job (:func:`multi_offset_counts`). Costs at
    most TWO actions at plan-construction time: the sketch (skipped
    when ``raw_cuts`` is given) and one combined heavy-group refinement
    (shadow-collision guard + tiebreak percentiles in a single
    aggregate; skipped when nothing is heavy). Callers chaining several
    passes over one frame should persist it and/or share a collected
    sketch via ``raw_cuts``."""
    ctx = _plan_context(df, key, tiebreaks, descending, num_shards,
                        raw_cuts, stats_df, qkey_col)
    rows = _refine_single(ctx)
    return ctx["qkey"], ctx["shard"], _finish_sub(ctx, rows)


def _plan_context(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...],
    descending: bool,
    num_shards: int,
    raw_cuts: list[float] | None,
    stats_df: DataFrame | None,
    qkey_col: str,
) -> dict:
    """Phase A of the eager core: pure driver arithmetic once the raw
    cuts are in hand (one collect when they aren't) — cuts, heavy tie
    groups, the shard expression, and what refinement (if any) phase B
    must run."""
    import math

    key_type = df.schema[key].dataType.simpleString()
    if key_type not in _SHARDABLE_KEY_TYPES:
        raise TypeError(
            f"add_global_rank needs a numeric/temporal key, got {key}:{key_type}")

    qkey = _quantile_key(key, key_type)
    if descending:
        qkey = -qkey
    qc = F.col(qkey_col)
    # Stats actions may run against a cheaper row-equivalent frame
    # (e.g. the persisted base of a chain of rank passes — appending
    # rank columns never changes the rows the sketches see).
    stats_base = stats_df if stats_df is not None else df
    stats_q = stats_base.withColumn(qkey_col, qkey)

    if raw_cuts is None:
        probs = _grid_probs(num_shards)
        if probs:
            # collect()[0], not first(): first() is take(1), which runs
            # several incremental partial jobs even on a 1-row aggregate.
            row = stats_q.agg(F.percentile_approx(
                qkey_col, F.array(*[F.lit(p) for p in probs]),
                F.lit(_ACCURACY)).alias("c")).collect()[0]
            raw_cuts = list(row["c"] or [])
        else:
            raw_cuts = []
    raw = [c for c in raw_cuts if c is not None and not math.isnan(c)]
    cuts = sorted(set(raw))
    # Heavy keys and how many sub-shards each deserves (see module
    # docstring): multiplicity m among the raw cuts -> m + 1 shards.
    heavy = {v: raw.count(v) + 1 for v in cuts if raw.count(v) >= 2}

    null_shard = num_shards + 1 if descending else -1
    nan_shard = -1 if descending else num_shards
    shard = F.when(qc.isNull(), F.lit(null_shard))
    if key_type in ("float", "double"):
        shard = shard.when(F.isnan(qc), F.lit(nan_shard))
    shard = shard.otherwise(_count_below_lit(cuts, qc))

    tb_shardable = False
    qtb = None
    if tiebreaks:
        tb_type = df.schema[tiebreaks[0]].dataType.simpleString()
        tb_shardable = tb_type in _SHARDABLE_KEY_TYPES
        if tb_shardable:
            qtb = _quantile_key(tiebreaks[0], tb_type)
    # Refinements only matter for heavy groups:
    # * guard — for 64-bit keys beyond 2^53 the double shadow is lossy,
    #   so "heavy" can flag DISTINCT keys that merely collide in the
    #   shadow; only groups certified min(key) == max(key) may be split
    #   (unsafe ones stay whole — correct, at the cost of balance for
    #   pathological dense giant-int ties; rescale such keys under 2^53);
    # * tb — percentiles of the first tiebreak inside each heavy tie
    #   group, sliced down to m-1 sub-cuts driver-side.
    need_guard = bool(heavy) and key_type in (
        "bigint", "timestamp", "timestamp_ntz")
    need_tb = bool(heavy) and bool(tiebreaks) and tb_shardable
    # The returned exprs must resolve on a row-equivalent stats frame
    # too (documented contract), so the no-tiebreak hash split may only
    # hash columns both frames carry.
    hash_cols = (df.columns if stats_df is None else
                 [c for c in df.columns if c in stats_df.columns])
    return {
        "key": key, "tiebreaks": tuple(tiebreaks), "descending": descending,
        "num_shards": num_shards, "qkey_col": qkey_col, "qkey": qkey,
        "qtb": qtb, "shard": shard, "cuts": cuts, "heavy": heavy,
        "need_guard": need_guard, "need_tb": need_tb,
        "grid": _grid_probs(max(num_shards, 2)),
        "stats_base": stats_base, "stats_q": stats_q,
        "hash_cols": hash_cols,
    }


def _refine_single(ctx: dict) -> list[tuple[float, bool | None, list | None]]:
    """Phase B for one pass: ONE bounded action over just the
    heavy-flagged rows covering both the shadow-collision guard and the
    tiebreak percentiles (<= num_shards groups). Returns
    ``(shadow_value, all_same_key | None, tb_percentiles | None)``
    rows; empty when no refinement is needed."""
    if not (ctx["need_guard"] or ctx["need_tb"]):
        return []
    qc = F.col(ctx["qkey_col"])
    src = ctx["stats_q"].where(qc.isin([float(v) for v in ctx["heavy"]]))
    aggs = []
    if ctx["need_guard"]:
        aggs += [F.min(ctx["key"]).alias("_dg_mn"),
                 F.max(ctx["key"]).alias("_dg_mx")]
    if ctx["need_tb"]:
        src = src.withColumn("_dg_qtb", ctx["qtb"])
        aggs.append(F.percentile_approx(
            "_dg_qtb", F.array(*[F.lit(p) for p in ctx["grid"]]),
            F.lit(_ACCURACY)).alias("_dg_p"))
    rows = src.groupBy(ctx["qkey_col"]).agg(*aggs).collect()
    return [
        (r[ctx["qkey_col"]],
         (r["_dg_mn"] == r["_dg_mx"]) if ctx["need_guard"] else None,
         list(r["_dg_p"] or []) if ctx["need_tb"] else None)
        for r in rows
    ]


def _finish_sub(ctx: dict,
                rows: list[tuple[float, bool | None, list | None]]) -> Column:
    """Phase C: fold the refinement rows into the literal sub-shard
    expression (pure driver arithmetic, no jobs)."""
    import math

    heavy = ctx["heavy"]
    if not heavy:
        return F.lit(0)
    qc = F.col(ctx["qkey_col"])
    if ctx["need_guard"]:
        safe = {v for v, same, _ in rows if same}
        heavy = {v: m for v, m in heavy.items() if v in safe}
        if not heavy:
            return F.lit(0)

    if ctx["need_tb"]:
        qtb = ctx["qtb"]
        g = len(ctx["grid"]) + 1
        sub = F.lit(0)
        for v, _, p in rows:
            p = list(p or [])
            m = heavy.get(v)
            if not m or not p:
                continue
            picks = {p[min(len(p) - 1, max(0, round(i * g / m) - 1))]
                     for i in range(1, m)}
            picks = sorted(c for c in picks
                           if c is not None and not math.isnan(c))
            tb_null_first = F.when(qtb.isNull(), F.lit(0)).otherwise(
                _count_below_lit(picks, qtb))
            sub = F.when(qc == F.lit(float(v)), tb_null_first
                         ).otherwise(sub)
        return sub

    if not ctx["tiebreaks"]:
        # Arbitrary-but-valid tie permutation (see module docstring). A
        # common column set reduced to the key alone degrades the split
        # (constant within a tie group) but stays valid.
        row_hash = F.xxhash64(*[F.col(c) for c in ctx["hash_cols"]])
        sub = F.lit(0)
        for v, m in heavy.items():
            sub = F.when(qc == F.lit(float(v)),
                         F.pmod(row_hash, F.lit(m)).cast("int")).otherwise(sub)
        return sub

    # Non-shardable first tiebreak: keep tie groups whole so the
    # tiebreak ordering stays exact (documented contract).
    return F.lit(0)


def _apply_shard_exprs(df: DataFrame, exprs,
                       qkey_col: str = "_dg_qkey") -> DataFrame:
    qkey, shard, sub = exprs
    return (df.withColumn(qkey_col, qkey)
            .withColumn("_dg_shard", shard)
            .withColumn("_dg_sub", sub))


def eager_rank_plan(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    descending: bool = False,
    num_shards: int | None = None,
    raw_cuts: list[float] | None = None,
    stats_df: DataFrame | None = None,
    qkey_col: str = "_dg_qkey",
) -> dict:
    """Precompute one eager rank pass's literal shard expressions, for
    callers batching SEVERAL passes over one frame: build each pass's
    plan (with a distinct ``qkey_col``), collect every pass's offset
    counts in ONE job via :func:`multi_offset_counts`, then hand both
    to :func:`add_global_rank`/``add_ntile`` as ``plan=`` /
    ``offset_counts=`` — construction cost collapses to (shared sketch)
    + (per-pass heavy refinement, usually zero or one) + (one combined
    counts job), instead of one counts job per pass."""
    spark = df.sparkSession
    if num_shards is None:
        num_shards = _default_num_shards(spark)
    if qkey_col in df.columns or (
            stats_df is not None and qkey_col in stats_df.columns):
        raise ValueError(
            f"eager_rank_plan: qkey_col {qkey_col!r} collides with an "
            "input column; pick another name")
    exprs = _eager_shard_exprs(df, key, tiebreaks, descending, num_shards,
                               raw_cuts=raw_cuts, stats_df=stats_df,
                               qkey_col=qkey_col)
    return {"exprs": exprs, "qkey_col": qkey_col, "key": key,
            "tiebreaks": tuple(tiebreaks), "descending": descending,
            "num_shards": num_shards}


def multi_rank_plans(
    df: DataFrame,
    specs: dict[str, dict],
    stats_df: DataFrame | None = None,
) -> dict[str, dict]:
    """Build SEVERAL eager rank plans over one frame with at most ONE
    combined refinement job across all of them (vs one per heavy pass
    when plans are built individually).

    ``specs``: ``{name: {"key": ..., "tiebreaks": (), "descending":
    bool, "num_shards": int, "raw_cuts": [...]}}`` — ``raw_cuts``
    should come from one shared :func:`raw_cut_expr` aggregate so the
    sketches are also a single job; all passes must share
    ``num_shards`` (one percentile grid serves the combined agg).

    The combined job explodes one (pass, shadow-value, key-as-string,
    tiebreak-shadow) struct per needing pass and aggregates min/max +
    tiebreak percentiles per (pass, heavy value) — the string cast
    makes the collision guard type-uniform across passes, and
    ``min == max`` detects a true single-valued tie group regardless of
    the string ordering. Chain with :func:`multi_offset_counts` and
    ``add_global_rank(plan=..., offset_counts=...)`` for a fixed
    three-action construction budget no matter how many passes.
    """
    shard_counts = {spec.get("num_shards") for spec in specs.values()}
    if len(shard_counts) > 1:
        raise ValueError(
            "multi_rank_plans: all specs must share num_shards "
            f"(got {sorted(map(str, shard_counts))})")
    # Same collision guard as eager_rank_plan: a generated qkey column
    # already present in the input would silently shadow real data in
    # the shard projection and yield wrong sub-shard offsets.
    for name in specs:
        qkey_col = f"_dg_qkey_{name}"
        if qkey_col in df.columns or (
                stats_df is not None and qkey_col in stats_df.columns):
            raise ValueError(
                f"multi_rank_plans: generated qkey_col {qkey_col!r} "
                "collides with an input column; rename the pass or the "
                "column")
    contexts = {
        name: _plan_context(
            df, spec["key"], tuple(spec.get("tiebreaks", ())),
            bool(spec.get("descending", False)),
            spec.get("num_shards") or _default_num_shards(df.sparkSession),
            spec.get("raw_cuts"), stats_df, f"_dg_qkey_{name}")
        for name, spec in specs.items()
    }
    refine: dict[str, list] = {name: [] for name in contexts}
    needing = {n: c for n, c in contexts.items()
               if c["need_guard"] or c["need_tb"]}
    if needing:
        src = next(iter(needing.values()))["stats_base"]
        structs, pred = [], None
        grid = next(iter(needing.values()))["grid"]
        for n, c in needing.items():
            src = src.withColumn(c["qkey_col"], c["qkey"])
            tb_col = f"_dg_qtb_{n}"
            if c["need_tb"]:
                src = src.withColumn(tb_col, c["qtb"])
            structs.append(F.struct(
                F.lit(n).alias("m"),
                F.col(c["qkey_col"]).alias("v"),
                (F.col(c["key"]).cast("string") if c["need_guard"]
                 else F.lit(None).cast("string")).alias("kstr"),
                (F.col(tb_col) if c["need_tb"]
                 else F.lit(None).cast("double")).alias("tb"),
            ))
            this = (F.col("x.m") == F.lit(n)) & F.col("x.v").isin(
                [float(v) for v in c["heavy"]])
            pred = this if pred is None else (pred | this)
        rows = (
            src.select(F.explode(F.array(*structs)).alias("x"))
            .where(pred)
            .groupBy("x.m", "x.v")
            .agg(F.min("x.kstr").alias("_dg_mn"),
                 F.max("x.kstr").alias("_dg_mx"),
                 F.percentile_approx(
                     "x.tb", F.array(*[F.lit(p) for p in grid]),
                     F.lit(_ACCURACY)).alias("_dg_p"))
            .collect())
        for r in rows:
            c = contexts[r["m"]]
            refine[r["m"]].append((
                r["v"],
                (r["_dg_mn"] == r["_dg_mx"]) if c["need_guard"] else None,
                list(r["_dg_p"] or []) if c["need_tb"] else None))
    return {
        name: {"exprs": (c["qkey"], c["shard"],
                         _finish_sub(c, refine[name])),
               "qkey_col": c["qkey_col"], "key": c["key"],
               "tiebreaks": c["tiebreaks"], "descending": c["descending"],
               "num_shards": c["num_shards"]}
        for name, c in contexts.items()
    }


def multi_offset_counts(
    stats_df: DataFrame,
    plans: dict[str, dict],
) -> dict[str, list[tuple[int, int, int]]]:
    """Per-(shard, sub) row counts for SEVERAL rank passes over one
    row-equivalent frame in ONE job: each pass's qkey is attached under
    its own ``qkey_col``, the (pass, shard, sub) triples are exploded
    from a single projection, and one groupBy-count serves every pass.
    Feed each returned list to ``add_global_rank(offset_counts=...)``.
    Bounded output: passes x shards x subs rows, never corpus-sized."""
    qkey_cols = [p["qkey_col"] for p in plans.values()]
    dupes = {c for c in qkey_cols if qkey_cols.count(c) > 1}
    if dupes:
        # Two plans sharing a qkey column would silently evaluate one
        # pass's shard/sub exprs against the other's key — use
        # multi_rank_plans (per-pass qkey cols) rather than several
        # eager_rank_plan defaults.
        raise ValueError(
            f"multi_offset_counts: plans share qkey_col(s) {sorted(dupes)}")
    with_q = stats_df
    structs = []
    for name, plan in plans.items():
        qkey, shard, sub = plan["exprs"]
        with_q = with_q.withColumn(plan["qkey_col"], qkey)
        structs.append(F.struct(
            F.lit(name).alias("m"), shard.alias("s"), sub.alias("b")))
    rows = (with_q.select(F.explode(F.array(*structs)).alias("x"))
            .groupBy("x.m", "x.s", "x.b").count().collect())
    out: dict[str, list[tuple[int, int, int]]] = {n: [] for n in plans}
    for r in rows:
        out[r["m"]].append((r["s"], r["b"], r["count"]))
    return {name: sorted(counts) for name, counts in out.items()}


def _eager_sharded(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...],
    descending: bool,
    num_shards: int,
    raw_cuts: list[float] | None = None,
    stats_df: DataFrame | None = None,
) -> DataFrame:
    return _apply_shard_exprs(df, _eager_shard_exprs(
        df, key, tiebreaks, descending, num_shards,
        raw_cuts=raw_cuts, stats_df=stats_df))


def _sharded(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...],
    descending: bool,
    num_shards: int,
    raw_cuts: tuple[DataFrame, str] | None = None,
) -> DataFrame:
    """Attach ``_dg_shard`` / ``_dg_sub`` (and keep ``_dg_qkey``) so that
    (a) the lexicographic (shard, sub) order is consistent with the
    requested global order across groups, and (b) within one (shard,
    sub) group a window ordered by the full ORDER BY yields correct
    local ranks. Exposed for the balance tests."""
    key_type = df.schema[key].dataType.simpleString()
    if key_type not in _SHARDABLE_KEY_TYPES:
        raise TypeError(
            f"add_global_rank needs a numeric/temporal key, got {key}:{key_type}")

    # Signed shadow: ascending in qkey == the requested global order.
    qkey = _quantile_key(key, key_type)
    if descending:
        qkey = -qkey
    with_q = df.withColumn("_dg_qkey", qkey)

    # Sub-shard strategy for heavy tie groups (see module docstring).
    tb_shardable = False
    if tiebreaks:
        tb_type = df.schema[tiebreaks[0]].dataType.simpleString()
        tb_shardable = tb_type in _SHARDABLE_KEY_TYPES
        if tb_shardable:
            with_q = with_q.withColumn(
                "_dg_qtb", _quantile_key(tiebreaks[0], tb_type))
    hash_split = not tiebreaks

    # Shard cuts are a LAZY 1-row percentile_approx aggregate broadcast
    # back onto the frame — not a driver-side approxQuantile action.
    # Lazy matters: chained rank passes stay ONE Catalyst plan, so
    # upstream exchanges are computed once and reused instead of being
    # re-executed per driver action. RAW (pre-distinct) cuts are kept:
    # a value's multiplicity among them identifies heavy tie groups.
    if raw_cuts is not None:
        cuts_frame, cuts_col = raw_cuts
        sketch = cuts_frame.select(F.col(cuts_col).alias("_dg_rawcuts"))
    elif _grid_probs(num_shards):
        sketch = with_q.agg(
            F.percentile_approx(
                "_dg_qkey",
                F.array(*[F.lit(p) for p in _grid_probs(num_shards)]),
                F.lit(_ACCURACY)).alias("_dg_rawcuts"))
    else:
        sketch = df.sparkSession.range(1).select(
            F.array().cast("array<double>").alias("_dg_rawcuts"))

    raw = F.coalesce(F.col("_dg_rawcuts"), F.array().cast("array<double>"))
    finite = F.filter(raw, lambda c: ~F.isnan(c))
    # Heavy keys: distinct cut values appearing >= 2 times in the raw
    # array. multiplicity m -> m + 1 sub-shards (mass ~ m/G). O(G^2)
    # comparisons over <= num_shards scalars, once, in-plan.
    cuts_df = sketch.select(
        F.array_sort(F.array_distinct(finite)).alias("_dg_cuts"),
        F.transform(
            F.filter(
                F.array_distinct(finite),
                lambda v: F.size(F.filter(raw, lambda c: c == v)) >= 2),
            lambda v: F.struct(
                v.alias("_dg_hv"),
                (F.size(F.filter(raw, lambda c: c == v)) + 1).alias("_dg_hm")),
        ).alias("_dg_heavy"),
    )

    with_cuts = with_q.crossJoin(
        F.broadcast(cuts_df.select("_dg_cuts")))

    # Base shard = number of cuts strictly below the shadow key —
    # monotone in the requested order, equal keys share a shard. NULL
    # keys: FIRST for ascending (shard -1), LAST for descending (shard
    # num_shards + 1, past every cut-derived shard), matching Spark's
    # default window null ordering. NaN keys need their own branch:
    # Spark orders NaN as the LARGEST value, but the descending trick
    # (negated shadow key) cannot express that — -NaN is still NaN,
    # which would land "largest first" rows in the LAST shard. So:
    # descending → NaN shard -1 (before every real value, ahead of
    # nothing else since NULLs go last), ascending → shard num_shards
    # (after every real value; NULLs went first).
    null_shard = num_shards + 1 if descending else -1
    nan_shard = -1 if descending else num_shards
    shard = F.when(F.col("_dg_qkey").isNull(), F.lit(null_shard))
    if key_type in ("float", "double"):
        shard = shard.when(F.isnan(F.col("_dg_qkey")), F.lit(nan_shard))
    shard = shard.otherwise(_count_below(F.col("_dg_cuts"), F.col("_dg_qkey")))
    based = with_cuts.withColumn("_dg_shard", shard).drop("_dg_cuts")

    heavy_df = cuts_df.select(
        F.explode("_dg_heavy").alias("_dg_h")).select("_dg_h.*")

    # Shadow-collision guard (see the eager twin): for 64-bit key types
    # a flagged group may hold DISTINCT keys colliding in the lossy
    # double shadow — only groups where min(key) == max(key) may be
    # split. The flag aggregate is AQE-pruned away when nothing is
    # heavy; for exactly-shadowed key types every group is safe.
    if key_type in ("bigint", "timestamp", "timestamp_ntz"):
        heavy_df = (
            based.join(F.broadcast(heavy_df),
                       based["_dg_qkey"] == heavy_df["_dg_hv"], "inner")
            .groupBy("_dg_hv", "_dg_hm")
            .agg((F.min(key) == F.max(key)).alias("_dg_safe"))
            .where(F.col("_dg_safe")).drop("_dg_safe")
        )

    if tb_shardable:
        # Per-heavy-key tiebreak cuts: percentile of the tb shadow over
        # just that tie group, on a fixed grid, sliced down to m cuts.
        # Empty heavy set -> AQE collapses the join to an empty
        # relation and skips this corpus scan entirely.
        grid = _grid_probs(max(num_shards, 2))
        g = len(grid) + 1
        tb_cuts = (
            based.join(F.broadcast(heavy_df),
                       based["_dg_qkey"] == heavy_df["_dg_hv"], "inner")
            .groupBy("_dg_hv", "_dg_hm")
            .agg(F.percentile_approx(
                "_dg_qtb", F.array(*[F.lit(p) for p in grid]),
                F.lit(_ACCURACY)).alias("_dg_p"))
            .select(
                "_dg_hv",
                F.array_sort(F.array_distinct(F.filter(
                    F.transform(
                        F.sequence(F.lit(1), F.col("_dg_hm") - 1),
                        lambda i: F.element_at(
                            F.col("_dg_p"),
                            F.round(i * g / F.col("_dg_hm")).cast("int")),
                    ),
                    lambda c: c.isNotNull() & ~F.isnan(c),
                ))).alias("_dg_subcuts"))
        )
        joined = based.join(F.broadcast(tb_cuts),
                            based["_dg_qkey"] == tb_cuts["_dg_hv"], "left")
        sub = (
            F.when(F.col("_dg_subcuts").isNull(), F.lit(0))
            .when(F.col("_dg_qtb").isNull(), F.lit(0))  # asc NULLS FIRST
            .otherwise(_count_below(F.col("_dg_subcuts"), F.col("_dg_qtb")))
        )
        out = joined.withColumn("_dg_sub", sub).drop(
            "_dg_hv", "_dg_subcuts", "_dg_qtb")
    elif hash_split:
        # Arbitrary-but-valid tie permutation: deterministic full-row
        # hash spreads the group; sub ordering is irrelevant because
        # every row in subs >= 1 of a base shard is a tie of the same
        # heavy key (non-heavy neighbours all sit in sub 0).
        row_hash = F.xxhash64(*[F.col(c) for c in df.columns])
        joined = based.join(F.broadcast(heavy_df),
                            based["_dg_qkey"] == heavy_df["_dg_hv"], "left")
        sub = F.when(F.col("_dg_hm").isNull(), F.lit(0)).otherwise(
            F.pmod(row_hash, F.col("_dg_hm")).cast("int"))
        out = joined.withColumn("_dg_sub", sub).drop("_dg_hv", "_dg_hm")
    else:
        # Non-shardable first tiebreak: keep tie groups whole so the
        # tiebreak ordering stays exact (documented contract).
        out = based.withColumn("_dg_sub", F.lit(0))
    if "_dg_hm" in out.columns:
        out = out.drop("_dg_hm")
    return out


def _dispatch_sharded(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...],
    descending: bool,
    num_shards: int,
    raw_cuts,
    mode: str,
    stats_df: DataFrame | None = None,
) -> DataFrame:
    if mode == "eager":
        lst = None
        if raw_cuts is not None:
            if (isinstance(raw_cuts, tuple) and len(raw_cuts) == 2
                    and isinstance(raw_cuts[1], str)):
                row = raw_cuts[0].select(raw_cuts[1]).collect()[0]
                lst = list(row[0] or [])
            else:
                lst = [float(c) for c in raw_cuts]
        return _eager_sharded(df, key, tiebreaks, descending, num_shards,
                              raw_cuts=lst, stats_df=stats_df)
    if mode != "lazy":
        raise ValueError(f"mode must be 'eager' or 'lazy', got {mode!r}")
    if raw_cuts is not None and not (
            isinstance(raw_cuts, tuple) and len(raw_cuts) == 2
            and isinstance(raw_cuts[1], str)):
        raise TypeError("lazy mode takes raw_cuts as a (frame, column) pair")
    return _sharded(df, key, tiebreaks, descending, num_shards,
                    raw_cuts=raw_cuts)


def tie_shard_counts(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    descending: bool = False,
    num_shards: int | None = None,
    mode: str = "eager",
) -> DataFrame:
    """Diagnostic: rows per (shard, sub-shard) under the same sharding
    :func:`add_global_rank` would use — assert balance in tests or log
    it before committing a plan to a low-cardinality key."""
    if num_shards is None:
        num_shards = _default_num_shards(df.sparkSession)
    _assert_work_cols_free(df)
    return (_dispatch_sharded(df, key, tiebreaks, descending, num_shards,
                              None, mode)
            .groupBy("_dg_shard", "_dg_sub").count()
            .select(F.col("_dg_shard").alias("shard"),
                    F.col("_dg_sub").alias("sub"), "count"))


def add_global_rank(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    descending: bool = False,
    out: str = "rank",
    total_out: str | None = None,
    num_shards: int | None = None,
    raw_cuts=None,
    mode: str = "eager",
    stats_df: DataFrame | None = None,
    plan: dict | None = None,
    offset_counts: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Exact 1-based global rank of every row under
    ``ORDER BY key [DESC], tiebreaks...`` — sharded, no global sort.

    ``key`` must be numeric or temporal (quantile-shardable); NULL keys
    rank where Spark's default null ordering puts them (FIRST for
    ascending, LAST for descending). ``total_out`` optionally also
    attaches the frame's total row count (needed by :func:`add_ntile`).
    ``raw_cuts`` substitutes a precomputed sketch so chained passes
    share one corpus pass: a plain list of (sign-adjusted shadow)
    doubles, or a ``(frame, column)`` pair from :func:`raw_cut_sketch`.

    ``mode="eager"`` (default) collects the bounded sketch driver-side
    at plan-construction time and embeds the cuts as literals — the
    smallest plan, at the cost of 1-2 construction-time jobs (persist
    the input when chaining passes). ``mode="lazy"`` keeps everything
    in ONE Catalyst plan (no construction-time jobs; plan-only callers
    never execute) at the cost of extra sketch/broadcast branches.

    Heavy tie groups (a key owning more than ``1/num_shards`` of the
    frame) are sub-sharded — see the module docstring for the exact
    contract per tiebreak shape.

    ``plan`` / ``offset_counts`` (eager mode): a precomputed
    :func:`eager_rank_plan` and its :func:`multi_offset_counts` entry —
    the batching interface for several passes over one frame; with both
    given, this call runs ZERO construction jobs.
    """
    spark = df.sparkSession
    if num_shards is None:
        # A supplied plan knows its own shard grid — adopt it rather
        # than the session default (which need not match and would make
        # the literal-offsets map keys collide).
        if plan is not None and plan.get("num_shards") is not None:
            num_shards = plan["num_shards"]
        else:
            num_shards = _default_num_shards(spark)
    _assert_work_cols_free(df)

    order = _sort_exprs(key, tiebreaks, descending)
    if mode == "eager":
        if plan is not None:
            # A plan embeds its key/direction/shard grid as literals; a
            # swapped or mis-sized plan would otherwise produce silently
            # wrong ranks (offsets from one key, window order by another).
            mismatches = [
                f"{field}: plan={plan[field]!r} != arg={arg!r}"
                for field, arg in (("key", key), ("descending", descending),
                                   ("num_shards", num_shards),
                                   ("tiebreaks", tuple(tiebreaks)))
                if field in plan and plan[field] != arg
            ]
            if mismatches:
                raise ValueError(
                    "add_global_rank: plan= does not match this call — "
                    + "; ".join(mismatches))
            exprs, qkey_col = plan["exprs"], plan["qkey_col"]
        else:
            lst = None
            if raw_cuts is not None:
                if (isinstance(raw_cuts, tuple) and len(raw_cuts) == 2
                        and isinstance(raw_cuts[1], str)):
                    row = raw_cuts[0].select(raw_cuts[1]).collect()[0]
                    lst = list(row[0] or [])
                else:
                    lst = [float(c) for c in raw_cuts]
            exprs = _eager_shard_exprs(df, key, tiebreaks, descending,
                                       num_shards, raw_cuts=lst,
                                       stats_df=stats_df)
            qkey_col = "_dg_qkey"
        sharded = _apply_shard_exprs(df, exprs, qkey_col).drop(qkey_col)
        stats = stats_df if stats_df is not None else df
        crows = None
        if offset_counts is not None:
            crows = sorted((int(s), int(b), int(c))
                           for s, b, c in offset_counts)
        elif stats.is_cached:
            # The stats frame is cached: collect the bounded
            # per-(shard, sub) counts too and embed the rank offsets as
            # a LITERAL map — no offsets aggregate, no SinglePartition
            # prefix window, no broadcast join. The plan collapses to
            # scan -> shard projection -> one window shuffle -> project.
            crows = sorted(
                (r["_dg_shard"], r["_dg_sub"], r["count"])
                for r in _apply_shard_exprs(stats, exprs, qkey_col)
                .groupBy("_dg_shard", "_dg_sub").count().collect())
        if crows is not None:
            total = sum(c for _, _, c in crows)
            kidx = num_shards + 2  # shard in [-1, n+1], sub in [0, n]
            kv, acc = [], 0
            for s, b, c in crows:
                kv += [F.lit(s * kidx + b), F.lit(acc).cast("long")]
                acc += c
            if kv:
                # Loud-failure guard (ADVICE r5): if the persisted stats
                # frame was evicted and recomputed from a nondeterministic
                # upstream, a (shard, sub) group can appear at execution
                # that the construction-time map never saw — a NULL map
                # lookup would then silently NULL every rank in that
                # group. coalesce short-circuits, so raise_error fires
                # only on the actual mismatch.
                lookup = F.create_map(*kv)[F.col("_dg_shard") * kidx
                                           + F.col("_dg_sub")]
                off = F.coalesce(
                    lookup,
                    F.raise_error(F.concat(
                        F.lit("add_global_rank: (shard, sub) group absent "
                              "from the cached offsets map — stats frame "
                              "no longer row-equivalent to the input; "
                              "shard*k+sub="),
                        (F.col("_dg_shard") * kidx
                         + F.col("_dg_sub")).cast("string"),
                    )).cast("long"),
                )
            else:
                # EMPTY offsets map: correct only if the frame is empty
                # at execution too (then this expression never runs).
                # Any surviving row means the stats frame and the input
                # diverged — same loud failure as a missing group, not
                # silently restarting every group's ranks at 1.
                off = F.raise_error(F.lit(
                    "add_global_rank: cached offsets map is EMPTY but "
                    "rows exist — stats frame no longer row-equivalent "
                    "to the input")).cast("long")
            ranked = sharded.withColumn(
                "_dg_rn",
                F.row_number().over(
                    Window.partitionBy("_dg_shard", "_dg_sub").orderBy(*order))
            ).withColumn(out, off + F.col("_dg_rn"))
            if total_out:
                ranked = ranked.withColumn(
                    total_out, F.lit(total).cast("long"))
            return ranked.drop("_dg_shard", "_dg_sub", "_dg_rn")
    else:
        sharded = _dispatch_sharded(df, key, tiebreaks, descending, num_shards,
                                    raw_cuts, mode,
                                    stats_df=stats_df).drop("_dg_qkey")

    local = sharded.withColumn(
        "_dg_rn",
        F.row_number().over(
            Window.partitionBy("_dg_shard", "_dg_sub").orderBy(*order)))
    # Tiny frame: one row per (shard, sub). Its cumulative window is the
    # only single-partition stage — bounded by the shard count, never
    # the corpus. Shard counts come from the RANKED frame (max
    # row_number == count), not from a second aggregate over the input:
    # both consumers then share the window's shuffle exchange instead
    # of re-reading the whole upstream lineage.
    offsets = (
        local.groupBy("_dg_shard", "_dg_sub")
        .agg(F.max("_dg_rn").alias("_dg_cnt"))
        .select(
            "_dg_shard", "_dg_sub",
            F.coalesce(
                F.sum("_dg_cnt").over(
                    Window.orderBy("_dg_shard", "_dg_sub")
                    .rowsBetween(Window.unboundedPreceding, -1)),
                F.lit(0),
            ).alias("_dg_off"),
            F.sum("_dg_cnt").over(
                Window.orderBy("_dg_shard", "_dg_sub")
                .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).alias("_dg_total"),
        )
    )
    ranked = (
        local.join(F.broadcast(offsets), ["_dg_shard", "_dg_sub"])
        .withColumn(out, F.col("_dg_off") + F.col("_dg_rn"))
    )
    if total_out:
        ranked = ranked.withColumn(total_out, F.col("_dg_total"))
    return ranked.drop("_dg_shard", "_dg_sub", "_dg_rn", "_dg_off", "_dg_total")


def add_percent_rank(
    df: DataFrame,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    descending: bool = False,
    out: str = "percent_rank",
    num_shards: int | None = None,
    raw_cuts=None,
    mode: str = "eager",
    stats_df: DataFrame | None = None,
    plan: dict | None = None,
    offset_counts: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Exact ``PERCENT_RANK() OVER (ORDER BY key [DESC], tiebreaks...)``
    without a single-partition window: ``(rank - 1) / (N - 1)``, 0.0
    for a single-row frame (the SQL contract).

    Built on the row_number-based sharded rank, so it equals SQL
    PERCENT_RANK exactly when the ordering is total (the operator's
    standing contract); under ties SQL's rank()-based version would
    assign tied rows equal values, this one breaks them arbitrarily.
    """
    ranked = add_global_rank(
        df, key, tiebreaks, descending=descending,
        out="_dg_rank", total_out="_dg_n", num_shards=num_shards,
        raw_cuts=raw_cuts, mode=mode, stats_df=stats_df,
        plan=plan, offset_counts=offset_counts)
    pr = F.when(F.col("_dg_n") > 1,
                (F.col("_dg_rank") - 1).cast("double") / (F.col("_dg_n") - 1)
                ).otherwise(F.lit(0.0))
    return ranked.withColumn(out, pr).drop("_dg_rank", "_dg_n")


def add_ntile(
    df: DataFrame,
    n: int,
    key: str,
    tiebreaks: tuple[str, ...] = (),
    descending: bool = False,
    out: str = "tile",
    num_shards: int | None = None,
    raw_cuts=None,
    mode: str = "eager",
    stats_df: DataFrame | None = None,
    plan: dict | None = None,
    offset_counts: list[tuple[int, int, int]] | None = None,
) -> DataFrame:
    """Exact ``NTILE(n) OVER (ORDER BY key [DESC], tiebreaks...)``
    without a single-partition window.

    Standard SQL ntile semantics (identical in Spark and DuckDB): with
    N rows, the first ``N % n`` tiles hold ``N div n + 1`` rows, the
    rest ``N div n``. Computed from the sharded exact rank — integer
    arithmetic only, no float division.
    """
    ranked = add_global_rank(
        df, key, tiebreaks, descending=descending,
        out="_dg_rank", total_out="_dg_n", num_shards=num_shards,
        raw_cuts=raw_cuts, mode=mode, stats_df=stats_df,
        plan=plan, offset_counts=offset_counts)
    # base = N div n; rem = N % n; big = rem * (base + 1) rows live in
    # the widened tiles. ceil(a/b) == (a + b - 1) div b for positive
    # ints. The base=0 branch of the otherwise() is unreachable (then
    # rem == N so every rank <= big) and never evaluated by CASE WHEN.
    tile = F.expr(
        f"CASE WHEN _dg_rank <= (_dg_n % {n}) * (_dg_n div {n} + 1) "
        f"THEN (_dg_rank + (_dg_n div {n})) div (_dg_n div {n} + 1) "
        f"ELSE (_dg_n % {n}) + (_dg_rank - (_dg_n % {n}) * (_dg_n div {n} + 1) "
        f"     + (_dg_n div {n}) - 1) div (_dg_n div {n}) END"
    )
    return ranked.withColumn(out, tile.cast("int")).drop("_dg_rank", "_dg_n")
