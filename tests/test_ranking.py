"""Distributed exact ranking (operators/ranking.py): agreement with the
global-window reference on every shape that exercises the sharding —
ties on the primary key, NULL keys, N < n, descending order — plus the
plan assertion that no corpus-sized frame crosses a SinglePartition
exchange."""

import random

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from datagrowth_spark.operators.ranking import (
    add_global_rank,
    add_ntile,
    add_percent_rank,
)


def _frame(spark, n_rows, seed, with_nulls=False, tie_every=None):
    rng = random.Random(seed)
    rows = []
    for i in range(n_rows):
        v = float(rng.randint(0, n_rows // (tie_every or 1) or 1))
        if with_nulls and rng.random() < 0.15:
            v = None
        rows.append((i, v))
    return spark.createDataFrame(rows, "id long, v double")


def _reference_ntile(df, n, descending):
    order = [F.col("v").desc() if descending else F.col("v").asc(), F.col("id").asc()]
    return df.withColumn("expect", F.ntile(n).over(Window.orderBy(*order)))


@pytest.mark.parametrize("mode", ["eager", "lazy"])
@pytest.mark.parametrize("n_rows,n,descending,with_nulls", [
    (200, 4, False, False),
    (200, 4, True, False),
    (173, 7, True, True),   # N % n != 0, nulls rank last under DESC
    (173, 7, False, True),  # nulls rank first under ASC
    (3, 4, False, False),   # N < n: first N tiles get one row each
    (1, 4, True, False),
])
def test_ntile_matches_global_window(spark, n_rows, n, descending, with_nulls,
                                     mode):
    df = _frame(spark, n_rows, seed=n_rows * n, with_nulls=with_nulls)
    got = add_ntile(df, n, "v", ("id",), descending=descending, out="tile",
                    num_shards=8, mode=mode)
    ref = _reference_ntile(df, n, descending)
    merged = got.join(ref.select("id", "expect"), "id")
    bad = merged.where(F.col("tile") != F.col("expect")).count()
    assert bad == 0


@pytest.mark.parametrize("mode", ["eager", "lazy"])
def test_ntile_ties_share_shard(spark, mode):
    # Heavy ties: every key value repeats ~25x. The tiebreak (id) is
    # total, so ranks — and therefore tiles — must still be exact.
    df = _frame(spark, 500, seed=11, tie_every=25)
    got = add_ntile(df, 4, "v", ("id",), descending=True, out="tile",
                    num_shards=16, mode=mode)
    ref = _reference_ntile(df, 4, True)
    merged = got.join(ref.select("id", "expect"), "id")
    assert merged.where(F.col("tile") != F.col("expect")).count() == 0


@pytest.mark.parametrize("mode", ["eager", "lazy"])
@pytest.mark.parametrize("descending", [True, False])
def test_ntile_nan_inf_null_keys(spark, descending, mode):
    """Spark orders NaN as the LARGEST value (after +Inf), with NULLs
    first (asc) / last (desc). The negated-shadow-key descending trick
    can't express NaN's position (-NaN is still NaN), so the operator
    routes NaN through an explicit shard — this pins agreement with the
    global window across NaN, ±Inf, and NULL all present at once."""
    rng = random.Random(42)
    rows = []
    for i in range(120):
        r = rng.random()
        if r < 0.1:
            v = float("nan")
        elif r < 0.15:
            v = float("inf")
        elif r < 0.2:
            v = float("-inf")
        elif r < 0.3:
            v = None
        else:
            v = float(rng.randint(0, 40))
        rows.append((i, v))
    df = spark.createDataFrame(rows, "id long, v double")
    got = add_ntile(df, 5, "v", ("id",), descending=descending, out="tile",
                    num_shards=6, mode=mode)
    ref = _reference_ntile(df, 5, descending).withColumnRenamed("expect", "e5")
    merged = got.join(ref.select("id", "e5"), "id")
    assert merged.where(F.col("tile") != F.col("e5")).count() == 0


def test_global_rank_exact(spark):
    df = _frame(spark, 300, seed=3, with_nulls=True)
    got = add_global_rank(df, "v", ("id",), descending=False, out="r", num_shards=8)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    ref = df.withColumn("expect", F.row_number().over(w))
    merged = got.join(ref.select("id", "expect"), "id")
    assert merged.where(F.col("r") != F.col("expect")).count() == 0


@pytest.mark.parametrize("n_rows", [1, 2, 150])
def test_percent_rank_matches_global_window(spark, n_rows):
    df = _frame(spark, n_rows, seed=n_rows + 1, with_nulls=(n_rows > 2))
    got = add_percent_rank(df, "v", ("id",), out="pr", num_shards=8)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    ref = df.withColumn("expect", F.percent_rank().over(w))
    merged = got.join(ref.select("id", "expect"), "id")
    # Total order (id tiebreak) → row_number == rank → exact equality,
    # including the single-row 0.0 contract.
    assert merged.where(F.col("pr") != F.col("expect")).count() == 0


def test_rank_preserves_rows_and_columns(spark):
    df = _frame(spark, 50, seed=5, with_nulls=True)
    out = add_ntile(df, 4, "v", ("id",), out="tile", num_shards=4)
    assert out.count() == 50
    assert set(out.columns) == {"id", "v", "tile"}


@pytest.mark.parametrize("descending", [True, False])
def test_ntile_temporal_key(spark, descending):
    """Date keys go through the epoch shadow (the packing ADVICE-item
    bug class: approxQuantile/percentile_approx reject temporal
    columns) — quartiles must still match the global window."""
    import datetime

    rows = [(i, datetime.date(2024, 1, 1) + datetime.timedelta(days=i % 37))
            for i in range(150)]
    df = spark.createDataFrame(rows, "id long, v date")
    got = add_ntile(df, 4, "v", ("id",), descending=descending, out="tile",
                    num_shards=8)
    ref = _reference_ntile(df, 4, descending)
    merged = got.join(ref.select("id", "expect"), "id")
    assert merged.where(F.col("tile") != F.col("expect")).count() == 0


def test_non_shardable_key_raises(spark):
    df = spark.createDataFrame([(1, "a")], "id long, s string")
    with pytest.raises(TypeError):
        add_global_rank(df, "s")


def test_reserved_work_columns_rejected(spark):
    # ADVICE r4: a caller column named like a working column must raise,
    # not be silently overwritten and dropped.
    df = spark.createDataFrame([(1, 2.0, 3)], "id long, v double, _dg_shard int")
    with pytest.raises(ValueError, match="_dg_shard"):
        add_global_rank(df, "v", ("id",))


@pytest.mark.parametrize("mode", ["eager", "lazy"])
def test_low_cardinality_key_exact_and_balanced(spark, mode):
    """The r4 tie-skew hole: a 5-distinct-value key used to collapse
    the sharding to <=5 shards, funneling ~N/5 rows through single
    window tasks. With tie-group sub-sharding (tiebreak-ordered cuts
    within each heavy key) ranks stay EXACT and no (shard, sub) group
    exceeds a few times the ideal size."""
    from datagrowth_spark.operators.ranking import tie_shard_counts

    n_rows, shards = 1_000_000, 32
    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 5).cast("double").alias("v"))

    counts = tie_shard_counts(df, "v", ("id",), num_shards=shards,
                              mode=mode).collect()
    biggest = max(r["count"] for r in counts)
    ideal = n_rows / shards
    assert len(counts) >= shards // 2, f"only {len(counts)} groups"
    assert biggest <= 4 * ideal, f"fat group: {biggest} rows vs ideal {ideal}"

    # Exactness on a verifiable slice: sharded rank == global window.
    got = add_global_rank(df, "v", ("id",), out="r", num_shards=shards,
                          mode=mode)
    w = Window.orderBy(F.col("v").asc(), F.col("id").asc())
    ref = df.withColumn("expect", F.row_number().over(w))
    merged = got.join(ref.select("id", "expect"), "id")
    assert merged.where(F.col("r") != F.col("expect")).count() == 0


def test_low_cardinality_no_tiebreak_valid_permutation(spark):
    """Without tiebreaks a tie group's ranks are an arbitrary-but-valid
    permutation; hash sub-sharding must keep that contract: ranks are
    exactly 1..N, and every row's rank falls inside its key's block."""
    n_rows = 100_000
    df = spark.range(n_rows).select(
        F.col("id"), (F.col("id") % 3).cast("double").alias("v"))
    got = add_global_rank(df, "v", out="r", num_shards=16)
    rows = got.groupBy("v").agg(
        F.min("r").alias("lo"), F.max("r").alias("hi"),
        F.count("*").alias("n"), F.count_distinct("r").alias("nd")
    ).orderBy("v").collect()
    pos = 1
    for r in rows:
        assert r["lo"] == pos and r["hi"] == pos + r["n"] - 1
        assert r["nd"] == r["n"]  # ranks within the block are distinct
        pos += r["n"]

    from datagrowth_spark.operators.ranking import tie_shard_counts
    counts = tie_shard_counts(df, "v", num_shards=16).collect()
    assert max(c["count"] for c in counts) <= 4 * n_rows / 16


def test_heavy_ties_with_string_tiebreak_stay_exact(spark):
    """Non-shardable first tiebreak: no sub-sharding (documented), but
    ranks must remain exact against the global window."""
    rows = [(f"k{i:05d}", float(i % 4)) for i in range(400)]
    df = spark.createDataFrame(rows, "s string, v double")
    got = add_global_rank(df, "v", ("s",), out="r", num_shards=8)
    w = Window.orderBy(F.col("v").asc(), F.col("s").asc())
    ref = df.withColumn("expect", F.row_number().over(w))
    merged = got.join(ref.select("s", "expect"), "s")
    assert merged.where(F.col("r") != F.col("expect")).count() == 0


def test_shared_raw_cuts_match_per_call_cuts(spark):
    """raw_cut_sketch handed to several rank passes must reproduce the
    same exact values as per-call cut computation (RFM sharing path)."""
    from datagrowth_spark.operators.ranking import raw_cut_expr

    df = _frame(spark, 300, seed=9, tie_every=10)
    sketch = df.agg(
        raw_cut_expr("v", "double", True, 8).alias("c_v"))
    got = add_ntile(df, 4, "v", ("id",), descending=True, out="tile",
                    num_shards=8, raw_cuts=(sketch, "c_v"))
    ref = _reference_ntile(df, 4, True)
    merged = got.join(ref.select("id", "expect"), "id")
    assert merged.where(F.col("tile") != F.col("expect")).count() == 0


def test_plan_has_no_corpus_single_partition(spark):
    """Every SinglePartition exchange in the plan is a bounded frame:
    the 1-row percentile_approx cuts aggregate and the per-shard count
    prefix sum (num_shards rows). The data path itself stays
    partitioned — the original global-window formulation had the FULL
    frame behind a SinglePartition exchange feeding Sort+Window."""
    df = _frame(spark, 1000, seed=7)
    out = add_ntile(df, 4, "v", ("id",), descending=True, out="tile", num_shards=8)
    out.write.format("noop").mode("overwrite").save()
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    hits = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    # Cuts sketch (appears once per consuming branch in the printed
    # tree — exchange reuse dedupes them at runtime) plus the
    # shard-count prefix — all carry partial-agg rows only.
    assert 1 <= len(hits) <= 8
    for i in hits:
        # Each one's input must be a partial aggregate (cuts sketch or
        # shard counts) — never the Sort/Window data path.
        below = "\n".join(lines[i + 1:i + 3])
        assert "Aggregate" in below, below
        assert "Sort" not in below and "Window" not in below, below


@pytest.mark.parametrize("mode", ["eager", "lazy"])
@pytest.mark.parametrize("tiebreak", [True, False])
def test_giant_bigint_keys_shadow_collision_exact(spark, mode, tiebreak):
    """Distinct bigint keys beyond 2^53 collide in the double quantile
    shadow; a collided group flagged heavy must NOT be sub-split (the
    r5 vanilla-session bug: the split reordered genuinely different
    keys). Ranks must equal the global window exactly."""
    base = 1 << 60  # ulp at this magnitude is 128 — +0..3 all collide
    rows = [(i, base + (i % 4)) for i in range(400)]
    df = spark.createDataFrame(rows, "id long, k long")
    tbs = ("id",) if tiebreak else ()
    got = add_global_rank(df, "k", tbs, out="r", num_shards=64, mode=mode)
    w = Window.orderBy(F.col("k").asc(), F.col("id").asc())
    ref = df.withColumn("expect", F.row_number().over(w))
    merged = got.join(ref.select("id", "expect"), "id")
    if tiebreak:
        # Total order: exact equality.
        assert merged.where(F.col("r") != F.col("expect")).count() == 0
    else:
        # Ties permute arbitrarily, but each key's block must be
        # contiguous and start/end where the window's does.
        blocks = got.groupBy("k").agg(
            F.min("r").alias("lo"), F.max("r").alias("hi"),
            F.count("*").alias("n"), F.count_distinct("r").alias("nd")
        ).orderBy("k").collect()
        pos = 1
        for b in blocks:
            assert b["lo"] == pos and b["hi"] == pos + b["n"] - 1
            assert b["nd"] == b["n"]
            pos += b["n"]


@pytest.mark.parametrize("mode", ["eager", "lazy"])
def test_true_giant_bigint_ties_still_split(spark, mode):
    """A GENUINE heavy tie on a giant bigint key (min == max in the
    group) may still be hash-split — the guard must not disable the
    balance fix where it is valid."""
    from datagrowth_spark.operators.ranking import tie_shard_counts

    base = 1 << 60
    n = 100_000
    df = spark.range(n).select(
        F.col("id"), (F.lit(base) + (F.col("id") % 3) * (1 << 20)).alias("k"))
    # Keys are base, base+2^20, base+2^21 — far apart, no collision;
    # each a true heavy tie of ~n/3 rows.
    counts = tie_shard_counts(df, "k", num_shards=16, mode=mode).collect()
    assert max(c["count"] for c in counts) <= 4 * n / 16, counts
    got = add_global_rank(df, "k", out="r", num_shards=16, mode=mode)
    blocks = got.groupBy("k").agg(
        F.min("r").alias("lo"), F.max("r").alias("hi"),
        F.count("*").alias("n")).orderBy("k").collect()
    pos = 1
    for b in blocks:
        assert b["lo"] == pos and b["hi"] == pos + b["n"] - 1
        pos += b["n"]


def test_stats_df_with_chained_frame_and_heavy_no_tiebreak_key(spark):
    """Code-review regression: the eager no-tiebreak hash split must
    stay applicable to a row-equivalent stats frame that lacks the
    chained frame's extra columns (it previously hashed every input
    column, so the offsets collect against the persisted base raised
    an unresolved-column error)."""
    base = spark.range(60_000).select(
        F.col("id"),
        (F.col("id") % 7).cast("double").alias("a"),
        (F.col("id") % 3).cast("double").alias("b"),
    ).persist()
    r1 = add_global_rank(base, "a", ("id",), out="rank_a", num_shards=16)
    # 'b' has 3 heavy values; stats actions run against the cached base
    # which has no 'rank_a' column.
    r2 = add_global_rank(r1, "b", (), out="rank_b", num_shards=16,
                         stats_df=base)
    blocks = r2.groupBy("b").agg(
        F.min("rank_b").alias("lo"), F.max("rank_b").alias("hi"),
        F.count("*").alias("n"), F.count_distinct("rank_b").alias("nd")
    ).orderBy("b").collect()
    pos = 1
    for blk in blocks:
        assert blk["lo"] == pos and blk["hi"] == pos + blk["n"] - 1
        assert blk["nd"] == blk["n"]
        pos += blk["n"]
    base.unpersist()


def test_eager_cached_offsets_guard_raises_on_missing_group(spark):
    """ADVICE r5: with a cached stats frame, the eager rank embeds a
    literal (shard, sub) -> offset map. A stats frame that is NOT
    row-equivalent (here: missing the NULL-key rows, standing in for a
    nondeterministic recompute after eviction) must fail loudly at
    execution, never emit silently-NULL ranks."""
    df = spark.range(1000).select(
        F.when(F.col("id") < 990, F.col("id").cast("double")).alias("k"),
        F.col("id"))
    stats = df.where(F.col("k").isNotNull()).persist()
    try:
        stats.count()
        ranked = add_global_rank(df, "k", ("id",), out="r",
                                 num_shards=8, stats_df=stats)
        with pytest.raises(Exception, match="row-equivalent"):
            ranked.collect()
    finally:
        stats.unpersist()


def test_multi_rank_plans_match_individual_passes(spark):
    """The batched constructor (one combined refinement + one combined
    counts job for N passes) must produce bit-identical ranks to the
    per-pass path — exercised with a heavy low-cardinality bigint key
    (collision guard + tiebreak refinement) and a smooth double key."""
    from datagrowth_spark.operators.ranking import (
        multi_offset_counts, multi_rank_plans)

    df = spark.range(20_000).select(
        F.col("id"),
        (F.col("id") % 4).cast("bigint").alias("k_heavy"),
        (F.col("id") * 7 % 13_001).cast("double").alias("k_smooth"),
    ).persist()
    try:
        df.count()
        plans = multi_rank_plans(df, {
            "h": {"key": "k_heavy", "tiebreaks": ("id",), "num_shards": 8},
            "s": {"key": "k_smooth", "tiebreaks": ("id",), "num_shards": 8,
                  "descending": True},
        }, stats_df=df)
        counts = multi_offset_counts(df, plans)
        batched_h = add_global_rank(df, "k_heavy", ("id",), out="r",
                                    num_shards=8, plan=plans["h"],
                                    offset_counts=counts["h"])
        batched_s = add_global_rank(df, "k_smooth", ("id",), out="r",
                                    descending=True, num_shards=8,
                                    plan=plans["s"], offset_counts=counts["s"])
        solo_h = add_global_rank(df, "k_heavy", ("id",), out="r", num_shards=8)
        solo_s = add_global_rank(df, "k_smooth", ("id",), out="r",
                                 descending=True, num_shards=8)
        for batched, solo in ((batched_h, solo_h), (batched_s, solo_s)):
            got = {r["id"]: r["r"] for r in batched.collect()}
            want = {r["id"]: r["r"] for r in solo.collect()}
            assert got == want
    finally:
        df.unpersist()


def test_multi_rank_plans_rejects_mixed_num_shards(spark):
    from datagrowth_spark.operators.ranking import multi_rank_plans

    df = spark.range(100).select(F.col("id").cast("double").alias("a"),
                                 F.col("id"))
    with pytest.raises(ValueError, match="num_shards"):
        multi_rank_plans(df, {
            "x": {"key": "a", "num_shards": 4},
            "y": {"key": "a", "num_shards": 8},
        })


def test_plan_and_offset_counts_run_zero_construction_jobs(spark):
    """With plan= and offset_counts= precomputed, add_global_rank must
    build its frame without firing any Spark job."""
    from datagrowth_spark.operators.ranking import (
        multi_offset_counts, multi_rank_plans)

    df = spark.range(5_000).select(
        F.col("id"), (F.col("id") % 3).cast("double").alias("k")).persist()
    try:
        df.count()
        plans = multi_rank_plans(
            df, {"k": {"key": "k", "tiebreaks": ("id",), "num_shards": 8}},
            stats_df=df)
        counts = multi_offset_counts(df, plans)
        sc = spark.sparkContext
        sc.setJobGroup("zero-jobs", "plan-only rank construction")
        ranked = add_global_rank(df, "k", ("id",), out="r", num_shards=8,
                                 plan=plans["k"], offset_counts=counts["k"])
        ids = sc.statusTracker().getJobIdsForGroup("zero-jobs")
        assert list(ids) == [], ids
        assert ranked.where(F.col("r").isNull()).count() == 0
    finally:
        df.unpersist()


def test_plan_arg_mismatch_raises(spark):
    """A swapped plan (built for another key/direction/shard grid) must
    fail loudly instead of producing silently wrong ranks."""
    from datagrowth_spark.operators.ranking import (
        multi_offset_counts, multi_rank_plans)

    df = spark.range(1_000).select(
        F.col("id"), (F.col("id") % 7).cast("double").alias("a"),
        (F.col("id") % 11).cast("double").alias("b")).persist()
    try:
        df.count()
        plans = multi_rank_plans(df, {
            "a": {"key": "a", "tiebreaks": ("id",), "num_shards": 8},
            "b": {"key": "b", "tiebreaks": ("id",), "num_shards": 8},
        }, stats_df=df)
        counts = multi_offset_counts(df, plans)
        with pytest.raises(ValueError, match="plan= does not match"):
            add_global_rank(df, "a", ("id",), out="r", num_shards=8,
                            plan=plans["b"], offset_counts=counts["b"])
        with pytest.raises(ValueError, match="num_shards"):
            add_global_rank(df, "a", ("id",), out="r", num_shards=4,
                            plan=plans["a"], offset_counts=counts["a"])
        # Omitted num_shards adopts the plan's grid instead of the
        # session default.
        ok = add_global_rank(df, "a", ("id",), out="r",
                             plan=plans["a"], offset_counts=counts["a"])
        want = add_global_rank(df, "a", ("id",), out="r", num_shards=8)
        assert {r["id"]: r["r"] for r in ok.collect()} == \
            {r["id"]: r["r"] for r in want.collect()}
        # Tiebreaks are part of the plan identity too: offsets computed
        # under one tie order are wrong inside heavy tie groups under
        # another (ADVICE r6).
        with pytest.raises(ValueError, match="tiebreaks"):
            add_global_rank(df, "a", (), out="r", num_shards=8,
                            plan=plans["a"], offset_counts=counts["a"])
    finally:
        df.unpersist()


def test_multi_rank_plans_qkey_collision_raises(spark):
    """multi_rank_plans must refuse inputs that already carry one of
    its generated _dg_qkey_<name> columns (same guard as
    eager_rank_plan), instead of silently shadowing real data."""
    from datagrowth_spark.operators.ranking import multi_rank_plans

    df = spark.range(10).select(
        F.col("id"), (F.col("id") % 3).cast("double").alias("a"),
        F.lit(0.0).alias("_dg_qkey_a"))
    with pytest.raises(ValueError, match="_dg_qkey_a.*collides"):
        multi_rank_plans(df, {"a": {"key": "a", "tiebreaks": ("id",),
                                    "num_shards": 8}}, stats_df=df)


def test_empty_offsets_map_fails_loudly_on_rows(spark):
    """offset_counts=[] with surviving rows is the all-groups-missing
    form of the eviction mismatch — must raise, not restart every
    group's ranks at 1."""
    from pyspark.errors.exceptions.captured import SparkRuntimeException
    from datagrowth_spark.operators.ranking import eager_rank_plan

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("double").alias("k"))
    plan = eager_rank_plan(df, "k", ("id",), num_shards=8)
    ranked = add_global_rank(df, "k", ("id",), out="r", num_shards=8,
                             plan=plan, offset_counts=[])
    with pytest.raises(SparkRuntimeException, match="offsets map is EMPTY"):
        ranked.collect()
    # ...but an empty FRAME with an empty map is legitimately fine.
    empty = df.where(F.lit(False))
    assert add_global_rank(empty, "k", ("id",), out="r", num_shards=8,
                           plan=plan, offset_counts=[]).count() == 0


def test_multi_offset_counts_rejects_shared_qkey_col(spark):
    """Two individually-built plans default to the same qkey column;
    batching them would evaluate one pass's exprs against the other's
    key — reject instead of corrupting counts."""
    from datagrowth_spark.operators.ranking import (
        eager_rank_plan, multi_offset_counts)

    df = spark.range(100).select(
        F.col("id"), (F.col("id") % 3).cast("double").alias("a"),
        (F.col("id") % 5).cast("double").alias("b"))
    plans = {"a": eager_rank_plan(df, "a", ("id",), num_shards=8),
             "b": eager_rank_plan(df, "b", ("id",), num_shards=8)}
    with pytest.raises(ValueError, match="share qkey_col"):
        multi_offset_counts(df, plans)
