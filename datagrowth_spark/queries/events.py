"""Events query family.

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
from datagrowth_spark.queries._shared import _dec_sum, _t  # noqa: E501



def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events table with its ``ts`` column surfaced as a plain timestamp.

    The fixture's physical type has drifted between TIMESTAMP(NANOS) and
    TIMESTAMP(MICROS) across generations; ``ensure_ts_readable`` probes
    the footer (pyarrow, no Spark state) and sets the legacy nanos conf
    only when actually required:

    * nanos → read as long, floor-divide to micros — bit-identical to
      DuckDB's ns→µs truncation;
    * timestamp / timestamp_ntz → a bare cast (µs precision preserved).
    """
    path = os.path.join(sf_dir, "events.parquet")
    if ensure_ts_readable(spark, path):
        df = spark.read.parquet(path)
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(path).withColumn("ts", F.col("ts").cast("timestamp"))



# ---------------------------------------------------------------------------
# Events (stream-shaped table): sessionization, time rollups, JSON props
# ---------------------------------------------------------------------------

def q_events_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = _events(spark, sf_dir)
    return (
        ev.groupBy(F.date_trunc("day", F.col("ts")).alias("day"), F.col("event_type"))
        .agg(
            F.count("*").alias("n_events"),
            _dec_sum("value").alias("total_value"),
            F.count_distinct(F.col("user_id")).alias("n_users"),
        )
    )



SQL_EVENTS_DAILY = """
SELECT date_trunc('day', ts) AS day, event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value,
       COUNT(DISTINCT user_id) AS n_users
FROM events
GROUP BY date_trunc('day', ts), event_type
"""



def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session assignment via 30-minute gap rule: one window per user.

    At scale the shuffle key is user_id; sessionization is the canonical
    applyInPandasWithState streaming op — this is its batch plan.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # Full-precision timestamp arithmetic (not unix_timestamp, which truncates
    # to whole seconds and would mis-bucket sub-second gaps at the boundary).
    prev_ts = F.lag("ts").over(w)
    new_sess = F.when(
        prev_ts.isNull() | (F.col("ts") > prev_ts + F.expr("INTERVAL 30 MINUTES")), 1
    ).otherwise(0)
    return (
        ev.withColumn("new_sess", new_sess)
        .groupBy("user_id")
        .agg(
            F.sum("new_sess").alias("n_sessions"),
            F.count("*").alias("n_events"),
            _dec_sum("value").alias("total_value"),
        )
    )



SQL_EVENTS_SESSIONIZE = """
WITH flagged AS (
  SELECT user_id, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
                OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS new_sess
  FROM events
)
SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM flagged
GROUP BY user_id
"""



def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON path extraction from the props payload column (the reference's
    reach/objective shape, E1, over a relational table)."""
    ev = _events(spark, sf_dir)
    k = F.get_json_object(F.col("props"), "$.k").cast("int")
    return (
        ev.withColumn("k_bucket", (k % 10))
        .groupBy("k_bucket")
        .agg(F.count("*").alias("n_events"), _dec_sum("value").alias("total_value"))
    )



SQL_EVENTS_JSON_PROPS = """
SELECT CAST(props->>'$.k' AS INT) % 10 AS k_bucket, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1
"""



def q_events_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range-frame rolling aggregates: each user's peak 7-day event count
    and value. The RANGE frame is expressed over epoch MICROS (not
    seconds — a second-truncated ordering would mis-frame sub-second
    neighbors) and the rolling sum rides an exact decimal so frame
    evaluation order can't perturb it. One shuffle on user_id; both
    windows and the final aggregate share that partitioning, so the
    sort amortizes across all three.
    """
    ev = _events(spark, sf_dir)
    micros_7d = 7 * 86400 * 1_000_000
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_micros(F.col("ts")))
        .rangeBetween(-micros_7d, 0)
    )
    rolled = ev.select(
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_7d"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w).cast("double").alias("v_7d"),
    )
    return rolled.groupBy("user_id").agg(
        F.max("n_7d").alias("peak_7d_events"),
        F.max("v_7d").alias("peak_7d_value"),
    )



SQL_EVENTS_ROLLING = """
WITH r AS (
  SELECT user_id,
         COUNT(*) OVER w AS n_7d,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS v_7d
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts
               RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
)
SELECT user_id, MAX(n_7d) AS peak_7d_events, MAX(v_7d) AS peak_7d_value
FROM r GROUP BY user_id
"""



def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel: users who viewed, then clicked at-or-after their
    first view, then purchased at-or-after that first qualifying click.
    Three keyed min-aggregates chained by user id — each stage is one
    hash aggregate plus a user-keyed join, no windows, no self-join
    blowup; the per-user frame shrinks at every stage.
    """
    ev = _events(spark, sf_dir).select("user_id", "event_type", "ts")
    views = ev.where(F.col("event_type") == "view") \
        .groupBy("user_id").agg(F.min("ts").alias("t_view"))
    clicks = (
        ev.where(F.col("event_type") == "click")
        .join(views, "user_id")
        .where(F.col("ts") >= F.col("t_view"))
        .groupBy("user_id").agg(F.min("ts").alias("t_click"))
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .where(F.col("ts") >= F.col("t_click"))
        .groupBy("user_id").agg(F.min("ts").alias("t_purchase"))
    )
    return (
        views.agg(F.count(F.lit(1)).alias("n_viewed"))
        .crossJoin(clicks.agg(F.count(F.lit(1)).alias("n_clicked_after_view")))
        .crossJoin(purchases.agg(F.count(F.lit(1)).alias("n_purchased_after_click")))
    )



SQL_EVENTS_FUNNEL = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view FROM events WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON v.user_id = e.user_id
  WHERE e.event_type = 'click' AND e.ts >= v.t_view
  GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON c.user_id = e.user_id
  WHERE e.event_type = 'purchase' AND e.ts >= c.t_click
  GROUP BY e.user_id
)
SELECT (SELECT COUNT(*) FROM v) AS n_viewed,
       (SELECT COUNT(*) FROM c) AS n_clicked_after_view,
       (SELECT COUNT(*) FROM p) AS n_purchased_after_click
"""



def q_events_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-type value quantiles (sort-based percentile).

    Exact percentile needs the group's values together — fine for
    bounded group counts; at 100 TB with huge groups switch to
    approx_percentile (t-digest, mergeable map-side) and accept the
    documented error bound. Rounded to 6dp; linear interpolation
    matches DuckDB quantile_cont bit-for-bit on this data.
    """
    ev = _events(spark, sf_dir)
    return ev.groupBy("event_type").agg(
        F.round(F.expr("percentile(value, 0.5)"), 6).alias("p50"),
        F.round(F.expr("percentile(value, 0.9)"), 6).alias("p90"),
        F.round(F.expr("percentile(value, 0.99)"), 6).alias("p99"),
    )



SQL_EVENTS_VALUE_QUANTILES = """
SELECT event_type,
       round(quantile_cont(value, 0.5), 6) AS p50,
       round(quantile_cont(value, 0.9), 6) AS p90,
       round(quantile_cont(value, 0.99), 6) AS p99
FROM events
GROUP BY event_type
"""



def q_events_asof_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Each event joined to the customer's most recent order at-or-before
    the event, then aggregated per event type. The as-of plan is the
    union + running-fill window (one shuffle per side, one sort — see
    operators/asof.py); right-side ties are pre-aggregated to the max
    order key per (customer, date) as the deterministic contract requires.
    """
    from datagrowth_spark.operators.asof import asof_join

    ev = _events(spark, sf_dir).select("event_id", "user_id", "ts", "event_type")
    orders = _t(spark, sf_dir, "orders")
    od = (
        orders.groupBy(F.col("o_custkey").alias("user_id"), "o_orderdate")
        .agg(F.max("o_orderkey").alias("o_orderkey"))
    )
    j = asof_join(ev, od, on="user_id", left_ts="ts", right_ts="o_orderdate")
    # o_orderdate reads as TIMESTAMP_NTZ; session tz is pinned UTC so the
    # cast is the identity instant and matches DuckDB's tz-less epoch_us.
    gap_sec = F.expr(
        "(unix_micros(ts) - unix_micros(cast(o_orderdate as timestamp))) div 1000000"
    )
    return (
        j.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("o_orderkey").alias("n_matched"),
            F.round(
                F.sum(gap_sec) / (F.count("o_orderkey") * F.lit(86400.0)), 6
            ).alias("avg_gap_days"),
        )
    )



def q_events_value_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval join: events matched into OVERLAPPING value bands (width
    30, stride 25 — a value can land in two bands), then aggregated.
    Runs the grid-bucket range-join plan (one shuffle per side on the
    bucket key, exact predicate re-checked post-join); the oracle is
    DuckDB's native inequality join.
    """
    from datagrowth_spark.operators.interval import interval_join

    ev = _events(spark, sf_dir).select("event_type", "value")
    types = ev.select("event_type").distinct()
    bands = (
        types.select(
            "event_type",
            F.explode(F.sequence(F.lit(0), F.lit(19))).alias("band"),
        )
        .select(
            "event_type",
            F.col("band").cast("long").alias("band"),
            (F.col("band") * 25.0).alias("lo"),
            (F.col("band") * 25.0 + 30.0).alias("hi"),
        )
    )
    j = interval_join(ev, bands, "value", "lo", "hi",
                      on=["event_type"], bucket_width=25.0, closed="left")
    return (
        j.groupBy("event_type", "band")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            _dec_sum("value").alias("total_value"),
        )
    )



SQL_EVENTS_VALUE_BANDS = """
WITH types AS (SELECT DISTINCT event_type FROM events),
bands AS (
  SELECT event_type, CAST(i AS BIGINT) AS band, i * 25.0 AS lo, i * 25.0 + 30.0 AS hi
  FROM types, generate_series(0, 19) t(i)
),
j AS (
  SELECT e.event_type, b.band, e.value
  FROM events e JOIN bands b
    ON e.event_type = b.event_type AND e.value >= b.lo AND e.value < b.hi
)
SELECT event_type, band,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM j GROUP BY 1, 2
"""



SQL_EVENTS_ASOF_ORDERS = """
WITH od AS (
  SELECT o_custkey AS user_id, o_orderdate, MAX(o_orderkey) AS o_orderkey
  FROM orders GROUP BY 1, 2
),
j AS (
  SELECT e.event_type, CAST(e.ts AS TIMESTAMP) AS ts, o.o_orderdate, o.o_orderkey
  FROM events e ASOF LEFT JOIN od o
    ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(COUNT(o_orderkey) AS BIGINT) AS n_matched,
       round(SUM((epoch_us(ts) - epoch_us(o_orderdate)) // 1000000)
             / (COUNT(o_orderkey) * 86400.0), 6) AS avg_gap_days
FROM j GROUP BY event_type
"""



# ---------------------------------------------------------------------------
# Registry
# ---------------------------------------------------------------------------

def q_events_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type totals via explicit two-phase SALTED aggregation
    (operators/skew.py). The events table has a handful of types over
    millions of rows — the classic hot-key shape where one reducer
    combining a single key becomes the straggler. Phase 1 groups by
    (type, salt∈[0,16)) so the hot key partial-aggregates on 16
    reducers; phase 2 combines 16 tiny partials per key. Results are
    exactly the plain GROUP BY (salting only re-routes rows; sums are
    exact decimals), which is what the oracle checks.
    """
    from datagrowth_spark.operators import skew as SK

    ev = _events(spark, sf_dir).select(
        "event_type", F.col("value").cast("decimal(18,2)").alias("v")
    )
    agg = SK.salted_aggregate(
        ev,
        "event_type",
        {"n_events": ("count", F.lit(1)), "total_value": ("sum", F.col("v"))},
        salt=16,
    )
    return agg.select(
        "event_type",
        "n_events",
        F.col("total_value").cast("double").alias("total_value"),
    )



SQL_EVENTS_HEAVY_HITTERS = """
SELECT event_type, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events GROUP BY event_type
"""



def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by their first-activity day,
    counted on each subsequent active day (offset ≤ 14).

    One shuffle on user_id (the distinct + window share it); the final
    (cohort × offset) aggregate is tiny. The per-user min is a
    whole-partition window — no sort, no second exchange.
    """
    ev = _events(spark, sf_dir)
    ud = ev.select("user_id", F.to_date("ts").alias("d")).distinct()
    cohort = F.min("d").over(Window.partitionBy("user_id"))
    return (
        ud.withColumn("cohort_date", cohort)
        .withColumn("day_offset", F.datediff("d", "cohort_date").cast("int"))
        .where(F.col("day_offset") <= 14)
        .groupBy("cohort_date", "day_offset")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )



SQL_EVENTS_RETENTION = """
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
),
c AS (
  SELECT user_id, d, MIN(d) OVER (PARTITION BY user_id) AS cohort_date FROM ud
)
SELECT cohort_date, CAST(date_diff('day', cohort_date, d) AS INT) AS day_offset,
       COUNT(*) AS n_users
FROM c
WHERE date_diff('day', cohort_date, d) <= 14
GROUP BY 1, 2
"""



def q_events_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outlier screen (|z| > 2).

    Two passes over a pruned (event_type, value) projection: exact
    decimal sums make the per-type mean/std order-independent scalars,
    which broadcast back for the outlier count — the classic
    sigma-rule data-quality monitor, all JVM-side.
    """
    ev = _events(spark, sf_dir).select("event_type", "value")
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col("value").cast("decimal(18,2)")).alias("_s"),
        F.sum((F.col("value").cast("decimal(18,2)") * F.col("value").cast("decimal(18,2)"))).alias("_ss"),
    ).select(
        "event_type", "n_events",
        (F.col("_s").cast("double") / F.col("n_events")).alias("_mean"),
        F.sqrt(
            (F.col("_ss").cast("double") - F.col("_s").cast("double") * F.col("_s").cast("double") / F.col("n_events"))
            / (F.col("n_events") - 1)
        ).alias("_std"),
    )
    z = (F.col("value") - F.col("_mean")) / F.col("_std")
    return (
        ev.join(F.broadcast(stats), "event_type")
        .groupBy("event_type")
        .agg(
            F.first("n_events").alias("n_events"),
            F.round(F.first("_mean"), 6).alias("mean_value"),
            F.round(F.first("_std"), 6).alias("std_value"),
            F.sum((F.abs(F.round(z, 6)) > 2.0).cast("int")).alias("n_outliers"),
        )
    )



SQL_EVENTS_ANOMALY = """
WITH stats AS (
  SELECT event_type, COUNT(*) AS n_events,
         CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS s,
         CAST(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS ss
  FROM events GROUP BY event_type
),
m AS (
  SELECT event_type, n_events, s / n_events AS mean_value,
         sqrt((ss - s * s / n_events) / (n_events - 1)) AS std_value
  FROM stats
)
SELECT e.event_type, MIN(m.n_events) AS n_events,
       round(MIN(m.mean_value), 6) AS mean_value,
       round(MIN(m.std_value), 6) AS std_value,
       CAST(SUM(CASE WHEN abs(round((e.value - m.mean_value) / m.std_value, 6)) > 2.0
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM events e JOIN m USING (event_type)
GROUP BY e.event_type
"""



def q_events_user_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top event-type transitions (Markov edges) across per-user
    timelines — the funnel-discovery complement to q_events_funnel.

    One shuffle on user_id for the lead() window; the transition count
    is a tiny (|types|²) aggregate. Window order is (ts, event_id) so
    simultaneous events are deterministically sequenced.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    nxt = F.lead("event_type").over(w)
    return (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("next_type", nxt)
        .where(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("src_type"),
            F.col("next_type").alias("dst_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_transitions"))
        .orderBy(F.desc("n_transitions"), F.asc("src_type"), F.asc("dst_type"))
        .limit(20)
    )



SQL_EVENTS_USER_PATHS = """
WITH seq AS (
  SELECT event_type AS src_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS dst_type
  FROM events
)
SELECT src_type, dst_type, COUNT(*) AS n_transitions
FROM seq WHERE dst_type IS NOT NULL
GROUP BY 1, 2
ORDER BY n_transitions DESC, src_type ASC, dst_type ASC
LIMIT 20
"""



_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")



def q_events_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event counts PIVOTed into one column per event type.

    The pivot value list is explicit, so Spark skips the extra
    distinct-values job and the output schema is static — at 100 TB an
    implicit pivot would scan the corpus twice and produce a
    data-dependent schema. One shuffle on day; the pivot itself is a
    map-side conditional aggregation.
    """
    ev = _events(spark, sf_dir)
    return (
        ev.select(F.to_date("ts").alias("day"), "event_type")
        .groupBy("day")
        .pivot("event_type", list(_EVENT_TYPES))
        .agg(F.count(F.lit(1)))
        .select(
            "day",
            *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in _EVENT_TYPES],
        )
    )



SQL_EVENTS_TYPE_PIVOT = """
SELECT CAST(ts AS DATE) AS day,
       CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY 1
"""



def q_events_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (event_type, day-of-week): every subtotal combination
    in one pass — the grouping-sets complement to q_orders_rollup's
    ROLLUP. The expand operator multiplies rows 4× before the single
    shuffle; group count stays tiny (|types|+1 × 8)."""
    ev = _events(spark, sf_dir)
    return (
        ev.select("event_type", F.dayofweek("ts").alias("dow"), "value")
        .cube("event_type", "dow")
        .agg(F.count(F.lit(1)).alias("n_events"), _dec_sum("value").alias("total_value"))
    )



SQL_EVENTS_CUBE = """
SELECT event_type, CAST(dayofweek(ts) + 1 AS INT) AS dow, COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY CUBE(event_type, CAST(dayofweek(ts) + 1 AS INT))
"""



def q_events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running total of distinct users ever seen, by day.

    Cumulative-distinct folds to first-seen-day counts: one shuffle on
    user_id for the min-date, one tiny aggregate to new-users-per-day,
    then the running sum over the day dimension is a broadcast
    triangle join (d' ≤ d) on the ~hundreds-of-rows daily frame — NO
    single-partition global-order window anywhere, at any scale.
    """
    ev = _events(spark, sf_dir)
    first_seen = (
        ev.select("user_id", F.to_date("ts").alias("d"))
        .groupBy("user_id")
        .agg(F.min("d").alias("first_day"))
    )
    daily_new = first_seen.groupBy("first_day").agg(F.count(F.lit(1)).alias("new_users"))
    days = daily_new.select(F.col("first_day").alias("day"))
    return (
        days.join(
            F.broadcast(daily_new),
            F.col("first_day") <= F.col("day"),
        )
        .groupBy("day")
        .agg(F.sum("new_users").alias("cumulative_users"))
    )



SQL_EVENTS_CUMULATIVE_USERS = """
WITH first_seen AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS first_day FROM events GROUP BY user_id
),
daily_new AS (
  SELECT first_day, COUNT(*) AS new_users FROM first_seen GROUP BY first_day
)
SELECT d.first_day AS day,
       CAST(SUM(n.new_users) AS BIGINT) AS cumulative_users
FROM daily_new d JOIN daily_new n ON n.first_day <= d.first_day
GROUP BY 1
"""

