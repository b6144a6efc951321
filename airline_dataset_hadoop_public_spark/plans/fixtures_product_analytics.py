"""Product-analytics query shapes over the ``events`` stream table:
cohort retention, conversion funnel, Markov transition matrix,
deterministic stratified sampling, and rolling 7-day active users —
plus Gopher-style document quality flags on ``documents``.

The reference (/root/reference/README.md; SURVEY.md §2) stops at
avg-by-key and top-k over flight records — it has no sessionized /
behavioral analytics surface at all. A modern event pipeline (and any
LLM-data curation stack) needs these shapes, so they are first-class
queries here, each with a full DuckDB value oracle.

Scale notes (local[32] tests, 1000-executor design):
- cohort retention: two aggregations both hash-partitioned on
  user_id — the first-event frame joins the activity frame on the
  SAME key, so the exchange is reused; the final (cohort, offset)
  rollup is over |users x weeks-active|, far smaller than events.
- funnel: three cascading per-user min aggregations all keyed on
  user_id (exchange reuse across every stage); no broadcast of the
  per-user frame — at 10^9 users the stage frames are fact-sized
  and must stay shuffled, which this plan already does.
- transition matrix: one window (partition user_id, order ts) — the
  natural event-log partitioning; the (from, to) rollup output is
  |event_types|^2, a constant.
- stratified sample: the md5-derived per-mille predicate is a pure
  row-local filter evaluated in the scan stage — no shuffle at all,
  the 100 TB-safe way to downsample before any join (same scheme as
  sample_systematic_revenue, but with per-stratum rates so rare
  strata can be oversampled for training-data balance).
- rolling 7d actives: the distinct day frame is tiny (one row per
  calendar day — broadcastable at any SF); the (user, day) frame
  stays distributed and range-joins against the broadcast days.
- gopher flags: pure per-row array expressions (no UDF, no shuffle);
  whole-stage codegen end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.catalog import load_table
from .registry import register

# ---------------------------------------------------------------------------
# Cohort retention — users grouped by the ISO week of their first
# event (any type); for each (cohort week, week offset) the count of
# distinct cohort members active that week. Weeks are Monday-anchored
# via date_trunc('week', ...) in both engines.
# ---------------------------------------------------------------------------

_COHORT_ORACLE = """
WITH firsts AS (
  SELECT user_id, date_trunc('week', MIN(ts)) AS cohort_week
  FROM events GROUP BY user_id
),
activity AS (
  SELECT DISTINCT user_id, date_trunc('week', ts) AS active_week
  FROM events
)
SELECT strftime(f.cohort_week, '%Y-%m-%d') AS cohort_week,
       date_diff('day', f.cohort_week, a.active_week) // 7 AS week_offset,
       COUNT(DISTINCT a.user_id) AS active_users
FROM firsts f JOIN activity a ON a.user_id = f.user_id
GROUP BY 1, 2
ORDER BY cohort_week ASC, week_offset ASC
"""


@register("events_cohort_retention", _COHORT_ORACLE)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    activity = events.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).distinct()
    return (
        firsts.join(activity, "user_id")
        .groupBy(
            F.date_format("cohort_week", "yyyy-MM-dd").alias("cohort_week"),
            (
                F.datediff(F.to_date("active_week"), F.to_date("cohort_week")) / 7
            )
            .cast("long")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
        .orderBy(F.asc("cohort_week"), F.asc("week_offset"))
    )


# ---------------------------------------------------------------------------
# Conversion funnel — strictly ordered view -> click -> purchase with
# a 24h conversion window per step: the click must land within 24h
# after the user's first view, the purchase within 24h after that
# first qualifying click. Classic cascading min-timestamp funnel;
# every stage is a per-user aggregate on the same shuffle key.
# ---------------------------------------------------------------------------

_FUNNEL_ORACLE = """
WITH v AS (
  SELECT user_id, MIN(ts) AS t FROM events
  WHERE event_type = 'view' GROUP BY user_id
),
c AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN v ON v.user_id = e.user_id
   AND e.ts > v.t AND e.ts <= v.t + INTERVAL 24 HOUR
  WHERE e.event_type = 'click' GROUP BY e.user_id
),
p AS (
  SELECT e.user_id, MIN(e.ts) AS t
  FROM events e JOIN c ON c.user_id = e.user_id
   AND e.ts > c.t AND e.ts <= c.t + INTERVAL 24 HOUR
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT stage, users FROM (
  SELECT '1_view' AS stage, COUNT(*) AS users FROM v
  UNION ALL SELECT '2_click_24h', COUNT(*) FROM c
  UNION ALL SELECT '3_purchase_24h', COUNT(*) FROM p
) ORDER BY stage ASC
"""


@register("events_funnel_conversion", _FUNNEL_ORACLE)
def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    v = (
        events.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("vt"))
    )
    c = (
        events.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(
            (F.col("ts") > F.col("vt"))
            & (F.col("ts") <= F.col("vt") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("ct"))
    )
    p = (
        events.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(
            (F.col("ts") > F.col("ct"))
            & (F.col("ts") <= F.col("ct") + F.expr("INTERVAL 24 HOURS"))
        )
        .groupBy("user_id")
        .agg(F.min("ts").alias("pt"))
    )

    def stage(df: DataFrame, name: str) -> DataFrame:
        return df.agg(
            F.lit(name).alias("stage"), F.count(F.lit(1)).alias("users")
        )

    return (
        stage(v, "1_view")
        .unionAll(stage(c, "2_click_24h"))
        .unionAll(stage(p, "3_purchase_24h"))
        .orderBy(F.asc("stage"))
    )


# ---------------------------------------------------------------------------
# Event transition matrix — first-order Markov chain over each user's
# event stream: LEAD over (user_id, ts, event_id) pairs consecutive
# events; output per (from, to) cell the transition count and the
# row-normalized probability. |event_types|^2 output — a constant.
# ---------------------------------------------------------------------------

_TRANSITION_ORACLE = """
WITH s AS (
  SELECT event_type AS from_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS to_type
  FROM events
),
cells AS (
  SELECT from_type, to_type, COUNT(*) AS transitions
  FROM s WHERE to_type IS NOT NULL GROUP BY from_type, to_type
)
SELECT from_type, to_type, transitions,
       ROUND(transitions::DOUBLE /
             SUM(transitions) OVER (PARTITION BY from_type), 4) AS prob
FROM cells
ORDER BY from_type ASC, to_type ASC
"""


@register("events_transition_matrix", _TRANSITION_ORACLE)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    cells = (
        events.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(seq).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("transitions"))
    )
    row_total = Window.partitionBy("from_type")
    return cells.select(
        "from_type",
        "to_type",
        "transitions",
        F.round(
            F.col("transitions") / F.sum("transitions").over(row_total), 4
        ).alias("prob"),
    ).orderBy(F.asc("from_type"), F.asc("to_type"))


# ---------------------------------------------------------------------------
# Stratified sample — deterministic per-stratum rates via the
# portable md5-derived per-mille hash (bit-identical in DuckDB, same
# scheme as dedup.py:450): purchases kept at 20%, errors at 10%, the
# high-volume types at 5% — oversampling rare strata is the standard
# class-balancing move for training-data extraction. Pure row-local
# predicate: no shuffle, evaluated in the scan stage.
# ---------------------------------------------------------------------------

_STRATIFIED_ORACLE = """
SELECT event_id, event_type, value
FROM events
WHERE CAST(('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 15)) AS BIGINT)
      % 1000 <
      CASE event_type WHEN 'purchase' THEN 200
                      WHEN 'error' THEN 100
                      ELSE 50 END
"""


@register("events_stratified_sample", _STRATIFIED_ORACLE)
def events_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    bucket = F.expr(
        "CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 15), 16, 10)"
        " AS BIGINT) % 1000"
    )
    rate = (
        F.when(F.col("event_type") == "purchase", 200)
        .when(F.col("event_type") == "error", 100)
        .otherwise(50)
    )
    return events.filter(bucket < rate).select("event_id", "event_type", "value")


# ---------------------------------------------------------------------------
# Rolling 7-day active users — for every calendar day in the log, the
# distinct-user count over that day and the 6 preceding. The day
# frame (one row per day — broadcastable at any SF) range-joins the
# distributed distinct (user, day) frame.
# ---------------------------------------------------------------------------

_ROLLING_ORACLE = """
WITH days AS (SELECT DISTINCT date_trunc('day', ts) AS day FROM events),
ud AS (SELECT DISTINCT user_id, date_trunc('day', ts) AS uday FROM events)
SELECT strftime(d.day, '%Y-%m-%d') AS day,
       COUNT(DISTINCT ud.user_id) AS active_7d
FROM days d JOIN ud
  ON ud.uday <= d.day AND ud.uday >= d.day - INTERVAL 6 DAY
GROUP BY 1 ORDER BY day ASC
"""


@register("events_rolling_7d_active_users", _ROLLING_ORACLE)
def events_rolling_7d_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    days = events.select(F.date_trunc("day", F.col("ts")).alias("day")).distinct()
    ud = events.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("uday")
    ).distinct()
    return (
        ud.join(
            F.broadcast(days),
            (F.col("uday") <= F.col("day"))
            & (F.col("uday") >= F.col("day") - F.expr("INTERVAL 6 DAYS")),
        )
        .groupBy(F.date_format("day", "yyyy-MM-dd").alias("day"))
        .agg(F.countDistinct("user_id").alias("active_7d"))
        .orderBy(F.asc("day"))
    )


# ---------------------------------------------------------------------------
# Gopher-style quality flags — the repetition/shape heuristics from
# the Gopher paper (Rae et al. 2021, "Scaling Language Models",
# appendix A1.1) adapted to this corpus: word-count bounds, mean word
# length bounds, minimum stop-word fraction, minimum distinct-word
# fraction (the inverse of Gopher's duplicate-line rules for a
# corpus without line structure). All metrics are rounded to 4dp
# BEFORE the flag comparisons so both engines flag identically at
# boundaries. Pure array expressions — no UDF, no shuffle.
# ---------------------------------------------------------------------------

_STOPWORDS = "('the','a','of','to','and','in','is','it')"

_GOPHER_ORACLE = f"""
WITH w AS (
  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
),
m AS (
  SELECT doc_id,
         len(ws) AS n_words,
         ROUND(list_sum(list_transform(ws, x -> length(x)))::DOUBLE
               / len(ws), 4) AS mean_word_len,
         ROUND(len(list_distinct(ws))::DOUBLE / len(ws), 4) AS distinct_frac,
         ROUND(len(list_filter(ws, x -> x IN {_STOPWORDS}))::DOUBLE
               / len(ws), 4) AS stopword_frac
  FROM w
)
SELECT doc_id, n_words, mean_word_len, distinct_frac, stopword_frac,
       CAST(n_words BETWEEN 20 AND 80 AS INT) AS flag_len,
       CAST(mean_word_len BETWEEN 3.0 AND 7.0 AS INT) AS flag_mwl,
       CAST(distinct_frac >= 0.4 AS INT) AS flag_distinct,
       CAST(stopword_frac >= 0.03 AS INT) AS flag_stop,
       CAST(n_words BETWEEN 20 AND 80 AND mean_word_len BETWEEN 3.0 AND 7.0
            AND distinct_frac >= 0.4 AND stopword_frac >= 0.03 AS INT)
         AS gopher_pass
FROM m
"""


@register("text_gopher_quality_flags", _GOPHER_ORACLE)
def text_gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id",
        F.expr("split(text, ' ')").alias("ws"),
    ).select(
        "doc_id",
        F.size("ws").cast("long").alias("n_words"),
        F.round(
            F.expr("aggregate(ws, 0L, (a, x) -> a + length(x))")
            / F.size("ws"),
            4,
        ).alias("mean_word_len"),
        F.round(
            F.size(F.array_distinct("ws")) / F.size("ws"), 4
        ).alias("distinct_frac"),
        F.round(
            F.expr(f"size(filter(ws, x -> x IN {_STOPWORDS}))") / F.size("ws"),
            4,
        ).alias("stopword_frac"),
    )
    flag_len = F.col("n_words").between(20, 80)
    flag_mwl = F.col("mean_word_len").between(3.0, 7.0)
    flag_distinct = F.col("distinct_frac") >= 0.4
    flag_stop = F.col("stopword_frac") >= 0.03
    return m.select(
        "doc_id",
        "n_words",
        "mean_word_len",
        "distinct_frac",
        "stopword_frac",
        flag_len.cast("int").alias("flag_len"),
        flag_mwl.cast("int").alias("flag_mwl"),
        flag_distinct.cast("int").alias("flag_distinct"),
        flag_stop.cast("int").alias("flag_stop"),
        (flag_len & flag_mwl & flag_distinct & flag_stop)
        .cast("int")
        .alias("gopher_pass"),
    )


# ---------------------------------------------------------------------------
# Bitmap retention: each user's activity compressed to ONE 64-bit
# presence mask (bit d = active on day d), then day-offset retention
# read off with pure bitwise ops — popcount(mask & (mask >> d)) counts
# the user's (day, day+d) active pairs. This is the roaring-bitmap
# retention layout every large analytics store uses (per-user state is
# one word; the whole analysis is map-side bit_or + byte-wide
# arithmetic, no self-join of the fact table — contrast
# events_cohort_retention, which joins facts to firsts). The 30-day
# fixture span fits one BIGINT; at production span the mask is an
# array of words keyed by epoch-week, same algebra per word
# (the bloom fixture at fixtures_resolution.py:43 shows the multi-word
# layout).
# ---------------------------------------------------------------------------

_BITMAP_EPOCH = "2024-01-01"

_BITMAP_RETENTION_ORACLE = f"""
WITH idx AS (
  SELECT user_id,
         date_diff('day', DATE '{_BITMAP_EPOCH}', CAST(ts AS DATE)) AS d
  FROM events),
m AS (
  SELECT user_id,
         bit_or(CAST(1 AS BIGINT) << CAST(d AS INT)) AS mask
  FROM idx WHERE d >= 0 AND d < 63
  GROUP BY user_id),
x AS (
  SELECT o.d AS offset_days, user_id,
         mask & (mask >> CAST(o.d AS INT)) AS ov
  FROM m CROSS JOIN (SELECT UNNEST(generate_series(1, 7)) AS d) o)
SELECT offset_days,
       CAST(COUNT(*) FILTER (WHERE ov <> 0) AS BIGINT) AS n_users_retained,
       CAST(COALESCE(SUM(bit_count(ov)), 0) AS BIGINT) AS n_day_pairs,
       ROUND(COUNT(*) FILTER (WHERE ov <> 0)
             / CAST(COUNT(*) AS DOUBLE), 4) AS retained_user_frac
FROM x GROUP BY 1
"""


@register("events_bitmap_retention", _BITMAP_RETENTION_ORACLE)
def events_bitmap_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    idx = events.select(
        "user_id",
        F.datediff(
            F.to_date("ts"), F.lit(_BITMAP_EPOCH).cast("date")
        ).alias("d"),
    ).filter((F.col("d") >= 0) & (F.col("d") < 63))
    masks = idx.select(
        "user_id",
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(d AS INT))").alias("m"),
    ).groupBy("user_id").agg(F.bit_or("m").alias("mask"))
    offsets = spark.range(1, 8).select(F.col("id").cast("int").alias("offset_days"))
    x = masks.crossJoin(F.broadcast(offsets)).withColumn(
        "ov", F.expr("mask & shiftright(mask, offset_days)")
    )
    return x.groupBy("offset_days").agg(
        F.count_if(F.col("ov") != 0).alias("n_users_retained"),
        F.coalesce(F.sum(F.bit_count("ov")), F.lit(0))
        .cast("long")
        .alias("n_day_pairs"),
        F.round(
            F.count_if(F.col("ov") != 0) / F.count(F.lit(1)).cast("double"), 4
        ).alias("retained_user_frac"),
    )


# ---------------------------------------------------------------------------
# Funnel step latency (the product-analytics complement of
# events_funnel_conversion, which counts WHO converts — this measures
# HOW FAST): for every purchase, time since the user's most recent
# preceding click, summarized as interpolated p50/p90. The Spark side
# reuses the single-shuffle as-of join (operators/range_join.asof_join,
# union + carry-forward window); the oracle uses DuckDB's native ASOF
# JOIN. Latencies are exact integer microseconds, and both engines
# share the linear-interpolation percentile definition (the
# events_value_percentiles contract). Clicks are deduplicated to
# (user, ts) on both sides — the as-of payload requires unique right
# timestamps, and latency depends only on ts. Contract: NULL
# user/ts excluded; purchases with no preceding click drop (inner
# as-of semantics, FIXTURES.md §J).
# ---------------------------------------------------------------------------

_FUNNEL_LATENCY_ORACLE = """
WITH p AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'purchase' AND user_id IS NOT NULL AND ts IS NOT NULL),
c AS (
  SELECT DISTINCT user_id, ts FROM events
  WHERE event_type = 'click' AND user_id IS NOT NULL AND ts IS NOT NULL),
j AS (
  SELECT p.user_id, (epoch_us(p.ts) - epoch_us(c.ts)) / 1000000.0 AS lat_s
  FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts)
SELECT CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       ROUND(quantile_cont(lat_s, 0.5), 4) AS p50_sec,
       ROUND(quantile_cont(lat_s, 0.9), 4) AS p90_sec
FROM j
"""


@register("events_funnel_step_latency", _FUNNEL_LATENCY_ORACLE)
def events_funnel_step_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.range_join import asof_join

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .select("user_id", F.col("ts").alias("click_ts"))
        .distinct()
    )
    joined = asof_join(
        purchases,
        clicks,
        keys=["user_id"],
        left_ts="ts",
        right_ts="click_ts",
        payload=["click_ts"],
        id_col="event_id",
    )
    lat = joined.select(
        "user_id",
        (
            (F.unix_micros("ts") - F.unix_micros("click_ts"))
            / F.lit(1_000_000.0)
        ).alias("lat_s"),
    )
    return lat.agg(
        F.count(F.lit(1)).alias("n_conversions"),
        F.countDistinct("user_id").alias("n_users"),
        F.round(F.expr("percentile(lat_s, 0.5)"), 4).alias("p50_sec"),
        F.round(F.expr("percentile(lat_s, 0.9)"), 4).alias("p90_sec"),
    )


# ---------------------------------------------------------------------------
# Cohort LTV triangle (the revenue complement of
# events_cohort_retention): customers grouped by first-order month,
# revenue tracked by month-age since that cohort month — the
# cohort x age triangle every subscription/commerce business reads
# LTV curves from. Age is exact integer month arithmetic
# (year*12+month difference, written identically in both engines —
# months_between's fractional semantics never enter), revenue is
# exact integer cents, so the whole triangle is deterministic.
# One aggregate for first-order months (map-side combinable), one
# join back (Catalyst broadcasts the cohort dim when it fits), one
# (cohort, age) aggregate. Contract: NULL custkey/orderdate rows
# excluded on both sides (FIXTURES.md §J).
# ---------------------------------------------------------------------------

_LTV_ORACLE = """
WITH o AS (
  SELECT o_custkey AS ck, CAST(o_orderdate AS DATE) AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL),
fc AS (
  SELECT ck, MIN(DATE_TRUNC('month', d)) AS cm FROM o GROUP BY ck)
SELECT STRFTIME(fc.cm, '%Y-%m') AS cohort_month,
       CAST((YEAR(DATE_TRUNC('month', o.d)) - YEAR(fc.cm)) * 12
            + (MONTH(DATE_TRUNC('month', o.d)) - MONTH(fc.cm)) AS BIGINT)
         AS age_months,
       CAST(COUNT(DISTINCT o.ck) AS BIGINT) AS active_customers,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(o.cents) AS BIGINT) AS revenue_cents
FROM o JOIN fc ON fc.ck = o.ck
GROUP BY 1, 2
"""


@register("orders_cohort_ltv_triangle", _LTV_ORACLE)
def orders_cohort_ltv_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(
            F.col("o_custkey").isNotNull() & F.col("o_orderdate").isNotNull()
        )
        .select(
            F.col("o_custkey").alias("ck"),
            F.to_date("o_orderdate").alias("d"),
            F.round(F.col("o_totalprice") * 100).cast("bigint").alias(
                "cents"
            ),
        )
    )
    fc = o.groupBy("ck").agg(F.min(F.trunc("d", "month")).alias("cm"))
    om = o.withColumn("m", F.trunc("d", "month"))
    j = om.join(fc, "ck")
    age = (
        (F.year("m") - F.year("cm")) * 12 + (F.month("m") - F.month("cm"))
    ).cast("bigint")
    return j.groupBy(
        F.date_format("cm", "yyyy-MM").alias("cohort_month"),
        age.alias("age_months"),
    ).agg(
        F.countDistinct("ck").alias("active_customers"),
        F.count(F.lit(1)).alias("n_orders"),
        F.sum("cents").alias("revenue_cents"),
    )


# ---------------------------------------------------------------------------
# Last-touch revenue attribution (r6): each purchase is credited to
# the user's most recent non-purchase event ("touch") at or before
# the purchase, provided it lies within a 7-day lookback window —
# the standard last-touch marketing-attribution report. Purchases
# with no touch in the window credit the '(none)' channel.
#
# Engine side: the shared as-of operator (operators/range_join.
# asof_join — one tagged union + one window per user, no join
# explosion) finds the latest preceding touch; the lookback window
# and the '(none)' bucket are plain post-filters. The oracle uses
# DuckDB's native ASOF LEFT JOIN — same greatest-t_ts-≤-p_ts
# semantics — so the two engines state the identical rule through
# their own idioms. Touches are pre-collapsed to one per (user, ts)
# with arg_max / max_by on event_id so the as-of tie rule never
# depends on physical order (asof_join's uniqueness precondition).
#
# Determinism contracts: ts-equal touch collapses use the event_id
# total order; revenue sums in exact cents (ROUND(value·100) BIGINT,
# FIXTURES §J/§K discipline); NULL user/ts/type rows, NULL event_id
# rows, and non-finite purchase values are excluded on both sides.
# ---------------------------------------------------------------------------

_ATTR_ORACLE = """
WITH base AS (
  SELECT * FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
t AS (
  SELECT user_id AS u, ts AS t_ts, arg_max(event_type, event_id) AS ch
  FROM base
  WHERE event_type <> 'purchase' AND event_id IS NOT NULL
  GROUP BY 1, 2),
p AS (
  SELECT event_id, user_id AS u, ts AS p_ts, value
  FROM base
  WHERE event_type = 'purchase' AND event_id IS NOT NULL
    AND value IS NOT NULL AND isfinite(value)),
j AS (
  SELECT p.u, p.p_ts, p.value, t.t_ts, t.ch
  FROM p ASOF LEFT JOIN t ON p.u = t.u AND t.t_ts <= p.p_ts),
lab AS (
  SELECT CASE WHEN t_ts IS NULL OR t_ts < p_ts - INTERVAL 7 DAY
              THEN '(none)' ELSE ch END AS channel,
         value
  FROM j)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_conversions,
       CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT)
         AS revenue_cents
FROM lab GROUP BY channel
"""


@register("events_last_touch_attribution", _ATTR_ORACLE)
def events_last_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    from ..operators.range_join import asof_join

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    touches = (
        ev.filter(
            (F.col("event_type") != "purchase")
            & F.col("event_id").isNotNull()
        )
        .groupBy("user_id", F.col("ts").alias("t_ts"))
        .agg(F.max_by("event_type", "event_id").alias("ch"))
    )
    purchases = ev.filter(
        (F.col("event_type") == "purchase")
        & F.col("event_id").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != float("inf"))
    ).select("event_id", "user_id", F.col("ts").alias("p_ts"), "value")
    hit = asof_join(
        purchases,
        touches,
        keys=["user_id"],
        left_ts="p_ts",
        right_ts="t_ts",
        payload=["ch", "t_ts"],
        id_col="event_id",
    )
    within = F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS")
    labeled = hit.select(
        F.when(within, F.col("ch")).otherwise(F.lit("(none)")).alias(
            "channel"
        ),
        "value",
    )
    untouched = purchases.join(
        hit.select("event_id"), "event_id", "left_anti"
    ).select(F.lit("(none)").alias("channel"), "value")
    return (
        labeled.unionByName(untouched)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            F.sum(F.round(F.col("value") * 100).cast("long")).alias(
                "revenue_cents"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Linear multi-touch attribution (r6): the even-split counterpart of
# last-touch above — EVERY touch in the purchase's 7-day lookback
# gets an equal share of the conversion value, the standard
# comparison baseline in attribution analysis. Touchless purchases
# credit '(none)' in full.
#
# Scale shape: the lookback join is a per-user equi-join with the
# window predicate (per-user pair fan-out is bounded by per-user
# activity; a true planet-scale run buckets by day exactly like the
# interval-overlap operator — documented, not needed at these
# per-user counts).
#
# Determinism: a rational share cents/n summed as doubles can land
# EXACTLY on a .005 boundary (odd cents, n = 2), where Spark's
# HALF_UP and DuckDB's binary-value rounding disagree by convention —
# so shares are FLOORED TO EXACT INTEGER BASIS POINTS instead:
# share_bp = (cents · 100) div n_touches (floor; operands
# non-negative, so Spark's truncating `div` and DuckDB's flooring
# `//` agree). Non-negativity is ENFORCED, not assumed: both engine
# and oracle filter value >= 0 (refund rows with negative value are
# out of scope for attribution credit — on negative cents `div`
# truncates toward zero while `//` floors, so admitting them would
# diverge cross-engine). Each purchase leaves at most n_touches − 1
# bp unattributed — stated rounding semantics, bit-exact in any
# engine. NULL/non-finite contracts mirror last-touch.
# ---------------------------------------------------------------------------

_LINEAR_ATTR_ORACLE = """
WITH base AS (
  SELECT * FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
t AS (
  SELECT user_id AS u, ts AS t_ts, event_type AS ch
  FROM base WHERE event_type <> 'purchase' AND event_id IS NOT NULL),
p AS (
  SELECT event_id AS pid, user_id AS u, ts AS p_ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM base
  WHERE event_type = 'purchase' AND event_id IS NOT NULL
    AND value IS NOT NULL AND isfinite(value) AND value >= 0),
hits AS (
  SELECT p.pid, p.cents, t.ch
  FROM p JOIN t ON t.u = p.u
   AND t.t_ts <= p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
nt AS (SELECT pid, COUNT(*) AS n FROM hits GROUP BY pid),
shares AS (
  SELECT h.ch AS channel, (h.cents * 100) // nt.n AS share_bp
  FROM hits h JOIN nt ON nt.pid = h.pid),
untouched AS (
  SELECT '(none)' AS channel, cents * 100 AS share_bp
  FROM p LEFT JOIN nt ON nt.pid = p.pid WHERE nt.pid IS NULL)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_share_events,
       CAST(SUM(share_bp) AS BIGINT) AS attributed_bp
FROM (SELECT * FROM shares UNION ALL SELECT * FROM untouched)
GROUP BY channel
"""


@register("events_linear_touch_attribution", _LINEAR_ATTR_ORACLE)
def events_linear_touch_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    touches = ev.filter(
        (F.col("event_type") != "purchase") & F.col("event_id").isNotNull()
    ).select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("ch"),
    )
    purchases = ev.filter(
        (F.col("event_type") == "purchase")
        & F.col("event_id").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != float("inf"))
        & (F.col("value") >= 0)
    ).select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    hits = purchases.join(touches, "u").filter(
        (F.col("t_ts") <= F.col("p_ts"))
        & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
    )
    nt = hits.groupBy("pid").agg(F.count(F.lit(1)).alias("n"))
    shares = hits.join(nt, "pid").select(
        F.col("ch").alias("channel"),
        F.expr("(cents * 100) div n").alias("share_bp"),
    )
    untouched = purchases.join(nt, "pid", "left_anti").select(
        F.lit("(none)").alias("channel"),
        (F.col("cents") * 100).alias("share_bp"),
    )
    return (
        shares.unionByName(untouched)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_share_events"),
            F.sum("share_bp").alias("attributed_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Time-decay multi-touch attribution (r7): completes the attribution
# family (last-touch / linear above) with the industry-standard
# exponential decay — a touch Δ days before the purchase earns weight
# 0.5^(Δ/7) (7-day half-life), shares normalized per purchase.
#
# Determinism: weights are QUANTIZED TO INTEGER MILLI-UNITS
# (round(w·1000)) before any share math, so shares are the same
# floor'd integer basis points as the linear fixture:
# share_bp = (cents·100·w_m) div Σw_m. The only float is the pow();
# its round-to-milli boundary cases are all dyadic (0.5^k · 1000 —
# exactly representable doubles), so both engines' HALF_UP agree, and
# Δ is an exact integer day count (epoch-seconds div 86400).
# Non-negativity: value ≥ 0 enforced like linear (div vs // differ on
# negatives). Each purchase leaves < n_touches milli-rounding bp
# unattributed — stated, bit-exact cross-engine.
#
# Scale shape: same bounded per-user lookback join as linear.
# ---------------------------------------------------------------------------

_DECAY_ATTR_ORACLE = """
WITH base AS (
  SELECT * FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL AND event_type IS NOT NULL),
t AS (
  SELECT user_id AS u, ts AS t_ts, event_type AS ch
  FROM base WHERE event_type <> 'purchase' AND event_id IS NOT NULL),
p AS (
  SELECT event_id AS pid, user_id AS u, ts AS p_ts,
         CAST(ROUND(value * 100) AS BIGINT) AS cents
  FROM base
  WHERE event_type = 'purchase' AND event_id IS NOT NULL
    AND value IS NOT NULL AND isfinite(value) AND value >= 0),
hits AS (
  SELECT p.pid, p.cents, t.ch,
         CAST(ROUND(POWER(0.5,
           CAST((epoch_us(p.p_ts) - epoch_us(t.t_ts)) // 86400000000
                AS DOUBLE) / 7.0)
           * 1000) AS BIGINT) AS w_m
  FROM p JOIN t ON t.u = p.u
   AND t.t_ts <= p.p_ts AND t.t_ts >= p.p_ts - INTERVAL 7 DAY),
nt AS (SELECT pid, SUM(w_m) AS sw FROM hits GROUP BY pid),
shares AS (
  SELECT h.ch AS channel, (h.cents * 100 * h.w_m) // nt.sw AS share_bp
  FROM hits h JOIN nt ON nt.pid = h.pid),
untouched AS (
  SELECT '(none)' AS channel, cents * 100 AS share_bp
  FROM p LEFT JOIN nt ON nt.pid = p.pid WHERE nt.pid IS NULL)
SELECT channel,
       CAST(COUNT(*) AS BIGINT) AS n_share_events,
       CAST(SUM(share_bp) AS BIGINT) AS attributed_bp
FROM (SELECT * FROM shares UNION ALL SELECT * FROM untouched)
GROUP BY channel
"""


@register("events_time_decay_attribution", _DECAY_ATTR_ORACLE)
def events_time_decay_attribution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull()
        & F.col("ts").isNotNull()
        & F.col("event_type").isNotNull()
    )
    touches = ev.filter(
        (F.col("event_type") != "purchase") & F.col("event_id").isNotNull()
    ).select(
        F.col("user_id").alias("u"),
        F.col("ts").alias("t_ts"),
        F.col("event_type").alias("ch"),
    )
    purchases = ev.filter(
        (F.col("event_type") == "purchase")
        & F.col("event_id").isNotNull()
        & F.col("value").isNotNull()
        & ~F.isnan("value")
        & (F.abs("value") != float("inf"))
        & (F.col("value") >= 0)
    ).select(
        F.col("event_id").alias("pid"),
        F.col("user_id").alias("u"),
        F.col("ts").alias("p_ts"),
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    # integer MICROSECOND floor-div on both engines — DuckDB's epoch()
    # is a fractional-second DOUBLE (and // doesn't floor doubles), so
    # the day count must come from exact integer micros on both sides
    days = F.expr(
        "CAST((unix_micros(p_ts) - unix_micros(t_ts)) div 86400000000"
        " AS DOUBLE)"
    )
    hits = (
        purchases.join(touches, "u")
        .filter(
            (F.col("t_ts") <= F.col("p_ts"))
            & (F.col("t_ts") >= F.col("p_ts") - F.expr("INTERVAL 7 DAYS"))
        )
        .select(
            "pid",
            "cents",
            "ch",
            F.round(F.pow(F.lit(0.5), days / F.lit(7.0)) * 1000)
            .cast("long")
            .alias("w_m"),
        )
    )
    nt = hits.groupBy("pid").agg(F.sum("w_m").alias("sw"))
    shares = hits.join(nt, "pid").select(
        F.col("ch").alias("channel"),
        F.expr("(cents * 100 * w_m) div sw").alias("share_bp"),
    )
    untouched = purchases.join(nt, "pid", "left_anti").select(
        F.lit("(none)").alias("channel"),
        (F.col("cents") * 100).alias("share_bp"),
    )
    return (
        shares.unionByName(untouched)
        .groupBy("channel")
        .agg(
            F.count(F.lit(1)).alias("n_share_events"),
            F.sum("share_bp").alias("attributed_bp"),
        )
    )


# ---------------------------------------------------------------------------
# Month-over-month revenue bridge (the "MRR waterfall", r7): for each
# month, decompose the revenue delta vs the prior month into the four
# standard components over per-customer monthly revenue —
#   new         customers with revenue this month, none last month
#   expansion   both months, this month higher (Σ increase)
#   contraction both months, this month lower (Σ decrease)
#   churned     revenue last month, none this month
# so that  this_total − prev_total
#        = new + expansion − contraction − churned   (exact cents).
# Complements orders_mom_revenue_growth (aggregate-only) with the
# full customer-level decomposition.
#
# Exact integer cents end-to-end; month buckets are date_trunc'd
# DATEs shifted with add_months (both engines' calendar arithmetic is
# exact), rendered 'yyyy-MM' per the temporal-string contract. The
# month AFTER the last data month appears with churn only — a real
# consequence of the shift, kept on both sides (stated, mirrored).
#
# Scale shape: one groupBy (custkey, month) touches facts; the bridge
# itself is a full-outer self-join of that aggregate on
# (custkey, month+1) — both sides shuffle on the same composite key —
# then one month-key aggregate over customer-level rows.
# ---------------------------------------------------------------------------

_BRIDGE_ORACLE = """
WITH cm AS (
  SELECT o_custkey AS c, date_trunc('month', o_orderdate) AS m,
         CAST(SUM(CAST(ROUND(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_orderdate IS NOT NULL
        AND o_totalprice IS NOT NULL
  GROUP BY 1, 2),
shifted AS (
  SELECT c, m + INTERVAL 1 MONTH AS m, cents AS prev_cents FROM cm),
joined AS (
  SELECT COALESCE(cur.c, prv.c) AS c,
         COALESCE(cur.m, prv.m) AS m,
         cur.cents, prv.prev_cents
  FROM cm cur FULL OUTER JOIN shifted prv
    ON cur.c = prv.c AND cur.m = prv.m)
SELECT strftime(m, '%Y-%m') AS month,
       CAST(SUM(CASE WHEN prev_cents IS NULL THEN cents ELSE 0 END)
            AS BIGINT) AS new_cents,
       CAST(SUM(CASE WHEN cents IS NOT NULL AND prev_cents IS NOT NULL
                     AND cents > prev_cents THEN cents - prev_cents
                     ELSE 0 END) AS BIGINT) AS expansion_cents,
       CAST(SUM(CASE WHEN cents IS NOT NULL AND prev_cents IS NOT NULL
                     AND cents < prev_cents THEN prev_cents - cents
                     ELSE 0 END) AS BIGINT) AS contraction_cents,
       CAST(SUM(CASE WHEN cents IS NULL THEN prev_cents ELSE 0 END)
            AS BIGINT) AS churned_cents
FROM joined GROUP BY m ORDER BY month
"""


@register("orders_revenue_bridge_waterfall", _BRIDGE_ORACLE)
def orders_revenue_bridge_waterfall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull()
        & F.col("o_orderdate").isNotNull()
        & F.col("o_totalprice").isNotNull()
    )
    cm = orders.groupBy(
        F.col("o_custkey").alias("c"),
        F.trunc("o_orderdate", "month").alias("m"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100).cast("long"))
        .cast("long")
        .alias("cents")
    )
    shifted = cm.select(
        "c", F.add_months("m", 1).alias("m"), F.col("cents").alias(
            "prev_cents"
        )
    )
    joined = cm.join(shifted, ["c", "m"], "full_outer")
    both = F.col("cents").isNotNull() & F.col("prev_cents").isNotNull()
    return (
        joined.groupBy(F.date_format("m", "yyyy-MM").alias("month"))
        .agg(
            F.sum(
                F.when(F.col("prev_cents").isNull(), F.col("cents"))
                .otherwise(F.lit(0))
            ).cast("long").alias("new_cents"),
            F.sum(
                F.when(
                    both & (F.col("cents") > F.col("prev_cents")),
                    F.col("cents") - F.col("prev_cents"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("expansion_cents"),
            F.sum(
                F.when(
                    both & (F.col("cents") < F.col("prev_cents")),
                    F.col("prev_cents") - F.col("cents"),
                ).otherwise(F.lit(0))
            ).cast("long").alias("contraction_cents"),
            F.sum(
                F.when(F.col("cents").isNull(), F.col("prev_cents"))
                .otherwise(F.lit(0))
            ).cast("long").alias("churned_cents"),
        )
        .orderBy("month")
    )
