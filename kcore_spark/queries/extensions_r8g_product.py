"""Round-8 part G, product-analytics block (split from extensions_r8g
per the r9 verdict; behavior unchanged): OHLC bars, corpus mixture
weighting, time-to-convert funnel, top-p cut, recency-decay
engagement, DAU/WAU stickiness, growth accounting, SLO burn rate,
view abandonment, grid-bucketed spatial join, ABC classification,
and supplier HHI concentration.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

# ------------------------------- OHLC bars (min_by / max_by surface)
# Daily purchase-value bars: open/close via min_by/max_by over a
# zero-padded (ts, event_id) composite key — fully tie-broken where a
# plain arg-by-ts would be nondeterministic — plus high/low/volume and
# the interpolated median. One partial-agg shuffle keyed by day;
# min_by/max_by partials carry (key, value) pairs, so the bar build
# never sorts within groups.


def q_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("v"),
        F.concat(
            F.lpad(F.unix_timestamp("ts").cast("string"), 12, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("ord_key"),
    )
    return (
        p.groupBy("day")
        .agg(
            F.min_by("v", "ord_key").alias("open_v"),
            F.max("v").alias("high_v"),
            F.min("v").alias("low_v"),
            F.max_by("v", "ord_key").alias("close_v"),
            F.count(F.lit(1)).alias("volume"),
            F.round(F.median("v"), 4).alias("median_v"),
        )
        .orderBy("day")
    )


Q_OHLC_SQL = """
WITH p AS (
  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS v,
         lpad(CAST(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS VARCHAR), 12, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
  FROM events WHERE event_type = 'purchase')
SELECT day,
       CAST(arg_min(v, ord_key) AS BIGINT) AS open_v,
       CAST(MAX(v) AS BIGINT) AS high_v,
       CAST(MIN(v) AS BIGINT) AS low_v,
       CAST(arg_max(v, ord_key) AS BIGINT) AS close_v,
       COUNT(*) AS volume,
       ROUND(median(v), 4) AS median_v
FROM p GROUP BY day ORDER BY day
"""

QUERIES["q_ohlc_daily"] = QuerySpec(
    q_ohlc_daily,
    Q_OHLC_SQL,
    "daily OHLC bars via min_by/max_by over a tie-broken composite key, "
    "plus exact high/low/volume and interpolated median",
)


# ----------------------------- corpus mixture weighting (capped)
# The pretraining-mix allocator: per (lang, source) bucket, weight =
# n_docs * quality_hits (docs inside the 100-2000 char band — an
# integer, so the raw weight is exact), share = w/W capped at 5% with
# the excess redistributed proportionally across uncapped buckets in
# one waterfall round. The cap test is INTEGER (20*w vs W) so both
# engines agree on the capped set exactly; redistribution factors are
# ratios of integer sums evaluated in one in-row double expression.
# One partial-agg shuffle + a 1-row totals broadcast — scan-dominated
# at 100 TB.

MIX_CAP_NUM, MIX_CAP_DEN = 1, 20  # cap = 5%


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.col("n_chars").between(100, 2000).cast("int")
        ).alias("quality_hits"),
    ).withColumn("w", F.col("n_docs") * F.col("quality_hits"))
    tot = g.agg(F.sum("w").alias("big_w"))
    flagged = g.crossJoin(F.broadcast(tot)).withColumn(
        "capped", (F.col("w") * MIX_CAP_DEN * MIX_CAP_NUM > F.col("big_w")).cast("int")
    )
    masses = flagged.agg(
        F.sum(
            F.when(
                F.col("capped") == 1,
                F.col("w") * MIX_CAP_DEN - F.col("big_w"),
            ).otherwise(F.lit(0))
        ).alias("excess_num"),
        F.sum(
            F.when(F.col("capped") == 0, F.col("w") * MIX_CAP_DEN).otherwise(
                F.lit(0)
            )
        ).alias("uncapped_num"),
    )
    out = flagged.crossJoin(F.broadcast(masses)).select(
        "lang",
        "source",
        "n_docs",
        "quality_hits",
        "capped",
        F.round(F.col("w").cast("double") / F.col("big_w"), 10).alias("raw_share"),
        F.round(
            F.when(F.col("capped") == 1, F.lit(MIX_CAP_NUM / MIX_CAP_DEN)).otherwise(
                (F.col("w").cast("double") / F.col("big_w"))
                * (
                    F.lit(1.0)
                    + F.col("excess_num").cast("double")
                    / F.col("uncapped_num").cast("double")
                )
            ),
            10,
        ).alias("final_share"),
    )
    return out.orderBy(F.col("final_share").desc(), "lang", "source")


Q_MIXTURE_SQL = f"""
WITH g AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         SUM(CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END) AS quality_hits,
         COUNT(*) * SUM(CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END) AS w
  FROM documents GROUP BY lang, source),
tot AS (SELECT SUM(w) AS big_w FROM g),
flagged AS (
  SELECT g.*, tot.big_w,
         CASE WHEN w * {MIX_CAP_DEN} * {MIX_CAP_NUM} > big_w THEN 1 ELSE 0 END AS capped
  FROM g CROSS JOIN tot),
masses AS (
  SELECT SUM(CASE WHEN capped = 1 THEN w * {MIX_CAP_DEN} - big_w ELSE 0 END) AS excess_num,
         SUM(CASE WHEN capped = 0 THEN w * {MIX_CAP_DEN} ELSE 0 END) AS uncapped_num
  FROM flagged)
SELECT lang, source, n_docs, CAST(quality_hits AS BIGINT) AS quality_hits, capped,
       ROUND(CAST(w AS DOUBLE) / big_w, 10) AS raw_share,
       ROUND(CASE WHEN capped = 1 THEN {MIX_CAP_NUM / MIX_CAP_DEN}
                  ELSE (CAST(w AS DOUBLE) / big_w)
                       * (1.0 + CAST(excess_num AS DOUBLE) / CAST(uncapped_num AS DOUBLE))
             END, 10) AS final_share
FROM flagged CROSS JOIN masses
ORDER BY final_share DESC, lang, source
"""

QUERIES["q_corpus_mixture"] = QuerySpec(
    q_corpus_mixture,
    Q_MIXTURE_SQL,
    "pretraining corpus mixture allocator: quality-weighted shares with a 5% "
    "cap and one-round proportional redistribution (integer cap test)",
)


# -------------------------------------------- time-to-convert funnel
# Completes the funnel family with the DURATION question: per user,
# the first 'view' and the first 'purchase' at-or-after it; output
# the conversion rate and the LOW-median seconds-to-convert (integer
# cumulative walk, the q_weighted_median machinery). Two keyed
# partial-agg shuffles + one user-keyed join; epoch seconds keep the
# whole computation in the integer domain.


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    fv = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("sec").alias("view_sec")
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("sec") >= F.col("view_sec"))
        .groupBy("user_id")
        .agg(F.min(F.col("sec") - F.col("view_sec")).alias("delta_s"))
    )
    # distinct conversion gaps are USER-count-sized until they saturate
    # at span-seconds (~10^6-10^7) — measured 10.0x per 10x data (r12
    # bounded-domain probe), so the median walk runs on _dist_cumsum
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    deltas = fp.groupBy("delta_s").agg(F.count(F.lit(1)).alias("c"))
    tot_c = deltas.agg(F.sum("c").alias("n"))
    med = (
        _dist_cumsum(deltas, [F.col("delta_s")], "c", out_col="cumc")
        .crossJoin(F.broadcast(tot_c))
        .where(2 * F.col("cumc") >= F.col("n"))
        .agg(F.min("delta_s").alias("median_delta_s"))
    )
    totals = fv.agg(F.count(F.lit(1)).alias("n_viewed")).crossJoin(
        F.broadcast(fp.agg(F.count(F.lit(1)).alias("n_converted")))
    )
    return totals.crossJoin(F.broadcast(med)).select(
        "n_viewed",
        "n_converted",
        F.round(F.col("n_converted") / F.col("n_viewed").cast("double"), 8).alias(
            "conversion_rate"
        ),
        "median_delta_s",
    )


Q_TTC_SQL = """
WITH ev AS (
  -- floor, not CAST: events ts carries sub-second fractions and
  -- Spark's unix_timestamp truncates while a bare BIGINT cast rounds
  SELECT user_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
  FROM events),
fv AS (
  SELECT user_id, MIN(sec) AS view_sec FROM ev
  WHERE event_type = 'view' GROUP BY user_id),
fp AS (
  SELECT ev.user_id, MIN(ev.sec - fv.view_sec) AS delta_s
  FROM ev JOIN fv ON fv.user_id = ev.user_id
  WHERE ev.event_type = 'purchase' AND ev.sec >= fv.view_sec
  GROUP BY ev.user_id),
deltas AS (SELECT delta_s, COUNT(*) AS c FROM fp GROUP BY delta_s),
med AS (
  SELECT MIN(delta_s) AS median_delta_s FROM (
    SELECT delta_s,
           SUM(c) OVER (ORDER BY delta_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
           SUM(c) OVER () AS n
    FROM deltas) WHERE 2 * cumc >= n)
SELECT (SELECT COUNT(*) FROM fv) AS n_viewed,
       (SELECT COUNT(*) FROM fp) AS n_converted,
       ROUND((SELECT COUNT(*) FROM fp) / CAST((SELECT COUNT(*) FROM fv) AS DOUBLE), 8)
         AS conversion_rate,
       median_delta_s
FROM med
"""

QUERIES["q_time_to_convert"] = QuerySpec(
    q_time_to_convert,
    Q_TTC_SQL,
    "funnel duration: conversion rate + LOW-median seconds from first view "
    "to first subsequent purchase (integer epoch walk)",
)


# -------------------------------------------- top-p (nucleus) cut
# The nucleus-sampling selection rule applied to a count distribution:
# per event type, rank users by event count (desc, id tie-break) and
# keep the smallest prefix whose mass reaches half the total — keep
# while 2*cum_before < total, an integer test, so the cut is exact on
# both engines. The same machinery picks "head" tokens/domains to
# keep or cap in a corpus-pruning pass. One keyed partial-agg shuffle
# + a per-type window over the post-aggregate user table.

TOPP_NUM, TOPP_DEN = 1, 2  # p = 0.5


def q_top_p_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    win = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), "user_id"
    ).rowsBetween(Window.unboundedPreceding, -1)
    w_t = Window.partitionBy("event_type")
    marked = (
        counts.withColumn("cum_before", F.coalesce(F.sum("c").over(win), F.lit(0)))
        .withColumn("total", F.sum("c").over(w_t))
        .withColumn(
            "kept",
            (
                F.col("cum_before") * TOPP_DEN < F.col("total") * TOPP_NUM
            ).cast("int"),
        )
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.sum("kept").alias("n_kept"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("kept") * F.col("c")).alias("kept_mass"),
            F.min("total").alias("total_mass"),
        )
        .orderBy("event_type")
    )


Q_TOPP_SQL = f"""
WITH counts AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
marked AS (
  SELECT event_type, c,
         COALESCE(SUM(c) OVER (PARTITION BY event_type
                               ORDER BY c DESC, user_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before,
         SUM(c) OVER (PARTITION BY event_type) AS total
  FROM counts)
SELECT event_type,
       CAST(SUM(CASE WHEN cum_before * {TOPP_DEN} < total * {TOPP_NUM} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN cum_before * {TOPP_DEN} < total * {TOPP_NUM} THEN c ELSE 0 END) AS BIGINT) AS kept_mass,
       CAST(MIN(total) AS BIGINT) AS total_mass
FROM marked GROUP BY event_type ORDER BY event_type
"""

QUERIES["q_top_p_cut"] = QuerySpec(
    q_top_p_cut,
    Q_TOPP_SQL,
    "top-p (nucleus) selection per group: smallest count-ranked prefix "
    "reaching half the mass, integer-exact cut",
)


# ------------------------------------ recency-decay engagement score
# Exponentially decayed engagement per user: score = sum over events
# of value * 2^(-age_days / half_life), half-life 7 days, age measured
# from the corpus max event time (1-row broadcast). Each decayed term
# is one in-row double rounded to 12 dp, then decimal-summed per user
# (order-independent); top-20 via TakeOrdered. The standard
# leaderboard/churn-risk scoring pass: one scan + one keyed shuffle.

DECAY_HALF_LIFE_DAYS = 7.0
DECAY_TOPK = 20


def q_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("v"),
    )
    mx = ev.agg(F.max("sec").alias("max_sec"))
    terms = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.round(
            F.col("v").cast("double")
            * F.pow(
                F.lit(2.0),
                -((F.col("max_sec") - F.col("sec")).cast("double") / 86400.0)
                / F.lit(DECAY_HALF_LIFE_DAYS),
            )
            / 10000.0,
            12,
        )
        .cast("decimal(28,12)")
        .alias("term"),
    )
    scores = terms.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("term").alias("score_dec"),
    )
    return (
        scores.orderBy(F.col("score_dec").desc(), "user_id")
        .limit(DECAY_TOPK)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("score_dec").cast("double"), 8).alias("decay_score"),
        )
    )


Q_DECAY_SQL = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS v
  FROM events),
mx AS (SELECT MAX(sec) AS max_sec FROM ev),
terms AS (
  SELECT user_id,
         CAST(ROUND(CAST(v AS DOUBLE)
              * POW(2.0, -(CAST(max_sec - sec AS DOUBLE) / 86400.0) / {DECAY_HALF_LIFE_DAYS})
              / 10000.0, 12) AS DECIMAL(28,12)) AS term
  FROM ev CROSS JOIN mx),
scores AS (
  SELECT user_id, COUNT(*) AS n_events, SUM(term) AS score_dec
  FROM terms GROUP BY user_id)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       ROUND(CAST(score_dec AS DOUBLE), 8) AS decay_score
FROM scores
ORDER BY score_dec DESC, user_id
LIMIT {DECAY_TOPK}
"""

QUERIES["q_decay_engagement"] = QuerySpec(
    q_decay_engagement,
    Q_DECAY_SQL,
    "recency-decayed engagement leaderboard: half-life weighting riding the "
    "scan, 12dp-rounded terms into decimal sums, TakeOrdered top-20",
)


# ------------------------------------------ DAU/WAU stickiness
# The product-health ratio: per ISO-style 7-day bucket (epoch-day / 7),
# weekly active users (exact distinct) and the average daily active
# count over the week's OBSERVED days; stickiness = avg_dau / wau.
# Exact integer distinct counts, two final in-row divisions. Shapes:
# one (user, day) dedup shuffle feeding both rollups.


def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    user_days = ev.select(
        "user_id",
        F.floor(F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400).alias(
            "day"
        ),
    ).distinct()
    user_days = user_days.withColumn("week", F.floor(F.col("day") / 7))
    dau = user_days.groupBy("week", "day").agg(F.count(F.lit(1)).alias("dau"))
    daily = dau.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dau").alias("dau_sum"),
    )
    wau = user_days.groupBy("week").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        daily.join(wau, "week")
        .select(
            F.col("week").cast("long").alias("week"),
            "n_days",
            "wau",
            F.round(F.col("dau_sum") / F.col("n_days").cast("double"), 6).alias(
                "avg_dau"
            ),
            F.round(
                F.col("dau_sum")
                / F.col("n_days").cast("double")
                / F.col("wau").cast("double"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("week")
    )


Q_STICKINESS_SQL = """
WITH user_days AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT) AS day
  FROM events),
ud AS (SELECT *, CAST(FLOOR(day / 7) AS BIGINT) AS week FROM user_days),
dau AS (SELECT week, day, COUNT(*) AS dau FROM ud GROUP BY 1, 2),
daily AS (SELECT week AS wk, COUNT(*) AS n_days, SUM(dau) AS dau_sum FROM dau GROUP BY week),
wau AS (SELECT week AS wk2, COUNT(DISTINCT user_id) AS wau FROM ud GROUP BY week)
SELECT wk AS week, CAST(n_days AS BIGINT) AS n_days, CAST(wau AS BIGINT) AS wau,
       ROUND(dau_sum / CAST(n_days AS DOUBLE), 6) AS avg_dau,
       ROUND(dau_sum / CAST(n_days AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness
FROM daily JOIN wau ON wau.wk2 = daily.wk
ORDER BY week
"""

QUERIES["q_dau_wau_stickiness"] = QuerySpec(
    q_dau_wau_stickiness,
    Q_STICKINESS_SQL,
    "DAU/WAU stickiness per 7-day bucket: exact distinct actives, one "
    "(user, day) dedup shuffle feeding both rollups",
)


# ---------------------------------------------- growth accounting
# The growth-accounting decomposition per 7-day bucket: every active
# user is NEW (first-ever week), RETAINED (also active the previous
# week) or RESURRECTED (active before, but not last week); CHURNED
# counts last week's actives who went silent this week. All exact
# distinct-activity set algebra: one (user, week) dedup shuffle, a
# per-user min, and two self-joins on (user, week-1). The identity
# wau(w) = new + retained + resurrected holds row-for-row.


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    uw = ev.select(
        "user_id",
        F.floor(
            F.floor(F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400) / 7
        ).alias("week"),
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("week").alias("first_week"))
    prev = uw.select("user_id", (F.col("week") + 1).alias("week"))
    flagged = (
        uw.join(first, "user_id")
        .join(prev.withColumn("was_prev", F.lit(1)), ["user_id", "week"], "left")
        .select(
            "week",
            F.when(F.col("week") == F.col("first_week"), F.lit("new"))
            .when(F.col("was_prev") == 1, F.lit("retained"))
            .otherwise(F.lit("resurrected"))
            .alias("kind"),
        )
    )
    actives = flagged.groupBy("week").agg(
        F.count(F.lit(1)).alias("wau"),
        F.sum((F.col("kind") == "new").cast("int")).alias("n_new"),
        F.sum((F.col("kind") == "retained").cast("int")).alias("n_retained"),
        F.sum((F.col("kind") == "resurrected").cast("int")).alias("n_resurrected"),
    )
    churned = (
        prev.join(uw, ["user_id", "week"], "left_anti")
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        actives.join(churned, "week", "left")
        .select(
            F.col("week").cast("long").alias("week"),
            "wau",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0)).alias("n_churned"),
        )
        .orderBy("week")
    )


Q_GROWTH_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(FLOOR(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) / 86400) / 7) AS BIGINT) AS week
  FROM events),
first AS (SELECT user_id, MIN(week) AS first_week FROM uw GROUP BY user_id),
flagged AS (
  SELECT uw.week,
         CASE WHEN uw.week = f.first_week THEN 'new'
              WHEN p.user_id IS NOT NULL THEN 'retained'
              ELSE 'resurrected' END AS kind
  FROM uw JOIN first f ON f.user_id = uw.user_id
  LEFT JOIN uw p ON p.user_id = uw.user_id AND p.week = uw.week - 1),
actives AS (
  SELECT week, COUNT(*) AS wau,
         SUM(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS n_new,
         SUM(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END) AS n_retained,
         SUM(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END) AS n_resurrected
  FROM flagged GROUP BY week),
churned AS (
  SELECT a.week + 1 AS week, COUNT(*) AS n_churned
  FROM uw a LEFT JOIN uw b ON b.user_id = a.user_id AND b.week = a.week + 1
  WHERE b.user_id IS NULL
  GROUP BY a.week + 1)
SELECT a.week, CAST(wau AS BIGINT) AS wau,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(n_retained AS BIGINT) AS n_retained,
       CAST(n_resurrected AS BIGINT) AS n_resurrected,
       CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
FROM actives a LEFT JOIN churned c ON c.week = a.week
ORDER BY a.week
"""

QUERIES["q_growth_accounting"] = QuerySpec(
    q_growth_accounting,
    Q_GROWTH_SQL,
    "growth accounting per 7-day bucket: new/retained/resurrected/churned "
    "from exact (user, week) set algebra; wau = new+retained+resurrected",
)


# ------------------------------------------ SLO burn-rate windows
# The multi-window error-budget alert (SRE workbook shape): per hour,
# the error ratio (error events / all events), and the 1h/6h burn
# rates — ratio over the window divided by the SLO budget (1%). The
# 6h window is a RANGE frame over the hourly rollup (integer sums),
# so burn rates are ratios of exact integers; an alert fires when
# BOTH windows burn faster than 1x (the standard page condition).


SLO_BUDGET_NUM, SLO_BUDGET_DEN = 1, 100  # 1% error budget


def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("int")).alias("e"),
    )
    hourly = hourly.withColumn("hs", F.unix_timestamp("h"))
    w6 = Window.orderBy("hs").rangeBetween(-5 * 3600, 0)
    rolled = hourly.withColumn("n6", F.sum("n").over(w6)).withColumn(
        "e6", F.sum("e").over(w6)
    )
    burn1 = (
        F.col("e").cast("double")
        / F.col("n")
        * SLO_BUDGET_DEN
        / SLO_BUDGET_NUM
    )
    burn6 = (
        F.col("e6").cast("double")
        / F.col("n6")
        * SLO_BUDGET_DEN
        / SLO_BUDGET_NUM
    )
    return (
        rolled.select(
            F.col("hs").alias("hour_epoch"),
            "n",
            "e",
            F.round(burn1, 6).alias("burn_1h"),
            F.round(burn6, 6).alias("burn_6h"),
            ((F.col("e") * SLO_BUDGET_DEN > F.col("n") * SLO_BUDGET_NUM)
             & (F.col("e6") * SLO_BUDGET_DEN > F.col("n6") * SLO_BUDGET_NUM))
            .cast("int")
            .alias("page"),
        )
        .orderBy("hour_epoch")
    )


Q_SLO_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
  FROM events GROUP BY 1),
hs AS (SELECT CAST(epoch(h) AS BIGINT) AS hs, n, e FROM hourly),
rolled AS (
  SELECT *,
         SUM(n) OVER (ORDER BY hs RANGE BETWEEN {5 * 3600} PRECEDING AND CURRENT ROW) AS n6,
         SUM(e) OVER (ORDER BY hs RANGE BETWEEN {5 * 3600} PRECEDING AND CURRENT ROW) AS e6
  FROM hs)
SELECT hs AS hour_epoch, CAST(n AS BIGINT) AS n, CAST(e AS BIGINT) AS e,
       ROUND(CAST(e AS DOUBLE) / n * {SLO_BUDGET_DEN} / {SLO_BUDGET_NUM}, 6) AS burn_1h,
       ROUND(CAST(e6 AS DOUBLE) / n6 * {SLO_BUDGET_DEN} / {SLO_BUDGET_NUM}, 6) AS burn_6h,
       CASE WHEN e * {SLO_BUDGET_DEN} > n * {SLO_BUDGET_NUM}
             AND e6 * {SLO_BUDGET_DEN} > n6 * {SLO_BUDGET_NUM} THEN 1 ELSE 0 END AS page
FROM rolled ORDER BY hour_epoch
"""

QUERIES["q_slo_burn_rate"] = QuerySpec(
    q_slo_burn_rate,
    Q_SLO_SQL,
    "multi-window SLO burn rate: 1h/6h error-budget ratios over the hourly "
    "rollup (RANGE frame, integer sums) with the dual-window page condition",
)


# ------------------------------------------- abandonment within 1h
# The funnel complement to q_time_to_convert: per day, the share of
# 'view' events with NO purchase by the same user within the next
# hour — a time-banded anti-join. The purchase side joins per user
# (keyed shuffle); the window condition is a range predicate on the
# join output, and the semi/anti split is one exists-aggregation per
# view event. Exact integer counts, one final division.

ABANDON_WINDOW_S = 3600


def q_view_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "sec", "day"
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("sec").alias("bsec")
    )
    converted = views.join(
        buys,
        (views.user_id == buys.user_id)
        & (F.col("bsec") > F.col("sec"))
        & (F.col("bsec") <= F.col("sec") + ABANDON_WINDOW_S),
        "left_semi",
    )
    per_day = views.groupBy("day").agg(F.count(F.lit(1)).alias("n_views"))
    conv_day = converted.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_converted")
    )
    return (
        per_day.join(conv_day, "day", "left")
        .select(
            "day",
            "n_views",
            F.coalesce(F.col("n_converted"), F.lit(0)).alias("n_converted"),
            F.round(
                (F.col("n_views") - F.coalesce(F.col("n_converted"), F.lit(0)))
                / F.col("n_views").cast("double"),
                6,
            ).alias("abandonment_rate"),
        )
        .orderBy("day")
    )


Q_ABANDON_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
  FROM events),
views AS (SELECT user_id, event_id, sec, day FROM ev WHERE event_type = 'view'),
buys AS (SELECT user_id, sec AS bsec FROM ev WHERE event_type = 'purchase'),
conv AS (
  SELECT DISTINCT v.event_id, v.day
  FROM views v JOIN buys b
    ON b.user_id = v.user_id
   AND b.bsec > v.sec AND b.bsec <= v.sec + {ABANDON_WINDOW_S}),
per_day AS (SELECT day, COUNT(*) AS n_views FROM views GROUP BY day),
conv_day AS (SELECT day, COUNT(*) AS n_converted FROM conv GROUP BY day)
SELECT p.day, CAST(n_views AS BIGINT) AS n_views,
       CAST(COALESCE(n_converted, 0) AS BIGINT) AS n_converted,
       ROUND((n_views - COALESCE(n_converted, 0)) / CAST(n_views AS DOUBLE), 6)
         AS abandonment_rate
FROM per_day p LEFT JOIN conv_day c ON c.day = p.day
ORDER BY p.day
"""

QUERIES["q_view_abandonment"] = QuerySpec(
    q_view_abandonment,
    Q_ABANDON_SQL,
    "per-day view abandonment: time-banded left-semi join (purchase within "
    "1h) then exact counts — the funnel complement to time-to-convert",
)


# ------------------------------------------ grid-bucketed spatial join
# The spatial-join candidate generator (the H3/S2 pattern): customers
# get deterministic md5-uniform coordinates, points bucket into a
# 10-degree grid, ONE side explodes to its 3x3 cell neighborhood and
# the join is a plain equi-join on the cell key — neighbor-complete
# for any radius <= cell size, NEVER an all-pairs distance test. The
# verify stage computes squared degree distance (rounded 8dp) against
# a 5-degree radius. Scale shape: candidates are bounded per cell;
# skewed cells would be salted exactly like the fuzzy-join blocks.

GEO_CELL_DEG = 10
GEO_RADIUS_DEG = 5


def q_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def u(salt: str):
        h = F.conv(
            F.substring(F.md5(F.concat(F.col("c_custkey").cast("string"),
                                       F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("double")
        return (h + 1) / F.lit(4294967296.0)

    pts = cust.select(
        "c_custkey",
        F.round(u("lat") * 180 - 90, 6).alias("lat"),
        F.round(u("lon") * 360 - 180, 6).alias("lon"),
    )
    pts = pts.withColumn("cx", F.floor(F.col("lat") / GEO_CELL_DEG)).withColumn(
        "cy", F.floor(F.col("lon") / GEO_CELL_DEG)
    )
    right = pts.select(
        F.col("c_custkey").alias("k2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        "cx",
        "cy",
    )
    probe = (
        pts.select("c_custkey", "lat", "lon", "cx", "cy")
        .withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            F.col("c_custkey").alias("k1"),
            F.col("lat").alias("lat1"),
            F.col("lon").alias("lon1"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    cand = probe.join(right, ["cx", "cy"]).where(F.col("k1") < F.col("k2"))
    scored = cand.select(
        F.round(
            (F.col("lat1") - F.col("lat2")) * (F.col("lat1") - F.col("lat2"))
            + (F.col("lon1") - F.col("lon2")) * (F.col("lon1") - F.col("lon2")),
            8,
        ).alias("d2")
    )
    return (
        scored.agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(
                (F.col("d2") <= F.lit(float(GEO_RADIUS_DEG**2))).cast("int")
            ).alias("n_close_pairs"),
        )
        .crossJoin(F.broadcast(pts.agg(F.count(F.lit(1)).alias("n_points"))))
        .select("n_points", "n_candidates", "n_close_pairs")
    )


Q_SPATIAL_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         ROUND((('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lat'), 1, 8))::BIGINT + 1.0)
               / 4294967296.0 * 180 - 90, 6) AS lat,
         ROUND((('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lon'), 1, 8))::BIGINT + 1.0)
               / 4294967296.0 * 360 - 180, 6) AS lon
  FROM customer),
cells AS (
  SELECT *, CAST(FLOOR(lat / {GEO_CELL_DEG}) AS BIGINT) AS cx,
            CAST(FLOOR(lon / {GEO_CELL_DEG}) AS BIGINT) AS cy
  FROM pts),
probe AS (
  SELECT c_custkey AS k1, lat AS lat1, lon AS lon1,
         cx + dx.g AS cx, cy + dy.g AS cy
  FROM cells, (SELECT UNNEST([-1, 0, 1]) AS g) dx, (SELECT UNNEST([-1, 0, 1]) AS g) dy),
cand AS (
  SELECT ROUND((p.lat1 - r.lat) * (p.lat1 - r.lat)
               + (p.lon1 - r.lon) * (p.lon1 - r.lon), 8) AS d2
  FROM probe p JOIN cells r ON r.cx = p.cx AND r.cy = p.cy AND p.k1 < r.c_custkey)
SELECT (SELECT COUNT(*) FROM pts) AS n_points,
       COUNT(*) AS n_candidates,
       CAST(SUM(CASE WHEN d2 <= {GEO_RADIUS_DEG**2}.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_close_pairs
FROM cand
"""

QUERIES["q_spatial_grid_join"] = QuerySpec(
    q_spatial_grid_join,
    Q_SPATIAL_SQL,
    "grid-bucketed spatial join: 3x3 neighborhood probe equi-join (the "
    "H3/S2 candidate pattern), neighbor-complete for radius <= cell size",
)


# ------------------------------------------------ ABC classification
# The supply-chain Pareto classes: parts ranked by revenue; A-class
# covers the first 80% of cumulative revenue, B the next 15%, C the
# tail. Cut tests are integer cross-multiplications on exact cents
# (5*cum <= 4*total for A; 20*cum <= 19*total for B), applied to the
# revenue BEFORE each part (so the part that crosses the line still
# belongs to the class it completes). One keyed shuffle, then the
# ranked walk over the (catalog-sized) per-part rollup uses the
# DISTRIBUTED prefix-sum machinery (_dist_cumsum, extensions_r8.py)
# and the total a 1-row broadcast cross — no single-task global
# window; output is the class summary.


def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    per_part = li.groupBy("pk").agg(F.sum("cents").alias("rev"))
    walked = (
        _dist_cumsum(
            per_part, [(-F.col("rev")), F.col("pk")], "rev", out_col="cum_incl"
        )
        .withColumn("cum_before", F.col("cum_incl") - F.col("rev"))
        .crossJoin(F.broadcast(per_part.agg(F.sum("rev").alias("total"))))
        .withColumn(
            "abc",
            F.when(F.col("cum_before") * 5 <= F.col("total") * 4, F.lit("A"))
            .when(F.col("cum_before") * 20 <= F.col("total") * 19, F.lit("B"))
            .otherwise(F.lit("C")),
        )
    )
    return (
        walked.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").alias("class_revenue_cents"),
        )
        .crossJoin(F.broadcast(per_part.agg(F.count(F.lit(1)).alias("total_parts"))))
        .select(
            "abc",
            "n_parts",
            "class_revenue_cents",
            F.round(F.col("n_parts") / F.col("total_parts").cast("double"), 6).alias(
                "part_share"
            ),
        )
        .orderBy("abc")
    )


Q_ABC_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS rev
  FROM lineitem GROUP BY l_partkey),
walked AS (
  SELECT pk, rev,
         COALESCE(SUM(rev) OVER (ORDER BY rev DESC, pk
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before,
         SUM(rev) OVER () AS total
  FROM per_part),
classed AS (
  SELECT *,
         CASE WHEN cum_before * 5 <= total * 4 THEN 'A'
              WHEN cum_before * 20 <= total * 19 THEN 'B'
              ELSE 'C' END AS abc
  FROM walked)
SELECT abc, COUNT(*) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS class_revenue_cents,
       ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM per_part) AS DOUBLE), 6)
         AS part_share
FROM classed GROUP BY abc ORDER BY abc
"""

QUERIES["q_abc_classification"] = QuerySpec(
    q_abc_classification,
    Q_ABC_SQL,
    "ABC (Pareto) inventory classes over per-part revenue: integer "
    "cross-multiplied 80/95% cuts on the cumulative walk",
)


# ---------------------------------------------- concentration (HHI)
# The Herfindahl-Hirschman concentration index of supplier revenue:
# HHI = sum of squared market shares = sum(rev_i^2) / (sum(rev))^2,
# both sums exact decimals (cents squared crosses int64), one final
# division — the antitrust-style complement to Gini/Lorenz already in
# the registry. Also reports the effective number of suppliers 1/HHI.


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("sk"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    per_supp = li.groupBy("sk").agg(
        F.sum("cents").cast("decimal(38,0)").alias("rev")
    )
    agg = per_supp.agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev").alias("total"),
        F.sum(F.col("rev") * F.col("rev")).alias("sq_sum"),
    )
    hhi = agg["sq_sum"].cast("double") / (
        F.col("total").cast("double") * F.col("total").cast("double")
    )
    return agg.select(
        "n_suppliers",
        F.round(hhi, 10).alias("hhi"),
        F.round(F.lit(1.0) / hhi, 6).alias("effective_suppliers"),
    )


Q_HHI_SQL = """
WITH per_supp AS (
  SELECT l_suppkey AS sk,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DECIMAL(38,0)) AS rev
  FROM lineitem GROUP BY l_suppkey),
agg AS (
  SELECT COUNT(*) AS n_suppliers, SUM(rev) AS total, SUM(rev * rev) AS sq_sum
  FROM per_supp)
SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
       ROUND(CAST(sq_sum AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 10) AS hhi,
       ROUND(1.0 / (CAST(sq_sum AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))), 6)
         AS effective_suppliers
FROM agg
"""

QUERIES["q_supplier_hhi"] = QuerySpec(
    q_supplier_hhi,
    Q_HHI_SQL,
    "Herfindahl concentration of supplier revenue (decimal-exact squared "
    "shares, effective-supplier count 1/HHI)",
)
