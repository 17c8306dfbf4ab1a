"""Round-10 surface extensions, batch BX (SURVEY §2.3 N r10): the
changepoint block, second wave — Pettitt's rank-based test (a
distribution-free single-changepoint detector with its closed-form
significance approximation), the first binary-segmentation step (the
mean-shift split maximizing SSE reduction — the core move of binseg /
PELT-style detectors), and a variance-changepoint scan (the split
maximizing the Gaussian log-likelihood gain for a variance change,
catching regime shifts the mean-based tests miss). All three run over
the daily order-revenue series and complement q_cusum_changepoint /
q_page_hinkley (online detectors) with offline retrospective ones.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: the daily series is a cents-decimal rollup; prefix sums
are decimal; candidate scores are rounded to 6dp BEFORE the argmax so
cross-engine last-ulp noise cannot flip a tie (day ascending breaks
ties, pinned both sides); Pettitt uses exact average ranks
(min-rank + (ties-1)/2 — integer halves).
Scale: one orders scan folds to the calendar-bounded daily series;
every window after that runs over that curve (adjudicated — the
q_cusum_changepoint precedent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_MIN_SEG = 5  # pinned minimum segment length for the split scans


def _daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    return (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .alias("cents")
        )
        .select(
            F.unix_timestamp(F.col("d").cast("timestamp")).alias("day_epoch"),
            "cents",
        )
    )


_DAILY_SQL = """
  SELECT CAST(epoch(CAST(d AS TIMESTAMP)) AS BIGINT) AS day_epoch, cents
  FROM (
    SELECT CAST(o_orderdate AS DATE) AS d,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))) AS cents
    FROM orders GROUP BY 1)
"""


# -------------------------------------------------------------- Pettitt
# U_t = 2 W_t - t (n + 1) with W_t the cumsum (in time order) of
# value-ranks (average ranks for ties). K = max |U_t|; p ~=
# 2 exp(-6 K^2 / (n^3 + n^2)), capped at 1.


def q_pettitt_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = _daily(spark, sf_dir)
    w_rank = Window.orderBy("cents")
    w_tie = Window.partitionBy("cents")
    ranked = daily.select(
        "day_epoch",
        (
            F.rank().over(w_rank) + (F.count(F.lit(1)).over(w_tie) - 1) / 2.0
        ).alias("r"),
    )
    w_time = Window.orderBy("day_epoch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    n = daily.agg(F.count(F.lit(1)).cast("long").alias("n"))
    u = (
        ranked.withColumn("w_t", F.sum("r").over(w_time))
        .withColumn("t", F.row_number().over(Window.orderBy("day_epoch")))
        .crossJoin(F.broadcast(n))
        .select(
            "day_epoch",
            "n",
            (2.0 * F.col("w_t") - F.col("t") * (F.col("n") + 1)).alias("u_t"),
        )
    )
    best = u.select(
        "n",
        F.abs("u_t").alias("k"),
        "day_epoch",
    ).agg(
        F.first("n").alias("n_days"),
        F.max(F.struct(F.col("k"), (-F.col("day_epoch")).alias("neg_d"))).alias("b"),
    )
    nd = F.col("n_days").cast("double")
    k = F.col("b.k")
    p = F.least(
        F.lit(1.0), 2.0 * F.exp(-6.0 * k * k / (nd * nd * nd + nd * nd))
    )
    return best.select(
        "n_days",
        (-F.col("b.neg_d")).cast("long").alias("change_day_epoch"),
        F.round(k, 1).alias("k_stat"),
        F.round(p, 6).alias("p_approx"),
    )


Q_PETTITT_SQL = f"""
WITH daily AS ({_DAILY_SQL}),
ranked AS (
  SELECT day_epoch,
         RANK() OVER (ORDER BY cents)
           + (COUNT(*) OVER (PARTITION BY cents) - 1) / 2.0 AS r
  FROM daily),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
u AS (
  SELECT day_epoch, n,
         2.0 * SUM(r) OVER (ORDER BY day_epoch ROWS UNBOUNDED PRECEDING)
           - ROW_NUMBER() OVER (ORDER BY day_epoch) * (n + 1) AS u_t
  FROM ranked CROSS JOIN n),
best AS (
  SELECT n AS n_days, day_epoch, ABS(u_t) AS k
  FROM u ORDER BY ABS(u_t) DESC, day_epoch ASC LIMIT 1)
SELECT n_days, CAST(day_epoch AS BIGINT) AS change_day_epoch,
       ROUND(k, 1) AS k_stat,
       ROUND(LEAST(1.0, 2.0 * EXP(-6.0 * k * k
             / (CAST(n_days AS DOUBLE) * n_days * n_days
                + CAST(n_days AS DOUBLE) * n_days))), 6) AS p_approx
FROM best
"""

QUERIES["q_pettitt_test"] = QuerySpec(
    q_pettitt_test,
    Q_PETTITT_SQL,
    "Pettitt rank changepoint over daily revenue — average-rank cumsum, "
    "closed-form significance, earliest-day tie-break",
)


def _prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily series in integer KILODOLLARS (cents/1e5, rounded) with
    decimal prefix sums of v and v^2 plus position t and global totals.
    The unit choice keeps every moment (a1^2, s1^2, ...) inside the
    double-exact integer range, so both engines compute the SSE algebra
    bit-identically — cents-scale prefixes overflowed 2^53 and lost
    last-ulp agreement at sf0.001."""
    daily = _daily(spark, sf_dir).select(
        "day_epoch",
        F.round(F.col("cents") / 100000.0, 0).cast("long").alias("v"),
    )
    w_time = Window.orderBy("day_epoch").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("v").alias("s1"),
        F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).alias("s2"),
    )
    return (
        daily.withColumn("a1", F.sum("v").over(w_time))
        .withColumn(
            "a2", F.sum((F.col("v") * F.col("v")).cast("decimal(38,0)")).over(w_time)
        )
        .withColumn("t", F.row_number().over(Window.orderBy("day_epoch")))
        .crossJoin(F.broadcast(tot))
    )


_PREFIX_SQL = f"""
  daily0 AS ({_DAILY_SQL}),
  daily AS (
    SELECT day_epoch,
           CAST(ROUND(cents / 100000.0, 0) AS BIGINT) AS v
    FROM daily0),
  tot AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS s1,
           SUM(CAST(v * v AS DECIMAL(38,0))) AS s2
    FROM daily),
  prefix AS (
    SELECT day_epoch,
           SUM(v) OVER (ORDER BY day_epoch ROWS UNBOUNDED PRECEDING) AS a1,
           SUM(CAST(v * v AS DECIMAL(38,0)))
               OVER (ORDER BY day_epoch ROWS UNBOUNDED PRECEDING) AS a2,
           ROW_NUMBER() OVER (ORDER BY day_epoch) AS t,
           n, s1, s2
    FROM daily CROSS JOIN tot)
"""

# SSE reported in (kilodollar)^2 units — no further scaling
_SCALE = 1.0


def q_binseg_sse(spark: SparkSession, sf_dir: str) -> DataFrame:
    pre = _prefix(spark, sf_dir)
    td = F.col("t").cast("double")
    rd = (F.col("n") - F.col("t")).cast("double")
    a1 = F.col("a1").cast("double")
    a2 = F.col("a2").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    sse_l = (a2 - a1 * a1 / td) / _SCALE
    sse_r = ((s2 - a2) - (s1 - a1) * (s1 - a1) / rd) / _SCALE
    sse_tot = (s2 - s1 * s1 / F.col("n").cast("double")) / _SCALE
    cand = (
        pre.where((F.col("t") >= _MIN_SEG) & (F.col("t") <= F.col("n") - _MIN_SEG))
        .select(
            "day_epoch",
            "n",
            F.round(sse_tot, 2).alias("sse_total"),
            F.round(sse_l + sse_r, 2).alias("sse_split"),
        )
        # gain from the ROUNDED columns so both engines tie identically
        .withColumn("gain", F.round(F.col("sse_total") - F.col("sse_split"), 2))
    )
    best = cand.agg(
        F.first("n").alias("n_days"),
        F.first("sse_total").alias("sse_total"),
        F.max(
            F.struct(F.col("gain"), (-F.col("day_epoch")).alias("neg_d"),
                     F.col("sse_split"))
        ).alias("b"),
    )
    return best.select(
        "n_days",
        (-F.col("b.neg_d")).cast("long").alias("split_day_epoch"),
        "sse_total",
        F.col("b.sse_split").alias("sse_split"),
        F.round(F.col("b.gain") / F.col("sse_total") * 100.0, 4).alias(
            "gain_pct"
        ),
    )


Q_BINSEG_SQL = f"""
WITH {_PREFIX_SQL},
cand AS (
  SELECT day_epoch, n,
         ROUND((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                / CAST(n AS DOUBLE)) / {_SCALE}, 2) AS sse_total,
         ROUND((CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE)
                / CAST(t AS DOUBLE)) / {_SCALE}
             + ((CAST(s2 AS DOUBLE) - CAST(a2 AS DOUBLE))
                - (CAST(s1 AS DOUBLE) - CAST(a1 AS DOUBLE))
                  * (CAST(s1 AS DOUBLE) - CAST(a1 AS DOUBLE))
                  / CAST(n - t AS DOUBLE)) / {_SCALE}, 2) AS sse_split
  FROM prefix
  WHERE t >= {_MIN_SEG} AND t <= n - {_MIN_SEG}),
best AS (
  SELECT n AS n_days, day_epoch, sse_total, sse_split,
         ROUND(sse_total - sse_split, 2) AS gain
  FROM cand ORDER BY ROUND(sse_total - sse_split, 2) DESC, day_epoch ASC
  LIMIT 1)
SELECT n_days, CAST(day_epoch AS BIGINT) AS split_day_epoch,
       sse_total, sse_split,
       ROUND(gain / sse_total * 100.0, 4) AS gain_pct
FROM best
"""

QUERIES["q_binseg_sse"] = QuerySpec(
    q_binseg_sse,
    Q_BINSEG_SQL,
    "first binary-segmentation split of daily revenue — decimal prefix "
    "sums, rounded-gain argmax with pinned tie-break",
)


def q_variance_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    pre = _prefix(spark, sf_dir)
    td = F.col("t").cast("double")
    rd = (F.col("n") - F.col("t")).cast("double")
    nd = F.col("n").cast("double")
    a1 = F.col("a1").cast("double")
    a2 = F.col("a2").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    var_l = (a2 - a1 * a1 / td) / td / _SCALE
    var_r = ((s2 - a2) - (s1 - a1) * (s1 - a1) / rd) / rd / _SCALE
    var_tot = (s2 - s1 * s1 / nd) / nd / _SCALE
    gain = (
        nd / 2.0 * F.log(var_tot)
        - td / 2.0 * F.log(var_l)
        - rd / 2.0 * F.log(var_r)
    )
    cand = pre.where(
        (F.col("t") >= _MIN_SEG) & (F.col("t") <= F.col("n") - _MIN_SEG)
    ).select(
        "day_epoch",
        "n",
        F.round(gain, 6).alias("ll_gain"),
        F.round(var_l, 2).alias("var_left"),
        F.round(var_r, 2).alias("var_right"),
    )
    best = cand.agg(
        F.first("n").alias("n_days"),
        F.max(
            F.struct(
                F.col("ll_gain"),
                (-F.col("day_epoch")).alias("neg_d"),
                F.col("var_left"),
                F.col("var_right"),
            )
        ).alias("b"),
    )
    return best.select(
        "n_days",
        (-F.col("b.neg_d")).cast("long").alias("split_day_epoch"),
        F.col("b.ll_gain").alias("ll_gain"),
        F.col("b.var_left").alias("var_left"),
        F.col("b.var_right").alias("var_right"),
    )


Q_VARCP_SQL = f"""
WITH {_PREFIX_SQL},
cand AS (
  SELECT day_epoch, n,
         ROUND(CAST(n AS DOUBLE) / 2.0
               * LN((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE)
                     / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE) / {_SCALE})
             - CAST(t AS DOUBLE) / 2.0
               * LN((CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE)
                     / CAST(t AS DOUBLE)) / CAST(t AS DOUBLE) / {_SCALE})
             - CAST(n - t AS DOUBLE) / 2.0
               * LN(((CAST(s2 AS DOUBLE) - CAST(a2 AS DOUBLE))
                     - (CAST(s1 AS DOUBLE) - CAST(a1 AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) - CAST(a1 AS DOUBLE))
                       / CAST(n - t AS DOUBLE))
                    / CAST(n - t AS DOUBLE) / {_SCALE}), 6) AS ll_gain,
         ROUND((CAST(a2 AS DOUBLE) - CAST(a1 AS DOUBLE) * CAST(a1 AS DOUBLE)
                / CAST(t AS DOUBLE)) / CAST(t AS DOUBLE) / {_SCALE}, 2)
             AS var_left,
         ROUND(((CAST(s2 AS DOUBLE) - CAST(a2 AS DOUBLE))
                - (CAST(s1 AS DOUBLE) - CAST(a1 AS DOUBLE))
                  * (CAST(s1 AS DOUBLE) - CAST(a1 AS DOUBLE))
                  / CAST(n - t AS DOUBLE))
               / CAST(n - t AS DOUBLE) / {_SCALE}, 2) AS var_right
  FROM prefix
  WHERE t >= {_MIN_SEG} AND t <= n - {_MIN_SEG})
SELECT n AS n_days, CAST(day_epoch AS BIGINT) AS split_day_epoch,
       ll_gain, var_left, var_right
FROM cand ORDER BY ll_gain DESC, day_epoch ASC LIMIT 1
"""

QUERIES["q_variance_changepoint"] = QuerySpec(
    q_variance_changepoint,
    Q_VARCP_SQL,
    "variance-regime changepoint: max Gaussian LL gain over the daily "
    "series — shared decimal prefix sums, pinned argmax",
)
