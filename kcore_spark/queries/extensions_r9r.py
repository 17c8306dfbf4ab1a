"""Round-9 surface extensions, batch R (SURVEY §2.3 N r9): maximum
drawdown (the running-peak risk metric over a cumulative series),
greedy propensity-score matching (completing the causal family that
q_cuped_adjustment / q_diff_in_diff / q_smd_balance started), and
sharp regression discontinuity (local linear on both sides of a
cutoff — the jump estimator).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Cumulative sums are DECIMAL-exact; matching is rank-paired (greedy
deterministic, never a nearest-neighbor search); both OLS fits are
closed-form moment math.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# --------------------------------------- maximum drawdown
# Over each priority's cumulative daily revenue: dd_t = (peak_t −
# cum_t)/peak_t with peak_t the running max; max drawdown is the
# worst dd. For a monotone revenue cumsum the interesting series is
# daily revenue minus its own mean (a mean-reverting P&L), which
# actually draws down. DECIMAL-exact cumulatives; one ordered window
# per priority (curve-sized after the daily rollup).


def q_max_drawdown(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("prio"),
        F.to_date("o_orderdate").alias("d"),
        F.col("o_totalprice").cast("decimal(18,2)").alias("v"),
    )
    daily = orders.groupBy("prio", "d").agg(
        F.sum("v").cast("decimal(38,2)").alias("rev")
    )
    mean_rev = daily.groupBy("prio").agg(
        (F.sum("rev") / F.count(F.lit(1))).cast("decimal(38,6)").alias("mu")
    )
    w = Window.partitionBy("prio").orderBy("d")
    pnl = (
        daily.join(F.broadcast(mean_rev), "prio")
        .withColumn(
            "cum",
            F.sum((F.col("rev").cast("decimal(38,6)") - F.col("mu"))).over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .withColumn(
            "peak", F.max("cum").over(w.rowsBetween(Window.unboundedPreceding, 0))
        )
        .withColumn("dd", (F.col("peak") - F.col("cum")).cast("double"))
    )
    return (
        pnl.groupBy("prio")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_days"),
            F.round(F.max("dd"), 2).alias("max_drawdown"),
        )
        .orderBy("prio")
    )


Q_DRAWDOWN_SQL = """
WITH daily AS (
  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS rev
  FROM orders GROUP BY 1, 2),
mean_rev AS (
  SELECT prio, CAST(SUM(rev) / COUNT(*) AS DECIMAL(38,6)) AS mu
  FROM daily GROUP BY prio),
pnl AS (
  SELECT daily.prio, d,
         SUM(CAST(rev AS DECIMAL(38,6)) - mu) OVER (PARTITION BY daily.prio ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM daily JOIN mean_rev ON daily.prio = mean_rev.prio),
peaks AS (
  SELECT prio, cum,
         MAX(cum) OVER (PARTITION BY prio ORDER BY d
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS peak
  FROM pnl)
SELECT prio, CAST(COUNT(*) AS BIGINT) AS n_days,
       ROUND(MAX(CAST(peak - cum AS DOUBLE)), 2) AS max_drawdown
FROM peaks
GROUP BY prio
ORDER BY prio
"""

QUERIES["q_max_drawdown"] = QuerySpec(
    q_max_drawdown,
    Q_DRAWDOWN_SQL,
    "maximum drawdown of each priority's mean-centered cumulative "
    "revenue — decimal-exact cumsums, one ordered window per group",
)


# ---------------------------- greedy propensity-score matching
# Treatment = md5 arm over customers; propensity = acctbal decile
# (the pinned stand-in for a fitted score). Within each decile the
# i-th treated customer (by key order) pairs with the i-th control —
# greedy deterministic 1:1 matching, no nearest-neighbor search, so
# the pair count per decile is min(n_t, n_c). Output: per-decile
# matched pairs and the matched-sample ATT on order spend.


def q_propensity_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Plan shape for 100 TB: the propensity decile is NTILE(10) over
    the full customer table — computed via the distributed exact-rank
    machinery (_dist_rank range-repartition, extensions_r8.py) plus
    NTILE's fill arithmetic (the q_lift_table precedent), NOT a
    single-partition global window. The per-(decile, treated) rank
    that follows is a keyed window — 20 partitions, fine as-is."""
    from kcore_spark.queries.extensions_r8 import _dist_rank

    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    orders = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("spend"))
    n = cust.count()
    q, r = divmod(n, 10)
    pre = (
        cust.join(orders, "c_custkey", "left")
        .na.fill({"spend": 0})
        .withColumn(
            "treated",
            (
                F.conv(
                    F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10
                ).cast("long")
                % 2
            ),
        )
    )
    base = _dist_rank(pre, [F.col("c_acctbal"), F.col("c_custkey")]).withColumn(
        "decile",
        (
            F.when(F.col("rk") <= r * (q + 1), (F.col("rk") - 1) / (q + 1))
            .otherwise(r + (F.col("rk") - r * (q + 1) - 1) / q)
            .cast("long")
            + 1
        ).cast("int"),
    )
    wdt = Window.partitionBy("decile", "treated").orderBy("c_custkey")
    ranked = base.withColumn("rn", F.row_number().over(wdt))
    t = ranked.where(F.col("treated") == 1).select(
        "decile", "rn", F.col("spend").alias("spend_t")
    )
    c = ranked.where(F.col("treated") == 0).select(
        "decile", "rn", F.col("spend").alias("spend_c")
    )
    pairs = t.join(c, ["decile", "rn"])
    return (
        pairs.groupBy("decile")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(
                (F.sum("spend_t") - F.sum("spend_c")).cast("double")
                / F.count(F.lit(1)),
                2,
            ).alias("att_spend"),
        )
        .orderBy("decile")
    )


Q_PROPENSITY_SQL = """
WITH spend AS (
  SELECT o_custkey AS c_custkey,
         SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
  FROM orders GROUP BY o_custkey),
base AS (
  SELECT c.c_custkey, COALESCE(s.spend, 0) AS spend,
         ('0x' || substring(md5(CAST(c.c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2
           AS treated,
         NTILE(10) OVER (ORDER BY c.c_acctbal, c.c_custkey) AS decile
  FROM customer c LEFT JOIN spend s ON c.c_custkey = s.c_custkey),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY decile, treated
              ORDER BY c_custkey) AS rn
  FROM base),
pairs AS (
  SELECT t.decile, t.spend AS spend_t, c.spend AS spend_c
  FROM ranked t JOIN ranked c
    ON t.decile = c.decile AND t.rn = c.rn
   AND t.treated = 1 AND c.treated = 0)
SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(spend_t) - SUM(spend_c) AS DOUBLE) / COUNT(*), 2)
         AS att_spend
FROM pairs
GROUP BY decile
ORDER BY decile
"""

QUERIES["q_propensity_match"] = QuerySpec(
    q_propensity_match,
    Q_PROPENSITY_SQL,
    "greedy 1:1 propensity matching within acctbal deciles (rank-"
    "paired, no NN search) — per-decile matched-sample ATT on spend",
)


# ---------------------- sharp regression discontinuity (RDD)
# Jump in per-customer order count at acctbal = 0 (indebted vs not):
# local linear fit on each side within the bandwidth, jump =
# intercept_right − intercept_left at the cutoff. Two closed-form
# OLS fits from one scan's moments (a side column fans the moments
# out); the null fixture should show jump ≈ 0 — the estimator, not a
# discovered effect, is what's pinned.

_RDD_BW = 1000.0  # bandwidth around the cutoff


def q_regression_discontinuity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    cnt = load_table(spark, sf_dir, "orders").groupBy(
        F.col("o_custkey").alias("c_custkey")
    ).agg(F.count(F.lit(1)).alias("y"))
    pts = (
        cust.join(cnt, "c_custkey", "left")
        .na.fill({"y": 0})
        .where(F.abs(F.col("c_acctbal")) <= _RDD_BW)
        .select(
            F.col("c_acctbal").alias("x"),
            F.col("y").cast("double").alias("y"),
            (F.col("c_acctbal") >= 0).cast("int").alias("side"),
        )
    )
    m = pts.groupBy("side").agg(
        F.count(F.lit(1)).alias("n"),
        F.avg("x").alias("mx"),
        F.avg("y").alias("my"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
    )
    beta = (F.col("sxy") - F.col("n") * F.col("mx") * F.col("my")) / F.nullif(
        F.col("sxx") - F.col("n") * F.col("mx") * F.col("mx"), F.lit(0.0)
    )
    fits = m.select(
        "side",
        F.col("n").cast("long").alias("n"),
        beta.alias("slope"),
        (F.col("my") - beta * F.col("mx")).alias("intercept_at_0"),
    )
    wide = fits.groupBy().agg(
        F.sum(F.when(F.col("side") == 0, F.col("n"))).cast("long").alias("n_left"),
        F.sum(F.when(F.col("side") == 1, F.col("n"))).cast("long").alias("n_right"),
        F.sum(F.when(F.col("side") == 0, F.col("intercept_at_0"))).alias("il"),
        F.sum(F.when(F.col("side") == 1, F.col("intercept_at_0"))).alias("ir"),
        F.sum(F.when(F.col("side") == 0, F.col("slope"))).alias("sl"),
        F.sum(F.when(F.col("side") == 1, F.col("slope"))).alias("sr"),
    )
    return wide.select(
        "n_left",
        "n_right",
        F.round(F.col("sl"), 6).alias("slope_left"),
        F.round(F.col("sr"), 6).alias("slope_right"),
        F.round(F.col("ir") - F.col("il"), 6).alias("jump_at_cutoff"),
    )


Q_RDD_SQL = f"""
WITH cnt AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS y FROM orders GROUP BY o_custkey),
pts AS (
  SELECT c.c_acctbal AS x, CAST(COALESCE(cnt.y, 0) AS DOUBLE) AS y,
         CASE WHEN c.c_acctbal >= 0 THEN 1 ELSE 0 END AS side
  FROM customer c LEFT JOIN cnt ON c.c_custkey = cnt.c_custkey
  WHERE ABS(c.c_acctbal) <= {_RDD_BW}),
m AS (
  SELECT side, COUNT(*) AS n, AVG(x) AS mx, AVG(y) AS my,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM pts GROUP BY side),
fits AS (
  SELECT side, n,
         (sxy - n * mx * my) / NULLIF(sxx - n * mx * mx, 0.0) AS slope,
         my - (sxy - n * mx * my) / NULLIF(sxx - n * mx * mx, 0.0) * mx
           AS intercept_at_0
  FROM m)
SELECT CAST(SUM(CASE WHEN side = 0 THEN n END) AS BIGINT) AS n_left,
       CAST(SUM(CASE WHEN side = 1 THEN n END) AS BIGINT) AS n_right,
       ROUND(SUM(CASE WHEN side = 0 THEN slope END), 6) AS slope_left,
       ROUND(SUM(CASE WHEN side = 1 THEN slope END), 6) AS slope_right,
       ROUND(SUM(CASE WHEN side = 1 THEN intercept_at_0 END)
             - SUM(CASE WHEN side = 0 THEN intercept_at_0 END), 6)
         AS jump_at_cutoff
FROM fits
"""

QUERIES["q_regression_discontinuity"] = QuerySpec(
    q_regression_discontinuity,
    Q_RDD_SQL,
    "sharp RDD at acctbal=0: local linear both sides within the "
    "bandwidth, jump = intercept gap — two closed-form fits, one scan",
)
