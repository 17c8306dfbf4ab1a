"""Round-10 surface extensions, batch B (SURVEY §2.3 N r10): the
experimentation-platform block — Holm-Bonferroni step-down control
(the FWER twin of q_bh_fdr's FDR), Cohen's d / Hedges' g effect
sizes, Cochran's Q test for k related binary outcomes, and the
sample-ratio-mismatch (SRM) health check every A/B platform runs
before trusting a readout.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: the hypothesis catalog reuses
q_bh_fdr's portable md5-uniform p-values; effect-size moments are
DECIMAL sums; Cochran's Q is integer sums end-to-end with one final
division; SRM counts are integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------- Holm-Bonferroni step-down (FWER)
# Same 25-hypothesis md5-uniform catalog as q_bh_fdr, but the
# family-wise-error procedure: sort p ascending, reject while
# p_i <= alpha/(m-i+1), STOP at the first failure (rejections are a
# prefix, unlike BH's largest-k rule). Adjusted p is the running max
# of (m-i+1)*p_i, capped at 1. One window over the m-row catalog
# (adjudicated bounded: 25 hypotheses).

HOLM_ALPHA = 0.05


def q_holm_bonferroni(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").select("n_name")
    h = F.conv(F.substring(F.md5(F.col("n_name")), 1, 8), 16, 10).cast("double")
    u = (h + 1) / F.lit(4294967296.0)
    p = F.round(u * u * u, 12).alias("p_value")
    w = Window.orderBy("p_value", "n_name")
    w_all = Window.partitionBy()
    wrun = w.rowsBetween(Window.unboundedPreceding, 0)
    ranked = (
        nat.select("n_name", p)
        .withColumn("i", F.row_number().over(w))
        .withColumn("m", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "step_alpha",
            F.round(F.lit(HOLM_ALPHA) / (F.col("m") - F.col("i") + 1), 12),
        )
        .withColumn("fails", (F.col("p_value") > F.col("step_alpha")).cast("int"))
    )
    # first failure index (m+1 if none): rejections are the strict prefix
    ranked = ranked.withColumn(
        "first_fail",
        F.coalesce(
            F.min(F.when(F.col("fails") == 1, F.col("i"))).over(w_all),
            F.col("m") + 1,
        ),
    ).withColumn(
        "holm_adj_p",
        F.round(
            F.least(
                F.lit(1.0),
                F.max(
                    F.round((F.col("m") - F.col("i") + 1) * F.col("p_value"), 12)
                ).over(wrun),
            ),
            10,
        ),
    )
    return (
        ranked.where(F.col("i") < F.col("first_fail"))
        .select(
            "n_name",
            F.round("p_value", 10).alias("p_value"),
            "i",
            F.round("step_alpha", 10).alias("step_alpha"),
            "holm_adj_p",
        )
        .orderBy("i")
    )


Q_HOLM_SQL = f"""
WITH u AS (
  SELECT n_name,
         (('0x' || substring(md5(n_name), 1, 8))::BIGINT + 1.0) / 4294967296.0 AS uu
  FROM nation),
h AS (SELECT n_name, ROUND(uu * uu * uu, 12) AS p_value FROM u),
ranked AS (
  SELECT n_name, p_value,
         ROW_NUMBER() OVER (ORDER BY p_value, n_name) AS i,
         COUNT(*) OVER () AS m
  FROM h),
stepped AS (
  SELECT *, ROUND({HOLM_ALPHA} / (m - i + 1), 12) AS step_alpha,
         CASE WHEN p_value > ROUND({HOLM_ALPHA} / (m - i + 1), 12)
              THEN i END AS fail_i
  FROM ranked),
ff AS (
  SELECT *, COALESCE(MIN(fail_i) OVER (), m + 1) AS first_fail,
         ROUND(LEAST(1.0, MAX(ROUND((m - i + 1) * p_value, 12))
           OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
           10) AS holm_adj_p
  FROM stepped)
SELECT n_name, ROUND(p_value, 10) AS p_value, i,
       ROUND(step_alpha, 10) AS step_alpha, holm_adj_p
FROM ff WHERE i < first_fail
ORDER BY i
"""

QUERIES["q_holm_bonferroni"] = QuerySpec(
    q_holm_bonferroni,
    Q_HOLM_SQL,
    "Holm-Bonferroni step-down over the 25-hypothesis catalog "
    "(prefix rejections + running-max adjusted p) — FWER control",
)


# --------------------------------- Cohen's d / Hedges' g effect size
# Standardized mean difference of order spend between the md5 A/B
# arms (the q_propensity_match treatment convention): pooled-SD
# Cohen's d plus the small-sample Hedges' g correction. Moments are
# DECIMAL sums (cents domain) per arm — one partial-agg shuffle, two
# output-side divisions.


def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        (
            F.conv(
                F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 2
        ).alias("arm"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    per = orders.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s1"),
        # cents^2 ~ 3.6e15 summed over the table overflows LONG; the
        # square is computed in DECIMAL (matches the oracle's HUGEINT)
        F.sum(F.col("cents").cast("decimal(19,0)") * F.col("cents"))
        .cast("decimal(38,0)")
        .alias("s2"),
    )
    a = per.where(F.col("arm") == 0).select(
        F.col("n").alias("n0"), F.col("s1").alias("s1_0"), F.col("s2").alias("s2_0")
    )
    b = per.where(F.col("arm") == 1).select(
        F.col("n").alias("n1"), F.col("s1").alias("s1_1"), F.col("s2").alias("s2_1")
    )
    j = a.crossJoin(F.broadcast(b))
    m0 = F.col("s1_0").cast("double") / F.col("n0") / 100.0
    m1 = F.col("s1_1").cast("double") / F.col("n1") / 100.0
    ss0 = (
        F.col("s2_0").cast("double")
        - F.col("s1_0").cast("double") * F.col("s1_0").cast("double") / F.col("n0")
    ) / 10000.0
    ss1 = (
        F.col("s2_1").cast("double")
        - F.col("s1_1").cast("double") * F.col("s1_1").cast("double") / F.col("n1")
    ) / 10000.0
    df = F.col("n0") + F.col("n1") - 2
    sp = F.sqrt((ss0 + ss1) / df)
    d = (m1 - m0) / sp
    g = d * (1.0 - 3.0 / (4.0 * df.cast("double") - 1.0))
    return j.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(m1 - m0, 6).alias("mean_diff"),
        F.round(sp, 6).alias("pooled_sd"),
        F.round(d, 8).alias("cohens_d"),
        F.round(g, 8).alias("hedges_g"),
    )


Q_COHENS_SQL = """
WITH src AS (
  SELECT ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 2
           AS arm,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders),
per AS (
  SELECT arm, COUNT(*) AS n, SUM(cents) AS s1,
         CAST(SUM(CAST(cents AS HUGEINT) * cents) AS DECIMAL(38,0)) AS s2
  FROM src GROUP BY arm),
j AS (
  SELECT a.n AS n0, a.s1 AS s1_0, a.s2 AS s2_0,
         b.n AS n1, b.s1 AS s1_1, b.s2 AS s2_1
  FROM (SELECT * FROM per WHERE arm = 0) a, (SELECT * FROM per WHERE arm = 1) b),
calc AS (
  SELECT n0, n1,
         CAST(s1_1 AS DOUBLE) / n1 / 100.0 - CAST(s1_0 AS DOUBLE) / n0 / 100.0
           AS mean_diff,
         SQRT(((CAST(s2_0 AS DOUBLE) - CAST(s1_0 AS DOUBLE) * s1_0 / n0) / 10000.0
             + (CAST(s2_1 AS DOUBLE) - CAST(s1_1 AS DOUBLE) * s1_1 / n1) / 10000.0)
             / (n0 + n1 - 2)) AS sp,
         n0 + n1 - 2 AS df
  FROM j)
SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       ROUND(mean_diff, 6) AS mean_diff,
       ROUND(sp, 6) AS pooled_sd,
       ROUND(mean_diff / sp, 8) AS cohens_d,
       ROUND(mean_diff / sp * (1.0 - 3.0 / (4.0 * df - 1.0)), 8) AS hedges_g
FROM calc
"""

QUERIES["q_cohens_d"] = QuerySpec(
    q_cohens_d,
    Q_COHENS_SQL,
    "Cohen's d / Hedges' g of order spend between md5 A/B arms "
    "(decimal-exact pooled moments) — standardized effect size",
)


# ------------------------------ Cochran's Q (k related binary outcomes)
# Did each (user, week) subject view / click / purchase that week?
# Three related binary treatments per subject (weekly granularity —
# whole-window subjects are saturated in the fixture: every active
# user eventually does all three, making Q degenerate 0/0); Cochran's
# Q tests whether the three weekly success rates differ:
#   Q = k(k-1) * SUM_j (G_j - T/k)^2 / (k*T - SUM_i L_i^2)
# with G_j column totals, L_i per-user row totals, T the grand total —
# INTEGER sums end-to-end (exactness across engines by construction),
# one final division. Two keyed shuffles (per-user pivot, then the
# 1-row reduction).

_CQ_TYPES = ["view", "click", "purchase"]


def q_cochran_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).where(
        F.col("event_type").isin(_CQ_TYPES)
    )
    per_user = ev.groupBy(
        "user_id", F.date_trunc("week", F.col("ts")).alias("wk")
    ).agg(
        *[
            F.max((F.col("event_type") == t).cast("int")).alias(f"x{i}")
            for i, t in enumerate(_CQ_TYPES)
        ]
    )
    k = len(_CQ_TYPES)
    li = sum(F.col(f"x{i}") for i in range(k))
    m = per_user.agg(
        F.count(F.lit(1)).alias("n_subjects"),
        *[F.sum(f"x{i}").alias(f"g{i}") for i in range(k)],
        F.sum(li * li).alias("sum_li2"),
    )
    total = sum(F.col(f"g{i}") for i in range(k))
    num = sum(
        (F.col(f"g{i}") * k - total) * (F.col(f"g{i}") * k - total)
        for i in range(k)
    )  # k^2 * sum (G_j - T/k)^2, integer
    q = (
        F.lit(k - 1).cast("double")
        * num.cast("double")
        / (F.lit(k) * (F.lit(k) * total - F.col("sum_li2")).cast("double"))
    )
    return m.select(
        F.col("n_subjects").cast("long").alias("n_subjects"),
        *[F.col(f"g{i}").cast("long").alias(f"n_{t}") for i, t in enumerate(_CQ_TYPES)],
        F.round(q, 6).alias("cochran_q"),
    )


Q_COCHRAN_SQL = """
WITH per_user AS (
  SELECT user_id, date_trunc('week', ts) AS wk,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS x0,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS x1,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS x2
  FROM events WHERE event_type IN ('view', 'click', 'purchase')
  GROUP BY user_id, date_trunc('week', ts)),
m AS (
  SELECT COUNT(*) AS n_subjects, SUM(x0) AS g0, SUM(x1) AS g1, SUM(x2) AS g2,
         SUM((x0 + x1 + x2) * (x0 + x1 + x2)) AS sum_li2
  FROM per_user)
SELECT CAST(n_subjects AS BIGINT) AS n_subjects,
       CAST(g0 AS BIGINT) AS n_view,
       CAST(g1 AS BIGINT) AS n_click,
       CAST(g2 AS BIGINT) AS n_purchase,
       ROUND(2.0 * ((g0 * 3 - (g0 + g1 + g2)) * (g0 * 3 - (g0 + g1 + g2))
                  + (g1 * 3 - (g0 + g1 + g2)) * (g1 * 3 - (g0 + g1 + g2))
                  + (g2 * 3 - (g0 + g1 + g2)) * (g2 * 3 - (g0 + g1 + g2)))
             / (3.0 * (3 * (g0 + g1 + g2) - sum_li2)), 6) AS cochran_q
FROM m
"""

QUERIES["q_cochran_q"] = QuerySpec(
    q_cochran_q,
    Q_COCHRAN_SQL,
    "Cochran's Q over weekly view/click/purchase subject binaries "
    "(integer-exact) — k-related-proportions test",
)


# ----------------------------------- sample-ratio mismatch (SRM)
# The A/B health check: a 50/50 md5 split of customers should land
# 50/50 in every segment; chi-square with 1 df = (n0-n1)^2/(n0+n1)
# flags allocation bugs (the single most common experimentation
# failure). Integer counts per (segment, arm); flag at the 0.001
# level (chi2 > 10.828) like production SRM monitors.


def q_srm_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_mktsegment",
        (
            F.conv(
                F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10
            ).cast("long")
            % 2
        ).alias("arm"),
    )
    per = cust.groupBy("c_mktsegment").agg(
        F.sum((F.col("arm") == 0).cast("int")).alias("n0"),
        F.sum((F.col("arm") == 1).cast("int")).alias("n1"),
    )
    diff = F.col("n0") - F.col("n1")
    chi2 = (diff * diff).cast("double") / (F.col("n0") + F.col("n1"))
    return per.select(
        "c_mktsegment",
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        F.round(chi2, 6).alias("srm_chi2"),
        (chi2 > 10.828).alias("srm_flag"),
    ).orderBy("c_mktsegment")


Q_SRM_SQL = """
WITH src AS (
  SELECT c_mktsegment,
         ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT % 2
           AS arm
  FROM customer),
per AS (
  SELECT c_mktsegment,
         SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS n0,
         SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS n1
  FROM src GROUP BY c_mktsegment)
SELECT c_mktsegment,
       CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       ROUND(CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1), 6) AS srm_chi2,
       CAST((n0 - n1) * (n0 - n1) AS DOUBLE) / (n0 + n1) > 10.828 AS srm_flag
FROM per
ORDER BY c_mktsegment
"""

QUERIES["q_srm_check"] = QuerySpec(
    q_srm_check,
    Q_SRM_SQL,
    "sample-ratio-mismatch chi-square per market segment on the md5 "
    "50/50 split — the A/B allocation health check",
)
