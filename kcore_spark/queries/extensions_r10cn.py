"""Round-10 surface extensions, batch CN (SURVEY §2.3 N r10): the
meta-analysis block — treat each nation as a "study" estimating the
BUILDING-vs-rest difference in mean customer spend, then pool:
fixed-effect inverse-variance pooling with its CI, DerSimonian-Laird
random effects (closed-form tau^2 between-study variance, plus
Cochran's Q and I^2 heterogeneity), and Egger's funnel-plot asymmetry
regression (does effect correlate with precision — the small-study
bias screen). A genuinely multi-site inference family the engine
lacked; sibling of q_two_proportion_z / q_welch_ttest (single-site).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: per-study moments are cents-decimal sums; per-study
effects/weights are rounded and decimal-summed across the 25-study
table; the pinned A&S Phi gives z p-values.
Scale: one orders⋈customer scan folds to per-(nation, segment)
moments; everything after is 25-row algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10ai import _phi, _PHI_SQL

QUERIES: dict[str, QuerySpec] = {}

_Z95 = 1.959964


def _studies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation effect d = mean spend (BUILDING) - mean spend (rest),
    with its squared standard error v = s1^2/n1 + s2^2/n2."""
    spend = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .alias("cents")
        )
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_mktsegment") == "BUILDING").alias("grp"),
    )
    x = spend.join(cust, spend.o_custkey == cust.c_custkey).select(
        "c_nationkey", "grp", (F.col("cents").cast("double") / 100.0).alias("x")
    )
    per = x.groupBy("c_nationkey", "grp").agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.sum(F.round("x", 2).cast("decimal(38,2)")).cast("double").alias("s1"),
        F.sum(F.round(F.col("x") * F.col("x"), 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("s2"),
    )
    md = F.col("m").cast("double")
    mean = F.col("s1") / md
    var = (md * F.col("s2") - F.col("s1") ** 2) / (md * (md - 1.0))
    sides = per.select(
        "c_nationkey", "grp", F.col("m"), mean.alias("mu"), var.alias("va")
    )
    a = sides.where(F.col("grp")).select(
        "c_nationkey",
        F.col("m").alias("n1"),
        F.col("mu").alias("mu1"),
        F.col("va").alias("v1"),
    )
    b = sides.where(~F.col("grp")).select(
        "c_nationkey",
        F.col("m").alias("n2"),
        F.col("mu").alias("mu2"),
        F.col("va").alias("v2"),
    )
    # effects in KILODOLLARS (variances in k$^2): keeps tau^2/weights in
    # a range where 6dp rounding is bit-stable (dollar-scale tau^2 hit
    # rounding-ulp mismatches at sf0.001)
    return a.join(b, "c_nationkey").where((F.col("n1") >= 2) & (F.col("n2") >= 2)).select(
        "c_nationkey",
        ((F.col("mu1") - F.col("mu2")) / 1000.0).alias("d"),
        (
            (
                F.col("v1") / F.col("n1").cast("double")
                + F.col("v2") / F.col("n2").cast("double")
            )
            / 1000000.0
        ).alias("v"),
    )


_STUDIES_SQL = """
  spend AS (
    SELECT o_custkey,
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))) AS cents
    FROM orders GROUP BY o_custkey),
  x AS (
    SELECT c_nationkey, c_mktsegment = 'BUILDING' AS grp,
           CAST(cents AS DOUBLE) / 100.0 AS x
    FROM spend JOIN customer ON o_custkey = c_custkey),
  per AS (
    SELECT c_nationkey, grp, CAST(COUNT(*) AS BIGINT) AS m,
           CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(38,2))) AS DOUBLE) AS s1,
           CAST(SUM(CAST(ROUND(x * x, 2) AS DECIMAL(38,2))) AS DOUBLE) AS s2
    FROM x GROUP BY 1, 2),
  sides AS (
    SELECT c_nationkey, grp, m, s1 / m AS mu,
           (CAST(m AS DOUBLE) * s2 - POWER(s1, 2))
             / (CAST(m AS DOUBLE) * (CAST(m AS DOUBLE) - 1.0)) AS va
    FROM per),
  studies AS (
    SELECT a.c_nationkey AS c_nationkey,
           (a.mu - b.mu) / 1000.0 AS d,
           (a.va / a.m + b.va / b.m) / 1000000.0 AS v
    FROM sides a JOIN sides b
      ON a.c_nationkey = b.c_nationkey AND a.grp AND NOT b.grp
    WHERE a.m >= 2 AND b.m >= 2)
"""


def _pool(st: DataFrame):
    """Fixed-effect sums plus Q ingredients (25-row decimal folds)."""
    t = st.select(
        F.round(1.0 / F.col("v"), 12).cast("decimal(38,12)").alias("w"),
        F.round(F.col("d") / F.col("v"), 12).cast("decimal(38,12)").alias("wd"),
        F.round(F.col("d") * F.col("d") / F.col("v"), 12)
        .cast("decimal(38,12)")
        .alias("wd2"),
        F.round(1.0 / (F.col("v") * F.col("v")), 12)
        .cast("decimal(38,12)")
        .alias("w2"),
    )
    return t.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("w").cast("double").alias("sw"),
        F.sum("wd").cast("double").alias("swd"),
        F.sum("wd2").cast("double").alias("swd2"),
        F.sum("w2").cast("double").alias("sw2"),
    )


_POOL_SQL = """
  pool AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS k,
           CAST(SUM(CAST(ROUND(1.0 / v, 12) AS DECIMAL(38,12))) AS DOUBLE) AS sw,
           CAST(SUM(CAST(ROUND(d / v, 12) AS DECIMAL(38,12))) AS DOUBLE) AS swd,
           CAST(SUM(CAST(ROUND(d * d / v, 12) AS DECIMAL(38,12))) AS DOUBLE)
               AS swd2,
           CAST(SUM(CAST(ROUND(1.0 / (v * v), 12) AS DECIMAL(38,12)))
                AS DOUBLE) AS sw2
    FROM studies)
"""


def q_meta_fixed_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    pool = _pool(_studies(spark, sf_dir))
    mu = F.col("swd") / F.col("sw")
    se = F.sqrt(1.0 / F.col("sw"))
    z = mu / se
    return pool.select(
        F.col("k").alias("n_studies"),
        F.round(mu, 4).alias("pooled_effect"),
        F.round(se, 4).alias("se"),
        F.round(mu - _Z95 * se, 4).alias("ci_lo"),
        F.round(mu + _Z95 * se, 4).alias("ci_hi"),
        F.round(2.0 * (1.0 - _phi(F.abs(z))), 6).alias("p_value"),
    )


Q_META_FE_SQL = f"""
WITH {_STUDIES_SQL},
{_POOL_SQL}
SELECT k AS n_studies,
       ROUND(swd / sw, 4) AS pooled_effect,
       ROUND(SQRT(1.0 / sw), 4) AS se,
       ROUND(swd / sw - {_Z95} * SQRT(1.0 / sw), 4) AS ci_lo,
       ROUND(swd / sw + {_Z95} * SQRT(1.0 / sw), 4) AS ci_hi,
       ROUND(2.0 * (1.0 -
           {_PHI_SQL.format(z="ABS((swd / sw) / SQRT(1.0 / sw))")}), 6)
           AS p_value
FROM pool
"""

QUERIES["q_meta_fixed_effect"] = QuerySpec(
    q_meta_fixed_effect,
    Q_META_FE_SQL,
    "fixed-effect inverse-variance pooling of per-nation segment "
    "effects — 25-study decimal folds, pinned Phi",
)


def q_meta_random_effects(spark: SparkSession, sf_dir: str) -> DataFrame:
    st = _studies(spark, sf_dir).localCheckpoint()
    pool = _pool(st)
    q_stat = F.col("swd2") - F.col("swd") ** 2 / F.col("sw")
    kd = F.col("k").cast("double")
    c = F.col("sw") - F.col("sw2") / F.col("sw")
    tau2 = F.greatest((q_stat - (kd - 1.0)) / c, F.lit(0.0))
    i2 = F.greatest((q_stat - (kd - 1.0)) / q_stat, F.lit(0.0))
    base = pool.select(
        "k", F.round(q_stat, 6).alias("q_cochran"), F.round(tau2, 6).alias("tau2"),
        F.round(i2, 6).alias("i2"),
    )
    re = st.crossJoin(F.broadcast(base)).select(
        "k",
        "q_cochran",
        "tau2",
        "i2",
        F.round(1.0 / (F.col("v") + F.col("tau2")), 12)
        .cast("decimal(38,12)")
        .alias("wr"),
        F.round(F.col("d") / (F.col("v") + F.col("tau2")), 12)
        .cast("decimal(38,12)")
        .alias("wrd"),
    )
    agg = re.groupBy("k", "q_cochran", "tau2", "i2").agg(
        F.sum("wr").cast("double").alias("swr"),
        F.sum("wrd").cast("double").alias("swrd"),
    )
    mu = F.col("swrd") / F.col("swr")
    se = F.sqrt(1.0 / F.col("swr"))
    return agg.select(
        F.col("k").alias("n_studies"),
        "q_cochran",
        "tau2",
        "i2",
        F.round(mu, 4).alias("pooled_effect_re"),
        F.round(se, 4).alias("se_re"),
    )


Q_META_RE_SQL = f"""
WITH {_STUDIES_SQL},
{_POOL_SQL},
base AS (
  SELECT k,
         ROUND(swd2 - POWER(swd, 2) / sw, 6) AS q_cochran,
         ROUND(GREATEST((swd2 - POWER(swd, 2) / sw - (k - 1.0))
                        / (sw - sw2 / sw), 0.0), 6) AS tau2,
         ROUND(GREATEST((swd2 - POWER(swd, 2) / sw - (k - 1.0))
                        / (swd2 - POWER(swd, 2) / sw), 0.0), 6) AS i2
  FROM pool),
re AS (
  SELECT k, q_cochran, tau2, i2,
         CAST(ROUND(1.0 / (v + tau2), 12) AS DECIMAL(38,12)) AS wr,
         CAST(ROUND(d / (v + tau2), 12) AS DECIMAL(38,12)) AS wrd
  FROM studies CROSS JOIN base),
agg AS (
  SELECT k, q_cochran, tau2, i2,
         CAST(SUM(wr) AS DOUBLE) AS swr,
         CAST(SUM(wrd) AS DOUBLE) AS swrd
  FROM re GROUP BY 1, 2, 3, 4)
SELECT k AS n_studies, q_cochran, tau2, i2,
       ROUND(swrd / swr, 4) AS pooled_effect_re,
       ROUND(SQRT(1.0 / swr), 4) AS se_re
FROM agg
"""

QUERIES["q_meta_random_effects"] = QuerySpec(
    q_meta_random_effects,
    Q_META_RE_SQL,
    "DerSimonian-Laird random-effects pooling with Cochran Q / I^2 / "
    "tau^2 — closed form over the 25-study table",
)


def q_egger_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Egger: OLS of standardized effect (d/se) on precision (1/se);
    a nonzero intercept flags small-study asymmetry."""
    st = _studies(spark, sf_dir)
    pts = st.select(
        (F.col("d") / F.sqrt(F.col("v"))).alias("y"),
        (1.0 / F.sqrt(F.col("v"))).alias("x"),
    )
    mom = pts.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("x", 10).cast("decimal(38,10)")).cast("double").alias("sx"),
        F.sum(F.round("y", 10).cast("decimal(38,10)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("x") * F.col("y"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxy"),
        F.sum(F.round(F.col("y") * F.col("y"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("syy"),
    )
    nd = F.col("n").cast("double")
    slope = (F.col("sxy") - F.col("sx") * F.col("sy") / nd) / (
        F.col("sxx") - F.col("sx") * F.col("sx") / nd
    )
    icpt = (F.col("sy") - slope * F.col("sx")) / nd
    return mom.select(
        F.col("n").alias("n_studies"),
        F.round(icpt, 6).alias("egger_intercept"),
        F.round(slope, 6).alias("precision_slope"),
    )


Q_EGGER_SQL = f"""
WITH {_STUDIES_SQL},
pts AS (SELECT d / SQRT(v) AS y, 1.0 / SQRT(v) AS x FROM studies),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(x * y, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(y * y, 10) AS DECIMAL(38,10))) AS DOUBLE) AS syy
  FROM pts)
SELECT n AS n_studies,
       ROUND((sy - ((sxy - sx * sy / n) / (sxx - sx * sx / n)) * sx) / n, 6)
           AS egger_intercept,
       ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS precision_slope
FROM mom
"""

QUERIES["q_egger_regression"] = QuerySpec(
    q_egger_regression,
    Q_EGGER_SQL,
    "Egger funnel-asymmetry regression over the study table — "
    "closed-form OLS of standardized effect on precision",
)
