"""Round-10 surface extensions, batch BS (SURVEY §2.3 N r10): the
stratified-contingency-table block — the epidemiology/causal toolkit
for 2x2 tables split across strata. Mantel-Haenszel pooled odds ratio
with the CMH chi-square (does exposure associate with outcome after
controlling for region?), the Cochran-Armitage trend test (does the
outcome rate move monotonically with an ordered dose?), and Woolf's
homogeneity test (is one pooled OR even defensible, or do strata
disagree?). Completes the categorical-inference family next to
q_odds_ratio / q_two_proportion_z / q_cramers_v.

Units: orders. Exposure = the customer's market segment is
'BUILDING'; outcome = urgent/high order priority; stratum = the
customer's region. Dose for the trend test = the priority digit 1..5;
its outcome = the order had a returned line item.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: per-stratum terms rounded to fixed scale and summed as
DECIMAL (strata sums bit-stable under any aggregation order); the
pinned A&S 26.2.17 normal CDF shared with the z-test family.
Scale: one orders scan joined through two broadcast-sized dims
(customer is the largest side and joins on its key); every test
statistic folds through group-bys — no windows, no global sorts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10ai import _phi, _PHI_SQL

QUERIES: dict[str, QuerySpec] = {}


def _strata_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-region 2x2 cells: exposure = BUILDING segment, outcome =
    urgent/high priority. Integer cell counts — exact by construction."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.substring("o_orderpriority", 1, 1).cast("int") <= 2).alias("outcome"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_nationkey",
        (F.col("c_mktsegment") == "BUILDING").alias("exposed"),
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    joined = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    return joined.groupBy("r_name").agg(
        F.sum((F.col("exposed") & F.col("outcome")).cast("long")).alias("a"),
        F.sum((F.col("exposed") & ~F.col("outcome")).cast("long")).alias("b"),
        F.sum((~F.col("exposed") & F.col("outcome")).cast("long")).alias("c"),
        F.sum((~F.col("exposed") & ~F.col("outcome")).cast("long")).alias("d"),
    )


_CELLS_SQL = """
  SELECT r_name,
         SUM(CASE WHEN exposed AND outcome THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN exposed AND NOT outcome THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN NOT exposed AND outcome THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN NOT exposed AND NOT outcome THEN 1 ELSE 0 END) AS d
  FROM (
    SELECT r_name,
           c_mktsegment = 'BUILDING' AS exposed,
           CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) <= 2 AS outcome
    FROM orders
    JOIN customer ON o_custkey = c_custkey
    JOIN nation ON c_nationkey = n_nationkey
    JOIN region ON n_regionkey = r_regionkey)
  GROUP BY r_name
"""


# ------------------------------------------------- Mantel-Haenszel + CMH
# OR_MH = sum(a*d/n) / sum(b*c/n); CMH chi2 (no continuity correction,
# pinned) = (sum a - sum E)^2 / sum V with E = r1*c1/n and
# V = r1*r2*c1*c2 / (n^2 (n-1)). p from chi2(1) = 2*(1 - Phi(sqrt(x))).


def q_mantel_haenszel(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _strata_cells(spark, sf_dir)
    n = (F.col("a") + F.col("b") + F.col("c") + F.col("d")).cast("double")
    r1 = (F.col("a") + F.col("b")).cast("double")
    r2 = (F.col("c") + F.col("d")).cast("double")
    c1 = (F.col("a") + F.col("c")).cast("double")
    c2 = (F.col("b") + F.col("d")).cast("double")
    terms = cells.select(
        F.round(F.col("a") * F.col("d") / n, 12).cast("decimal(38,12)").alias("ad_n"),
        F.round(F.col("b") * F.col("c") / n, 12).cast("decimal(38,12)").alias("bc_n"),
        F.col("a").cast("decimal(38,0)").alias("a_l"),
        F.round(r1 * c1 / n, 12).cast("decimal(38,12)").alias("e"),
        F.round(r1 * r2 * c1 * c2 / (n * n * (n - 1.0)), 12)
        .cast("decimal(38,12)")
        .alias("v"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("ad_n").cast("double").alias("s_ad"),
        F.sum("bc_n").cast("double").alias("s_bc"),
        F.sum("a_l").cast("double").alias("s_a"),
        F.sum("e").cast("double").alias("s_e"),
        F.sum("v").cast("double").alias("s_v"),
    )
    chi2 = (F.col("s_a") - F.col("s_e")) ** 2 / F.col("s_v")
    return agg.select(
        "n_strata",
        F.round(F.col("s_ad") / F.col("s_bc"), 6).alias("or_mh"),
        F.round(chi2, 6).alias("cmh_chi2"),
        F.round(2.0 * (1.0 - _phi(F.sqrt(chi2))), 6).alias("p_value"),
    )


_CHI_EXPR = "(s_a - s_e) * (s_a - s_e) / s_v"
Q_MH_SQL = f"""
WITH cells AS ({_CELLS_SQL}),
terms AS (
  SELECT CAST(ROUND(a * d / CAST(a + b + c + d AS DOUBLE), 12)
              AS DECIMAL(38,12)) AS ad_n,
         CAST(ROUND(b * c / CAST(a + b + c + d AS DOUBLE), 12)
              AS DECIMAL(38,12)) AS bc_n,
         CAST(a AS DECIMAL(38,0)) AS a_l,
         CAST(ROUND((a + b) * (a + c) / CAST(a + b + c + d AS DOUBLE), 12)
              AS DECIMAL(38,12)) AS e,
         CAST(ROUND(CAST(a + b AS DOUBLE) * (c + d) * (a + c) * (b + d)
                    / (CAST(a + b + c + d AS DOUBLE)
                       * CAST(a + b + c + d AS DOUBLE)
                       * (CAST(a + b + c + d AS DOUBLE) - 1.0)), 12)
              AS DECIMAL(38,12)) AS v
  FROM cells),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(ad_n) AS DOUBLE) AS s_ad,
         CAST(SUM(bc_n) AS DOUBLE) AS s_bc,
         CAST(SUM(a_l) AS DOUBLE) AS s_a,
         CAST(SUM(e) AS DOUBLE) AS s_e,
         CAST(SUM(v) AS DOUBLE) AS s_v
  FROM terms)
SELECT n_strata,
       ROUND(s_ad / s_bc, 6) AS or_mh,
       ROUND({_CHI_EXPR}, 6) AS cmh_chi2,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z=f"SQRT({_CHI_EXPR})")}), 6) AS p_value
FROM agg
"""

QUERIES["q_mantel_haenszel"] = QuerySpec(
    q_mantel_haenszel,
    Q_MH_SQL,
    "Mantel-Haenszel pooled OR + CMH chi-square across region strata — "
    "decimal-summed per-stratum terms, pinned normal CDF",
)


# --------------------------------------------------- Cochran-Armitage
# Dose = priority digit 1..5; outcome = order has a returned line.
# T = sum(t_i r_i) - R * sum(t_i n_i) / N;
# Var = (R/N)(1 - R/N) * (sum(n_i t_i^2) - (sum(t_i n_i))^2 / N);
# Z = T / sqrt(Var), two-sided p via the pinned Phi.


def q_cochran_armitage(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.substring("o_orderpriority", 1, 1).cast("int").alias("dose")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
    )
    flagged = orders.join(
        returned.withColumn("ret", F.lit(1)), "o_orderkey", "left"
    ).select("dose", F.coalesce("ret", F.lit(0)).cast("long").alias("ret"))
    by_dose = flagged.groupBy("dose").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum("ret").cast("long").alias("r_i"),
    )
    agg = by_dose.agg(
        F.count(F.lit(1)).cast("long").alias("n_doses"),
        F.sum("n_i").cast("long").alias("n_total"),
        F.sum("r_i").cast("long").alias("n_success"),
        F.sum(F.col("dose") * F.col("r_i")).cast("double").alias("s_tr"),
        F.sum(F.col("dose") * F.col("n_i")).cast("double").alias("s_tn"),
        F.sum(F.col("dose") * F.col("dose") * F.col("n_i"))
        .cast("double")
        .alias("s_t2n"),
    )
    nd = F.col("n_total").cast("double")
    p = F.col("n_success").cast("double") / nd
    t_stat = F.col("s_tr") - p * F.col("s_tn")
    var = p * (1.0 - p) * (F.col("s_t2n") - F.col("s_tn") ** 2 / nd)
    z = t_stat / F.sqrt(var)
    return agg.select(
        "n_doses",
        "n_total",
        "n_success",
        F.round(z, 6).alias("z_trend"),
        F.round(2.0 * (1.0 - _phi(F.abs(z))), 6).alias("p_two_sided"),
    )


_Z_CA = (
    "(s_tr - (n_success / CAST(n_total AS DOUBLE)) * s_tn)"
    " / SQRT((n_success / CAST(n_total AS DOUBLE))"
    "        * (1.0 - n_success / CAST(n_total AS DOUBLE))"
    "        * (s_t2n - s_tn * s_tn / CAST(n_total AS DOUBLE)))"
)
Q_CA_SQL = f"""
WITH flagged AS (
  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS dose,
         CASE WHEN o_orderkey IN (
             SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
              THEN 1 ELSE 0 END AS ret
  FROM orders),
by_dose AS (
  SELECT dose, COUNT(*) AS n_i, SUM(ret) AS r_i FROM flagged GROUP BY dose),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_doses,
         CAST(SUM(n_i) AS BIGINT) AS n_total,
         CAST(SUM(r_i) AS BIGINT) AS n_success,
         CAST(SUM(dose * r_i) AS DOUBLE) AS s_tr,
         CAST(SUM(dose * n_i) AS DOUBLE) AS s_tn,
         CAST(SUM(dose * dose * n_i) AS DOUBLE) AS s_t2n
  FROM by_dose)
SELECT n_doses, n_total, n_success,
       ROUND({_Z_CA}, 6) AS z_trend,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z=f"ABS({_Z_CA})")}), 6) AS p_two_sided
FROM agg
"""

QUERIES["q_cochran_armitage"] = QuerySpec(
    q_cochran_armitage,
    Q_CA_SQL,
    "Cochran-Armitage trend test: return rate vs ordered priority dose — "
    "two-level group-by fold, integer moment sums",
)


# ----------------------------------------------------- Woolf homogeneity
# Haldane +0.5 on every cell (pinned). w = 1/(1/a'+1/b'+1/c'+1/d');
# X^2 = sum(w ln^2 OR) - (sum w lnOR)^2 / sum w, df = K - 1.


def q_woolf_homogeneity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cells = _strata_cells(spark, sf_dir)
    a = F.col("a").cast("double") + 0.5
    b = F.col("b").cast("double") + 0.5
    c = F.col("c").cast("double") + 0.5
    d = F.col("d").cast("double") + 0.5
    w = 1.0 / (1.0 / a + 1.0 / b + 1.0 / c + 1.0 / d)
    lnor = F.log(a * d / (b * c))
    terms = cells.select(
        F.round(w, 12).cast("decimal(38,12)").alias("w"),
        F.round(w * lnor, 12).cast("decimal(38,12)").alias("wl"),
        F.round(w * lnor * lnor, 12).cast("decimal(38,12)").alias("wl2"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("n_strata"),
        F.sum("w").cast("double").alias("s_w"),
        F.sum("wl").cast("double").alias("s_wl"),
        F.sum("wl2").cast("double").alias("s_wl2"),
    )
    chi2 = F.col("s_wl2") - F.col("s_wl") ** 2 / F.col("s_w")
    return agg.select(
        "n_strata",
        (F.col("n_strata") - 1).cast("long").alias("df"),
        F.round(F.col("s_wl") / F.col("s_w"), 6).alias("pooled_ln_or"),
        F.round(chi2, 6).alias("chi2_woolf"),
    )


Q_WOOLF_SQL = f"""
WITH cells AS ({_CELLS_SQL}),
terms AS (
  SELECT CAST(ROUND(1.0 / (1.0/(a+0.5) + 1.0/(b+0.5) + 1.0/(c+0.5) + 1.0/(d+0.5)),
              12) AS DECIMAL(38,12)) AS w,
         CAST(ROUND((1.0 / (1.0/(a+0.5) + 1.0/(b+0.5) + 1.0/(c+0.5) + 1.0/(d+0.5)))
                    * LN((a+0.5) * (d+0.5) / ((b+0.5) * (c+0.5))),
              12) AS DECIMAL(38,12)) AS wl,
         CAST(ROUND((1.0 / (1.0/(a+0.5) + 1.0/(b+0.5) + 1.0/(c+0.5) + 1.0/(d+0.5)))
                    * LN((a+0.5) * (d+0.5) / ((b+0.5) * (c+0.5)))
                    * LN((a+0.5) * (d+0.5) / ((b+0.5) * (c+0.5))),
              12) AS DECIMAL(38,12)) AS wl2
  FROM cells),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
         CAST(SUM(w) AS DOUBLE) AS s_w,
         CAST(SUM(wl) AS DOUBLE) AS s_wl,
         CAST(SUM(wl2) AS DOUBLE) AS s_wl2
  FROM terms)
SELECT n_strata,
       CAST(n_strata - 1 AS BIGINT) AS df,
       ROUND(s_wl / s_w, 6) AS pooled_ln_or,
       ROUND(s_wl2 - s_wl * s_wl / s_w, 6) AS chi2_woolf
FROM agg
"""

QUERIES["q_woolf_homogeneity"] = QuerySpec(
    q_woolf_homogeneity,
    Q_WOOLF_SQL,
    "Woolf homogeneity of per-stratum odds ratios (Haldane-corrected) — "
    "weighted log-OR variance fold over the strata table",
)
