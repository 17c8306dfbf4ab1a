"""Round-10 surface extensions, batch BK (SURVEY §2.3 N r10): the
index-numbers/curation-reporting block — Laspeyres/Paasche/Fisher
price indices between two ship years (the canonical index-number
triple over part-level unit prices and quantities), cohort payback
(months for a signup cohort's cumulative revenue per customer to
clear a fixed acquisition-cost proxy — the unit-economics read next
to q_cohort_ltv), and a dedup impact report (docs/tokens before vs
after exact dedup — the one-row summary every curation run logs,
composing q_dedup_exact with the token counters).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: unit prices are ROUND(·,9)-pinned decimal ratios;
index sums are pinned decimals; payback uses integer month indexes;
dedup keeps MIN(doc_id) per md5(text) group.
Scale: part-year rollups and one part-keyed join; cohort cumulative
is a PARTITIONED window; dedup is one hash groupBy.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------------------------------- price indices
# Base year 1995, current 1997. Per part-year: q = Σ quantity,
# p = Σ value / Σ quantity (pinned). Only parts traded in BOTH years
# enter (the matched basket).


def q_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(
        F.year("l_shipdate").isin(1995, 1997)
    )
    py = li.groupBy(
        "l_partkey", F.year("l_shipdate").alias("yr")
    ).agg(
        F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q"),
        F.sum(F.col("l_extendedprice").cast("decimal(15,2)")).alias("v"),
    ).select(
        "l_partkey",
        "yr",
        F.col("q").cast("double").alias("q"),
        F.round(F.col("v").cast("double") / F.col("q").cast("double"), 9).alias("p"),
    )
    base = py.where(F.col("yr") == 1995).select(
        "l_partkey", F.col("q").alias("q0"), F.col("p").alias("p0")
    )
    cur = py.where(F.col("yr") == 1997).select(
        "l_partkey", F.col("q").alias("q1"), F.col("p").alias("p1")
    )
    j = base.join(cur, "l_partkey")
    agg = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        F.sum(F.round(F.col("p1") * F.col("q0"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("p1q0"),
        F.sum(F.round(F.col("p0") * F.col("q0"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("p0q0"),
        F.sum(F.round(F.col("p1") * F.col("q1"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("p1q1"),
        F.sum(F.round(F.col("p0") * F.col("q1"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("p0q1"),
    )
    lasp = F.col("p1q0") / F.col("p0q0")
    paas = F.col("p1q1") / F.col("p0q1")
    return agg.select(
        "n_parts",
        F.round(lasp, 6).alias("laspeyres"),
        F.round(paas, 6).alias("paasche"),
        F.round(F.sqrt(lasp * paas), 6).alias("fisher"),
    )


Q_PRICE_IDX_SQL = """
WITH py AS (
  SELECT l_partkey, year(l_shipdate) AS yr,
         CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE) AS q,
         ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(15,2))) AS DOUBLE), 9) AS p
  FROM lineitem WHERE year(l_shipdate) IN (1995, 1997)
  GROUP BY 1, 2),
j AS (
  SELECT b.q AS q0, b.p AS p0, c.q AS q1, c.p AS p1
  FROM (SELECT * FROM py WHERE yr = 1995) b
  JOIN (SELECT * FROM py WHERE yr = 1997) c USING (l_partkey)),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
         CAST(SUM(CAST(ROUND(p1 * q0, 4) AS DECIMAL(38,4))) AS DOUBLE) AS p1q0,
         CAST(SUM(CAST(ROUND(p0 * q0, 4) AS DECIMAL(38,4))) AS DOUBLE) AS p0q0,
         CAST(SUM(CAST(ROUND(p1 * q1, 4) AS DECIMAL(38,4))) AS DOUBLE) AS p1q1,
         CAST(SUM(CAST(ROUND(p0 * q1, 4) AS DECIMAL(38,4))) AS DOUBLE) AS p0q1
  FROM j)
SELECT n_parts,
       ROUND(p1q0 / p0q0, 6) AS laspeyres,
       ROUND(p1q1 / p0q1, 6) AS paasche,
       ROUND(SQRT((p1q0 / p0q0) * (p1q1 / p0q1)), 6) AS fisher
FROM agg
"""

QUERIES["q_price_index"] = QuerySpec(
    q_price_index,
    Q_PRICE_IDX_SQL,
    "Laspeyres/Paasche/Fisher price indices on the matched part "
    "basket — pinned unit prices, decimal index sums",
)


# --------------------------------------------------- cohort payback
# Cohort = first order month; months_since from month arithmetic.
# Payback month = first months_since where cumulative revenue per
# cohort customer >= 300000 (the CAC proxy literal).


def q_cohort_payback(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    first = orders.groupBy("o_custkey").agg(
        F.date_trunc("month", F.min("o_orderdate")).alias("cohort")
    )
    sizes = first.groupBy("cohort").agg(F.count(F.lit(1)).alias("size"))
    cm = (
        orders.join(first, "o_custkey")
        .groupBy(
            "cohort", F.date_trunc("month", F.col("o_orderdate")).alias("mon")
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(15,2)")).alias("rev")
        )
        .withColumn(
            "m_since",
            F.months_between(F.col("mon"), F.col("cohort")).cast("long"),
        )
    )
    w = (
        Window.partitionBy("cohort")
        .orderBy("m_since")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = cm.withColumn("cum_rev", F.sum("rev").over(w).cast("double"))
    j = cum.join(F.broadcast(sizes), "cohort")
    hit = j.where(
        F.col("cum_rev") / F.col("size").cast("double") >= 300000.0
    ).groupBy("cohort").agg(F.min("m_since").alias("payback_months"))
    out = (
        sizes.join(hit, "cohort", "left")
        .select(
            F.unix_timestamp("cohort").alias("cohort_epoch"),
            F.col("size").cast("long").alias("n_customers"),
            F.col("payback_months").cast("long").alias("payback_months"),
        )
        .orderBy("cohort_epoch")
    )
    return out


Q_PAYBACK_SQL = """
WITH first AS (
  SELECT o_custkey, date_trunc('month', MIN(o_orderdate)) AS cohort
  FROM orders GROUP BY 1),
sizes AS (SELECT cohort, COUNT(*) AS size FROM first GROUP BY 1),
cm AS (
  SELECT cohort, date_trunc('month', o_orderdate) AS mon,
         SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS rev
  FROM orders JOIN first USING (o_custkey)
  GROUP BY 1, 2),
cum AS (
  SELECT cohort,
         CAST(date_diff('month', cohort, mon) AS BIGINT) AS m_since,
         CAST(SUM(rev) OVER (PARTITION BY cohort ORDER BY mon
                             ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS cum_rev
  FROM cm),
hit AS (
  SELECT cohort, MIN(m_since) AS payback_months
  FROM cum JOIN sizes USING (cohort)
  WHERE cum_rev / size >= 300000.0
  GROUP BY cohort)
SELECT CAST(epoch(cohort) AS BIGINT) AS cohort_epoch,
       CAST(size AS BIGINT) AS n_customers,
       CAST(payback_months AS BIGINT) AS payback_months
FROM sizes LEFT JOIN hit USING (cohort)
ORDER BY cohort_epoch
"""

QUERIES["q_cohort_payback"] = QuerySpec(
    q_cohort_payback,
    Q_PAYBACK_SQL,
    "months to cohort payback at a fixed CAC proxy — partitioned "
    "cumulative revenue, first-hit month",
)


# ---------------------------------------------- dedup impact report
# Exact dedup by md5(text), keep MIN(doc_id); whitespace tokens.


def q_dedup_impact_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.md5(F.col("text")).alias("h"),
        F.size(
            F.filter(
                F.split(F.lower(F.col("text")), "\\s+"), lambda t: t != ""
            )
        ).cast("long").alias("toks"),
    )
    groups = docs.groupBy("h").agg(
        F.count(F.lit(1)).alias("dups"),
        F.min("doc_id").alias("keep_id"),
        F.first("toks").alias("toks"),
    )
    agg = groups.agg(
        F.sum("dups").cast("long").alias("docs_before"),
        F.count(F.lit(1)).cast("long").alias("docs_after"),
        F.sum(F.col("dups") * F.col("toks")).cast("long").alias("tokens_before"),
        F.sum("toks").cast("long").alias("tokens_after"),
    )
    return agg.select(
        "docs_before",
        "docs_after",
        "tokens_before",
        "tokens_after",
        F.round(
            1.0
            - F.col("tokens_after").cast("double")
            / F.col("tokens_before").cast("double"),
            6,
        ).alias("token_reduction"),
    )


Q_DEDUP_IMPACT_SQL = """
WITH docs AS (
  SELECT doc_id, md5(text) AS h,
         len(list_filter(string_split_regex(lower(text), '\\s+'),
                         t -> t <> '')) AS toks
  FROM documents),
groups AS (
  SELECT h, COUNT(*) AS dups, MIN(doc_id) AS keep_id,
         ANY_VALUE(toks) AS toks
  FROM docs GROUP BY h),
agg AS (
  SELECT CAST(SUM(dups) AS BIGINT) AS docs_before,
         CAST(COUNT(*) AS BIGINT) AS docs_after,
         CAST(SUM(dups * toks) AS BIGINT) AS tokens_before,
         CAST(SUM(toks) AS BIGINT) AS tokens_after
  FROM groups)
SELECT docs_before, docs_after, tokens_before, tokens_after,
       ROUND(1.0 - CAST(tokens_after AS DOUBLE)
                   / CAST(tokens_before AS DOUBLE), 6) AS token_reduction
FROM agg
"""

QUERIES["q_dedup_impact_report"] = QuerySpec(
    q_dedup_impact_report,
    Q_DEDUP_IMPACT_SQL,
    "exact-dedup impact summary: docs/tokens before vs after — one "
    "hash groupBy, integer token accounting",
)
