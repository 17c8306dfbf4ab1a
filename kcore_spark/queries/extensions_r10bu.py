"""Round-10 surface extensions, batch BU (SURVEY §2.3 N r10): the
concordance/agreement block, second wave — Krippendorff's alpha
(nominal agreement with unequal raters per unit: do an order's line
items agree on the return flag?), Kendall's coefficient of concordance
W (do the five regions rank the 25 part brands by revenue the same
way?), and Somers' D (asymmetric ordinal association of return outcome
on priority dose — the directed cousin of q_kendall_tau / q_gk_gamma).
Completes the inter-rater family next to q_fleiss_kappa /
q_cohens_kappa / q_cronbach_alpha.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: Krippendorff folds exact integer cell counts (the one
fractional per-unit term is rounded and decimal-summed); Kendall's W
ranks are tie-broken by brand name (pinned); Somers' D pair counts are
exact integers from the 5x2 contingency grid.
Scale: alpha is one keyed group-by over lineitem; W ranks within
region partitions (25-row per-partition sorts); Somers' D folds the
corpus to a 10-cell grid before the bounded pair cross.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------- Krippendorff's alpha
# Units = orders, observations = line items, category = l_returnflag.
# alpha = 1 - (n-1) * sum_u sum_c n_uc (m_u - n_uc)/(m_u - 1)
#             / sum_c n_c (n - n_c),   over units with m_u >= 2.


def q_krippendorff_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("u"), F.col("l_returnflag").alias("cat")
    )
    cells = li.groupBy("u", "cat").agg(F.count(F.lit(1)).cast("long").alias("n_uc"))
    m = cells.groupBy("u").agg(F.sum("n_uc").alias("m_u")).where(F.col("m_u") >= 2)
    uc = cells.join(m, "u")
    do_terms = uc.select(
        F.round(
            F.col("n_uc")
            * (F.col("m_u") - F.col("n_uc"))
            / (F.col("m_u") - 1).cast("double"),
            12,
        )
        .cast("decimal(38,12)")
        .alias("t"),
        F.col("n_uc"),
        F.col("cat"),
        F.col("m_u"),
    )
    per_cat = do_terms.groupBy("cat").agg(
        F.sum("t").alias("s_t"), F.sum("n_uc").cast("long").alias("n_c")
    )
    agg = per_cat.agg(
        F.sum("s_t").cast("double").alias("d_o_num"),
        F.sum("n_c").cast("long").alias("n"),
        F.sum(F.col("n_c") * F.col("n_c")).cast("long").alias("s_nc2"),
    )
    # sum_c n_c (n - n_c) = n^2 - sum n_c^2
    s_e = (F.col("n") * F.col("n") - F.col("s_nc2")).cast("double")
    units = m.agg(F.count(F.lit(1)).cast("long").alias("n_units"))
    return agg.crossJoin(F.broadcast(units)).select(
        "n_units",
        F.col("n").alias("n_ratings"),
        F.round(
            1.0 - (F.col("n") - 1).cast("double") * F.col("d_o_num") / s_e, 6
        ).alias("alpha"),
    )


Q_KRIPP_SQL = """
WITH cells AS (
  SELECT l_orderkey AS u, l_returnflag AS cat, COUNT(*) AS n_uc
  FROM lineitem GROUP BY 1, 2),
m AS (
  SELECT u, SUM(n_uc) AS m_u FROM cells GROUP BY u HAVING SUM(n_uc) >= 2),
uc AS (
  SELECT cells.u, cat, n_uc, m_u FROM cells JOIN m ON cells.u = m.u),
per_cat AS (
  SELECT cat,
         SUM(CAST(ROUND(n_uc * (m_u - n_uc) / CAST(m_u - 1 AS DOUBLE), 12)
                  AS DECIMAL(38,12))) AS s_t,
         CAST(SUM(n_uc) AS BIGINT) AS n_c
  FROM uc GROUP BY cat),
agg AS (
  SELECT CAST(SUM(s_t) AS DOUBLE) AS d_o_num,
         CAST(SUM(n_c) AS BIGINT) AS n,
         CAST(SUM(n_c * n_c) AS BIGINT) AS s_nc2
  FROM per_cat),
units AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units FROM m)
SELECT n_units, n AS n_ratings,
       ROUND(1.0 - CAST(n - 1 AS DOUBLE) * d_o_num
                   / CAST(n * n - s_nc2 AS DOUBLE), 6) AS alpha
FROM agg CROSS JOIN units
"""

QUERIES["q_krippendorff_alpha"] = QuerySpec(
    q_krippendorff_alpha,
    Q_KRIPP_SQL,
    "Krippendorff's nominal alpha over orders' return-flag ratings — "
    "exact integer cell folds, one keyed group-by",
)


# --------------------------------------------------------- Kendall's W
# Raters = 5 regions, objects = 25 brands ranked by revenue (ties
# broken by brand, pinned). W = 12 S / (m^2 (n^3 - n)).


def q_kendalls_w(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    sup = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").select("r_regionkey", "r_name")
    rev = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(sup), li.l_suppkey == sup.s_suppkey)
        .join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("r_name", "p_brand")
        .agg(F.sum(F.col("cents").cast("decimal(38,0)")).alias("rev"))
    )
    w_rank = Window.partitionBy("r_name").orderBy(
        F.col("rev").desc(), F.col("p_brand")
    )
    ranked = rev.withColumn("rk", F.row_number().over(w_rank))
    sums = ranked.groupBy("p_brand").agg(F.sum("rk").cast("long").alias("r_j"))
    m_n = ranked.agg(
        F.countDistinct("r_name").cast("long").alias("m"),
        F.countDistinct("p_brand").cast("long").alias("n"),
    )
    s = sums.crossJoin(F.broadcast(m_n)).agg(
        F.first("m").alias("m"),
        F.first("n").alias("n"),
        F.sum(
            (F.col("r_j") - F.col("m") * (F.col("n") + 1) / 2.0)
            * (F.col("r_j") - F.col("m") * (F.col("n") + 1) / 2.0)
        ).alias("s"),
    )
    md = F.col("m").cast("double")
    nd = F.col("n").cast("double")
    w = 12.0 * F.col("s") / (md * md * (nd * nd * nd - nd))
    return s.select(
        F.col("m").alias("n_raters"),
        F.col("n").alias("n_objects"),
        F.round(w, 6).alias("kendalls_w"),
        F.round(md * (nd - 1.0) * w, 6).alias("chi2"),
    )


Q_KW_SQL = """
WITH rev AS (
  SELECT r_name, p_brand,
         SUM(CAST(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)
                  AS DECIMAL(38,0))) AS rev
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  JOIN region ON n_regionkey = r_regionkey
  GROUP BY 1, 2),
ranked AS (
  SELECT r_name, p_brand,
         ROW_NUMBER() OVER (PARTITION BY r_name
                            ORDER BY rev DESC, p_brand) AS rk
  FROM rev),
sums AS (SELECT p_brand, CAST(SUM(rk) AS BIGINT) AS r_j FROM ranked GROUP BY 1),
mn AS (
  SELECT CAST(COUNT(DISTINCT r_name) AS BIGINT) AS m,
         CAST(COUNT(DISTINCT p_brand) AS BIGINT) AS n
  FROM ranked),
s AS (
  SELECT MIN(m) AS m, MIN(n) AS n,
         SUM((r_j - m * (n + 1) / 2.0) * (r_j - m * (n + 1) / 2.0)) AS s
  FROM sums CROSS JOIN mn)
SELECT m AS n_raters, n AS n_objects,
       ROUND(12.0 * s / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
             * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                - CAST(n AS DOUBLE))), 6) AS kendalls_w,
       ROUND(CAST(m AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)
             * (12.0 * s / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                   - CAST(n AS DOUBLE)))), 6) AS chi2
FROM s
"""

QUERIES["q_kendalls_w"] = QuerySpec(
    q_kendalls_w,
    Q_KW_SQL,
    "Kendall's W: concordance of the five regions' brand-revenue "
    "rankings — partitioned 25-row rank windows, exact rank sums",
)


# ------------------------------------------------------------ Somers' D
# D_{Y|X} from the 5x2 (priority dose x returned) contingency:
# (C - D) / (n(n-1)/2 - T_X) with T_X = sum_i n_i(n_i-1)/2.


def q_somers_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.substring("o_orderpriority", 1, 1).cast("int").alias("x")
    )
    returned = (
        load_table(spark, sf_dir, "lineitem")
        .where(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o_orderkey"))
        .distinct()
        .withColumn("y", F.lit(1))
    )
    grid = (
        orders.join(returned, "o_orderkey", "left")
        .select("x", F.coalesce("y", F.lit(0)).alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )
    a = grid.select(
        F.col("x").alias("x1"), F.col("y").alias("y1"), F.col("cnt").alias("c1")
    )
    b = grid.select(
        F.col("x").alias("x2"), F.col("y").alias("y2"), F.col("cnt").alias("c2")
    )
    pairs = a.crossJoin(F.broadcast(b))
    conc = pairs.where(
        ((F.col("x1") < F.col("x2")) & (F.col("y1") < F.col("y2")))
    ).agg(F.sum(F.col("c1") * F.col("c2")).cast("long").alias("v"))
    disc = pairs.where(
        ((F.col("x1") < F.col("x2")) & (F.col("y1") > F.col("y2")))
    ).agg(F.sum(F.col("c1") * F.col("c2")).cast("long").alias("v"))
    tx = grid.groupBy("x").agg(F.sum("cnt").alias("n_i")).agg(
        F.sum(F.col("n_i") * (F.col("n_i") - 1) / 2).cast("long").alias("t_x"),
        F.sum("n_i").cast("long").alias("n"),
    )
    j = (
        conc.select(F.col("v").alias("n_c"))
        .crossJoin(disc.select(F.col("v").alias("n_d")))
        .crossJoin(tx)
    )
    denom = (F.col("n") * (F.col("n") - 1) / 2 - F.col("t_x")).cast("double")
    return j.select(
        "n",
        "n_c",
        "n_d",
        F.round((F.col("n_c") - F.col("n_d")).cast("double") / denom, 6).alias(
            "somers_d_yx"
        ),
    )


Q_SOMERS_SQL = """
WITH grid AS (
  SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS x,
         CASE WHEN o_orderkey IN (
             SELECT l_orderkey FROM lineitem WHERE l_returnflag = 'R')
              THEN 1 ELSE 0 END AS y,
         COUNT(*) AS cnt
  FROM orders GROUP BY 1, 2),
conc AS (
  SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS n_c
  FROM grid a, grid b WHERE a.x < b.x AND a.y < b.y),
disc AS (
  SELECT CAST(SUM(a.cnt * b.cnt) AS BIGINT) AS n_d
  FROM grid a, grid b WHERE a.x < b.x AND a.y > b.y),
tx AS (
  SELECT CAST(SUM(n_i * (n_i - 1) / 2) AS BIGINT) AS t_x,
         CAST(SUM(n_i) AS BIGINT) AS n
  FROM (SELECT x, SUM(cnt) AS n_i FROM grid GROUP BY x))
SELECT n, n_c, n_d,
       ROUND(CAST(n_c - n_d AS DOUBLE)
             / CAST(n * (n - 1) / 2 - t_x AS DOUBLE), 6) AS somers_d_yx
FROM conc CROSS JOIN disc CROSS JOIN tx
"""

QUERIES["q_somers_d"] = QuerySpec(
    q_somers_d,
    Q_SOMERS_SQL,
    "Somers' D of return outcome on priority dose — exact pair counts "
    "from the 10-cell contingency grid, bounded cross",
)
