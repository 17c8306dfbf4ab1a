"""Round-10 surface extensions, batch BT (SURVEY §2.3 N r10): the
actuarial claims-development block — the chain-ladder method over a
run-off triangle. Origins are order months, development lag is the
calendar-month gap from order to ship, "paid" is extended price, and
the evaluation date is the latest ORDER month (payments shipping past
it are censored, so recent origins are genuinely immature — a real
triangle, not a rectangle; the fixture's ship dates are independent of
order dates, so pre-order shipments book at inception, dev 0). Three queries: age-to-age development
factors (volume-weighted chain-ladder), Bornhuetter-Ferguson ultimates
(credibility blend of the chain-ladder projection with a pinned-ELR
prior), and Mack's sigma^2 (the variance of the development factors —
the uncertainty half of the chain-ladder model).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: cents-decimal paid sums; the triangle is DENSE (origin x
dev grid left-joined, zero-filled) so cumulative/lead windows never
misalign on missing cells; per-origin Mack terms rounded to fixed
scale and decimal-summed.
Scale: one lineitem⋈orders scan folds to the (months x devs) cell
table — everything after is grid-sized. The cumulative window is
PARTITIONED by origin month; the only global windows/crosses are over
the <=6-row factor ladder and 1-row eval/max-dev bounds (adjudicated
in scripts/explain_audit.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_ELR = 0.65  # pinned expected loss ratio for the BF prior


def _month(col: str) -> F.Column:
    return (F.year(col) * 12 + F.month(col) - 1).cast("int")


def _cum_triangle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dense cumulative triangle: (origin_m, dev, cum_cents, eval_m,
    max_dev) with dev grid 0..max_dev and zero-filled missing cells."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", _month("o_orderdate").alias("origin_m")
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        _month("l_shipdate").alias("ship_m"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    ev = orders.agg(F.max("origin_m").alias("eval_m"))
    paid = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .crossJoin(F.broadcast(ev))
        .where(F.col("ship_m") <= F.col("eval_m"))
        .select(
            "origin_m",
            # the fixture's ship dates are independent of order dates, so
            # pre-order shipments exist; book them at inception (dev 0)
            F.greatest(F.col("ship_m") - F.col("origin_m"), F.lit(0)).alias("dev"),
            "cents",
        )
    )
    cell = paid.groupBy("origin_m", "dev").agg(
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("c")
    )
    maxd = cell.agg(F.max("dev").alias("max_dev"))
    grid = (
        orders.select("origin_m")
        .distinct()
        .crossJoin(F.broadcast(maxd))
        .crossJoin(F.broadcast(ev))
        .select(
            "origin_m",
            F.explode(F.sequence(F.lit(0), F.col("max_dev"))).alias("dev"),
            "eval_m",
            "max_dev",
        )
        .where(F.col("origin_m") + F.col("dev") <= F.col("eval_m"))
    )
    dense = grid.join(cell, ["origin_m", "dev"], "left").select(
        "origin_m",
        "dev",
        "eval_m",
        "max_dev",
        F.coalesce(F.col("c"), F.lit(0).cast("decimal(38,0)")).alias("c"),
    )
    w = Window.partitionBy("origin_m").orderBy("dev").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return dense.withColumn("cum", F.sum("c").over(w))


_CUM_SQL = """
  orders_m AS (
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS INT)
               AS origin_m
    FROM orders),
  ev AS (SELECT MAX(origin_m) AS eval_m FROM orders_m),
  paid AS (
    SELECT origin_m,
           GREATEST(CAST(YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS INT)
                    - origin_m, 0) AS dev,
           CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents
    FROM lineitem
    JOIN orders_m ON l_orderkey = o_orderkey
    CROSS JOIN ev
    WHERE CAST(YEAR(l_shipdate) * 12 + MONTH(l_shipdate) - 1 AS INT) <= eval_m),
  cell AS (
    SELECT origin_m, dev, SUM(CAST(cents AS DECIMAL(38,0))) AS c
    FROM paid GROUP BY 1, 2),
  maxd AS (SELECT MAX(dev) AS max_dev FROM cell),
  grid AS (
    SELECT origin_m, t.dev, eval_m, max_dev
    FROM (SELECT DISTINCT origin_m FROM orders_m)
    CROSS JOIN maxd CROSS JOIN ev
    CROSS JOIN UNNEST(generate_series(0, max_dev)) AS t(dev)
    WHERE origin_m + t.dev <= eval_m),
  dense AS (
    SELECT g.origin_m, g.dev, g.eval_m, g.max_dev,
           COALESCE(c, CAST(0 AS DECIMAL(38,0))) AS c
    FROM grid g LEFT JOIN cell ON g.origin_m = cell.origin_m
                              AND g.dev = cell.dev),
  cum_t AS (
    SELECT origin_m, dev, eval_m, max_dev,
           SUM(c) OVER (PARTITION BY origin_m ORDER BY dev
                        ROWS UNBOUNDED PRECEDING) AS cum
    FROM dense)
"""


# ------------------------------------------------- chain-ladder factors
# f_d = sum_o C(o,d+1) / sum_o C(o,d) over origins where dev d+1 is
# observed (origin_m + d + 1 <= eval_m) — the volume-weighted estimator.


def q_chain_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    cum = _cum_triangle(spark, sf_dir)
    w = Window.partitionBy("origin_m").orderBy("dev")
    pairs = cum.withColumn("cum_next", F.lead("cum").over(w)).where(
        F.col("cum_next").isNotNull() & (F.col("cum") > 0)
    )
    fac = pairs.groupBy("dev").agg(
        F.count(F.lit(1)).cast("long").alias("n_origins"),
        F.sum("cum").alias("s_c"),
        F.sum("cum_next").alias("s_cn"),
    )
    return fac.select(
        F.col("dev").alias("dev_from"),
        "n_origins",
        F.round(F.col("s_c").cast("double") / 100.0, 2).alias("paid_at_dev"),
        F.round(
            F.col("s_cn").cast("double") / F.col("s_c").cast("double"), 6
        ).alias("factor"),
    ).orderBy("dev_from")


Q_CL_SQL = f"""
WITH {_CUM_SQL},
pairs AS (
  SELECT dev, cum,
         LEAD(cum) OVER (PARTITION BY origin_m ORDER BY dev) AS cum_next
  FROM cum_t),
fac AS (
  SELECT dev, CAST(COUNT(*) AS BIGINT) AS n_origins,
         SUM(cum) AS s_c, SUM(cum_next) AS s_cn
  FROM pairs WHERE cum_next IS NOT NULL AND cum > 0
  GROUP BY dev)
SELECT dev AS dev_from, n_origins,
       ROUND(CAST(s_c AS DOUBLE) / 100.0, 2) AS paid_at_dev,
       ROUND(CAST(s_cn AS DOUBLE) / CAST(s_c AS DOUBLE), 6) AS factor
FROM fac ORDER BY dev_from
"""

QUERIES["q_chain_ladder"] = QuerySpec(
    q_chain_ladder,
    Q_CL_SQL,
    "chain-ladder age-to-age factors over the censored run-off triangle — "
    "dense grid, partitioned cumulative/lead, grid-sized folds",
)


# --------------------------------------------- Bornhuetter-Ferguson
# Per origin: latest C at dev L = eval_m - origin_m (capped at max_dev);
# CDF = prod of factors f_d for d in [L, max_dev); BF ultimate =
# C_latest + ELR * premium * (1 - 1/CDF). Suffix products run over the
# <=6-row factor ladder (bounded global window, adjudicated).


def q_bornhuetter_ferguson(spark: SparkSession, sf_dir: str) -> DataFrame:
    cum = _cum_triangle(spark, sf_dir)
    w = Window.partitionBy("origin_m").orderBy("dev")
    pairs = cum.withColumn("cum_next", F.lead("cum").over(w)).where(
        F.col("cum_next").isNotNull() & (F.col("cum") > 0)
    )
    fac = pairs.groupBy("dev").agg(
        (F.sum("cum_next").cast("double") / F.sum("cum").cast("double")).alias("f")
    )
    # suffix product over the bounded factor ladder: cdf_from(d) =
    # prod_{e >= d} f_e, via a reverse-cumulative log-sum
    wf = Window.orderBy(F.col("dev").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cdf = fac.withColumn("cdf", F.exp(F.sum(F.log("f")).over(wf))).select(
        F.col("dev").alias("from_dev"), "cdf"
    )
    latest = cum.where(F.col("origin_m") + F.col("dev") == F.col("eval_m")).select(
        "origin_m",
        F.col("dev").alias("latest_dev"),
        F.col("cum").alias("latest_c"),
        "max_dev",
    )
    prem = (
        load_table(spark, sf_dir, "orders")
        .groupBy(_month("o_orderdate").alias("origin_m"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .alias("prem_cents")
        )
    )
    j = (
        latest.join(cdf, latest.latest_dev == cdf.from_dev, "left")
        .join(prem, "origin_m")
        .select(
            "origin_m",
            "latest_dev",
            F.round(F.col("latest_c").cast("double") / 100.0, 2).alias("paid_to_date"),
            F.coalesce("cdf", F.lit(1.0)).alias("cdf"),
            F.col("prem_cents").cast("double").alias("prem_c"),
        )
    )
    ult_cl = F.col("paid_to_date") * F.col("cdf")
    ult_bf = F.col("paid_to_date") + _ELR * (F.col("prem_c") / 100.0) * (
        1.0 - 1.0 / F.col("cdf")
    )
    return j.select(
        "origin_m",
        "latest_dev",
        "paid_to_date",
        F.round("cdf", 6).alias("cdf"),
        F.round(ult_cl, 2).alias("ult_chain_ladder"),
        F.round(ult_bf, 2).alias("ult_bf"),
    ).orderBy("origin_m")


Q_BF_SQL = f"""
WITH {_CUM_SQL},
pairs AS (
  SELECT dev, cum,
         LEAD(cum) OVER (PARTITION BY origin_m ORDER BY dev) AS cum_next
  FROM cum_t),
fac AS (
  SELECT dev, CAST(SUM(cum_next) AS DOUBLE) / CAST(SUM(cum) AS DOUBLE) AS f
  FROM pairs WHERE cum_next IS NOT NULL AND cum > 0 GROUP BY dev),
cdf AS (
  SELECT dev AS from_dev,
         EXP(SUM(LN(f)) OVER (ORDER BY dev DESC ROWS UNBOUNDED PRECEDING))
             AS cdf
  FROM fac),
latest AS (
  SELECT origin_m, dev AS latest_dev, cum AS latest_c, max_dev
  FROM cum_t WHERE origin_m + dev = eval_m),
prem AS (
  SELECT CAST(YEAR(o_orderdate) * 12 + MONTH(o_orderdate) - 1 AS INT)
             AS origin_m,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0))) AS prem_cents
  FROM orders GROUP BY 1),
j AS (
  SELECT l.origin_m, l.latest_dev,
         ROUND(CAST(l.latest_c AS DOUBLE) / 100.0, 2) AS paid_to_date,
         COALESCE(c.cdf, 1.0) AS cdf,
         CAST(p.prem_cents AS DOUBLE) AS prem_c
  FROM latest l
  LEFT JOIN cdf c ON l.latest_dev = c.from_dev
  JOIN prem p ON l.origin_m = p.origin_m)
SELECT origin_m, latest_dev, paid_to_date,
       ROUND(cdf, 6) AS cdf,
       ROUND(paid_to_date * cdf, 2) AS ult_chain_ladder,
       ROUND(paid_to_date + {_ELR} * (prem_c / 100.0) * (1.0 - 1.0 / cdf), 2)
           AS ult_bf
FROM j ORDER BY origin_m
"""

QUERIES["q_bornhuetter_ferguson"] = QuerySpec(
    q_bornhuetter_ferguson,
    Q_BF_SQL,
    "Bornhuetter-Ferguson ultimates per origin month: chain-ladder CDF "
    "suffix products (bounded ladder) blended with a pinned-ELR prior",
)


# ----------------------------------------------------------- Mack sigma2
# sigma_d^2 = 1/(n_d - 1) * sum_o C(o,d) * (C(o,d+1)/C(o,d) - f_d)^2 —
# the process-variance estimator under Mack's distribution-free model.


def q_mack_sigma(spark: SparkSession, sf_dir: str) -> DataFrame:
    cum = _cum_triangle(spark, sf_dir)
    w = Window.partitionBy("origin_m").orderBy("dev")
    pairs = cum.withColumn("cum_next", F.lead("cum").over(w)).where(
        F.col("cum_next").isNotNull() & (F.col("cum") > 0)
    )
    fac = pairs.groupBy("dev").agg(
        (F.sum("cum_next").cast("double") / F.sum("cum").cast("double")).alias("f"),
        F.count(F.lit(1)).cast("long").alias("n_origins"),
    )
    # dollars (not cents) keeps the squared-deviation terms in a sane range
    terms = pairs.join(fac, "dev").select(
        "dev",
        "n_origins",
        F.round(
            (F.col("cum").cast("double") / 100.0)
            * (
                F.col("cum_next").cast("double") / F.col("cum").cast("double")
                - F.col("f")
            )
            ** 2,
            10,
        )
        .cast("decimal(38,10)")
        .alias("t"),
    )
    agg = terms.groupBy("dev", "n_origins").agg(F.sum("t").cast("double").alias("s"))
    return agg.where(F.col("n_origins") > 1).select(
        F.col("dev").alias("dev_from"),
        "n_origins",
        F.round(F.col("s") / (F.col("n_origins") - 1.0), 6).alias("sigma2"),
    ).orderBy("dev_from")


Q_MACK_SQL = f"""
WITH {_CUM_SQL},
pairs AS (
  SELECT origin_m, dev, cum,
         LEAD(cum) OVER (PARTITION BY origin_m ORDER BY dev) AS cum_next
  FROM cum_t),
obs AS (SELECT * FROM pairs WHERE cum_next IS NOT NULL AND cum > 0),
fac AS (
  SELECT dev, CAST(SUM(cum_next) AS DOUBLE) / CAST(SUM(cum) AS DOUBLE) AS f,
         CAST(COUNT(*) AS BIGINT) AS n_origins
  FROM obs GROUP BY dev),
terms AS (
  SELECT o.dev, n_origins,
         CAST(ROUND((CAST(cum AS DOUBLE) / 100.0)
                    * POWER(CAST(cum_next AS DOUBLE) / CAST(cum AS DOUBLE) - f, 2),
              10) AS DECIMAL(38,10)) AS t
  FROM obs o JOIN fac ON o.dev = fac.dev),
agg AS (
  SELECT dev, n_origins, CAST(SUM(t) AS DOUBLE) AS s
  FROM terms GROUP BY 1, 2)
SELECT dev AS dev_from, n_origins,
       ROUND(s / (n_origins - 1.0), 6) AS sigma2
FROM agg WHERE n_origins > 1 ORDER BY dev_from
"""

QUERIES["q_mack_sigma"] = QuerySpec(
    q_mack_sigma,
    Q_MACK_SQL,
    "Mack sigma^2 development-factor variance per dev age — weighted "
    "squared deviations around the chain-ladder factor, decimal-summed",
)
