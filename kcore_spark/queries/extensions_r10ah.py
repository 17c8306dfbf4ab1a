"""Round-10 surface extensions, batch AH (SURVEY §2.3 N r10): the
agreement/reliability block — Fleiss' kappa (multi-rater chance-
corrected agreement; completes the agreement family next to Cohen's
kappa q_cohens_kappa and Cochran's Q q_cochran_q), Cronbach's alpha
(internal-consistency reliability over an item battery), and the
Matthews correlation coefficient (the balanced single-number binary-
classifier summary q_classification_report doesn't report).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: all three reduce to INTEGER contingency/count sums (or
decimal-exact quantity sums) before one closed-form ratio; the MCC
prediction fixture is the md5-uniform pinned scorer the eval family
already uses (q_classification_report idiom).
Scale: per-subject groupBys (one keyed shuffle each), k-row category
tables; nothing sorts or pairs a corpus-sized table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------------ Fleiss' kappa
# Three deterministic "raters" are noisy observers of the SAME
# signal (o_totalprice): each perturbs the price with its own
# md5-pinned ±30% factor, then buckets at the tercile cuts — the
# realistic multi-annotator setup, so agreement is genuinely above
# chance. n_ij = raters assigning category j to order i; P_i =
# (Σ n_ij² − m)/(m(m−1)); κ = (P̄ − Σp_j²)/(1 − Σp_j²).
# Integer-exact until the final ratio.


def _rater(salt: str):
    u = F.conv(
        F.substring(
            F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(salt))), 1, 8
        ),
        16,
        10,
    ).cast("long")
    seen = F.col("o_totalprice") * (0.7 + 0.6 * (u % 1000).cast("double") / 1000.0)
    return (
        F.when(seen > 336000, "high").when(seen > 165000, "mid").otherwise("low")
    )


def q_fleiss_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.relational import spread

    # spread: the three md5 raters (3 md5+conv per row) otherwise run
    # in the serial single-row-group scan task; the (o_orderkey, cat)
    # and o_orderkey groupBys both reuse this one exchange
    orders = spread(
        load_table(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice"),
        "o_orderkey",
    )
    votes = orders.select(
        "o_orderkey",
        F.explode(F.array(_rater("r1"), _rater("r2"), _rater("r3"))).alias("cat"),
    )
    nij = votes.groupBy("o_orderkey", "cat").agg(F.count(F.lit(1)).alias("nij"))
    # per-subject agreement: Σ nij² per order (m = 3 raters)
    pi = nij.groupBy("o_orderkey").agg(F.sum(F.col("nij") * F.col("nij")).alias("ss"))
    subj = pi.agg(
        F.count(F.lit(1)).cast("long").alias("n_subjects"),
        F.sum("ss").alias("sum_ss"),
    )
    cat = nij.groupBy("cat").agg(F.sum("nij").alias("cj"))
    pe = cat.agg(
        F.sum(F.col("cj") * F.col("cj")).alias("sum_cj2"),
        F.sum("cj").alias("total"),
    )
    pbar = (F.col("sum_ss").cast("double") - F.col("n_subjects") * 3)
    pbar = pbar / (F.col("n_subjects") * 3 * 2)
    pebar = F.col("sum_cj2").cast("double") / (F.col("total").cast("double") ** 2)
    return (
        subj.crossJoin(pe)
        .select(
            "n_subjects",
            F.round(pbar, 6).alias("p_bar"),
            F.round(pebar, 6).alias("p_e"),
            F.round((pbar - pebar) / (1 - pebar), 6).alias("fleiss_kappa"),
        )
    )


Q_FLEISS_SQL = """
WITH seen AS (
  SELECT o_orderkey,
         o_totalprice * (0.7 + 0.6 * CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || 'r1'), 1, 8))::BIGINT % 1000 AS DOUBLE) / 1000.0) AS s1,
         o_totalprice * (0.7 + 0.6 * CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || 'r2'), 1, 8))::BIGINT % 1000 AS DOUBLE) / 1000.0) AS s2,
         o_totalprice * (0.7 + 0.6 * CAST(('0x' || substring(md5(CAST(o_orderkey AS VARCHAR) || 'r3'), 1, 8))::BIGINT % 1000 AS DOUBLE) / 1000.0) AS s3
  FROM orders),
votes AS (
  SELECT o_orderkey, UNNEST([
    CASE WHEN s1 > 336000 THEN 'high' WHEN s1 > 165000 THEN 'mid' ELSE 'low' END,
    CASE WHEN s2 > 336000 THEN 'high' WHEN s2 > 165000 THEN 'mid' ELSE 'low' END,
    CASE WHEN s3 > 336000 THEN 'high' WHEN s3 > 165000 THEN 'mid' ELSE 'low' END]) AS cat
  FROM seen),
nij AS (SELECT o_orderkey, cat, COUNT(*) AS nij FROM votes GROUP BY 1, 2),
pi AS (SELECT o_orderkey, SUM(nij * nij) AS ss FROM nij GROUP BY 1),
subj AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects, SUM(ss) AS sum_ss FROM pi),
cat AS (SELECT cat, SUM(nij) AS cj FROM nij GROUP BY 1),
pe AS (SELECT SUM(cj * cj) AS sum_cj2, SUM(cj) AS total FROM cat)
SELECT n_subjects,
       ROUND((CAST(sum_ss AS DOUBLE) - n_subjects * 3)
             / (n_subjects * 3 * 2), 6) AS p_bar,
       ROUND(CAST(sum_cj2 AS DOUBLE)
             / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 6) AS p_e,
       ROUND(((CAST(sum_ss AS DOUBLE) - n_subjects * 3) / (n_subjects * 3 * 2)
              - CAST(sum_cj2 AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)))
             / (1 - CAST(sum_cj2 AS DOUBLE)
                    / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))), 6)
           AS fleiss_kappa
FROM subj CROSS JOIN pe
"""

QUERIES["q_fleiss_kappa"] = QuerySpec(
    q_fleiss_kappa,
    Q_FLEISS_SQL,
    "Fleiss' kappa across three deterministic raters — integer "
    "contingency sums, one closed-form ratio",
)


# --------------------------------------------------- Cronbach's alpha
# Item battery: l_quantity of line numbers 1..4 for orders carrying
# all four items. alpha = k/(k−1) · (1 − Σ var_item / var_total).
# Sample variances from decimal-exact sums of the decimal(15,2)
# quantities (and their exact decimal squares).


def q_cronbach_alpha(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") <= 4)
    full = (
        li.groupBy("l_orderkey")
        .agg(F.count(F.lit(1)).alias("k"))
        .where(F.col("k") == 4)
        .select("l_orderkey")
    )
    items = li.join(full, "l_orderkey").select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("decimal(15,2)").alias("q"),
    )
    # per-item sample variance: n·Σq² − (Σq)² over n(n−1)
    per_item = items.groupBy("l_linenumber").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("q").alias("s1"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    nd = F.col("n").cast("double")
    item_var = (nd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2) / (
        nd * (nd - 1)
    )
    sum_item_var = per_item.agg(
        F.sum(item_var).alias("sv"), F.count(F.lit(1)).cast("long").alias("k")
    )
    totals = items.groupBy("l_orderkey").agg(F.sum("q").alias("t"))
    tot = totals.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("t").alias("s1"),
        F.sum(F.col("t") * F.col("t")).alias("s2"),
    )
    tot_var = (
        F.col("n").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") ** 2
    ) / (F.col("n").cast("double") * (F.col("n").cast("double") - 1))
    return (
        sum_item_var.crossJoin(tot)
        .select(
            F.col("k"),
            F.col("n").cast("long").alias("n_subjects"),
            F.round("sv", 6).alias("sum_item_var"),
            F.round(tot_var, 6).alias("total_var"),
            F.round(
                (F.col("k") / (F.col("k") - 1).cast("double"))
                * (1 - F.col("sv") / tot_var),
                6,
            ).alias("cronbach_alpha"),
        )
    )


Q_CRONBACH_SQL = """
WITH li AS (
  SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DECIMAL(15,2)) AS q
  FROM lineitem WHERE l_linenumber <= 4),
full_orders AS (
  SELECT l_orderkey FROM li GROUP BY 1 HAVING COUNT(*) = 4),
items AS (SELECT li.* FROM li JOIN full_orders USING (l_orderkey)),
per_item AS (
  SELECT l_linenumber, COUNT(*) AS n, SUM(q) AS s1, SUM(q * q) AS s2
  FROM items GROUP BY 1),
siv AS (
  SELECT SUM((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1))) AS sv,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM per_item),
totals AS (SELECT l_orderkey, SUM(q) AS t FROM items GROUP BY 1),
tot AS (SELECT COUNT(*) AS n, SUM(t) AS s1, SUM(t * t) AS s2 FROM totals)
SELECT k, CAST(n AS BIGINT) AS n_subjects,
       ROUND(sv, 6) AS sum_item_var,
       ROUND((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)), 6) AS total_var,
       ROUND((CAST(k AS DOUBLE) / (k - 1))
             * (1 - sv / ((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                           - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                          / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))), 6)
           AS cronbach_alpha
FROM siv CROSS JOIN tot
"""

QUERIES["q_cronbach_alpha"] = QuerySpec(
    q_cronbach_alpha,
    Q_CRONBACH_SQL,
    "Cronbach's alpha over the 4-item line-quantity battery — "
    "decimal-exact item/total variances",
)


# ------------------------------------- Matthews correlation coefficient
# Binary task: actual = order is 'F' status; prediction = actual with
# md5-pinned asymmetric noise (the q_classification_report idiom).
# MCC = (TP·TN − FP·FN)/√((TP+FP)(TP+FN)(TN+FP)(TN+FN)); the four
# cells are integer counts, the product goes through double.


def q_mcc(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    u = F.conv(
        F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    actual = (F.col("o_orderstatus") == "F").cast("int")
    pred = (
        F.when(actual == 1, F.when(u % 10 < 8, 1).otherwise(0))
        .otherwise(F.when(u % 10 < 2, 1).otherwise(0))
    )
    cells = orders.select(actual.alias("a"), pred.alias("p")).agg(
        F.sum(((F.col("a") == 1) & (F.col("p") == 1)).cast("long")).alias("tp"),
        F.sum(((F.col("a") == 0) & (F.col("p") == 0)).cast("long")).alias("tn"),
        F.sum(((F.col("a") == 0) & (F.col("p") == 1)).cast("long")).alias("fp"),
        F.sum(((F.col("a") == 1) & (F.col("p") == 0)).cast("long")).alias("fn"),
    )
    tp, tn = F.col("tp").cast("double"), F.col("tn").cast("double")
    fp, fn = F.col("fp").cast("double"), F.col("fn").cast("double")
    denom = F.sqrt((tp + fp) * (tp + fn) * (tn + fp) * (tn + fn))
    return cells.select(
        "tp",
        "tn",
        "fp",
        "fn",
        F.round((tp * tn - fp * fn) / denom, 6).alias("mcc"),
    )


Q_MCC_SQL = """
WITH pred AS (
  SELECT CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS a,
         CASE WHEN o_orderstatus = 'F'
              THEN CASE WHEN ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 < 8
                        THEN 1 ELSE 0 END
              ELSE CASE WHEN ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 < 2
                        THEN 1 ELSE 0 END END AS p
  FROM orders),
cells AS (
  SELECT CAST(SUM(CASE WHEN a = 1 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS tp,
         CAST(SUM(CASE WHEN a = 0 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS tn,
         CAST(SUM(CASE WHEN a = 0 AND p = 1 THEN 1 ELSE 0 END) AS BIGINT) AS fp,
         CAST(SUM(CASE WHEN a = 1 AND p = 0 THEN 1 ELSE 0 END) AS BIGINT) AS fn
  FROM pred)
SELECT tp, tn, fp, fn,
       ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE)
              - CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE))
             / SQRT((CAST(tp AS DOUBLE) + fp) * (CAST(tp AS DOUBLE) + fn)
                    * (CAST(tn AS DOUBLE) + fp) * (CAST(tn AS DOUBLE) + fn)), 6)
           AS mcc
FROM cells
"""

QUERIES["q_mcc"] = QuerySpec(
    q_mcc,
    Q_MCC_SQL,
    "Matthews correlation coefficient on the md5-pinned binary task — "
    "four integer confusion cells, one closed-form ratio",
)
