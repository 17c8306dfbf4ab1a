"""Round-10 surface extensions, batch AM (SURVEY §2.3 N r10): the
ratio-metric experimentation block — delta-method standard errors for
ratio metrics (revenue-per-order where the randomization unit is the
customer, the variance every naive per-order t-test gets wrong),
post-stratification (reweighting arm means to the global segment mix,
the bias-removal companion to q_cuped_adjustment), and Bayesian
probability-of-best for two conversion arms (Beta posteriors compared
through the pinned normal approximation).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: md5-pinned arm assignment (the repo's q_hash_sample
idiom); decimal-exact per-unit sums and cross-moments; the normal
CDF is the A&S 26.2.17 polynomial shared with q_anderson_darling.
Scale: one customer-keyed rollup then per-arm moment aggs; strata
tables are k-row; no sorts, no windows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10ai import _PHI_SQL, _phi

QUERIES: dict[str, QuerySpec] = {}


def _arm():
    """md5-pinned 50/50 arm from the customer key."""
    u = F.conv(
        F.substring(F.md5(F.col("c_custkey").cast("string")), 1, 8), 16, 10
    ).cast("long")
    return F.when(u % 2 == 0, "A").otherwise("B")


_ARM_SQL = (
    "CASE WHEN ('0x' || substring(md5(CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT"
    " % 2 = 0 THEN 'A' ELSE 'B' END"
)


# ------------------------------------------------ delta-method ratio
# Unit = customer; R = ΣY/ΣN (revenue per order). Var(R) per arm via
# the delta method on the per-unit (Y, N) pairs:
#   var(R) = (s_yy − 2R·s_yn + R²·s_nn) / (n · mean_N²)
# with s_* the sample (co)variances of the unit totals.


def q_delta_method_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    units = (
        orders.groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(15,2)")).cast("decimal(18,2)").alias("y"),
            F.count(F.lit(1)).alias("m"),
        )
        .join(cust, "c_custkey")
        .select(_arm().alias("arm"), "y", "m")
    )
    agg = units.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("sy"),
        F.sum("m").alias("sm"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("y") * F.col("m")).alias("sym"),
        F.sum(F.col("m") * F.col("m")).alias("smm"),
    )
    n = F.col("n").cast("double")
    sy, sm = F.col("sy").cast("double"), F.col("sm").cast("double")
    r = sy / sm
    # sample covariances of unit totals
    vyy = (F.col("syy").cast("double") - sy * sy / n) / (n - 1)
    vym = (F.col("sym").cast("double") - sy * sm / n) / (n - 1)
    vmm = (F.col("smm").cast("double") - sm * sm / n) / (n - 1)
    mean_m = sm / n
    var_r = (vyy - 2 * r * vym + r * r * vmm) / (n * mean_m * mean_m)
    return agg.select(
        "arm",
        "n",
        F.round(r, 6).alias("ratio"),
        F.round(F.sqrt(var_r), 6).alias("se_delta"),
    ).orderBy("arm")


Q_DELTA_SQL = f"""
WITH units AS (
  SELECT {_ARM_SQL} AS arm, y, m
  FROM (
    SELECT o_custkey AS c_custkey,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DECIMAL(18,2)) AS y,
           COUNT(*) AS m
    FROM orders GROUP BY 1) u
  JOIN customer USING (c_custkey)),
agg AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy, SUM(m) AS sm,
         SUM(y * y) AS syy, SUM(y * m) AS sym, SUM(m * m) AS smm
  FROM units GROUP BY arm)
SELECT arm, n,
       ROUND(CAST(sy AS DOUBLE) / CAST(sm AS DOUBLE), 6) AS ratio,
       ROUND(SQRT(((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
                   - 2 * (CAST(sy AS DOUBLE) / CAST(sm AS DOUBLE))
                     * ((CAST(sym AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1))
                   + (CAST(sy AS DOUBLE) / CAST(sm AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(sm AS DOUBLE))
                     * ((CAST(smm AS DOUBLE) - CAST(sm AS DOUBLE) * CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)))
                  / (CAST(n AS DOUBLE) * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(sm AS DOUBLE) / CAST(n AS DOUBLE)))), 6) AS se_delta
FROM agg
ORDER BY arm
"""

QUERIES["q_delta_method_ratio"] = QuerySpec(
    q_delta_method_ratio,
    Q_DELTA_SQL,
    "delta-method SE for the revenue-per-order ratio metric, "
    "customer as randomization unit — decimal cross-moments per arm",
)


# ---------------------------------------------- post-stratification
# Arm means of o_totalprice reweighted to the GLOBAL market-segment
# mix: psm = Σ_s W_s · mean(arm, s). Removes segment-imbalance bias.


def q_post_stratification(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    base = orders.join(
        F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")
    ).select(
        _arm().alias("arm"),
        "c_mktsegment",
        F.col("o_totalprice").cast("decimal(15,2)").alias("y"),
    )
    weights = base.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("nw"))
    tot = weights.agg(F.sum("nw").alias("ntot"))
    cell = base.groupBy("arm", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("nc"), F.sum("y").alias("sc")
    )
    j = cell.join(F.broadcast(weights), "c_mktsegment").crossJoin(F.broadcast(tot))
    strat_term = (
        F.col("nw").cast("double") / F.col("ntot").cast("double")
    ) * (F.col("sc").cast("double") / F.col("nc").cast("double"))
    agg = j.groupBy("arm").agg(
        F.sum("nc").cast("long").alias("n"),
        F.sum(F.col("sc")).cast("double").alias("sy"),
        F.sum(F.round(strat_term, 9).cast("decimal(28,9)")).alias("psm"),
    )
    return agg.select(
        "arm",
        "n",
        F.round(F.col("sy") / F.col("n").cast("double"), 6).alias("raw_mean"),
        F.round(F.col("psm").cast("double"), 6).alias("post_strat_mean"),
    ).orderBy("arm")


Q_POST_STRAT_SQL = f"""
WITH base AS (
  SELECT {_ARM_SQL} AS arm, c_mktsegment,
         CAST(o_totalprice AS DECIMAL(15,2)) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey),
weights AS (SELECT c_mktsegment, COUNT(*) AS nw FROM base GROUP BY 1),
tot AS (SELECT SUM(nw) AS ntot FROM weights),
cell AS (
  SELECT arm, c_mktsegment, COUNT(*) AS nc, SUM(y) AS sc
  FROM base GROUP BY 1, 2),
agg AS (
  SELECT arm, CAST(SUM(nc) AS BIGINT) AS n, CAST(SUM(sc) AS DOUBLE) AS sy,
         SUM(CAST(ROUND((CAST(nw AS DOUBLE) / CAST(ntot AS DOUBLE))
                        * (CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)), 9)
                  AS DECIMAL(28,9))) AS psm
  FROM cell JOIN weights USING (c_mktsegment) CROSS JOIN tot
  GROUP BY arm)
SELECT arm, n,
       ROUND(sy / CAST(n AS DOUBLE), 6) AS raw_mean,
       ROUND(CAST(psm AS DOUBLE), 6) AS post_strat_mean
FROM agg
ORDER BY arm
"""

QUERIES["q_post_stratification"] = QuerySpec(
    q_post_stratification,
    Q_POST_STRAT_SQL,
    "post-stratified arm means at the global segment mix — k-row "
    "cell/weight joins, pinned-decimal reweighted sum",
)


# ------------------------------------------- Bayesian prob-of-best
# Conversion = customer placed a 1-URGENT order. Beta(1+s, 1+f)
# posteriors per arm; P(B > A) through the normal approximation with
# the pinned Φ — honest label: an approximation, but a PINNED one.


def q_bayes_prob_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")
    conv = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("c_custkey"))
        .distinct()
        .withColumn("converted", F.lit(1))
    )
    units = cust.join(conv, "c_custkey", "left").select(
        _arm().alias("arm"), F.coalesce("converted", F.lit(0)).alias("c")
    )
    agg = units.groupBy("arm").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("c").cast("long").alias("s"),
    )
    post = agg.select(
        "arm",
        "n",
        "s",
        (F.col("s") + 1).cast("double").alias("alpha"),
        (F.col("n") - F.col("s") + 1).cast("double").alias("beta"),
    )
    a = post.where(F.col("arm") == "A").select(
        F.col("n").alias("n_a"),
        F.col("s").alias("s_a"),
        F.col("alpha").alias("aa"),
        F.col("beta").alias("ba"),
    )
    b = post.where(F.col("arm") == "B").select(
        F.col("n").alias("n_b"),
        F.col("s").alias("s_b"),
        F.col("alpha").alias("ab"),
        F.col("beta").alias("bb"),
    )
    j = a.crossJoin(b)
    mean = lambda al, be: al / (al + be)  # noqa: E731
    var = lambda al, be: al * be / ((al + be) * (al + be) * (al + be + 1))  # noqa: E731
    z = (mean(F.col("ab"), F.col("bb")) - mean(F.col("aa"), F.col("ba"))) / F.sqrt(
        var(F.col("aa"), F.col("ba")) + var(F.col("ab"), F.col("bb"))
    )
    return j.select(
        "n_a",
        "s_a",
        "n_b",
        "s_b",
        F.round(mean(F.col("aa"), F.col("ba")), 6).alias("post_mean_a"),
        F.round(mean(F.col("ab"), F.col("bb")), 6).alias("post_mean_b"),
        F.round(_phi(z), 6).alias("p_b_beats_a"),
    )


_Z_EXPR = (
    "((ab / (ab + bb)) - (aa / (aa + ba)))"
    " / SQRT(aa * ba / ((aa + ba) * (aa + ba) * (aa + ba + 1))"
    " + ab * bb / ((ab + bb) * (ab + bb) * (ab + bb + 1)))"
)

Q_BAYES_SQL = f"""
WITH conv AS (
  SELECT DISTINCT o_custkey AS c_custkey FROM orders
  WHERE o_orderpriority = '1-URGENT'),
units AS (
  SELECT {_ARM_SQL} AS arm,
         CASE WHEN conv.c_custkey IS NULL THEN 0 ELSE 1 END AS c
  FROM customer LEFT JOIN conv USING (c_custkey)),
agg AS (
  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(c) AS BIGINT) AS s
  FROM units GROUP BY arm),
post AS (
  SELECT arm, n, s, CAST(s + 1 AS DOUBLE) AS alpha,
         CAST(n - s + 1 AS DOUBLE) AS beta FROM agg),
j AS (
  SELECT a.n AS n_a, a.s AS s_a, b.n AS n_b, b.s AS s_b,
         a.alpha AS aa, a.beta AS ba, b.alpha AS ab, b.beta AS bb
  FROM post a CROSS JOIN post b
  WHERE a.arm = 'A' AND b.arm = 'B')
SELECT n_a, s_a, n_b, s_b,
       ROUND(aa / (aa + ba), 6) AS post_mean_a,
       ROUND(ab / (ab + bb), 6) AS post_mean_b,
       ROUND({_PHI_SQL.format(z=_Z_EXPR)}, 6) AS p_b_beats_a
FROM j
"""

QUERIES["q_bayes_prob_best"] = QuerySpec(
    q_bayes_prob_best,
    Q_BAYES_SQL,
    "Bayesian P(B beats A) for conversion arms — Beta posteriors, "
    "pinned-Φ normal approximation",
)
