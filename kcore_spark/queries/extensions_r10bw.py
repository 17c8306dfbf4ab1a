"""Round-10 surface extensions, batch BW (SURVEY §2.3 N r10): the
variance-homogeneity block, second wave — Bartlett's test (the
likelihood-ratio test for equal variances across the five order
priorities, exact under normality), Conover's squared-ranks test (the
nonparametric alternative that survives heavy tails, with proper
average-rank tie handling), and the quick-screen pair Cochran's C +
Hartley's Fmax (is one group's variance dominating?). Completes the
scale-test family next to q_levene_test (Brown-Forsythe) and the
location tests q_kruskal_wallis / q_yuen_test.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: group moments are cents-decimal sums; per-group ln/ratio
terms are rounded to fixed scale and decimal-summed; the squared-ranks
tie table is integer-keyed (cents of |x - mean|), so average ranks are
exact halves in both engines.
Scale: Bartlett/Cochran fold one orders scan to 5 group-moment rows;
Conover follows the q_mann_whitney distinct-value rank-walk shape —
the only global window runs over the value-domain tie table
(adjudicated), never the raw rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _group_var(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-priority sample variance of o_totalprice via decimal moments."""
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    g = orders.groupBy("grp").agg(
        F.count(F.lit(1)).cast("long").alias("n_i"),
        F.sum(F.col("cents").cast("decimal(38,0)")).alias("s1"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)")).alias("s2"),
    )
    nd = F.col("n_i").cast("double")
    var = (
        (nd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2)
        / (nd * (nd - 1.0))
        / 10000.0
    )
    return g.select("grp", "n_i", var.alias("var_i"))


_GVAR_SQL = """
  SELECT grp, n_i,
         (CAST(n_i AS DOUBLE) * CAST(s2 AS DOUBLE)
          - POWER(CAST(s1 AS DOUBLE), 2))
         / (CAST(n_i AS DOUBLE) * (CAST(n_i AS DOUBLE) - 1.0)) / 10000.0 AS var_i
  FROM (
    SELECT o_orderpriority AS grp,
           CAST(COUNT(*) AS BIGINT) AS n_i,
           SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                    AS DECIMAL(38,0))) AS s1,
           SUM(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                    * CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                    AS DECIMAL(38,0))) AS s2
    FROM orders GROUP BY 1)
"""


# ---------------------------------------------------------- Bartlett
# X^2 = [(N-k) ln Sp^2 - sum (n_i-1) ln s_i^2] / C,
# C = 1 + (sum 1/(n_i-1) - 1/(N-k)) / (3(k-1)).


def q_bartlett_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    gv = _group_var(spark, sf_dir)
    terms = gv.select(
        "n_i",
        F.round((F.col("n_i") - 1) * F.col("var_i"), 6)
        .cast("decimal(38,6)")
        .alias("w_var"),
        F.round((F.col("n_i") - 1) * F.log("var_i"), 10)
        .cast("decimal(38,10)")
        .alias("w_ln"),
        F.round(1.0 / (F.col("n_i") - 1), 14).cast("decimal(38,14)").alias("inv"),
    )
    agg = terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n_i").cast("long").alias("n"),
        F.sum("w_var").cast("double").alias("s_wvar"),
        F.sum("w_ln").cast("double").alias("s_wln"),
        F.sum("inv").cast("double").alias("s_inv"),
    )
    nk = (F.col("n") - F.col("k")).cast("double")
    kd = F.col("k").cast("double")
    sp2 = F.col("s_wvar") / nk
    c = 1.0 + (F.col("s_inv") - 1.0 / nk) / (3.0 * (kd - 1.0))
    chi2 = (nk * F.log(sp2) - F.col("s_wln")) / c
    return agg.select(
        "k",
        "n",
        (F.col("k") - 1).cast("long").alias("df"),
        F.round(sp2, 4).alias("pooled_var"),
        F.round(chi2, 6).alias("chi2_bartlett"),
    )


Q_BARTLETT_SQL = f"""
WITH gv AS ({_GVAR_SQL}),
terms AS (
  SELECT n_i,
         CAST(ROUND((n_i - 1) * var_i, 6) AS DECIMAL(38,6)) AS w_var,
         CAST(ROUND((n_i - 1) * LN(var_i), 10) AS DECIMAL(38,10)) AS w_ln,
         CAST(ROUND(1.0 / (n_i - 1), 14) AS DECIMAL(38,14)) AS inv
  FROM gv),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(n_i) AS BIGINT) AS n,
         CAST(SUM(w_var) AS DOUBLE) AS s_wvar,
         CAST(SUM(w_ln) AS DOUBLE) AS s_wln,
         CAST(SUM(inv) AS DOUBLE) AS s_inv
  FROM terms)
SELECT k, n, CAST(k - 1 AS BIGINT) AS df,
       ROUND(s_wvar / CAST(n - k AS DOUBLE), 4) AS pooled_var,
       ROUND((CAST(n - k AS DOUBLE) * LN(s_wvar / CAST(n - k AS DOUBLE)) - s_wln)
             / (1.0 + (s_inv - 1.0 / CAST(n - k AS DOUBLE))
                      / (3.0 * (CAST(k AS DOUBLE) - 1.0))), 6) AS chi2_bartlett
FROM agg
"""

QUERIES["q_bartlett_test"] = QuerySpec(
    q_bartlett_test,
    Q_BARTLETT_SQL,
    "Bartlett equal-variance test across order priorities — decimal "
    "group moments, 5-row term fold",
)


# ------------------------------------------------ Conover squared ranks
# Rank |x - mean_g| over the pooled sample (average ranks via the
# integer-keyed distinct-value tie table), z = rank^2;
# T = (sum_i S_i^2/n_i - N zbar^2) / D^2, D^2 = (sum z^2 - N zbar^2)/(N-1).


def q_conover_squared_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    mu = orders.groupBy("grp").agg(
        (
            F.sum(F.col("cents").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        ).alias("mu")
    )
    dev = orders.join(F.broadcast(mu), "grp").select(
        "grp",
        F.round(F.abs(F.col("cents") - F.col("mu")), 0).cast("long").alias("v"),
    )
    gv = dev.groupBy("grp", "v").agg(F.count(F.lit(1)).cast("long").alias("c_gv"))
    vals = gv.groupBy("v").agg(F.sum("c_gv").cast("long").alias("t"))
    # the |deviation| tie table is order-count-sized (149,551 distinct
    # at sf0.1, 10.0x per 10x data — r12 bounded-domain probe): rank
    # walk on _dist_cumsum (cum_before = inclusive prefix − own count)
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    ranked = _dist_cumsum(vals, [F.col("v")], "t", out_col="cum").withColumn(
        "cum_before", F.col("cum") - F.col("t")
    ).select(
        "v",
        "t",
        (F.col("cum_before") + (F.col("t") + 1) / 2.0).alias("r"),
    )
    z = ranked.select("v", "t", (F.col("r") * F.col("r")).alias("z"))
    tot = z.agg(
        F.sum("t").cast("long").alias("n"),
        F.sum(F.round(F.col("t") * F.col("z"), 4).cast("decimal(38,4)"))
        .cast("double")
        .alias("s_z"),
        F.sum(
            F.round(F.col("t") * F.col("z") * F.col("z"), 4).cast("decimal(38,4)")
        )
        .cast("double")
        .alias("s_z2"),
    )
    s_i = (
        gv.join(z.select("v", "z"), "v")
        .groupBy("grp")
        .agg(
            F.sum("c_gv").cast("long").alias("n_i"),
            F.sum(F.round(F.col("c_gv") * F.col("z"), 4).cast("decimal(38,4)"))
            .cast("double")
            .alias("s_gi"),
        )
    )
    num_terms = s_i.select(
        F.round(F.col("s_gi") * F.col("s_gi") / F.col("n_i"), 4)
        .cast("decimal(38,4)")
        .alias("t2"),
    )
    num = num_terms.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("t2").cast("double").alias("s_t2"),
    )
    j = num.crossJoin(F.broadcast(tot))
    nd = F.col("n").cast("double")
    zbar = F.col("s_z") / nd
    d2 = (F.col("s_z2") - nd * zbar * zbar) / (nd - 1.0)
    t_stat = (F.col("s_t2") - nd * zbar * zbar) / d2
    return j.select(
        "k",
        "n",
        (F.col("k") - 1).cast("long").alias("df"),
        F.round(t_stat, 6).alias("t_conover"),
    )


Q_CONOVER_SQL = """
WITH o AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders),
mu AS (
  SELECT grp,
         CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) / COUNT(*) AS mu
  FROM o GROUP BY grp),
dev AS (
  SELECT o.grp, CAST(ROUND(ABS(cents - mu), 0) AS BIGINT) AS v
  FROM o JOIN mu ON o.grp = mu.grp),
gv AS (SELECT grp, v, CAST(COUNT(*) AS BIGINT) AS c_gv FROM dev GROUP BY 1, 2),
vals AS (SELECT v, CAST(SUM(c_gv) AS BIGINT) AS t FROM gv GROUP BY v),
ranked AS (
  SELECT v, t,
         COALESCE(SUM(t) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING), 0) + (t + 1) / 2.0 AS r
  FROM vals),
z AS (SELECT v, t, r * r AS z FROM ranked),
tot AS (
  SELECT CAST(SUM(t) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(t * z, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s_z,
         CAST(SUM(CAST(ROUND(t * z * z, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s_z2
  FROM z),
s_i AS (
  SELECT grp, CAST(SUM(c_gv) AS BIGINT) AS n_i,
         CAST(SUM(CAST(ROUND(c_gv * z, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s_gi
  FROM gv JOIN z ON gv.v = z.v GROUP BY grp),
num AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(ROUND(s_gi * s_gi / n_i, 4) AS DECIMAL(38,4)))
              AS DOUBLE) AS s_t2
  FROM s_i)
SELECT k, n, CAST(k - 1 AS BIGINT) AS df,
       ROUND((s_t2 - CAST(n AS DOUBLE) * (s_z / n) * (s_z / n))
             / ((s_z2 - CAST(n AS DOUBLE) * (s_z / n) * (s_z / n))
                / (CAST(n AS DOUBLE) - 1.0)), 6) AS t_conover
FROM num CROSS JOIN tot
"""

QUERIES["q_conover_squared_ranks"] = QuerySpec(
    q_conover_squared_ranks,
    Q_CONOVER_SQL,
    "Conover squared-ranks variance test — integer-keyed tie table, "
    "average-rank walk over the value domain (q_mann_whitney shape)",
)


# ----------------------------------------------- Cochran's C + Hartley
# C = max s_i^2 / sum s_i^2; Fmax = max s_i^2 / min s_i^2.


def q_cochran_c(spark: SparkSession, sf_dir: str) -> DataFrame:
    gv = _group_var(spark, sf_dir)
    ranked = gv.select(
        "grp",
        "n_i",
        "var_i",
        F.round("var_i", 4).alias("v4"),
    )
    agg = ranked.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.max(F.struct(F.col("v4"), F.col("grp"))).alias("mx"),
        F.min(F.struct(F.col("v4"), F.col("grp"))).alias("mn"),
        F.sum(F.round("var_i", 4).cast("decimal(38,4)")).cast("double").alias("s_v"),
    )
    return agg.select(
        "k",
        F.col("mx.grp").alias("max_group"),
        F.round(F.col("mx.v4") / F.col("s_v"), 6).alias("cochran_c"),
        F.round(F.col("mx.v4") / F.col("mn.v4"), 6).alias("hartley_fmax"),
    )


Q_COCHRAN_SQL = f"""
WITH gv AS ({_GVAR_SQL}),
r AS (SELECT grp, ROUND(var_i, 4) AS v4 FROM gv),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         MAX(v4) AS max_v, MIN(v4) AS min_v,
         CAST(SUM(CAST(ROUND(v4, 4) AS DECIMAL(38,4))) AS DOUBLE) AS s_v
  FROM r),
mg AS (
  -- tie-break matches Spark's MAX(STRUCT(v4, grp)): largest grp wins
  SELECT grp AS max_group FROM r
  WHERE v4 = (SELECT max_v FROM agg) ORDER BY grp DESC LIMIT 1)
SELECT k, max_group,
       ROUND(max_v / s_v, 6) AS cochran_c,
       ROUND(max_v / min_v, 6) AS hartley_fmax
FROM agg CROSS JOIN mg
"""

QUERIES["q_cochran_c"] = QuerySpec(
    q_cochran_c,
    Q_COCHRAN_SQL,
    "Cochran's C + Hartley Fmax variance-dominance screen across "
    "priorities — 5-row struct max/min fold",
)
