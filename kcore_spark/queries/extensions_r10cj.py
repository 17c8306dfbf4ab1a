"""Round-10 surface extensions, batch CJ (SURVEY §2.3 N r10): the
robust-nonparametrics block, second wave — the Hodges-Lehmann
pseudomedian of daily revenue changes (the median of Walsh averages:
the estimator behind the Wilcoxon test, robust yet ~95% efficient),
the sign test on week-over-week (lag-7) revenue pairs (the assumption-
free workhorse q_wilcoxon_signed_rank refines), and Mood's median test
(k-sample location via above/below-median counts — the coarse but
outlier-immune cousin of q_kruskal_wallis). All medians are EXACT,
found by cumulative walks over integer-cent value domains.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: Walsh sums and prices live in integer cents (doubled
units dodge half-cent floats); lower/upper median positions are pinned
floor((N+1)/2)/floor((N+2)/2); the pinned A&S Phi gives the sign-test
p-value; Mood ties at the median are pinned into "below".
Scale: the Walsh self-cross is over the CALENDAR-BOUNDED daily-diff
series (adjudicated); Mood folds the corpus to a distinct-price tie
table (the q_impute_missing global-median-walk precedent) and a 10-cell
contingency.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10ai import _phi, _PHI_SQL

QUERIES: dict[str, QuerySpec] = {}


def _diffs(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("d")
    return (
        daily.withColumn("prev", F.lag("cents").over(w))
        .where(F.col("prev").isNotNull())
        .select((F.col("cents") - F.col("prev")).alias("dc"))
    )


_DIFFS_SQL = """
  daily AS (
    SELECT CAST(o_orderdate AS DATE) AS d,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0)))
                AS BIGINT) AS cents
    FROM orders GROUP BY 1),
  diffs AS (
    SELECT cents - prev AS dc FROM (
      SELECT cents, LAG(cents) OVER (ORDER BY d) AS prev FROM daily)
    WHERE prev IS NOT NULL)
"""


def q_hodges_lehmann(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _diffs(spark, sf_dir)
    a = d.select(F.col("dc").alias("da")).withColumn(
        "ia", F.row_number().over(Window.orderBy("da"))
    )
    b = d.select(F.col("dc").alias("db")).withColumn(
        "ib", F.row_number().over(Window.orderBy("db"))
    )
    # spread the left side back over the cluster before the non-equi
    # pair join — the global row_number left it in one partition
    walsh = (
        a.repartition(a.sparkSession.sparkContext.defaultParallelism, "ia")
        .join(F.broadcast(b), F.col("ia") <= F.col("ib"))
        .select((F.col("da") + F.col("db")).alias("s"))
    )
    # the Walsh domain is calendar-bounded (days^2/2 regardless of
    # corpus size), so the value-table cum walk stays curve-sized; a
    # _dist_rank variant was measured SLOWER here (materializes every
    # pair through a checkpoint) — the bounded walk is the right plan
    vals = walsh.groupBy("s").agg(F.count(F.lit(1)).cast("long").alias("c"))
    wv = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = vals.withColumn("cum", F.sum("c").over(wv))
    tot = walsh.agg(F.count(F.lit(1)).cast("long").alias("n_pairs"))
    j = cum.crossJoin(F.broadcast(tot))
    k1 = F.floor((F.col("n_pairs") + 1) / 2)
    k2 = F.floor((F.col("n_pairs") + 2) / 2)
    lo = j.where(F.col("cum") >= k1).agg(
        F.min("s").alias("s_lo"), F.first("n_pairs").alias("n_pairs")
    )
    hi = j.where(F.col("cum") >= k2).agg(F.min("s").alias("s_hi"))
    return lo.crossJoin(F.broadcast(hi)).select(
        "n_pairs",
        F.round(
            (F.col("s_lo") + F.col("s_hi")).cast("double") / 4.0 / 100.0, 4
        ).alias("hl_daily_change"),
    )


Q_HL_SQL = f"""
WITH {_DIFFS_SQL},
a AS (SELECT dc AS da, ROW_NUMBER() OVER (ORDER BY dc) AS ia FROM diffs),
b AS (SELECT dc AS db, ROW_NUMBER() OVER (ORDER BY dc) AS ib FROM diffs),
walsh AS (SELECT da + db AS s FROM a JOIN b ON ia <= ib),
vals AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS c FROM walsh GROUP BY s),
cum AS (
  SELECT s, SUM(c) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum
  FROM vals),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM walsh),
lo AS (
  SELECT MIN(s) AS s_lo, MIN(n_pairs) AS n_pairs
  FROM cum CROSS JOIN tot WHERE cum >= FLOOR((n_pairs + 1) / 2.0)),
hi AS (
  SELECT MIN(s) AS s_hi
  FROM cum CROSS JOIN tot WHERE cum >= FLOOR((n_pairs + 2) / 2.0))
SELECT n_pairs,
       ROUND(CAST(s_lo + s_hi AS DOUBLE) / 4.0 / 100.0, 4) AS hl_daily_change
FROM lo CROSS JOIN hi
"""

QUERIES["q_hodges_lehmann"] = QuerySpec(
    q_hodges_lehmann,
    Q_HL_SQL,
    "Hodges-Lehmann pseudomedian of daily revenue changes — Walsh "
    "averages over the calendar-bounded diff series, exact median walk",
)


# ------------------------------------------------------------ sign test
# Week-over-week (lag-7) revenue pairs; S = # positive diffs among
# nonzero; z = (S - n/2) / sqrt(n/4); p two-sided via the pinned Phi.


def q_sign_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("decimal(38,0)"))
            .cast("long")
            .alias("cents")
        )
    )
    w = Window.orderBy("d")
    pairs = daily.withColumn("prev7", F.lag("cents", 7).over(w)).where(
        F.col("prev7").isNotNull()
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.sum((F.col("cents") > F.col("prev7")).cast("long")).alias("n_pos"),
        F.sum((F.col("cents") == F.col("prev7")).cast("long")).alias("n_zero"),
    )
    n = (F.col("n_pairs") - F.col("n_zero")).cast("double")
    z = (F.col("n_pos").cast("double") - n / 2.0) / F.sqrt(n / 4.0)
    return agg.select(
        "n_pairs",
        "n_pos",
        "n_zero",
        F.round(z, 6).alias("z_sign"),
        F.round(2.0 * (1.0 - _phi(F.abs(z))), 6).alias("p_two_sided"),
    )


_ZS = (
    "(n_pos - (n_pairs - n_zero) / 2.0)"
    " / SQRT((n_pairs - n_zero) / 4.0)"
)
Q_SIGN_SQL = f"""
WITH daily AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS DECIMAL(38,0)))
              AS BIGINT) AS cents
  FROM orders GROUP BY 1),
pairs AS (
  SELECT cents, prev7 FROM (
    SELECT cents, LAG(cents, 7) OVER (ORDER BY d) AS prev7 FROM daily)
  WHERE prev7 IS NOT NULL),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(SUM(CASE WHEN cents > prev7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_pos,
         CAST(SUM(CASE WHEN cents = prev7 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_zero
  FROM pairs)
SELECT n_pairs, n_pos, n_zero,
       ROUND({_ZS}, 6) AS z_sign,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z=f"ABS({_ZS})")}), 6) AS p_two_sided
FROM agg
"""

QUERIES["q_sign_test"] = QuerySpec(
    q_sign_test,
    Q_SIGN_SQL,
    "sign test on lag-7 daily revenue pairs — integer sign counts, "
    "pinned normal approximation",
)


# ------------------------------------------------- Mood's median test
# Global median order price (lower median, exact walk); 2 x 5 counts of
# above/below by priority; chi2 = sum (O - E)^2 / E, df = k - 1.


def q_mood_median_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("p"),
    )
    # distinct price-cents is order-count-sized (10.0x per 10x data,
    # r12 bounded-domain probe) — median walk on _dist_cumsum
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    vals = orders.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("c"))
    cum = _dist_cumsum(vals, [F.col("p")], "c", out_col="cum")
    tot = orders.agg(F.count(F.lit(1)).cast("long").alias("n"))
    med = (
        cum.crossJoin(F.broadcast(tot))
        .where(F.col("cum") >= F.floor((F.col("n") + 1) / 2))
        .agg(F.min("p").alias("median_p"))
    )
    cells = orders.crossJoin(F.broadcast(med)).groupBy("grp").agg(
        F.sum((F.col("p") > F.col("median_p")).cast("long")).alias("above"),
        F.sum((F.col("p") <= F.col("median_p")).cast("long")).alias("below"),
    )
    marg = cells.agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("above").cast("long").alias("ta"),
        F.sum("below").cast("long").alias("tb"),
    )
    terms = cells.crossJoin(F.broadcast(marg)).select(
        "k",
        F.round(
            (
                F.col("above")
                - (F.col("above") + F.col("below"))
                * F.col("ta")
                / (F.col("ta") + F.col("tb")).cast("double")
            )
            ** 2
            / (
                (F.col("above") + F.col("below"))
                * F.col("ta")
                / (F.col("ta") + F.col("tb")).cast("double")
            )
            + (
                F.col("below")
                - (F.col("above") + F.col("below"))
                * F.col("tb")
                / (F.col("ta") + F.col("tb")).cast("double")
            )
            ** 2
            / (
                (F.col("above") + F.col("below"))
                * F.col("tb")
                / (F.col("ta") + F.col("tb")).cast("double")
            ),
            10,
        )
        .cast("decimal(38,10)")
        .alias("t"),
    )
    return terms.groupBy("k").agg(
        F.round(F.sum("t").cast("double"), 6).alias("chi2_mood"),
    ).select("k", (F.col("k") - 1).cast("long").alias("df"), "chi2_mood")


Q_MOOD_SQL = """
WITH o AS (
  SELECT o_orderpriority AS grp,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS p
  FROM orders),
vals AS (SELECT p, CAST(COUNT(*) AS BIGINT) AS c FROM o GROUP BY p),
cum AS (
  SELECT p, SUM(c) OVER (ORDER BY p ROWS UNBOUNDED PRECEDING) AS cum
  FROM vals),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
med AS (
  SELECT MIN(p) AS median_p FROM cum CROSS JOIN tot
  WHERE cum >= FLOOR((n + 1) / 2.0)),
cells AS (
  SELECT grp,
         CAST(SUM(CASE WHEN p > median_p THEN 1 ELSE 0 END) AS BIGINT)
             AS above,
         CAST(SUM(CASE WHEN p <= median_p THEN 1 ELSE 0 END) AS BIGINT)
             AS below
  FROM o CROSS JOIN med GROUP BY grp),
marg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(above) AS BIGINT) AS ta,
         CAST(SUM(below) AS BIGINT) AS tb
  FROM cells),
terms AS (
  SELECT k,
         CAST(ROUND(
           POWER(above - (above + below) * ta / CAST(ta + tb AS DOUBLE), 2)
             / ((above + below) * ta / CAST(ta + tb AS DOUBLE))
           + POWER(below - (above + below) * tb / CAST(ta + tb AS DOUBLE), 2)
             / ((above + below) * tb / CAST(ta + tb AS DOUBLE)), 10)
         AS DECIMAL(38,10)) AS t
  FROM cells CROSS JOIN marg)
SELECT k, CAST(k - 1 AS BIGINT) AS df,
       ROUND(CAST(SUM(t) AS DOUBLE), 6) AS chi2_mood
FROM terms GROUP BY k
"""

QUERIES["q_mood_median_test"] = QuerySpec(
    q_mood_median_test,
    Q_MOOD_SQL,
    "Mood's median test across order priorities — exact global-median "
    "walk over the cents domain, 10-cell chi-square",
)
