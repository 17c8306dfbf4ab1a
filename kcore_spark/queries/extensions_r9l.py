"""Round-9 surface extensions, batch L (SURVEY §2.3 N r9): the
remaining corners of the nonparametric family — Wilcoxon signed-rank
(the PAIRED complement to q_mann_whitney), the log-rank test (the
two-sample inference step the q_kaplan_meier/q_nelson_aalen estimators
feed), and Theil-Sen robust slope (median-of-pairwise-slopes
regression, the outlier-proof complement to q_ols_slope).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Rank statistics follow the integer-domain tie machinery
(2·avg-rank = 2·below + cnt + 1) over DECIMAL-exact values; pairwise
slope enumeration is SAMPLE-BOUNDED per group (the fan-out-cap
stance), never O(N²) on the raw table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------ Wilcoxon signed-rank (paired test)
# Pairs: per user with both event kinds, mean purchase value vs mean
# view value (each rounded to 6 → DECIMAL-exact differences, so tie
# groups are identical across engines). W+ = Σ ranks of positive
# differences with tie-averaged ranks; normal approximation with the
# tie-corrected variance. Scale: the pair table is |users|-sized; the
# only ordered object is the distinct-|d| tie table.


def q_wilcoxon_signed_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "value")
    per_user = (
        ev.where(F.col("event_type").isin("purchase", "view"))
        .groupBy("user_id")
        .agg(
            F.round(
                F.avg(F.when(F.col("event_type") == "purchase", F.col("value"))), 6
            ).cast("decimal(18,6)").alias("pa"),
            F.round(
                F.avg(F.when(F.col("event_type") == "view", F.col("value"))), 6
            ).cast("decimal(18,6)").alias("pv"),
        )
        .where(F.col("pa").isNotNull() & F.col("pv").isNotNull())
        .select((F.col("pa") - F.col("pv")).alias("d"))
        .where(F.col("d") != 0)
    )
    by_abs = per_user.groupBy(F.abs(F.col("d")).alias("ad")).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum((F.col("d") > 0).cast("int")).alias("pos_cnt"),
    )
    # the |diff| tie table is USER-count-sized (decimal(18,6) per-user
    # average gaps almost never collide — measured 10x per 10x data,
    # r12 bounded-domain probe), so the rank walk runs on the
    # distributed prefix-sum machinery, not a global window
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    ranked = _dist_cumsum(by_abs, [F.col("ad")], "cnt", out_col="cum").withColumn(
        "below", F.col("cum") - F.col("cnt")
    )
    agg = ranked.agg(
        F.sum("cnt").alias("n"),
        # 2·W+ = Σ_pos (2·below + cnt + 1) — integers throughout
        F.sum(F.col("pos_cnt") * (2 * F.col("below") + F.col("cnt") + 1)).alias("two_w_plus"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias("tie3"),
    )
    n = F.col("n")
    w_plus = F.col("two_w_plus") / 2.0
    mean_w = n * (n + 1) / 4.0
    var_w = (n * (n + 1) * (2 * n + 1)).cast("double") / 24.0 - F.col("tie3") / 48.0
    return agg.select(
        n.cast("long").alias("n_pairs"),
        F.round(w_plus, 2).alias("w_plus"),
        # NULL (not ±inf/NaN) when every |d| falls in one tie group —
        # var_w = 0 — so both engines canonicalize identically
        F.round(
            (w_plus - mean_w) / F.nullif(F.sqrt(var_w), F.lit(0.0)), 6
        ).alias("z_stat"),
    )


Q_WILCOXON_SQL = """
WITH per_user AS (
  SELECT CAST(ROUND(AVG(CASE WHEN event_type = 'purchase' THEN value END), 6)
              AS DECIMAL(18,6)) AS pa,
         CAST(ROUND(AVG(CASE WHEN event_type = 'view' THEN value END), 6)
              AS DECIMAL(18,6)) AS pv
  FROM events WHERE event_type IN ('purchase', 'view')
  GROUP BY user_id),
diffs AS (
  SELECT pa - pv AS d FROM per_user
  WHERE pa IS NOT NULL AND pv IS NOT NULL AND pa - pv <> 0),
by_abs AS (
  SELECT ABS(d) AS ad, COUNT(*) AS cnt,
         SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS pos_cnt
  FROM diffs GROUP BY ABS(d)),
ranked AS (
  SELECT *, COALESCE(SUM(cnt) OVER (ORDER BY ad
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS below
  FROM by_abs),
agg AS (
  SELECT SUM(cnt) AS n,
         SUM(pos_cnt * (2 * below + cnt + 1)) AS two_w_plus,
         SUM(cnt * cnt * cnt - cnt) AS tie3
  FROM ranked)
SELECT CAST(n AS BIGINT) AS n_pairs,
       ROUND(two_w_plus / 2.0, 2) AS w_plus,
       ROUND((two_w_plus / 2.0 - n * (n + 1) / 4.0)
             / NULLIF(SQRT(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24.0
                           - tie3 / 48.0), 0.0), 6)
         AS z_stat
FROM agg
"""

QUERIES["q_wilcoxon_signed_rank"] = QuerySpec(
    q_wilcoxon_signed_rank,
    Q_WILCOXON_SQL,
    "Wilcoxon signed-rank (paired purchase-vs-view user means) — "
    "decimal-exact differences, integer-domain tie-averaged ranks, "
    "tie-corrected normal approximation",
)


# ----------------------------------- log-rank test (two-sample)
# The inference step over the q_kaplan_meier life table: split
# customers into two md5 arms, and at every event time compare
# observed group-1 deaths with the hypergeometric expectation
# e1 = d·n1/n; chi² = (Σ(d1−e1))²/Σv with
# v = d·(n1/n)·(1−n1/n)·(n−d)/(n−1). All life-table quantities are
# integers (at-risk via one cumulative window over the curve-sized
# per-time table); the per-time float terms sum once at the end.


def q_logrank_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    life = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.to_date(F.max("o_orderdate")), F.to_date(F.min("o_orderdate"))
        ).alias("dur"),
        (F.count(F.lit(1)) >= 4).cast("int").alias("event"),
    )
    g = (
        F.conv(F.substring(F.md5(F.col("o_custkey").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    )
    life = life.withColumn("g", g)
    per_t = life.groupBy("dur").agg(
        F.sum(F.when(F.col("g") == 1, F.col("event")).otherwise(0)).alias("d1"),
        F.sum(F.when(F.col("g") == 1, 1 - F.col("event")).otherwise(0)).alias("c1"),
        F.sum(F.when(F.col("g") == 0, F.col("event")).otherwise(0)).alias("d0"),
        F.sum(F.when(F.col("g") == 0, 1 - F.col("event")).otherwise(0)).alias("c0"),
    )
    tot = life.groupBy().agg(
        F.sum(F.when(F.col("g") == 1, 1).otherwise(0)).alias("tot1"),
        F.sum(F.when(F.col("g") == 0, 1).otherwise(0)).alias("tot0"),
    )
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    risk = (
        per_t.crossJoin(F.broadcast(tot))
        .withColumn(
            "n1",
            F.col("tot1")
            - F.coalesce(F.sum(F.col("d1") + F.col("c1")).over(w_prev), F.lit(0)),
        )
        .withColumn(
            "n0",
            F.col("tot0")
            - F.coalesce(F.sum(F.col("d0") + F.col("c0")).over(w_prev), F.lit(0)),
        )
        .withColumn("d", F.col("d1") + F.col("d0"))
        .withColumn("n", F.col("n1") + F.col("n0"))
        .where((F.col("d") > 0) & (F.col("n") > 1))
    )
    frac1 = F.col("n1").cast("double") / F.col("n")
    term_e = F.col("d") * frac1
    term_v = (
        F.col("d")
        * frac1
        * (1.0 - frac1)
        * (F.col("n") - F.col("d"))
        / (F.col("n") - 1)
    )
    return risk.agg(
        F.count(F.lit(1)).cast("long").alias("n_event_times"),
        F.sum("d1").cast("long").alias("observed_1"),
        F.round(F.sum(term_e), 6).alias("expected_1"),
        # NULL when ΣV = 0 (an arm empty at every event time) — the
        # statistic is undefined there; NULLIF keeps ANSI mode and the
        # oracle identical
        F.round(
            (F.sum("d1") - F.sum(term_e))
            * (F.sum("d1") - F.sum(term_e))
            / F.nullif(F.sum(term_v), F.lit(0.0)),
            6,
        ).alias("chi2"),
    )


Q_LOGRANK_SQL = """
WITH life AS (
  SELECT o_custkey,
         datediff('day', CAST(MIN(o_orderdate) AS DATE), CAST(MAX(o_orderdate) AS DATE)) AS dur,
         CASE WHEN COUNT(*) >= 4 THEN 1 ELSE 0 END AS event,
         ('0x' || substring(md5(CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT % 2 AS g
  FROM orders GROUP BY o_custkey),
per_t AS (
  SELECT dur,
         SUM(CASE WHEN g = 1 THEN event ELSE 0 END) AS d1,
         SUM(CASE WHEN g = 1 THEN 1 - event ELSE 0 END) AS c1,
         SUM(CASE WHEN g = 0 THEN event ELSE 0 END) AS d0,
         SUM(CASE WHEN g = 0 THEN 1 - event ELSE 0 END) AS c0
  FROM life GROUP BY dur),
tot AS (
  SELECT SUM(CASE WHEN g = 1 THEN 1 ELSE 0 END) AS tot1,
         SUM(CASE WHEN g = 0 THEN 1 ELSE 0 END) AS tot0
  FROM life),
risk AS (
  SELECT dur, d1, d0,
         tot1 - COALESCE(SUM(d1 + c1) OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n1,
         tot0 - COALESCE(SUM(d0 + c0) OVER (ORDER BY dur
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS n0
  FROM per_t CROSS JOIN tot),
terms AS (
  SELECT dur, d1, d1 + d0 AS d, n1 + n0 AS n, n1
  FROM risk WHERE d1 + d0 > 0 AND n1 + n0 > 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_event_times,
       CAST(SUM(d1) AS BIGINT) AS observed_1,
       ROUND(SUM(d * (CAST(n1 AS DOUBLE) / n)), 6) AS expected_1,
       ROUND((SUM(d1) - SUM(d * (CAST(n1 AS DOUBLE) / n)))
             * (SUM(d1) - SUM(d * (CAST(n1 AS DOUBLE) / n)))
             / NULLIF(SUM(d * (CAST(n1 AS DOUBLE) / n) * (1.0 - CAST(n1 AS DOUBLE) / n)
                   * (n - d) / (n - 1)), 0.0), 6) AS chi2
FROM terms
"""

QUERIES["q_logrank_test"] = QuerySpec(
    q_logrank_test,
    Q_LOGRANK_SQL,
    "log-rank test between two md5 customer arms over the "
    "q_kaplan_meier life table — integer at-risk via one cumulative "
    "window, hypergeometric expectation summed once",
)


# ------------------------- Theil-Sen robust slope (sample-bounded)
# Median of pairwise slopes of order value over order age, per
# priority. The estimator is O(m²) in the SAMPLE size m — so m is
# pinned (60 md5-ranked orders per group → ≤1770 pairs per group at
# ANY data scale), the same bounded-shortlist stance as q_mmr_rerank.
# The median interpolates over identically-derived doubles, so both
# engines agree before the 6-digit round.

_TS_SAMPLE = 60


def q_theil_sen(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("y"),
        F.to_date("o_orderdate").alias("d"),
    )
    base = orders.groupBy().agg(F.min("d").alias("d0"))
    u = F.conv(F.substring(F.md5(F.col("k").cast("string")), 1, 8), 16, 10).cast("long")
    w = Window.partitionBy("grp").orderBy(u.asc(), F.col("k").asc())
    samp = (
        orders.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= _TS_SAMPLE)
        .crossJoin(F.broadcast(base))
        .select("grp", "k", "y", F.datediff(F.col("d"), F.col("d0")).alias("x"))
    )
    a = samp.select("grp", F.col("k").alias("k1"), F.col("x").alias("x1"), F.col("y").alias("y1"))
    b = samp.select("grp", F.col("k").alias("k2"), F.col("x").alias("x2"), F.col("y").alias("y2"))
    slopes = (
        a.join(b, "grp")
        .where((F.col("k1") < F.col("k2")) & (F.col("x1") != F.col("x2")))
        .select("grp", ((F.col("y2") - F.col("y1")) / (F.col("x2") - F.col("x1"))).alias("s"))
    )
    return (
        slopes.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_pairs"),
            F.round(F.expr("percentile(s, 0.5)"), 6).alias("theil_sen_slope"),
        )
        .orderBy("grp")
    )


Q_THEIL_SEN_SQL = f"""
WITH base AS (SELECT MIN(CAST(o_orderdate AS DATE)) AS d0 FROM orders),
samp AS (
  SELECT grp, k, y, datediff('day', d0, d) AS x
  FROM (
    SELECT o_orderpriority AS grp, o_orderkey AS k, o_totalprice AS y,
           CAST(o_orderdate AS DATE) AS d,
           ROW_NUMBER() OVER (
             PARTITION BY o_orderpriority
             ORDER BY ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT,
                      o_orderkey) AS rn
    FROM orders) s CROSS JOIN base
  WHERE rn <= {_TS_SAMPLE}),
slopes AS (
  SELECT a.grp, (b.y - a.y) * 1.0 / (b.x - a.x) AS s
  FROM samp a JOIN samp b ON a.grp = b.grp AND a.k < b.k AND a.x <> b.x)
SELECT grp, CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(quantile_cont(s, 0.5), 6) AS theil_sen_slope
FROM slopes
GROUP BY grp
ORDER BY grp
"""

QUERIES["q_theil_sen"] = QuerySpec(
    q_theil_sen,
    Q_THEIL_SEN_SQL,
    "Theil-Sen robust slope per priority: median of pairwise slopes "
    "over a 60-row md5 sample — O(m²) bounded at any data scale",
)
