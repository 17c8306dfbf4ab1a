"""Round-9 surface extensions, batch Z (SURVEY §2.3 N r9): the last
two classical-inference holes — the odds ratio with its Wald interval
(the 2×2 effect size q_chi2_feature_select tests but never reports)
and two-way ANOVA with interaction (main effects + interaction F
statistics from cell means; the one-way form lives in
q_seasonality_strength).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Both are one partial-agg pass to a domain-bounded cell table; counts
stay integers until the final formulas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------- odds ratio + Wald 95% interval
# Exposure: md5 arm over users; outcome: the user ever purchases.
# OR = (a·d)/(b·c); ln-OR ± 1.96·√(1/a+1/b+1/c+1/d). Integer cells,
# three float expressions at the end.


def q_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    )
    per_user = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias("y")
    )
    cells = per_user.groupBy().agg(
        F.sum(F.when((arm == 1) & (F.col("y") == 1), 1).otherwise(0)).alias("a"),
        F.sum(F.when((arm == 1) & (F.col("y") == 0), 1).otherwise(0)).alias("b"),
        F.sum(F.when((arm == 0) & (F.col("y") == 1), 1).otherwise(0)).alias("c"),
        F.sum(F.when((arm == 0) & (F.col("y") == 0), 1).otherwise(0)).alias("d"),
    )
    ratio = (F.col("a").cast("double") * F.col("d")) / F.nullif(
        F.col("b").cast("double") * F.col("c"), F.lit(0.0)
    )
    ln_or = F.log(F.nullif(ratio, F.lit(0.0)))  # LN(0): NULL both engines
    nz = lambda c: F.nullif(c.cast("double"), F.lit(0.0))
    se = F.sqrt(
        1.0 / nz(F.col("a")) + 1.0 / nz(F.col("b"))
        + 1.0 / nz(F.col("c")) + 1.0 / nz(F.col("d"))
    )
    return cells.select(
        F.col("a").cast("long").alias("exposed_cases"),
        F.col("b").cast("long").alias("exposed_noncases"),
        F.col("c").cast("long").alias("unexposed_cases"),
        F.col("d").cast("long").alias("unexposed_noncases"),
        F.round(F.exp(ln_or), 6).alias("odds_ratio"),
        F.round(F.exp(ln_or - 1.96 * se), 6).alias("ci_low"),
        F.round(F.exp(ln_or + 1.96 * se), 6).alias("ci_high"),
    )


Q_ODDS_SQL = """
WITH per_user AS (
  SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS y
  FROM events GROUP BY user_id),
cells AS (
  SELECT SUM(CASE WHEN arm = 1 AND y = 1 THEN 1 ELSE 0 END) AS a,
         SUM(CASE WHEN arm = 1 AND y = 0 THEN 1 ELSE 0 END) AS b,
         SUM(CASE WHEN arm = 0 AND y = 1 THEN 1 ELSE 0 END) AS c,
         SUM(CASE WHEN arm = 0 AND y = 0 THEN 1 ELSE 0 END) AS d
  FROM per_user)
SELECT CAST(a AS BIGINT) AS exposed_cases, CAST(b AS BIGINT) AS exposed_noncases,
       CAST(c AS BIGINT) AS unexposed_cases, CAST(d AS BIGINT) AS unexposed_noncases,
       ROUND(EXP(LN(NULLIF(CAST(a AS DOUBLE) * d / NULLIF(CAST(b AS DOUBLE) * c, 0.0), 0.0))), 6)
         AS odds_ratio,
       ROUND(EXP(LN(NULLIF(CAST(a AS DOUBLE) * d / NULLIF(CAST(b AS DOUBLE) * c, 0.0), 0.0))
                 - 1.96 * SQRT(1.0/NULLIF(CAST(a AS DOUBLE), 0.0)
                               + 1.0/NULLIF(CAST(b AS DOUBLE), 0.0)
                               + 1.0/NULLIF(CAST(c AS DOUBLE), 0.0)
                               + 1.0/NULLIF(CAST(d AS DOUBLE), 0.0))), 6) AS ci_low,
       ROUND(EXP(LN(NULLIF(CAST(a AS DOUBLE) * d / NULLIF(CAST(b AS DOUBLE) * c, 0.0), 0.0))
                 + 1.96 * SQRT(1.0/NULLIF(CAST(a AS DOUBLE), 0.0)
                               + 1.0/NULLIF(CAST(b AS DOUBLE), 0.0)
                               + 1.0/NULLIF(CAST(c AS DOUBLE), 0.0)
                               + 1.0/NULLIF(CAST(d AS DOUBLE), 0.0))), 6) AS ci_high
FROM cells
"""

QUERIES["q_odds_ratio"] = QuerySpec(
    q_odds_ratio,
    Q_ODDS_SQL,
    "2×2 odds ratio (md5 exposure × ever-purchases) with the Wald "
    "95% interval — integer cells, three float expressions",
)


# ------------------------ two-way ANOVA with interaction
# Factors: order priority (A) × order status (B); response: total
# price. Balanced-design Type-I sums of squares from the cell-mean
# decomposition: SSA = Σ n_a(ȳ_a − ȳ)², SSB likewise, SSAB from cell
# means minus main effects, SSE = within-cell. For the fixture's
# unbalanced counts the decomposition is the standard
# weighted-cell-means form — identical formula both engines, which is
# what the oracle pins. One pass to |A|×|B| cells.


def q_two_way_anova(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("fa"),
        F.col("o_orderstatus").alias("fb"),
        F.col("o_totalprice").alias("y"),
    )
    cells = orders.groupBy("fa", "fb").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("q"),
    ).localCheckpoint()
    tot = cells.agg(
        F.sum("n").alias("n_tot"), F.sum("s").alias("s_tot"), F.sum("q").alias("q_tot")
    )
    a_m = cells.groupBy("fa").agg(F.sum("n").alias("na"), F.sum("s").alias("sa"))
    b_m = cells.groupBy("fb").agg(F.sum("n").alias("nb"), F.sum("s").alias("sb"))
    ssa = (
        a_m.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.col("sa") * F.col("sa") / F.col("na")).alias("x"),
            F.max(F.col("s_tot") * F.col("s_tot") / F.col("n_tot")).alias("cf"),
            F.max("n_tot").alias("n_tot"),
        )
        .select((F.col("x") - F.col("cf")).alias("ssa"), "n_tot")
    )
    ssb = (
        b_m.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.col("sb") * F.col("sb") / F.col("nb")).alias("x"),
            F.max(F.col("s_tot") * F.col("s_tot") / F.col("n_tot")).alias("cf"),
        )
        .select((F.col("x") - F.col("cf")).alias("ssb"))
    )
    sscells = (
        cells.crossJoin(F.broadcast(tot))
        .agg(
            F.sum(F.col("s") * F.col("s") / F.col("n")).alias("x"),
            F.max(F.col("s_tot") * F.col("s_tot") / F.col("n_tot")).alias("cf"),
            F.max("q_tot").alias("q_tot"),
            F.count(F.lit(1)).alias("n_cells"),
            F.count_distinct("fa").alias("ka"),
            F.count_distinct("fb").alias("kb"),
        )
        .select(
            (F.col("x") - F.col("cf")).alias("sscells"),
            (F.col("q_tot") - F.col("x")).alias("sse"),
            "n_cells",
            "ka",
            "kb",
        )
    )
    j = ssa.crossJoin(F.broadcast(ssb)).crossJoin(F.broadcast(sscells))
    ssab = F.col("sscells") - F.col("ssa") - F.col("ssb")
    dfa = F.col("ka") - 1
    dfb = F.col("kb") - 1
    dfab = F.col("n_cells") - F.col("ka") - F.col("kb") + 1
    dfe = F.col("n_tot") - F.col("n_cells")
    return j.select(
        F.col("n_tot").cast("long").alias("n"),
        F.round((F.col("ssa") / dfa) / (F.col("sse") / dfe), 6).alias("f_priority"),
        F.round((F.col("ssb") / dfb) / (F.col("sse") / dfe), 6).alias("f_status"),
        F.round((ssab / dfab) / (F.col("sse") / dfe), 6).alias("f_interaction"),
    )


Q_TWO_WAY_SQL = """
WITH cells AS (
  SELECT o_orderpriority AS fa, o_orderstatus AS fb,
         COUNT(*) AS n, SUM(o_totalprice) AS s,
         SUM(o_totalprice * o_totalprice) AS q
  FROM orders GROUP BY 1, 2),
tot AS (SELECT SUM(n) AS N, SUM(s) AS S, SUM(q) AS Q FROM cells),
a_m AS (SELECT fa, SUM(n) AS na, SUM(s) AS sa FROM cells GROUP BY fa),
b_m AS (SELECT fb, SUM(n) AS nb, SUM(s) AS sb FROM cells GROUP BY fb),
parts AS (
  SELECT
    (SELECT SUM(sa * sa / na) FROM a_m) - S * S / N AS ssa,
    (SELECT SUM(sb * sb / nb) FROM b_m) - S * S / N AS ssb,
    (SELECT SUM(s * s / n) FROM cells) - S * S / N AS sscells,
    Q - (SELECT SUM(s * s / n) FROM cells) AS sse,
    (SELECT COUNT(*) FROM cells) AS n_cells,
    (SELECT COUNT(DISTINCT fa) FROM cells) AS ka,
    (SELECT COUNT(DISTINCT fb) FROM cells) AS kb,
    N
  FROM tot)
SELECT CAST(N AS BIGINT) AS n,
       ROUND((ssa / (ka - 1)) / (sse / (N - n_cells)), 6) AS f_priority,
       ROUND((ssb / (kb - 1)) / (sse / (N - n_cells)), 6) AS f_status,
       ROUND(((sscells - ssa - ssb) / (n_cells - ka - kb + 1))
             / (sse / (N - n_cells)), 6) AS f_interaction
FROM parts
"""

QUERIES["q_two_way_anova"] = QuerySpec(
    q_two_way_anova,
    Q_TWO_WAY_SQL,
    "two-way ANOVA (priority × status on price): main-effect and "
    "interaction F from the weighted cell-mean decomposition",
)
