"""Round-8 surface extensions, part G (SURVEY §2.3 N r8): the
statistics / graph-mining block — Adamic-Adar link prediction,
mutual information + Cramér's V, Mann-Whitney U rank-sum test,
Welch's t-test, Benjamini-Hochberg FDR control, bitmap-backed exact
distinct counting (Spark 3.5+ bitmap aggregates), and integer-exact
autocorrelation of the hourly event series.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: sums that cross rows stay in
integer/decimal domains (rank sums, chi-square numerators, and the
ACF numerator/denominator are computed exactly from integer moments);
doubles appear only in per-cell log/exp terms rounded to 12 dp before
any decimal sum, or in one final division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------ Adamic-Adar link prediction
# Suppliers are bipartite-adjacent to the parts they ship (lineitem);
# the Adamic-Adar score of a supplier pair is sum over common parts w
# of 1/ln(deg(w)), the classic link-prediction feature. Scale shape:
# NEVER all supplier pairs — pairs are generated per part (bounded
# supplier array + map-side double explode), and hub parts above a
# fan-out cap are dropped BEFORE any array is collected (a hub
# part's 1/ln(deg) contribution is tiny and its pair blow-up is
# quadratic — the same df-cutoff stance as the Jaccard/containment
# dedup family). Per-pair terms are rounded to 12 dp and summed as
# decimals so the cross-row sum is order-independent.

AA_MAX_FANOUT = 50
AA_TOPK = 20


def q_link_prediction_aa(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
    ).distinct()
    # Pass 1: degree filter BEFORE any collect, so the per-part supplier
    # array built in pass 2 is provably bounded by AA_MAX_FANOUT even on
    # hub keys (collect_set before the filter would bloat one aggregation
    # buffer per hub at scale). Pass 2: bounded sorted array, then the
    # pairs are generated MAP-SIDE by a double explode — no 600k x 600k
    # self-join, and partial aggregation folds the 8.7M pair terms before
    # the single (s1, s2) shuffle.
    deg = (
        li.groupBy("pk")
        .agg(F.count(F.lit(1)).alias("deg"))
        .where((F.col("deg") >= 2) & (F.col("deg") <= AA_MAX_FANOUT))
    )
    grp = (
        li.join(deg, "pk")
        .groupBy("pk", "deg")
        .agg(F.sort_array(F.collect_set("sk")).alias("ss"))
        .withColumn(
            "term",
            F.round(F.lit(1.0) / F.log(F.col("deg").cast("double")), 12).cast(
                "decimal(20,12)"
            ),
        )
        .repartition(32, "pk")  # AQE under-coalesces the explode stage
    )
    pairs = (
        grp.select("term", F.explode("ss").alias("s1"), "ss")
        .select("term", "s1", F.explode("ss").alias("s2"))
        .where(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.count(F.lit(1)).alias("common_parts"),
            F.sum("term").alias("aa_dec"),
        )
    )
    # top-k via TakeOrderedAndProject (per-partition heads + driver merge),
    # not a row_number window — that would single-partition-sort all pairs.
    return (
        pairs.orderBy(F.col("aa_dec").desc(), "s1", "s2")
        .limit(AA_TOPK)
        .select(
            "s1",
            "s2",
            "common_parts",
            F.round(F.col("aa_dec").cast("double"), 8).alias("aa_score"),
        )
        .orderBy(F.col("aa_score").desc(), "s1", "s2")
    )


Q_AA_SQL = f"""
WITH li AS (
  SELECT DISTINCT l_partkey AS pk, l_suppkey AS sk FROM lineitem),
deg AS (
  SELECT pk, COUNT(*) AS deg,
         CAST(ROUND(1.0 / LN(CAST(COUNT(*) AS DOUBLE)), 12) AS DECIMAL(20,12)) AS term
  FROM li GROUP BY pk
  HAVING COUNT(*) BETWEEN 2 AND {AA_MAX_FANOUT}),
pairs AS (
  SELECT a.sk AS s1, b.sk AS s2, COUNT(*) AS common_parts,
         SUM(d.term) AS aa_dec
  FROM li a JOIN li b ON a.pk = b.pk AND a.sk < b.sk
  JOIN deg d ON d.pk = a.pk
  GROUP BY a.sk, b.sk),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (ORDER BY aa_dec DESC, s1, s2) AS rk FROM pairs)
SELECT s1, s2, common_parts, ROUND(CAST(aa_dec AS DOUBLE), 8) AS aa_score
FROM ranked WHERE rk <= {AA_TOPK}
ORDER BY aa_score DESC, s1, s2
"""

QUERIES["q_link_prediction_aa"] = QuerySpec(
    q_link_prediction_aa,
    Q_AA_SQL,
    "Adamic-Adar link prediction over the supplier-part bipartite graph "
    "(per-part pair generation with fan-out cap, decimal-exact score sum)",
)


# --------------------------- mutual information + Cramér's V
# Dependence between o_orderstatus and o_orderpriority: the full
# r x c contingency table (zero cells included via a marginal cross
# join, so chi-square is the textbook statistic, not an
# observed-cells-only variant). MI terms n_ij*ln(n_ij*n/(n_i*n_j))/n
# have exact-integer log arguments; each double term is rounded to
# 12 dp before the decimal sum. Cramér's V = sqrt(chi2/(n*min(r-1,c-1))).
# The contingency table is tiny (r*c rows) after one partial-agg
# shuffle over the fact table — the scan dominates at scale.


def q_mutual_info(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderstatus").alias("s"), F.col("o_orderpriority").alias("p")
    )
    joint = o.groupBy("s", "p").agg(F.count(F.lit(1)).alias("nij"))
    rows = joint.groupBy("s").agg(F.sum("nij").alias("ni"))
    cols = joint.groupBy("p").agg(F.sum("nij").alias("nj"))
    tot = joint.agg(
        F.sum("nij").alias("n"),
        F.countDistinct("s").alias("r"),
        F.countDistinct("p").alias("c"),
    )
    grid = (
        rows.crossJoin(cols)
        .join(joint, ["s", "p"], "left")
        .withColumn("nij", F.coalesce(F.col("nij"), F.lit(0)))
        .crossJoin(F.broadcast(tot))
    )
    cells = grid.select(
        "n",
        "r",
        "c",
        F.when(
            F.col("nij") > 0,
            F.round(
                F.col("nij").cast("double")
                * F.log(
                    (F.col("nij") * F.col("n")).cast("double")
                    / (F.col("ni") * F.col("nj")).cast("double")
                )
                / F.col("n").cast("double"),
                12,
            ),
        )
        .otherwise(F.lit(0.0))
        .cast("decimal(20,12)")
        .alias("mi_term"),
        F.round(
            F.pow(
                F.col("nij").cast("double")
                - (F.col("ni") * F.col("nj")).cast("double") / F.col("n"),
                2,
            )
            / ((F.col("ni") * F.col("nj")).cast("double") / F.col("n")),
            12,
        )
        .cast("decimal(20,12)")
        .alias("chi_term"),
    )
    agg = cells.groupBy("n", "r", "c").agg(
        F.sum("mi_term").alias("mi_dec"), F.sum("chi_term").alias("chi_dec")
    )
    return agg.select(
        F.col("n").alias("n_orders"),
        F.round(F.col("mi_dec").cast("double"), 8).alias("mi_nats"),
        F.round(F.col("chi_dec").cast("double"), 8).alias("chi2"),
        F.round(
            F.sqrt(
                F.col("chi_dec").cast("double")
                / (F.col("n") * F.least(F.col("r") - 1, F.col("c") - 1)).cast(
                    "double"
                )
            ),
            8,
        ).alias("cramers_v"),
    )


Q_MI_SQL = """
WITH joint AS (
  SELECT o_orderstatus AS s, o_orderpriority AS p, COUNT(*) AS nij
  FROM orders GROUP BY 1, 2),
rows_m AS (SELECT s, SUM(nij) AS ni FROM joint GROUP BY s),
cols_m AS (SELECT p, SUM(nij) AS nj FROM joint GROUP BY p),
tot AS (SELECT SUM(nij) AS n, COUNT(DISTINCT s) AS r, COUNT(DISTINCT p) AS c FROM joint),
grid AS (
  SELECT rows_m.s, cols_m.p, rows_m.ni, cols_m.nj,
         COALESCE(joint.nij, 0) AS nij, tot.n, tot.r, tot.c
  FROM rows_m CROSS JOIN cols_m
  LEFT JOIN joint ON joint.s = rows_m.s AND joint.p = cols_m.p
  CROSS JOIN tot),
cells AS (
  SELECT n, r, c,
         CAST(CASE WHEN nij > 0 THEN ROUND(
              CAST(nij AS DOUBLE) * LN(CAST(nij * n AS DOUBLE) / CAST(ni * nj AS DOUBLE))
              / CAST(n AS DOUBLE), 12) ELSE 0.0 END AS DECIMAL(20,12)) AS mi_term,
         CAST(ROUND(
              POW(CAST(nij AS DOUBLE) - CAST(ni * nj AS DOUBLE) / n, 2)
              / (CAST(ni * nj AS DOUBLE) / n), 12) AS DECIMAL(20,12)) AS chi_term
  FROM grid),
agg AS (
  SELECT n, r, c, SUM(mi_term) AS mi_dec, SUM(chi_term) AS chi_dec
  FROM cells GROUP BY n, r, c)
SELECT CAST(n AS BIGINT) AS n_orders,
       ROUND(CAST(mi_dec AS DOUBLE), 8) AS mi_nats,
       ROUND(CAST(chi_dec AS DOUBLE), 8) AS chi2,
       ROUND(SQRT(CAST(chi_dec AS DOUBLE) / CAST(n * LEAST(r - 1, c - 1) AS DOUBLE)), 8) AS cramers_v
FROM agg
"""

QUERIES["q_mutual_info"] = QuerySpec(
    q_mutual_info,
    Q_MI_SQL,
    "mutual information + chi-square + Cramér's V over the status x priority "
    "contingency table (zero cells included, 12dp-rounded terms, decimal sums)",
)


# ------------------------------------ Mann-Whitney U rank-sum test
# Nonparametric click-vs-purchase comparison of event values. Ranks
# are midranks over the GROUPED value table (one shuffle to group by
# value, then a window over distinct values — post-aggregate, small),
# so every quantity is exact integer arithmetic: 2*R1 = sum over
# values of n1*(2*cum_before + cnt + 1); the tie-corrected variance
# uses sum(t^3 - t), also integer. Doubles appear only in the final
# z = (U1 - mu)/sigma.


def q_mann_whitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    two = ev.where(F.col("event_type").isin("click", "purchase")).select(
        (F.col("event_type") == "click").cast("int").alias("g1"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("v"),
    )
    vals = two.groupBy("v").agg(
        F.sum("g1").alias("n1c"),
        F.sum(F.lit(1) - F.col("g1")).alias("n2c"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    ranked = vals.withColumn(
        "cum_before", F.coalesce(F.sum(F.col("n1c") + F.col("n2c")).over(w), F.lit(0))
    ).withColumn("t", F.col("n1c") + F.col("n2c"))
    agg = ranked.agg(
        F.sum("n1c").alias("n1"),
        F.sum("n2c").alias("n2"),
        F.sum(F.col("n1c") * (2 * F.col("cum_before") + F.col("t") + 1)).alias(
            "r1_x2"
        ),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    return agg.select(
        "n1",
        "n2",
        ((F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)) / 2.0).alias("u1"),
        F.round(
            (
                (F.col("r1_x2") - F.col("n1") * (F.col("n1") + 1)) / 2.0
                - F.col("n1") * F.col("n2") / 2.0
            )
            / F.sqrt(
                (F.col("n1") * F.col("n2")).cast("double")
                / 12.0
                * (
                    (F.col("n1") + F.col("n2") + 1).cast("double")
                    - F.col("tie3").cast("double")
                    / ((F.col("n1") + F.col("n2")).cast("double")
                       * (F.col("n1") + F.col("n2") - 1).cast("double"))
                )
            ),
            8,
        ).alias("z_score"),
    )


Q_MWU_SQL = """
WITH two AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'purchase')),
vals AS (
  SELECT v, SUM(g1) AS n1c, SUM(1 - g1) AS n2c FROM two GROUP BY v),
ranked AS (
  SELECT *, COALESCE(SUM(n1c + n2c) OVER (ORDER BY v
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before,
         n1c + n2c AS t
  FROM vals),
agg AS (
  SELECT SUM(n1c) AS n1, SUM(n2c) AS n2,
         SUM(n1c * (2 * cum_before + t + 1)) AS r1_x2,
         SUM(t * t * t - t) AS tie3
  FROM ranked)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       (r1_x2 - n1 * (n1 + 1)) / 2.0 AS u1,
       ROUND(((r1_x2 - n1 * (n1 + 1)) / 2.0 - n1 * n2 / 2.0)
             / SQRT(CAST(n1 * n2 AS DOUBLE) / 12.0
                    * (CAST(n1 + n2 + 1 AS DOUBLE)
                       - CAST(tie3 AS DOUBLE)
                         / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 - 1 AS DOUBLE)))), 8) AS z_score
FROM agg
"""

QUERIES["q_mann_whitney"] = QuerySpec(
    q_mann_whitney,
    Q_MWU_SQL,
    "Mann-Whitney U rank-sum test (click vs purchase values; integer midrank "
    "sums over the grouped value table, tie-corrected variance)",
)


# --------------------------------------------- Welch's t-test
# Parametric counterpart: URGENT vs LOW order totals. Sums and sums
# of squares are exact integers over cents; means/variances are
# rationals realized as one double each; t and the Welch-Satterthwaite
# df are final-expression doubles. One partial-agg shuffle.


def q_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderpriority").isin("1-URGENT", "5-LOW")
    )
    g = o.select(
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit("urgent"))
        .otherwise(F.lit("low"))
        .alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    stats = g.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("cents") * F.col("cents")).alias("q"),
    )
    wide = stats.groupBy().pivot("grp", ["urgent", "low"]).agg(
        F.min("n").alias("n"), F.min("s").alias("s"), F.min("q").alias("q")
    )

    def var(nc, sc, qc):
        return (
            qc.cast("double") - sc.cast("double") * sc.cast("double") / nc
        ) / (nc - 1)

    n1, s1, q1 = F.col("urgent_n"), F.col("urgent_s"), F.col("urgent_q")
    n2, s2, q2 = F.col("low_n"), F.col("low_s"), F.col("low_q")
    v1, v2 = var(n1, s1, q1), var(n2, s2, q2)
    se2 = v1 / n1 + v2 / n2
    return wide.select(
        n1.alias("n_urgent"),
        n2.alias("n_low"),
        F.round(s1 / n1 / 100.0, 6).alias("mean_urgent"),
        F.round(s2 / n2 / 100.0, 6).alias("mean_low"),
        F.round(
            (s1.cast("double") / n1 - s2.cast("double") / n2) / F.sqrt(se2), 8
        ).alias("t_stat"),
        F.round(
            se2 * se2
            / (v1 * v1 / (n1 * n1 * (n1 - 1)) + v2 * v2 / (n2 * n2 * (n2 - 1))),
            4,
        ).alias("welch_df"),
    )


Q_WELCH_SQL = """
WITH g AS (
  SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent' ELSE 'low' END AS grp,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
stats AS (
  SELECT grp, COUNT(*) AS n, SUM(cents) AS s, SUM(cents * cents) AS q
  FROM g GROUP BY grp),
wide AS (
  SELECT MIN(CASE WHEN grp = 'urgent' THEN n END) AS n1,
         MIN(CASE WHEN grp = 'urgent' THEN s END) AS s1,
         MIN(CASE WHEN grp = 'urgent' THEN q END) AS q1,
         MIN(CASE WHEN grp = 'low' THEN n END) AS n2,
         MIN(CASE WHEN grp = 'low' THEN s END) AS s2,
         MIN(CASE WHEN grp = 'low' THEN q END) AS q2
  FROM stats),
v AS (
  SELECT *,
         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1) AS v1,
         (CAST(q2 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n2) / (n2 - 1) AS v2
  FROM wide)
SELECT n1 AS n_urgent, n2 AS n_low,
       ROUND(s1 / n1 / 100.0, 6) AS mean_urgent,
       ROUND(s2 / n2 / 100.0, 6) AS mean_low,
       ROUND((CAST(s1 AS DOUBLE) / n1 - CAST(s2 AS DOUBLE) / n2)
             / SQRT(v1 / n1 + v2 / n2), 8) AS t_stat,
       ROUND((v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)
             / (v1 * v1 / (CAST(n1 AS DOUBLE) * n1 * (n1 - 1))
                + v2 * v2 / (CAST(n2 AS DOUBLE) * n2 * (n2 - 1))), 4) AS welch_df
FROM v
"""

QUERIES["q_welch_ttest"] = QuerySpec(
    q_welch_ttest,
    Q_WELCH_SQL,
    "Welch's unequal-variance t-test (URGENT vs LOW order totals; integer "
    "moment sums in cents, Welch-Satterthwaite df)",
)


# ---------------------------------- Benjamini-Hochberg FDR control
# The multiple-testing step an experimentation platform runs over a
# metric sweep: m hypotheses (one per nation), p-values from the
# CUBED portable md5-uniform (the q_hash_sample idiom; cubing skews
# mass toward 0, simulating a sweep where some effects are real — a
# deterministic stand-in for the upstream tests' p-values; the
# PROCEDURE is the operator under test), BH at q = 0.10: sort
# ascending, reject every hypothesis ranked at or below the largest
# i with p_i <= q*i/m. One window over m rows (post-aggregate, tiny).

BH_Q = 0.10


def q_bh_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    nat = load_table(spark, sf_dir, "nation").select("n_name")
    h = F.conv(F.substring(F.md5(F.col("n_name")), 1, 8), 16, 10).cast("double")
    u = (h + 1) / F.lit(4294967296.0)
    p = F.round(u * u * u, 12).alias("p_value")
    w = Window.orderBy("p_value", "n_name")
    w_all = Window.partitionBy()
    ranked = (
        nat.select("n_name", p)
        .withColumn("i", F.row_number().over(w))
        .withColumn("m", F.count(F.lit(1)).over(w_all))
        .withColumn(
            "bh_threshold", F.round(F.lit(BH_Q) * F.col("i") / F.col("m"), 10)
        )
        .withColumn(
            "passes", (F.col("p_value") <= F.col("bh_threshold")).cast("int")
        )
    )
    ranked = ranked.withColumn("k", F.max(F.col("passes") * F.col("i")).over(w_all))
    return (
        ranked.where(F.col("i") <= F.col("k"))
        .select(
            "n_name",
            F.round("p_value", 10).alias("p_value"),
            "i",
            "bh_threshold",
        )
        .orderBy("i")
    )


Q_BH_SQL = f"""
WITH u AS (
  SELECT n_name,
         (('0x' || substring(md5(n_name), 1, 8))::BIGINT + 1.0) / 4294967296.0 AS uu
  FROM nation),
h AS (SELECT n_name, ROUND(uu * uu * uu, 12) AS p_value FROM u),
ranked AS (
  SELECT n_name, p_value,
         ROW_NUMBER() OVER (ORDER BY p_value, n_name) AS i,
         COUNT(*) OVER () AS m
  FROM h),
thr AS (
  SELECT *, ROUND({BH_Q} * i / m, 10) AS bh_threshold,
         CASE WHEN p_value <= ROUND({BH_Q} * i / m, 10) THEN i ELSE 0 END AS pass_i
  FROM ranked),
kk AS (SELECT *, MAX(pass_i) OVER () AS k FROM thr)
SELECT n_name, ROUND(p_value, 10) AS p_value, i, bh_threshold
FROM kk WHERE i <= k
ORDER BY i
"""

QUERIES["q_bh_fdr"] = QuerySpec(
    q_bh_fdr,
    Q_BH_SQL,
    "Benjamini-Hochberg FDR step-up over a deterministic p-value sweep "
    "(md5-uniform inputs; the rejection procedure is the operator)",
)


# ------------------------- bitmap-backed exact distinct (Spark 3.5+)
# Exact count-distinct users per event type AND overall via the
# bitmap aggregate family: bitmap_construct_agg per (type, bucket)
# partial — each partial is a 4KB bitmap, so the shuffle carries
# bitmaps, not user ids — then bitmap_count, and bitmap_or_agg to
# merge type-level bitmaps into the overall count without a second
# scan. This is the 100TB-scale exact-distinct pattern (HLL/theta
# cover the approximate side elsewhere in the registry). Oracle:
# plain COUNT(DISTINCT).


def q_bitmap_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "event_type", (F.col("user_id") + 1).alias("uid")
    )
    parts = ev.groupBy(
        "event_type", F.expr("bitmap_bucket_number(uid)").alias("bucket")
    ).agg(F.expr("bitmap_construct_agg(bitmap_bit_position(uid))").alias("bm"))
    per_type = parts.groupBy("event_type").agg(
        F.sum(F.expr("bitmap_count(bm)")).alias("distinct_users")
    )
    overall = (
        parts.groupBy("bucket")
        .agg(F.expr("bitmap_or_agg(bm)").alias("obm"))
        .agg(F.sum(F.expr("bitmap_count(obm)")).alias("distinct_users"))
        .select(F.lit("ALL").alias("event_type"), "distinct_users")
    )
    return per_type.unionByName(overall).orderBy("event_type")


Q_BITMAP_SQL = """
SELECT event_type, COUNT(DISTINCT user_id) AS distinct_users
FROM events GROUP BY event_type
UNION ALL
SELECT 'ALL' AS event_type, COUNT(DISTINCT user_id) AS distinct_users
FROM events
ORDER BY event_type
"""

QUERIES["q_bitmap_distinct"] = QuerySpec(
    q_bitmap_distinct,
    Q_BITMAP_SQL,
    "exact distinct users per event type + overall via Spark 3.5 bitmap "
    "aggregates (bitmap partials shuffle, bitmap_or_agg merge)",
)


# ------------------------- autocorrelation of the hourly series
# ACF at lags 1..6 of hourly event counts. Integer-exact: with
# S = sum(x), Q = sum(x^2), n, and per-lag P_k = sum(x_t * x_{t+k}),
# H_k/T_k the head/tail partial sums,
#   r_k = (n^2*P_k - n*S*(H_k + T_k) + (n-k)*S^2) / (n^2*Q - n*S^2)
# — every term an integer (decimal(38,0) to be safe at scale), one
# final double division. The hourly series is a post-aggregate
# (one shuffle over events, then a few-hundred-row window), so the
# single-partition lead() window is bounded by hours, not rows.

ACF_MAX_LAG = 6


def q_acf_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    )
    w = Window.orderBy("h")
    s = hourly.select("x", *[F.lead("x", k).over(w).alias(f"x{k}") for k in
                             range(1, ACF_MAX_LAG + 1)])
    s = s.localCheckpoint()  # pin: aggregated once per lag + once for totals
    tot = s.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("s"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("q"),
    )
    lag_rows = []
    for k in range(1, ACF_MAX_LAG + 1):
        xk = F.col(f"x{k}")
        lag_rows.append(
            s.where(xk.isNotNull()).agg(
                F.lit(k).alias("lag"),
                F.count(F.lit(1)).alias("n_pairs"),
                F.sum(F.col("x") * xk).cast("decimal(38,0)").alias("p"),
                F.sum("x").cast("decimal(38,0)").alias("head"),
                F.sum(xk).cast("decimal(38,0)").alias("tail"),
            )
        )
    lags = lag_rows[0]
    for extra in lag_rows[1:]:
        lags = lags.unionByName(extra)
    joined = lags.crossJoin(F.broadcast(tot))
    num = (
        F.col("n") * F.col("n") * F.col("p")
        - F.col("n") * F.col("s") * (F.col("head") + F.col("tail"))
        + (F.col("n") - F.col("lag")) * F.col("s") * F.col("s")
    )
    den = F.col("n") * F.col("n") * F.col("q") - F.col("n") * F.col("s") * F.col("s")
    return joined.select(
        "lag",
        "n_pairs",
        F.round(num.cast("double") / den.cast("double"), 8).alias("acf"),
    ).orderBy("lag")


def _acf_sql() -> str:
    lag_selects = []
    for k in range(1, ACF_MAX_LAG + 1):
        lag_selects.append(f"""
  SELECT {k} AS lag, COUNT(*) AS n_pairs,
         CAST(SUM(x * x{k}) AS DECIMAL(38,0)) AS p,
         CAST(SUM(x) AS DECIMAL(38,0)) AS head,
         CAST(SUM(x{k}) AS DECIMAL(38,0)) AS tail
  FROM s WHERE x{k} IS NOT NULL""")
    leads = ", ".join(
        f"LEAD(x, {k}) OVER (ORDER BY h) AS x{k}"
        for k in range(1, ACF_MAX_LAG + 1)
    )
    return f"""
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, COUNT(*) AS x
  FROM events GROUP BY 1),
s AS (SELECT x, {leads} FROM hourly),
tot AS (
  SELECT COUNT(*) AS n, CAST(SUM(x) AS DECIMAL(38,0)) AS s_,
         CAST(SUM(x * x) AS DECIMAL(38,0)) AS q FROM s),
lags AS ({" UNION ALL ".join(lag_selects)})
SELECT lag, n_pairs,
       ROUND(CAST(n * n * p - n * s_ * (head + tail) + (n - lag) * s_ * s_ AS DOUBLE)
             / CAST(n * n * q - n * s_ * s_ AS DOUBLE), 8) AS acf
FROM lags CROSS JOIN tot
ORDER BY lag
"""


QUERIES["q_acf_hourly"] = QuerySpec(
    q_acf_hourly,
    _acf_sql(),
    "autocorrelation (lags 1-6) of hourly event counts — integer-exact "
    "moment formula, one final double division per lag",
)


# -------------------------------------- observed metrics (observe API)
# Spark's Observation API: data-quality counters that ride the main
# scan as accumulator-backed aggregates — the production pattern for
# emitting row counts / checksums on a write path WITHOUT a second
# scan. One action materializes the metrics; the query returns them
# as a row, and the oracle recomputes the same aggregates in SQL, so
# the accumulator path itself is value-checked cross-engine.


def q_observe_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Observation

    o = load_table(spark, sf_dir, "orders")
    obs = Observation("dq")
    observed = o.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias(
            "cents_sum"
        ),
        F.min(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("min_day"),
        F.max(F.date_format("o_orderdate", "yyyy-MM-dd")).alias("max_day"),
    )
    observed.count()  # the single pass the metrics ride (no extra scan)
    m = obs.get
    return spark.createDataFrame(
        [(m["n_rows"], m["cents_sum"], m["min_day"], m["max_day"])],
        "n_rows long, cents_sum long, min_day string, max_day string",
    )


Q_OBSERVE_SQL = """
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS cents_sum,
       MIN(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')) AS min_day,
       MAX(strftime(CAST(o_orderdate AS TIMESTAMP), '%Y-%m-%d')) AS max_day
FROM orders
"""

QUERIES["q_observe_metrics"] = QuerySpec(
    q_observe_metrics,
    Q_OBSERVE_SQL,
    "Observation API: accumulator-backed DQ metrics riding the main scan, "
    "value-checked against plain SQL aggregates",
)


# ------------------------------- SQL dialect extras (4.x surface)
# GROUP BY ALL / ORDER BY ALL / LIMIT-OFFSET pagination / try_divide
# null-on-zero — the modern-dialect conveniences a user migrating
# SQL workloads expects, pinned cross-engine in one statement
# (DuckDB speaks the same dialect for all four).


def q_sql_dialect_extras(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_dialect_v")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
               COUNT(*) AS n,
               try_divide(COUNT(*), SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END))
                 AS div_by_zero
        FROM li_dialect_v
        GROUP BY ALL
        ORDER BY ALL
        LIMIT 3 OFFSET 1
        """
    )


Q_DIALECT_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS qty,
       COUNT(*) AS n,
       CASE WHEN SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) = 0 THEN NULL
            ELSE CAST(COUNT(*) AS DOUBLE)
                 / SUM(CASE WHEN l_quantity < 0 THEN 1 ELSE 0 END) END AS div_by_zero
FROM lineitem
GROUP BY ALL
ORDER BY ALL
LIMIT 3 OFFSET 1
"""

QUERIES["q_sql_dialect_extras"] = QuerySpec(
    q_sql_dialect_extras,
    Q_DIALECT_SQL,
    "GROUP BY ALL / ORDER BY ALL / LIMIT-OFFSET / try_divide dialect pins",
)


# -------------------------- Kolmogorov-Smirnov two-sample test
# Distribution-free click-vs-purchase comparison, completing the
# rank-test family (Mann-Whitney above): D = sup |ECDF1 - ECDF2|,
# computed exactly as max |c1*N2 - c2*N1| / (N1*N2) over the grouped
# value table — integer numerators, one final division. Same scale
# shape as q_mann_whitney: the only window runs over the
# post-aggregate distinct-value table.


def q_ks_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    two = ev.where(F.col("event_type").isin("click", "purchase")).select(
        (F.col("event_type") == "click").cast("int").alias("g1"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("v"),
    )
    vals = two.groupBy("v").agg(
        F.sum("g1").alias("n1c"),
        F.sum(F.lit(1) - F.col("g1")).alias("n2c"),
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    steps = (
        vals.withColumn("c1", F.sum("n1c").over(w))
        .withColumn("c2", F.sum("n2c").over(w))
        .withColumn("n1", F.sum("n1c").over(w_all))
        .withColumn("n2", F.sum("n2c").over(w_all))
        .select(
            "n1",
            "n2",
            F.abs(F.col("c1") * F.col("n2") - F.col("c2") * F.col("n1")).alias(
                "dnum"
            ),
        )
    )
    return steps.groupBy("n1", "n2").agg(
        F.max("dnum").alias("d_numerator")
    ).select(
        "n1",
        "n2",
        "d_numerator",
        F.round(
            F.col("d_numerator").cast("double")
            / (F.col("n1") * F.col("n2")).cast("double"),
            10,
        ).alias("ks_d"),
    )


Q_KS_SQL = """
WITH two AS (
  SELECT CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS g1,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS v
  FROM events WHERE event_type IN ('click', 'purchase')),
vals AS (
  SELECT v, SUM(g1) AS n1c, SUM(1 - g1) AS n2c FROM two GROUP BY v),
steps AS (
  SELECT SUM(n1c) OVER (ORDER BY v) AS c1,
         SUM(n2c) OVER (ORDER BY v) AS c2,
         SUM(n1c) OVER () AS n1, SUM(n2c) OVER () AS n2
  FROM vals)
SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS BIGINT) AS d_numerator,
       ROUND(CAST(MAX(ABS(c1 * n2 - c2 * n1)) AS DOUBLE)
             / CAST(n1 * n2 AS DOUBLE), 10) AS ks_d
FROM steps GROUP BY n1, n2
"""

QUERIES["q_ks_test"] = QuerySpec(
    q_ks_test,
    Q_KS_SQL,
    "two-sample Kolmogorov-Smirnov D (exact integer ECDF numerators over the "
    "grouped value table, one final division)",
)


# ------------------------------- OHLC bars (min_by / max_by surface)
# Daily purchase-value bars: open/close via min_by/max_by over a
# zero-padded (ts, event_id) composite key — fully tie-broken where a
# plain arg-by-ts would be nondeterministic — plus high/low/volume and
# the interpolated median. One partial-agg shuffle keyed by day;
# min_by/max_by partials carry (key, value) pairs, so the bar build
# never sorts within groups.


def q_ohlc_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    p = ev.where(F.col("event_type") == "purchase").select(
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("v"),
        F.concat(
            F.lpad(F.unix_timestamp("ts").cast("string"), 12, "0"),
            F.lpad(F.col("event_id").cast("string"), 12, "0"),
        ).alias("ord_key"),
    )
    return (
        p.groupBy("day")
        .agg(
            F.min_by("v", "ord_key").alias("open_v"),
            F.max("v").alias("high_v"),
            F.min("v").alias("low_v"),
            F.max_by("v", "ord_key").alias("close_v"),
            F.count(F.lit(1)).alias("volume"),
            F.round(F.median("v"), 4).alias("median_v"),
        )
        .orderBy("day")
    )


Q_OHLC_SQL = """
WITH p AS (
  SELECT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS v,
         lpad(CAST(CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS VARCHAR), 12, '0')
           || lpad(CAST(event_id AS VARCHAR), 12, '0') AS ord_key
  FROM events WHERE event_type = 'purchase')
SELECT day,
       CAST(arg_min(v, ord_key) AS BIGINT) AS open_v,
       CAST(MAX(v) AS BIGINT) AS high_v,
       CAST(MIN(v) AS BIGINT) AS low_v,
       CAST(arg_max(v, ord_key) AS BIGINT) AS close_v,
       COUNT(*) AS volume,
       ROUND(median(v), 4) AS median_v
FROM p GROUP BY day ORDER BY day
"""

QUERIES["q_ohlc_daily"] = QuerySpec(
    q_ohlc_daily,
    Q_OHLC_SQL,
    "daily OHLC bars via min_by/max_by over a tie-broken composite key, "
    "plus exact high/low/volume and interpolated median",
)


# ----------------------------- corpus mixture weighting (capped)
# The pretraining-mix allocator: per (lang, source) bucket, weight =
# n_docs * quality_hits (docs inside the 100-2000 char band — an
# integer, so the raw weight is exact), share = w/W capped at 5% with
# the excess redistributed proportionally across uncapped buckets in
# one waterfall round. The cap test is INTEGER (20*w vs W) so both
# engines agree on the capped set exactly; redistribution factors are
# ratios of integer sums evaluated in one in-row double expression.
# One partial-agg shuffle + a 1-row totals broadcast — scan-dominated
# at 100 TB.

MIX_CAP_NUM, MIX_CAP_DEN = 1, 20  # cap = 5%


def q_corpus_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(
            F.col("n_chars").between(100, 2000).cast("int")
        ).alias("quality_hits"),
    ).withColumn("w", F.col("n_docs") * F.col("quality_hits"))
    tot = g.agg(F.sum("w").alias("big_w"))
    flagged = g.crossJoin(F.broadcast(tot)).withColumn(
        "capped", (F.col("w") * MIX_CAP_DEN * MIX_CAP_NUM > F.col("big_w")).cast("int")
    )
    masses = flagged.agg(
        F.sum(
            F.when(
                F.col("capped") == 1,
                F.col("w") * MIX_CAP_DEN - F.col("big_w"),
            ).otherwise(F.lit(0))
        ).alias("excess_num"),
        F.sum(
            F.when(F.col("capped") == 0, F.col("w") * MIX_CAP_DEN).otherwise(
                F.lit(0)
            )
        ).alias("uncapped_num"),
    )
    out = flagged.crossJoin(F.broadcast(masses)).select(
        "lang",
        "source",
        "n_docs",
        "quality_hits",
        "capped",
        F.round(F.col("w").cast("double") / F.col("big_w"), 10).alias("raw_share"),
        F.round(
            F.when(F.col("capped") == 1, F.lit(MIX_CAP_NUM / MIX_CAP_DEN)).otherwise(
                (F.col("w").cast("double") / F.col("big_w"))
                * (
                    F.lit(1.0)
                    + F.col("excess_num").cast("double")
                    / F.col("uncapped_num").cast("double")
                )
            ),
            10,
        ).alias("final_share"),
    )
    return out.orderBy(F.col("final_share").desc(), "lang", "source")


Q_MIXTURE_SQL = f"""
WITH g AS (
  SELECT lang, source, COUNT(*) AS n_docs,
         SUM(CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END) AS quality_hits,
         COUNT(*) * SUM(CASE WHEN n_chars BETWEEN 100 AND 2000 THEN 1 ELSE 0 END) AS w
  FROM documents GROUP BY lang, source),
tot AS (SELECT SUM(w) AS big_w FROM g),
flagged AS (
  SELECT g.*, tot.big_w,
         CASE WHEN w * {MIX_CAP_DEN} * {MIX_CAP_NUM} > big_w THEN 1 ELSE 0 END AS capped
  FROM g CROSS JOIN tot),
masses AS (
  SELECT SUM(CASE WHEN capped = 1 THEN w * {MIX_CAP_DEN} - big_w ELSE 0 END) AS excess_num,
         SUM(CASE WHEN capped = 0 THEN w * {MIX_CAP_DEN} ELSE 0 END) AS uncapped_num
  FROM flagged)
SELECT lang, source, n_docs, CAST(quality_hits AS BIGINT) AS quality_hits, capped,
       ROUND(CAST(w AS DOUBLE) / big_w, 10) AS raw_share,
       ROUND(CASE WHEN capped = 1 THEN {MIX_CAP_NUM / MIX_CAP_DEN}
                  ELSE (CAST(w AS DOUBLE) / big_w)
                       * (1.0 + CAST(excess_num AS DOUBLE) / CAST(uncapped_num AS DOUBLE))
             END, 10) AS final_share
FROM flagged CROSS JOIN masses
ORDER BY final_share DESC, lang, source
"""

QUERIES["q_corpus_mixture"] = QuerySpec(
    q_corpus_mixture,
    Q_MIXTURE_SQL,
    "pretraining corpus mixture allocator: quality-weighted shares with a 5% "
    "cap and one-round proportional redistribution (integer cap test)",
)


# ----------------------------------------- weighted median per group
# Weighted median of lineitem unit price (cents) weighted by quantity,
# per return flag — the survey-statistics quantile: the smallest value
# whose cumulative weight reaches half the group total. Same scale
# shape as the rank tests: one partial-agg shuffle groups identical
# (flag, value) rows, then the window walks the per-group
# distinct-value table with exact integer weights (the >= W/2 test is
# 2*cumw >= W, integer).


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
        F.col("l_quantity").cast("long").alias("wt"),
    )
    vals = li.groupBy("flag", "cents").agg(F.sum("wt").alias("w"))
    win = Window.partitionBy("flag").orderBy("cents").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_all = Window.partitionBy("flag")
    cum = vals.withColumn("cumw", F.sum("w").over(win)).withColumn(
        "total_w", F.sum("w").over(w_all)
    )
    hit = cum.where(2 * F.col("cumw") >= F.col("total_w"))
    first = hit.groupBy("flag").agg(
        F.min("cents").alias("weighted_median_cents"),
        F.min("total_w").alias("total_weight"),
    )
    return first.orderBy("flag")


Q_WMEDIAN_SQL = """
WITH vals AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) AS cents,
         SUM(CAST(l_quantity AS BIGINT)) AS w
  FROM lineitem GROUP BY 1, 2),
cum AS (
  SELECT flag, cents, w,
         SUM(w) OVER (PARTITION BY flag ORDER BY cents
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         SUM(w) OVER (PARTITION BY flag) AS total_w
  FROM vals)
SELECT flag,
       CAST(MIN(CASE WHEN 2 * cumw >= total_w THEN cents END) AS BIGINT)
         AS weighted_median_cents,
       CAST(MIN(total_w) AS BIGINT) AS total_weight
FROM cum GROUP BY flag ORDER BY flag
"""

QUERIES["q_weighted_median"] = QuerySpec(
    q_weighted_median,
    Q_WMEDIAN_SQL,
    "weighted median per group: exact integer cumulative-weight walk over "
    "the grouped value table (2*cumw >= W test)",
)


# ------------------------------------------- missing-value imputation
# Feature-engineering repair: 'error' events are treated as missing
# readings; each is imputed with the user's median over observed
# (non-error) values, falling back to the global median for users
# with no observations. Medians are exact (integer value domain via
# the cents scaling + DuckDB/Spark shared lower-interpolation on
# percentile_disc-style pick): we use the LOW median (percentile_disc
# 0.5-equivalent) computed via the cumulative walk so both engines
# agree bit-for-bit. Output: per-user imputed/observed counts and the
# decimal-exact post-imputation sum. Shapes: two keyed partial-agg
# shuffles + one broadcast of the 1-row global median.


def q_impute_missing(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id",
        "event_type",
        F.round(F.col("value") * 10000, 0).cast("long").alias("v"),
    )
    obs = ev.where(F.col("event_type") != "error")
    # LOW median via the integer cumulative-weight walk (2*cumw >= n)
    vals = obs.groupBy("user_id", "v").agg(F.count(F.lit(1)).alias("c"))
    win = Window.partitionBy("user_id").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_u = Window.partitionBy("user_id")
    med_u = (
        vals.withColumn("cumc", F.sum("c").over(win))
        .withColumn("n", F.sum("c").over(w_u))
        .where(2 * F.col("cumc") >= F.col("n"))
        .groupBy("user_id")
        .agg(F.min("v").alias("user_median"))
    )
    gvals = obs.groupBy("v").agg(F.count(F.lit(1)).alias("c"))
    gwin = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    g_all = Window.partitionBy()
    med_g = (
        gvals.withColumn("cumc", F.sum("c").over(gwin))
        .withColumn("n", F.sum("c").over(g_all))
        .where(2 * F.col("cumc") >= F.col("n"))
        .agg(F.min("v").alias("global_median"))
    )
    filled = (
        ev.join(med_u, "user_id", "left")
        .crossJoin(F.broadcast(med_g))
        .select(
            "user_id",
            (F.col("event_type") == "error").cast("int").alias("was_missing"),
            F.when(
                F.col("event_type") == "error",
                F.coalesce(F.col("user_median"), F.col("global_median")),
            )
            .otherwise(F.col("v"))
            .alias("v_imp"),
        )
    )
    return (
        filled.groupBy("user_id")
        .agg(
            F.sum("was_missing").alias("n_imputed"),
            F.sum(F.lit(1) - F.col("was_missing")).alias("n_observed"),
            F.sum("v_imp").alias("imputed_sum"),
        )
        .orderBy("user_id")
    )


Q_IMPUTE_SQL = """
WITH ev AS (
  SELECT user_id, event_type,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS v
  FROM events),
obs AS (SELECT * FROM ev WHERE event_type <> 'error'),
vals AS (
  SELECT user_id, v, COUNT(*) AS c FROM obs GROUP BY 1, 2),
med_u AS (
  SELECT user_id, MIN(v) AS user_median FROM (
    SELECT user_id, v,
           SUM(c) OVER (PARTITION BY user_id ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
           SUM(c) OVER (PARTITION BY user_id) AS n
    FROM vals) WHERE 2 * cumc >= n GROUP BY user_id),
gvals AS (SELECT v, COUNT(*) AS c FROM obs GROUP BY v),
med_g AS (
  SELECT MIN(v) AS global_median FROM (
    SELECT v,
           SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
           SUM(c) OVER () AS n
    FROM gvals) WHERE 2 * cumc >= n),
filled AS (
  SELECT ev.user_id,
         CASE WHEN ev.event_type = 'error' THEN 1 ELSE 0 END AS was_missing,
         CASE WHEN ev.event_type = 'error'
              THEN COALESCE(med_u.user_median, med_g.global_median)
              ELSE ev.v END AS v_imp
  FROM ev LEFT JOIN med_u ON med_u.user_id = ev.user_id
  CROSS JOIN med_g)
SELECT user_id,
       CAST(SUM(was_missing) AS BIGINT) AS n_imputed,
       CAST(SUM(1 - was_missing) AS BIGINT) AS n_observed,
       CAST(SUM(v_imp) AS BIGINT) AS imputed_sum
FROM filled GROUP BY user_id ORDER BY user_id
"""

QUERIES["q_impute_missing"] = QuerySpec(
    q_impute_missing,
    Q_IMPUTE_SQL,
    "missing-value imputation: per-user LOW median with global-median "
    "fallback (integer cumulative walks, decimal-exact post-fill sums)",
)


# --------------------------------------- referential-integrity audit
# The whole-schema DQ scan a warehouse runs before publishing: every
# foreign-key edge is checked for orphans (left-anti join, dimension
# side broadcast) and every primary key for duplicates (groupBy
# having count > 1). One output row per check. At 100 TB each check
# is an independent scan+anti-join — embarrassingly parallel across
# checks, and the anti joins broadcast the smaller parent whenever
# stats allow.


def q_referential_integrity(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = {n: load_table(spark, sf_dir, n) for n in (
        "lineitem", "orders", "customer", "supplier", "part", "nation", "region"
    )}
    fk_edges = [
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem.l_suppkey->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        ("nation.n_regionkey->region", "nation", "n_regionkey", "region", "r_regionkey"),
    ]
    pk_checks = [
        ("pk:orders.o_orderkey", "orders", "o_orderkey"),
        ("pk:customer.c_custkey", "customer", "c_custkey"),
        ("pk:part.p_partkey", "part", "p_partkey"),
        ("pk:supplier.s_suppkey", "supplier", "s_suppkey"),
    ]
    parts = []
    for name, child, ck, parent, pk in fk_edges:
        c = t[child].select(F.col(ck).alias("k"))
        p = t[parent].select(F.col(pk).alias("k"))
        orphans = c.join(p, "k", "left_anti")
        parts.append(
            c.agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("n_rows"),
            ).crossJoin(
                F.broadcast(orphans.agg(F.count(F.lit(1)).alias("n_violations")))
            )
        )
    for name, tbl, pk in pk_checks:
        dups = (
            t[tbl].groupBy(pk).agg(F.count(F.lit(1)).alias("c"))
            .where(F.col("c") > 1)
        )
        parts.append(
            t[tbl].agg(
                F.lit(name).alias("check_name"),
                F.count(F.lit(1)).alias("n_rows"),
            ).crossJoin(
                F.broadcast(dups.agg(F.count(F.lit(1)).alias("n_violations")))
            )
        )
    out = parts[0]
    for extra in parts[1:]:
        out = out.unionByName(extra)
    return out.orderBy("check_name")


Q_RI_SQL = """
SELECT * FROM (
  SELECT 'lineitem.l_orderkey->orders' AS check_name, COUNT(*) AS n_rows,
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
          WHERE o.o_orderkey IS NULL) AS n_violations FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_partkey->part', COUNT(*),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
          WHERE p.p_partkey IS NULL) FROM lineitem
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier', COUNT(*),
         (SELECT COUNT(*) FROM lineitem l LEFT JOIN supplier s ON l.l_suppkey = s.s_suppkey
          WHERE s.s_suppkey IS NULL) FROM lineitem
  UNION ALL
  SELECT 'orders.o_custkey->customer', COUNT(*),
         (SELECT COUNT(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
          WHERE c.c_custkey IS NULL) FROM orders
  UNION ALL
  SELECT 'customer.c_nationkey->nation', COUNT(*),
         (SELECT COUNT(*) FROM customer c LEFT JOIN nation n ON c.c_nationkey = n.n_nationkey
          WHERE n.n_nationkey IS NULL) FROM customer
  UNION ALL
  SELECT 'supplier.s_nationkey->nation', COUNT(*),
         (SELECT COUNT(*) FROM supplier s LEFT JOIN nation n ON s.s_nationkey = n.n_nationkey
          WHERE n.n_nationkey IS NULL) FROM supplier
  UNION ALL
  SELECT 'nation.n_regionkey->region', COUNT(*),
         (SELECT COUNT(*) FROM nation n LEFT JOIN region r ON n.n_regionkey = r.r_regionkey
          WHERE r.r_regionkey IS NULL) FROM nation
  UNION ALL
  SELECT 'pk:orders.o_orderkey', COUNT(*),
         (SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders GROUP BY 1 HAVING COUNT(*) > 1)) FROM orders
  UNION ALL
  SELECT 'pk:customer.c_custkey', COUNT(*),
         (SELECT COUNT(*) FROM (SELECT c_custkey FROM customer GROUP BY 1 HAVING COUNT(*) > 1)) FROM customer
  UNION ALL
  SELECT 'pk:part.p_partkey', COUNT(*),
         (SELECT COUNT(*) FROM (SELECT p_partkey FROM part GROUP BY 1 HAVING COUNT(*) > 1)) FROM part
  UNION ALL
  SELECT 'pk:supplier.s_suppkey', COUNT(*),
         (SELECT COUNT(*) FROM (SELECT s_suppkey FROM supplier GROUP BY 1 HAVING COUNT(*) > 1)) FROM supplier
) ORDER BY check_name
"""

QUERIES["q_referential_integrity"] = QuerySpec(
    q_referential_integrity,
    Q_RI_SQL,
    "whole-schema referential-integrity audit: FK orphan counts (left-anti, "
    "broadcast parents) + PK duplicate counts, one row per check",
)


# ---------------------------------- covariate balance audit (SMD)
# The balance table an experiment readout prints before trusting the
# effect estimate: per covariate, the standardized mean difference
# between arms, SMD = (m_t - m_c) / sqrt((v_t + v_c)/2). Treatment =
# odd user_id (the q_diff_in_diff assignment). Covariates are per-user
# integer features (event count, value sum in ten-thousandths, active
# days), so every arm moment (n, Σx, Σx²) is exact; SMD is the one
# final double per row. Shapes: one user-keyed shuffle to build
# features, one unpivot (stack), one partial-agg shuffle over 2·k arm
# cells.


def q_smd_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    feats = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.round(F.col("value") * 10000, 0).cast("long")).alias("value_sum"),
        F.countDistinct(F.date_format("ts", "yyyy-MM-dd")).alias("active_days"),
    )
    long = feats.select(
        (F.col("user_id") % 2 == 1).cast("int").alias("treat"),
        F.expr(
            "stack(3, 'n_events', CAST(n_events AS BIGINT), "
            "'value_sum', value_sum, "
            "'active_days', CAST(active_days AS BIGINT)) AS (covariate, x)"
        ),
    )
    cells = long.groupBy("covariate", "treat").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    wide = cells.groupBy("covariate").pivot("treat", [0, 1]).agg(
        F.min("n").alias("n"), F.min("s").alias("s"), F.min("q").alias("q")
    )

    def mv(n, s, q):
        m = s.cast("double") / n
        v = (q.cast("double") - s.cast("double") * s.cast("double") / n) / (n - 1)
        return m, v

    m0, v0 = mv(F.col("0_n"), F.col("0_s"), F.col("0_q"))
    m1, v1 = mv(F.col("1_n"), F.col("1_s"), F.col("1_q"))
    return wide.select(
        "covariate",
        F.col("0_n").alias("n_control"),
        F.col("1_n").alias("n_treat"),
        F.round(m0, 6).alias("mean_control"),
        F.round(m1, 6).alias("mean_treat"),
        # NULL (not inf/NaN/ANSI error) when both arms are constant
        F.when(
            (v0 + v1) > 0.0,
            F.round((m1 - m0) / F.sqrt((v0 + v1) / 2.0), 8),
        ).alias("smd"),
    ).orderBy("covariate")


Q_SMD_SQL = """
WITH feats AS (
  SELECT user_id,
         COUNT(*) AS n_events,
         SUM(CAST(ROUND(value * 10000, 0) AS BIGINT)) AS value_sum,
         COUNT(DISTINCT strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d')) AS active_days
  FROM events GROUP BY user_id),
long AS (
  SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat, covariate, x
  FROM feats, LATERAL (VALUES
    ('n_events', CAST(n_events AS BIGINT)),
    ('value_sum', value_sum),
    ('active_days', CAST(active_days AS BIGINT))) t(covariate, x)),
cells AS (
  SELECT covariate, treat, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS q
  FROM long GROUP BY 1, 2),
wide AS (
  SELECT covariate,
         MIN(CASE WHEN treat = 0 THEN n END) AS n0,
         MIN(CASE WHEN treat = 0 THEN s END) AS s0,
         MIN(CASE WHEN treat = 0 THEN q END) AS q0,
         MIN(CASE WHEN treat = 1 THEN n END) AS n1,
         MIN(CASE WHEN treat = 1 THEN s END) AS s1,
         MIN(CASE WHEN treat = 1 THEN q END) AS q1
  FROM cells GROUP BY covariate),
mv AS (
  SELECT covariate, n0, n1,
         CAST(s0 AS DOUBLE) / n0 AS m0,
         CAST(s1 AS DOUBLE) / n1 AS m1,
         (CAST(q0 AS DOUBLE) - CAST(s0 AS DOUBLE) * CAST(s0 AS DOUBLE) / n0) / (n0 - 1) AS v0,
         (CAST(q1 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n1) / (n1 - 1) AS v1
  FROM wide)
SELECT covariate,
       CAST(n0 AS BIGINT) AS n_control, CAST(n1 AS BIGINT) AS n_treat,
       ROUND(m0, 6) AS mean_control, ROUND(m1, 6) AS mean_treat,
       CASE WHEN (v0 + v1) > 0.0
            THEN ROUND((m1 - m0) / SQRT((v0 + v1) / 2.0), 8) END AS smd
FROM mv ORDER BY covariate
"""

QUERIES["q_smd_balance"] = QuerySpec(
    q_smd_balance,
    Q_SMD_SQL,
    "covariate balance audit: standardized mean differences between arms "
    "from exact integer per-user feature moments",
)


# -------------------------------------------- time-to-convert funnel
# Completes the funnel family with the DURATION question: per user,
# the first 'view' and the first 'purchase' at-or-after it; output
# the conversion rate and the LOW-median seconds-to-convert (integer
# cumulative walk, the q_weighted_median machinery). Two keyed
# partial-agg shuffles + one user-keyed join; epoch seconds keep the
# whole computation in the integer domain.


def q_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", F.unix_timestamp("ts").alias("sec")
    )
    fv = ev.where(F.col("event_type") == "view").groupBy("user_id").agg(
        F.min("sec").alias("view_sec")
    )
    fp = (
        ev.where(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .where(F.col("sec") >= F.col("view_sec"))
        .groupBy("user_id")
        .agg(F.min(F.col("sec") - F.col("view_sec")).alias("delta_s"))
    )
    deltas = fp.groupBy("delta_s").agg(F.count(F.lit(1)).alias("c"))
    win = Window.orderBy("delta_s").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    med = (
        deltas.withColumn("cumc", F.sum("c").over(win))
        .withColumn("n", F.sum("c").over(w_all))
        .where(2 * F.col("cumc") >= F.col("n"))
        .agg(F.min("delta_s").alias("median_delta_s"))
    )
    totals = fv.agg(F.count(F.lit(1)).alias("n_viewed")).crossJoin(
        F.broadcast(fp.agg(F.count(F.lit(1)).alias("n_converted")))
    )
    return totals.crossJoin(F.broadcast(med)).select(
        "n_viewed",
        "n_converted",
        F.round(F.col("n_converted") / F.col("n_viewed").cast("double"), 8).alias(
            "conversion_rate"
        ),
        "median_delta_s",
    )


Q_TTC_SQL = """
WITH ev AS (
  -- floor, not CAST: events ts carries sub-second fractions and
  -- Spark's unix_timestamp truncates while a bare BIGINT cast rounds
  SELECT user_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec
  FROM events),
fv AS (
  SELECT user_id, MIN(sec) AS view_sec FROM ev
  WHERE event_type = 'view' GROUP BY user_id),
fp AS (
  SELECT ev.user_id, MIN(ev.sec - fv.view_sec) AS delta_s
  FROM ev JOIN fv ON fv.user_id = ev.user_id
  WHERE ev.event_type = 'purchase' AND ev.sec >= fv.view_sec
  GROUP BY ev.user_id),
deltas AS (SELECT delta_s, COUNT(*) AS c FROM fp GROUP BY delta_s),
med AS (
  SELECT MIN(delta_s) AS median_delta_s FROM (
    SELECT delta_s,
           SUM(c) OVER (ORDER BY delta_s ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
           SUM(c) OVER () AS n
    FROM deltas) WHERE 2 * cumc >= n)
SELECT (SELECT COUNT(*) FROM fv) AS n_viewed,
       (SELECT COUNT(*) FROM fp) AS n_converted,
       ROUND((SELECT COUNT(*) FROM fp) / CAST((SELECT COUNT(*) FROM fv) AS DOUBLE), 8)
         AS conversion_rate,
       median_delta_s
FROM med
"""

QUERIES["q_time_to_convert"] = QuerySpec(
    q_time_to_convert,
    Q_TTC_SQL,
    "funnel duration: conversion rate + LOW-median seconds from first view "
    "to first subsequent purchase (integer epoch walk)",
)


# -------------------------------------------- top-p (nucleus) cut
# The nucleus-sampling selection rule applied to a count distribution:
# per event type, rank users by event count (desc, id tie-break) and
# keep the smallest prefix whose mass reaches half the total — keep
# while 2*cum_before < total, an integer test, so the cut is exact on
# both engines. The same machinery picks "head" tokens/domains to
# keep or cap in a corpus-pruning pass. One keyed partial-agg shuffle
# + a per-type window over the post-aggregate user table.

TOPP_NUM, TOPP_DEN = 1, 2  # p = 0.5


def q_top_p_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    counts = ev.groupBy("event_type", "user_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    win = Window.partitionBy("event_type").orderBy(
        F.col("c").desc(), "user_id"
    ).rowsBetween(Window.unboundedPreceding, -1)
    w_t = Window.partitionBy("event_type")
    marked = (
        counts.withColumn("cum_before", F.coalesce(F.sum("c").over(win), F.lit(0)))
        .withColumn("total", F.sum("c").over(w_t))
        .withColumn(
            "kept",
            (
                F.col("cum_before") * TOPP_DEN < F.col("total") * TOPP_NUM
            ).cast("int"),
        )
    )
    return (
        marked.groupBy("event_type")
        .agg(
            F.sum("kept").alias("n_kept"),
            F.count(F.lit(1)).alias("n_users"),
            F.sum(F.col("kept") * F.col("c")).alias("kept_mass"),
            F.min("total").alias("total_mass"),
        )
        .orderBy("event_type")
    )


Q_TOPP_SQL = f"""
WITH counts AS (
  SELECT event_type, user_id, COUNT(*) AS c
  FROM events GROUP BY 1, 2),
marked AS (
  SELECT event_type, c,
         COALESCE(SUM(c) OVER (PARTITION BY event_type
                               ORDER BY c DESC, user_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before,
         SUM(c) OVER (PARTITION BY event_type) AS total
  FROM counts)
SELECT event_type,
       CAST(SUM(CASE WHEN cum_before * {TOPP_DEN} < total * {TOPP_NUM} THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       COUNT(*) AS n_users,
       CAST(SUM(CASE WHEN cum_before * {TOPP_DEN} < total * {TOPP_NUM} THEN c ELSE 0 END) AS BIGINT) AS kept_mass,
       CAST(MIN(total) AS BIGINT) AS total_mass
FROM marked GROUP BY event_type ORDER BY event_type
"""

QUERIES["q_top_p_cut"] = QuerySpec(
    q_top_p_cut,
    Q_TOPP_SQL,
    "top-p (nucleus) selection per group: smallest count-ranked prefix "
    "reaching half the mass, integer-exact cut",
)


# ---------------------------------- burstiness (index of dispersion)
# Fano factor of the hourly arrival process per event type:
# D = var_pop(x)/mean(x) = (n*Q - S^2)/(n*S) over hourly counts —
# D ~ 1 is Poisson-like traffic, D >> 1 is bursty (the capacity-
# planning diagnostic). Exact integer moments (n, S, Q) per type,
# one final double division. Two keyed partial-agg shuffles, both
# post-aggregate-small.


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("x"))
    mom = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x") * F.col("x")).alias("q"),
    )
    return mom.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("s").alias("n_events"),
        F.round(
            (F.col("n") * F.col("q") - F.col("s") * F.col("s")).cast("double")
            / (F.col("n") * F.col("s")).cast("double"),
            8,
        ).alias("dispersion"),
    ).orderBy("event_type")


Q_BURST_SQL = """
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, COUNT(*) AS x
  FROM events GROUP BY 1, 2),
mom AS (
  SELECT event_type, COUNT(*) AS n, SUM(x) AS s, SUM(x * x) AS q
  FROM hourly GROUP BY event_type)
SELECT event_type,
       CAST(n AS BIGINT) AS n_hours,
       CAST(s AS BIGINT) AS n_events,
       ROUND(CAST(n * q - s * s AS DOUBLE) / CAST(n * s AS DOUBLE), 8) AS dispersion
FROM mom ORDER BY event_type
"""

QUERIES["q_burstiness"] = QuerySpec(
    q_burstiness,
    Q_BURST_SQL,
    "Fano factor of hourly arrivals per event type (integer moments, one "
    "final division) — the bursty-vs-Poisson traffic diagnostic",
)


# ------------------------------- seasonality strength (ANOVA R^2)
# How much of the hourly-count variance the hour-of-day profile
# explains: R^2 = SSB/SST with SSB = sum_h S_h^2/n_h - S^2/n over
# hour-of-day groups. Integer moments everywhere except the per-group
# S_h^2/n_h terms, which are rounded to 12 dp and summed as decimals
# (the q_mutual_info discipline); one final division. Complements
# ACF (lag structure) and the Fano factor (burstiness) as the third
# arrival-process diagnostic.


def q_seasonality_strength(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("x")
    ).select(F.hour("h").alias("hod"), "x")
    groups = hourly.groupBy("hod").agg(
        F.count(F.lit(1)).alias("nh"),
        F.sum("x").alias("sh"),
    ).select(
        "nh",
        "sh",
        F.round(
            (F.col("sh") * F.col("sh")).cast("double") / F.col("nh"), 12
        ).cast("decimal(28,12)").alias("term"),
    )
    tot = groups.agg(
        F.sum("nh").alias("n"),
        F.sum("sh").alias("s"),
        F.sum("term").alias("ssb_part"),
        F.count(F.lit(1)).alias("n_hods"),
    )
    q_tot = hourly.agg(F.sum(F.col("x") * F.col("x")).alias("q"))
    return tot.crossJoin(F.broadcast(q_tot)).select(
        F.col("n").alias("n_hours"),
        "n_hods",
        F.round(
            (
                F.col("ssb_part").cast("double")
                - (F.col("s") * F.col("s")).cast("double") / F.col("n")
            )
            / (
                F.col("q").cast("double")
                - (F.col("s") * F.col("s")).cast("double") / F.col("n")
            ),
            8,
        ).alias("seasonality_r2"),
    )


Q_SEASONALITY_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, COUNT(*) AS x
  FROM events GROUP BY 1),
hodd AS (SELECT EXTRACT(hour FROM h) AS hod, x FROM hourly),
groups AS (
  SELECT hod, COUNT(*) AS nh, SUM(x) AS sh,
         CAST(ROUND(CAST(SUM(x) * SUM(x) AS DOUBLE) / COUNT(*), 12) AS DECIMAL(28,12)) AS term
  FROM hodd GROUP BY hod),
tot AS (
  SELECT SUM(nh) AS n, SUM(sh) AS s, SUM(term) AS ssb_part, COUNT(*) AS n_hods
  FROM groups),
qq AS (SELECT SUM(x * x) AS q FROM hodd)
SELECT CAST(n AS BIGINT) AS n_hours, CAST(n_hods AS BIGINT) AS n_hods,
       ROUND((CAST(ssb_part AS DOUBLE) - CAST(s * s AS DOUBLE) / n)
             / (CAST(q AS DOUBLE) - CAST(s * s AS DOUBLE) / n), 8) AS seasonality_r2
FROM tot CROSS JOIN qq
"""

QUERIES["q_seasonality_strength"] = QuerySpec(
    q_seasonality_strength,
    Q_SEASONALITY_SQL,
    "hour-of-day ANOVA R^2 of hourly arrivals (SSB/SST from integer moments "
    "+ 12dp-rounded per-group terms) — the seasonality-strength diagnostic",
)


# ------------------------------------------- per-group OLS slope
# Simple linear regression per group from the five exact integer
# moments: slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2), intercept from
# the means — quantity (units) vs unit price (cents) per return flag,
# the price-sensitivity readout. Everything integer until the final
# divisions; one partial-agg shuffle. (The multivariate analog is
# q_logreg_gd / q_pca_power_iteration; this is the per-group scalar
# regression a BI layer asks for.)


def q_ols_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.round(F.col("l_extendedprice") * 100 / F.col("l_quantity"), 0)
        .cast("long")
        .alias("x"),  # unit price in cents
        F.col("l_quantity").cast("long").alias("y"),
    )
    # decimal(38,0): n*Sxx crosses the int64 ceiling once unit prices
    # reach ~1e6 cents over 60k+ rows (the ACF/chi2 overflow lesson)
    mom = li.groupBy("flag").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").cast("decimal(38,0)").alias("sx"),
        F.sum("y").cast("decimal(38,0)").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("decimal(38,0)").alias("sxx"),
        F.sum(F.col("x") * F.col("y")).cast("decimal(38,0)").alias("sxy"),
    )
    # subtract in DECIMAL (exact), cast the difference once — casting the
    # two ~1e21 products to double first would lose ~2^19 ulp each
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    return mom.select(
        "flag",
        F.col("n").cast("long").alias("n_rows"),
        F.round(slope * 1e6, 6).alias("slope_per_million_cents"),
        F.round(
            F.col("sy").cast("double") / F.col("n")
            - slope * (F.col("sx").cast("double") / F.col("n")),
            6,
        ).alias("intercept_qty"),
    ).orderBy("flag")


Q_OLS_SQL = """
WITH li AS (
  SELECT l_returnflag AS flag,
         CAST(ROUND(l_extendedprice * 100 / l_quantity, 0) AS BIGINT) AS x,
         CAST(l_quantity AS BIGINT) AS y
  FROM lineitem),
mom AS (
  SELECT flag, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * x) AS sxx, SUM(x * y) AS sxy
  FROM li GROUP BY flag)
SELECT flag, CAST(n AS BIGINT) AS n_rows,
       ROUND(CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6, 6)
         AS slope_per_million_cents,
       ROUND(CAST(sy AS DOUBLE) / n
             - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
               * (CAST(sx AS DOUBLE) / n), 6) AS intercept_qty
FROM mom ORDER BY flag
"""

QUERIES["q_ols_slope"] = QuerySpec(
    q_ols_slope,
    Q_OLS_SQL,
    "per-group simple OLS (quantity vs unit price) from five exact integer "
    "moments — integer until the final divisions",
)


# ------------------------------------ recency-decay engagement score
# Exponentially decayed engagement per user: score = sum over events
# of value * 2^(-age_days / half_life), half-life 7 days, age measured
# from the corpus max event time (1-row broadcast). Each decayed term
# is one in-row double rounded to 12 dp, then decimal-summed per user
# (order-independent); top-20 via TakeOrdered. The standard
# leaderboard/churn-risk scoring pass: one scan + one keyed shuffle.

DECAY_HALF_LIFE_DAYS = 7.0
DECAY_TOPK = 20


def q_decay_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id",
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("v"),
    )
    mx = ev.agg(F.max("sec").alias("max_sec"))
    terms = ev.crossJoin(F.broadcast(mx)).select(
        "user_id",
        F.round(
            F.col("v").cast("double")
            * F.pow(
                F.lit(2.0),
                -((F.col("max_sec") - F.col("sec")).cast("double") / 86400.0)
                / F.lit(DECAY_HALF_LIFE_DAYS),
            )
            / 10000.0,
            12,
        )
        .cast("decimal(28,12)")
        .alias("term"),
    )
    scores = terms.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("term").alias("score_dec"),
    )
    return (
        scores.orderBy(F.col("score_dec").desc(), "user_id")
        .limit(DECAY_TOPK)
        .select(
            "user_id",
            "n_events",
            F.round(F.col("score_dec").cast("double"), 8).alias("decay_score"),
        )
    )


Q_DECAY_SQL = f"""
WITH ev AS (
  SELECT user_id,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS v
  FROM events),
mx AS (SELECT MAX(sec) AS max_sec FROM ev),
terms AS (
  SELECT user_id,
         CAST(ROUND(CAST(v AS DOUBLE)
              * POW(2.0, -(CAST(max_sec - sec AS DOUBLE) / 86400.0) / {DECAY_HALF_LIFE_DAYS})
              / 10000.0, 12) AS DECIMAL(28,12)) AS term
  FROM ev CROSS JOIN mx),
scores AS (
  SELECT user_id, COUNT(*) AS n_events, SUM(term) AS score_dec
  FROM terms GROUP BY user_id)
SELECT user_id, CAST(n_events AS BIGINT) AS n_events,
       ROUND(CAST(score_dec AS DOUBLE), 8) AS decay_score
FROM scores
ORDER BY score_dec DESC, user_id
LIMIT {DECAY_TOPK}
"""

QUERIES["q_decay_engagement"] = QuerySpec(
    q_decay_engagement,
    Q_DECAY_SQL,
    "recency-decayed engagement leaderboard: half-life weighting riding the "
    "scan, 12dp-rounded terms into decimal sums, TakeOrdered top-20",
)


# ------------------------------------------ DAU/WAU stickiness
# The product-health ratio: per ISO-style 7-day bucket (epoch-day / 7),
# weekly active users (exact distinct) and the average daily active
# count over the week's OBSERVED days; stickiness = avg_dau / wau.
# Exact integer distinct counts, two final in-row divisions. Shapes:
# one (user, day) dedup shuffle feeding both rollups.


def q_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    user_days = ev.select(
        "user_id",
        F.floor(F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400).alias(
            "day"
        ),
    ).distinct()
    user_days = user_days.withColumn("week", F.floor(F.col("day") / 7))
    dau = user_days.groupBy("week", "day").agg(F.count(F.lit(1)).alias("dau"))
    daily = dau.groupBy("week").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("dau").alias("dau_sum"),
    )
    wau = user_days.groupBy("week").agg(
        F.countDistinct("user_id").alias("wau")
    )
    return (
        daily.join(wau, "week")
        .select(
            F.col("week").cast("long").alias("week"),
            "n_days",
            "wau",
            F.round(F.col("dau_sum") / F.col("n_days").cast("double"), 6).alias(
                "avg_dau"
            ),
            F.round(
                F.col("dau_sum")
                / F.col("n_days").cast("double")
                / F.col("wau").cast("double"),
                6,
            ).alias("stickiness"),
        )
        .orderBy("week")
    )


Q_STICKINESS_SQL = """
WITH user_days AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) / 86400) AS BIGINT) AS day
  FROM events),
ud AS (SELECT *, CAST(FLOOR(day / 7) AS BIGINT) AS week FROM user_days),
dau AS (SELECT week, day, COUNT(*) AS dau FROM ud GROUP BY 1, 2),
daily AS (SELECT week AS wk, COUNT(*) AS n_days, SUM(dau) AS dau_sum FROM dau GROUP BY week),
wau AS (SELECT week AS wk2, COUNT(DISTINCT user_id) AS wau FROM ud GROUP BY week)
SELECT wk AS week, CAST(n_days AS BIGINT) AS n_days, CAST(wau AS BIGINT) AS wau,
       ROUND(dau_sum / CAST(n_days AS DOUBLE), 6) AS avg_dau,
       ROUND(dau_sum / CAST(n_days AS DOUBLE) / CAST(wau AS DOUBLE), 6) AS stickiness
FROM daily JOIN wau ON wau.wk2 = daily.wk
ORDER BY week
"""

QUERIES["q_dau_wau_stickiness"] = QuerySpec(
    q_dau_wau_stickiness,
    Q_STICKINESS_SQL,
    "DAU/WAU stickiness per 7-day bucket: exact distinct actives, one "
    "(user, day) dedup shuffle feeding both rollups",
)


# ---------------------------------------------- growth accounting
# The growth-accounting decomposition per 7-day bucket: every active
# user is NEW (first-ever week), RETAINED (also active the previous
# week) or RESURRECTED (active before, but not last week); CHURNED
# counts last week's actives who went silent this week. All exact
# distinct-activity set algebra: one (user, week) dedup shuffle, a
# per-user min, and two self-joins on (user, week-1). The identity
# wau(w) = new + retained + resurrected holds row-for-row.


def q_growth_accounting(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    uw = ev.select(
        "user_id",
        F.floor(
            F.floor(F.unix_timestamp(F.date_trunc("day", F.col("ts"))) / 86400) / 7
        ).alias("week"),
    ).distinct()
    first = uw.groupBy("user_id").agg(F.min("week").alias("first_week"))
    prev = uw.select("user_id", (F.col("week") + 1).alias("week"))
    flagged = (
        uw.join(first, "user_id")
        .join(prev.withColumn("was_prev", F.lit(1)), ["user_id", "week"], "left")
        .select(
            "week",
            F.when(F.col("week") == F.col("first_week"), F.lit("new"))
            .when(F.col("was_prev") == 1, F.lit("retained"))
            .otherwise(F.lit("resurrected"))
            .alias("kind"),
        )
    )
    actives = flagged.groupBy("week").agg(
        F.count(F.lit(1)).alias("wau"),
        F.sum((F.col("kind") == "new").cast("int")).alias("n_new"),
        F.sum((F.col("kind") == "retained").cast("int")).alias("n_retained"),
        F.sum((F.col("kind") == "resurrected").cast("int")).alias("n_resurrected"),
    )
    churned = (
        prev.join(uw, ["user_id", "week"], "left_anti")
        .groupBy("week")
        .agg(F.count(F.lit(1)).alias("n_churned"))
    )
    return (
        actives.join(churned, "week", "left")
        .select(
            F.col("week").cast("long").alias("week"),
            "wau",
            "n_new",
            "n_retained",
            "n_resurrected",
            F.coalesce(F.col("n_churned"), F.lit(0)).alias("n_churned"),
        )
        .orderBy("week")
    )


Q_GROWTH_SQL = """
WITH uw AS (
  SELECT DISTINCT user_id,
         CAST(FLOOR(FLOOR(epoch(date_trunc('day', CAST(ts AS TIMESTAMP))) / 86400) / 7) AS BIGINT) AS week
  FROM events),
first AS (SELECT user_id, MIN(week) AS first_week FROM uw GROUP BY user_id),
flagged AS (
  SELECT uw.week,
         CASE WHEN uw.week = f.first_week THEN 'new'
              WHEN p.user_id IS NOT NULL THEN 'retained'
              ELSE 'resurrected' END AS kind
  FROM uw JOIN first f ON f.user_id = uw.user_id
  LEFT JOIN uw p ON p.user_id = uw.user_id AND p.week = uw.week - 1),
actives AS (
  SELECT week, COUNT(*) AS wau,
         SUM(CASE WHEN kind = 'new' THEN 1 ELSE 0 END) AS n_new,
         SUM(CASE WHEN kind = 'retained' THEN 1 ELSE 0 END) AS n_retained,
         SUM(CASE WHEN kind = 'resurrected' THEN 1 ELSE 0 END) AS n_resurrected
  FROM flagged GROUP BY week),
churned AS (
  SELECT a.week + 1 AS week, COUNT(*) AS n_churned
  FROM uw a LEFT JOIN uw b ON b.user_id = a.user_id AND b.week = a.week + 1
  WHERE b.user_id IS NULL
  GROUP BY a.week + 1)
SELECT a.week, CAST(wau AS BIGINT) AS wau,
       CAST(n_new AS BIGINT) AS n_new,
       CAST(n_retained AS BIGINT) AS n_retained,
       CAST(n_resurrected AS BIGINT) AS n_resurrected,
       CAST(COALESCE(c.n_churned, 0) AS BIGINT) AS n_churned
FROM actives a LEFT JOIN churned c ON c.week = a.week
ORDER BY a.week
"""

QUERIES["q_growth_accounting"] = QuerySpec(
    q_growth_accounting,
    Q_GROWTH_SQL,
    "growth accounting per 7-day bucket: new/retained/resurrected/churned "
    "from exact (user, week) set algebra; wau = new+retained+resurrected",
)


# ------------------------------------------ SLO burn-rate windows
# The multi-window error-budget alert (SRE workbook shape): per hour,
# the error ratio (error events / all events), and the 1h/6h burn
# rates — ratio over the window divided by the SLO budget (1%). The
# 6h window is a RANGE frame over the hourly rollup (integer sums),
# so burn rates are ratios of exact integers; an alert fires when
# BOTH windows burn faster than 1x (the standard page condition).


SLO_BUDGET_NUM, SLO_BUDGET_DEN = 1, 100  # 1% error budget


def q_slo_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("event_type") == "error").cast("int")).alias("e"),
    )
    hourly = hourly.withColumn("hs", F.unix_timestamp("h"))
    w6 = Window.orderBy("hs").rangeBetween(-5 * 3600, 0)
    rolled = hourly.withColumn("n6", F.sum("n").over(w6)).withColumn(
        "e6", F.sum("e").over(w6)
    )
    burn1 = (
        F.col("e").cast("double")
        / F.col("n")
        * SLO_BUDGET_DEN
        / SLO_BUDGET_NUM
    )
    burn6 = (
        F.col("e6").cast("double")
        / F.col("n6")
        * SLO_BUDGET_DEN
        / SLO_BUDGET_NUM
    )
    return (
        rolled.select(
            F.col("hs").alias("hour_epoch"),
            "n",
            "e",
            F.round(burn1, 6).alias("burn_1h"),
            F.round(burn6, 6).alias("burn_6h"),
            ((F.col("e") * SLO_BUDGET_DEN > F.col("n") * SLO_BUDGET_NUM)
             & (F.col("e6") * SLO_BUDGET_DEN > F.col("n6") * SLO_BUDGET_NUM))
            .cast("int")
            .alias("page"),
        )
        .orderBy("hour_epoch")
    )


Q_SLO_SQL = f"""
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         COUNT(*) AS n,
         SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
  FROM events GROUP BY 1),
hs AS (SELECT CAST(epoch(h) AS BIGINT) AS hs, n, e FROM hourly),
rolled AS (
  SELECT *,
         SUM(n) OVER (ORDER BY hs RANGE BETWEEN {5 * 3600} PRECEDING AND CURRENT ROW) AS n6,
         SUM(e) OVER (ORDER BY hs RANGE BETWEEN {5 * 3600} PRECEDING AND CURRENT ROW) AS e6
  FROM hs)
SELECT hs AS hour_epoch, CAST(n AS BIGINT) AS n, CAST(e AS BIGINT) AS e,
       ROUND(CAST(e AS DOUBLE) / n * {SLO_BUDGET_DEN} / {SLO_BUDGET_NUM}, 6) AS burn_1h,
       ROUND(CAST(e6 AS DOUBLE) / n6 * {SLO_BUDGET_DEN} / {SLO_BUDGET_NUM}, 6) AS burn_6h,
       CASE WHEN e * {SLO_BUDGET_DEN} > n * {SLO_BUDGET_NUM}
             AND e6 * {SLO_BUDGET_DEN} > n6 * {SLO_BUDGET_NUM} THEN 1 ELSE 0 END AS page
FROM rolled ORDER BY hour_epoch
"""

QUERIES["q_slo_burn_rate"] = QuerySpec(
    q_slo_burn_rate,
    Q_SLO_SQL,
    "multi-window SLO burn rate: 1h/6h error-budget ratios over the hourly "
    "rollup (RANGE frame, integer sums) with the dual-window page condition",
)


# ------------------------------------------- abandonment within 1h
# The funnel complement to q_time_to_convert: per day, the share of
# 'view' events with NO purchase by the same user within the next
# hour — a time-banded anti-join. The purchase side joins per user
# (keyed shuffle); the window condition is a range predicate on the
# join output, and the semi/anti split is one exists-aggregation per
# view event. Exact integer counts, one final division.

ABANDON_WINDOW_S = 3600


def q_view_abandonment(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("sec"),
        F.date_format("ts", "yyyy-MM-dd").alias("day"),
    )
    views = ev.where(F.col("event_type") == "view").select(
        "user_id", "event_id", "sec", "day"
    )
    buys = ev.where(F.col("event_type") == "purchase").select(
        "user_id", F.col("sec").alias("bsec")
    )
    converted = views.join(
        buys,
        (views.user_id == buys.user_id)
        & (F.col("bsec") > F.col("sec"))
        & (F.col("bsec") <= F.col("sec") + ABANDON_WINDOW_S),
        "left_semi",
    )
    per_day = views.groupBy("day").agg(F.count(F.lit(1)).alias("n_views"))
    conv_day = converted.groupBy("day").agg(
        F.count(F.lit(1)).alias("n_converted")
    )
    return (
        per_day.join(conv_day, "day", "left")
        .select(
            "day",
            "n_views",
            F.coalesce(F.col("n_converted"), F.lit(0)).alias("n_converted"),
            F.round(
                (F.col("n_views") - F.coalesce(F.col("n_converted"), F.lit(0)))
                / F.col("n_views").cast("double"),
                6,
            ).alias("abandonment_rate"),
        )
        .orderBy("day")
    )


Q_ABANDON_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
         strftime(CAST(ts AS TIMESTAMP), '%Y-%m-%d') AS day
  FROM events),
views AS (SELECT user_id, event_id, sec, day FROM ev WHERE event_type = 'view'),
buys AS (SELECT user_id, sec AS bsec FROM ev WHERE event_type = 'purchase'),
conv AS (
  SELECT DISTINCT v.event_id, v.day
  FROM views v JOIN buys b
    ON b.user_id = v.user_id
   AND b.bsec > v.sec AND b.bsec <= v.sec + {ABANDON_WINDOW_S}),
per_day AS (SELECT day, COUNT(*) AS n_views FROM views GROUP BY day),
conv_day AS (SELECT day, COUNT(*) AS n_converted FROM conv GROUP BY day)
SELECT p.day, CAST(n_views AS BIGINT) AS n_views,
       CAST(COALESCE(n_converted, 0) AS BIGINT) AS n_converted,
       ROUND((n_views - COALESCE(n_converted, 0)) / CAST(n_views AS DOUBLE), 6)
         AS abandonment_rate
FROM per_day p LEFT JOIN conv_day c ON c.day = p.day
ORDER BY p.day
"""

QUERIES["q_view_abandonment"] = QuerySpec(
    q_view_abandonment,
    Q_ABANDON_SQL,
    "per-day view abandonment: time-banded left-semi join (purchase within "
    "1h) then exact counts — the funnel complement to time-to-convert",
)


# ------------------------------------------ grid-bucketed spatial join
# The spatial-join candidate generator (the H3/S2 pattern): customers
# get deterministic md5-uniform coordinates, points bucket into a
# 10-degree grid, ONE side explodes to its 3x3 cell neighborhood and
# the join is a plain equi-join on the cell key — neighbor-complete
# for any radius <= cell size, NEVER an all-pairs distance test. The
# verify stage computes squared degree distance (rounded 8dp) against
# a 5-degree radius. Scale shape: candidates are bounded per cell;
# skewed cells would be salted exactly like the fuzzy-join blocks.

GEO_CELL_DEG = 10
GEO_RADIUS_DEG = 5


def q_spatial_grid_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey")

    def u(salt: str):
        h = F.conv(
            F.substring(F.md5(F.concat(F.col("c_custkey").cast("string"),
                                       F.lit(salt))), 1, 8),
            16,
            10,
        ).cast("double")
        return (h + 1) / F.lit(4294967296.0)

    pts = cust.select(
        "c_custkey",
        F.round(u("lat") * 180 - 90, 6).alias("lat"),
        F.round(u("lon") * 360 - 180, 6).alias("lon"),
    )
    pts = pts.withColumn("cx", F.floor(F.col("lat") / GEO_CELL_DEG)).withColumn(
        "cy", F.floor(F.col("lon") / GEO_CELL_DEG)
    )
    right = pts.select(
        F.col("c_custkey").alias("k2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
        "cx",
        "cy",
    )
    probe = (
        pts.select("c_custkey", "lat", "lon", "cx", "cy")
        .withColumn("dx", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .withColumn("dy", F.explode(F.array(*[F.lit(i) for i in (-1, 0, 1)])))
        .select(
            F.col("c_custkey").alias("k1"),
            F.col("lat").alias("lat1"),
            F.col("lon").alias("lon1"),
            (F.col("cx") + F.col("dx")).alias("cx"),
            (F.col("cy") + F.col("dy")).alias("cy"),
        )
    )
    cand = probe.join(right, ["cx", "cy"]).where(F.col("k1") < F.col("k2"))
    scored = cand.select(
        F.round(
            (F.col("lat1") - F.col("lat2")) * (F.col("lat1") - F.col("lat2"))
            + (F.col("lon1") - F.col("lon2")) * (F.col("lon1") - F.col("lon2")),
            8,
        ).alias("d2")
    )
    return (
        scored.agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum(
                (F.col("d2") <= F.lit(float(GEO_RADIUS_DEG**2))).cast("int")
            ).alias("n_close_pairs"),
        )
        .crossJoin(F.broadcast(pts.agg(F.count(F.lit(1)).alias("n_points"))))
        .select("n_points", "n_candidates", "n_close_pairs")
    )


Q_SPATIAL_SQL = f"""
WITH pts AS (
  SELECT c_custkey,
         ROUND((('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lat'), 1, 8))::BIGINT + 1.0)
               / 4294967296.0 * 180 - 90, 6) AS lat,
         ROUND((('0x' || substring(md5(CAST(c_custkey AS VARCHAR) || 'lon'), 1, 8))::BIGINT + 1.0)
               / 4294967296.0 * 360 - 180, 6) AS lon
  FROM customer),
cells AS (
  SELECT *, CAST(FLOOR(lat / {GEO_CELL_DEG}) AS BIGINT) AS cx,
            CAST(FLOOR(lon / {GEO_CELL_DEG}) AS BIGINT) AS cy
  FROM pts),
probe AS (
  SELECT c_custkey AS k1, lat AS lat1, lon AS lon1,
         cx + dx.g AS cx, cy + dy.g AS cy
  FROM cells, (SELECT UNNEST([-1, 0, 1]) AS g) dx, (SELECT UNNEST([-1, 0, 1]) AS g) dy),
cand AS (
  SELECT ROUND((p.lat1 - r.lat) * (p.lat1 - r.lat)
               + (p.lon1 - r.lon) * (p.lon1 - r.lon), 8) AS d2
  FROM probe p JOIN cells r ON r.cx = p.cx AND r.cy = p.cy AND p.k1 < r.c_custkey)
SELECT (SELECT COUNT(*) FROM pts) AS n_points,
       COUNT(*) AS n_candidates,
       CAST(SUM(CASE WHEN d2 <= {GEO_RADIUS_DEG**2}.0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_close_pairs
FROM cand
"""

QUERIES["q_spatial_grid_join"] = QuerySpec(
    q_spatial_grid_join,
    Q_SPATIAL_SQL,
    "grid-bucketed spatial join: 3x3 neighborhood probe equi-join (the "
    "H3/S2 candidate pattern), neighbor-complete for radius <= cell size",
)


# ------------------------------------------------ join-key skew report
# The pre-join diagnostic behind every salting decision in this repo:
# per candidate join key, the per-key row-count distribution's max,
# LOW median, top-key share, and the salt factor a skew-aware join
# would apply (ceil(max/avg), capped at 32). All integer counts; the
# LOW median reuses the cumulative-walk machinery; ratios are final
# divisions. One partial-agg shuffle per key (cheap: count-by-key).


def q_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    outs = []
    for col in ("l_orderkey", "l_partkey", "l_suppkey"):
        per_key = li.groupBy(col).agg(F.count(F.lit(1)).alias("c"))
        vals = per_key.groupBy("c").agg(F.count(F.lit(1)).alias("nkeys"))
        win = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, 0)
        w_all = Window.partitionBy()
        med = (
            vals.withColumn("cum", F.sum("nkeys").over(win))
            .withColumn("tot", F.sum("nkeys").over(w_all))
            .where(2 * F.col("cum") >= F.col("tot"))
            .agg(F.min("c").alias("median_rows"))
        )
        stats = per_key.agg(
            F.lit(col).alias("join_key"),
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("c").alias("n_rows"),
            F.max("c").alias("max_rows"),
        )
        outs.append(
            stats.crossJoin(F.broadcast(med)).select(
                "join_key",
                "n_keys",
                "n_rows",
                "max_rows",
                "median_rows",
                F.round(
                    F.col("max_rows") / (F.col("n_rows") / F.col("n_keys")).cast("double"),
                    6,
                ).alias("max_over_avg"),
                F.least(
                    F.lit(32),
                    F.ceil(
                        F.col("max_rows")
                        / (F.col("n_rows") / F.col("n_keys"))
                    ),
                ).cast("long").alias("suggested_salt"),
            )
        )
    out = outs[0]
    for extra in outs[1:]:
        out = out.unionByName(extra)
    return out.orderBy("join_key")


Q_SKEWREPORT_SQL = """
WITH ks AS (
  SELECT 'l_orderkey' AS join_key, l_orderkey AS k FROM lineitem
  UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
  UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem),
per_key AS (SELECT join_key, k, COUNT(*) AS c FROM ks GROUP BY 1, 2),
vals AS (SELECT join_key, c, COUNT(*) AS nkeys FROM per_key GROUP BY 1, 2),
med AS (
  SELECT join_key, MIN(c) AS median_rows FROM (
    SELECT join_key, c,
           SUM(nkeys) OVER (PARTITION BY join_key ORDER BY c
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
           SUM(nkeys) OVER (PARTITION BY join_key) AS tot
    FROM vals) WHERE 2 * cum >= tot GROUP BY join_key),
stats AS (
  SELECT join_key, COUNT(*) AS n_keys, SUM(c) AS n_rows, MAX(c) AS max_rows
  FROM per_key GROUP BY join_key)
SELECT s.join_key, CAST(n_keys AS BIGINT) AS n_keys, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(max_rows AS BIGINT) AS max_rows, CAST(median_rows AS BIGINT) AS median_rows,
       ROUND(max_rows / (CAST(n_rows AS DOUBLE) / n_keys), 6) AS max_over_avg,
       CAST(LEAST(32, CEIL(max_rows / (CAST(n_rows AS DOUBLE) / n_keys))) AS BIGINT)
         AS suggested_salt
FROM stats s JOIN med m ON m.join_key = s.join_key
ORDER BY s.join_key
"""

QUERIES["q_key_skew_report"] = QuerySpec(
    q_key_skew_report,
    Q_SKEWREPORT_SQL,
    "join-key skew report: per-key count distribution (max, LOW median, "
    "max/avg) and the capped salt factor a skew-aware join would apply",
)


# ------------------------------------------ round-number bias audit
# The forensic-accounting complement to Benford: the share of order
# totals landing on whole dollars (cents % 100 == 0) versus the 1%
# a uniform cents distribution implies, with the one-proportion
# z-score. All integer counts; z is the single final expression.
# Human-entered or manipulated amounts over-index on round numbers —
# the classic expense-fraud tell.


def q_round_number_bias(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents")
    )
    agg = o.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum((F.col("cents") % 100 == 0).cast("int")).alias("n_round"),
    )
    p0 = 0.01
    return agg.select(
        "n",
        "n_round",
        F.round(F.col("n_round") / F.col("n").cast("double"), 8).alias(
            "round_share"
        ),
        F.round(
            (F.col("n_round") / F.col("n").cast("double") - F.lit(p0))
            / F.sqrt(F.lit(p0) * (1 - p0) / F.col("n")),
            6,
        ).alias("z_vs_uniform"),
    )


Q_ROUNDBIAS_SQL = """
WITH o AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents FROM orders),
agg AS (
  SELECT COUNT(*) AS n,
         SUM(CASE WHEN cents % 100 = 0 THEN 1 ELSE 0 END) AS n_round
  FROM o)
SELECT CAST(n AS BIGINT) AS n, CAST(n_round AS BIGINT) AS n_round,
       ROUND(n_round / CAST(n AS DOUBLE), 8) AS round_share,
       ROUND((n_round / CAST(n AS DOUBLE) - 0.01)
             / SQRT(0.01 * 0.99 / n), 6) AS z_vs_uniform
FROM agg
"""

QUERIES["q_round_number_bias"] = QuerySpec(
    q_round_number_bias,
    Q_ROUNDBIAS_SQL,
    "round-number bias audit: whole-dollar share vs the uniform-cents 1% "
    "with a one-proportion z — the forensic complement to Benford",
)


# ------------------------------------------ duplicate-payment detect
# The financial-DQ double-charge scan: purchase events by the same
# user for the same amount within 5 minutes. Candidates come from an
# equi-join on (user, cents) — the natural blocking key, so the time
# band only scans within-block pairs — with the strict (sec, id)
# ordering making each unordered pair count once. Exact integer
# domain throughout.

DUP_WINDOW_S = 300


def q_duplicate_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    p = ev.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("eid"),
        F.unix_timestamp("ts").alias("sec"),
        F.round(F.col("value") * 10000, 0).cast("long").alias("cents"),
    )
    a = p.select("user_id", "cents", F.col("eid").alias("e1"), F.col("sec").alias("s1"))
    b = p.select("user_id", "cents", F.col("eid").alias("e2"), F.col("sec").alias("s2"))
    pairs = a.join(b, ["user_id", "cents"]).where(
        (
            (F.col("s1") < F.col("s2"))
            | ((F.col("s1") == F.col("s2")) & (F.col("e1") < F.col("e2")))
        )
        & (F.col("s2") - F.col("s1") <= DUP_WINDOW_S)
    )
    return pairs.agg(
        F.count(F.lit(1)).alias("n_suspect_pairs"),
        F.countDistinct("user_id").alias("n_users_flagged"),
        F.coalesce(F.sum("cents"), F.lit(0)).alias("exposure_cents"),
    )


Q_DUPPAY_SQL = f"""
WITH p AS (
  SELECT user_id, event_id AS eid,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS sec,
         CAST(ROUND(value * 10000, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'),
pairs AS (
  SELECT a.user_id, a.cents
  FROM p a JOIN p b
    ON b.user_id = a.user_id AND b.cents = a.cents
   AND (a.sec < b.sec OR (a.sec = b.sec AND a.eid < b.eid))
   AND b.sec - a.sec <= {DUP_WINDOW_S})
SELECT COUNT(*) AS n_suspect_pairs,
       COUNT(DISTINCT user_id) AS n_users_flagged,
       CAST(COALESCE(SUM(cents), 0) AS BIGINT) AS exposure_cents
FROM pairs
"""

QUERIES["q_duplicate_payments"] = QuerySpec(
    q_duplicate_payments,
    Q_DUPPAY_SQL,
    "double-charge scan: same (user, amount) within 5 minutes via the "
    "(user, cents) blocking equi-join + time band, pairs counted once",
)


# ------------------------------------------------ ABC classification
# The supply-chain Pareto classes: parts ranked by revenue; A-class
# covers the first 80% of cumulative revenue, B the next 15%, C the
# tail. Cut tests are integer cross-multiplications on exact cents
# (5*cum <= 4*total for A; 20*cum <= 19*total for B), applied to the
# revenue BEFORE each part (so the part that crosses the line still
# belongs to the class it completes). One keyed shuffle + one ranked
# walk over the per-part rollup; output is the class summary.


def q_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    per_part = li.groupBy("pk").agg(F.sum("cents").alias("rev"))
    win = Window.orderBy(F.col("rev").desc(), "pk").rowsBetween(
        Window.unboundedPreceding, -1
    )
    w_all = Window.partitionBy()
    walked = (
        per_part.withColumn("cum_before", F.coalesce(F.sum("rev").over(win), F.lit(0)))
        .withColumn("total", F.sum("rev").over(w_all))
        .withColumn(
            "abc",
            F.when(F.col("cum_before") * 5 <= F.col("total") * 4, F.lit("A"))
            .when(F.col("cum_before") * 20 <= F.col("total") * 19, F.lit("B"))
            .otherwise(F.lit("C")),
        )
    )
    return (
        walked.groupBy("abc")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("rev").alias("class_revenue_cents"),
        )
        .crossJoin(F.broadcast(per_part.agg(F.count(F.lit(1)).alias("total_parts"))))
        .select(
            "abc",
            "n_parts",
            "class_revenue_cents",
            F.round(F.col("n_parts") / F.col("total_parts").cast("double"), 6).alias(
                "part_share"
            ),
        )
        .orderBy("abc")
    )


Q_ABC_SQL = """
WITH per_part AS (
  SELECT l_partkey AS pk,
         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS rev
  FROM lineitem GROUP BY l_partkey),
walked AS (
  SELECT pk, rev,
         COALESCE(SUM(rev) OVER (ORDER BY rev DESC, pk
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS cum_before,
         SUM(rev) OVER () AS total
  FROM per_part),
classed AS (
  SELECT *,
         CASE WHEN cum_before * 5 <= total * 4 THEN 'A'
              WHEN cum_before * 20 <= total * 19 THEN 'B'
              ELSE 'C' END AS abc
  FROM walked)
SELECT abc, COUNT(*) AS n_parts,
       CAST(SUM(rev) AS BIGINT) AS class_revenue_cents,
       ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM per_part) AS DOUBLE), 6)
         AS part_share
FROM classed GROUP BY abc ORDER BY abc
"""

QUERIES["q_abc_classification"] = QuerySpec(
    q_abc_classification,
    Q_ABC_SQL,
    "ABC (Pareto) inventory classes over per-part revenue: integer "
    "cross-multiplied 80/95% cuts on the cumulative walk",
)


# ---------------------------------------------- concentration (HHI)
# The Herfindahl-Hirschman concentration index of supplier revenue:
# HHI = sum of squared market shares = sum(rev_i^2) / (sum(rev))^2,
# both sums exact decimals (cents squared crosses int64), one final
# division — the antitrust-style complement to Gini/Lorenz already in
# the registry. Also reports the effective number of suppliers 1/HHI.


def q_supplier_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_suppkey").alias("sk"),
        F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
    )
    per_supp = li.groupBy("sk").agg(
        F.sum("cents").cast("decimal(38,0)").alias("rev")
    )
    agg = per_supp.agg(
        F.count(F.lit(1)).alias("n_suppliers"),
        F.sum("rev").alias("total"),
        F.sum(F.col("rev") * F.col("rev")).alias("sq_sum"),
    )
    hhi = agg["sq_sum"].cast("double") / (
        F.col("total").cast("double") * F.col("total").cast("double")
    )
    return agg.select(
        "n_suppliers",
        F.round(hhi, 10).alias("hhi"),
        F.round(F.lit(1.0) / hhi, 6).alias("effective_suppliers"),
    )


Q_HHI_SQL = """
WITH per_supp AS (
  SELECT l_suppkey AS sk,
         CAST(SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS DECIMAL(38,0)) AS rev
  FROM lineitem GROUP BY l_suppkey),
agg AS (
  SELECT COUNT(*) AS n_suppliers, SUM(rev) AS total, SUM(rev * rev) AS sq_sum
  FROM per_supp)
SELECT CAST(n_suppliers AS BIGINT) AS n_suppliers,
       ROUND(CAST(sq_sum AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE)), 10) AS hhi,
       ROUND(1.0 / (CAST(sq_sum AS DOUBLE) / (CAST(total AS DOUBLE) * CAST(total AS DOUBLE))), 6)
         AS effective_suppliers
FROM agg
"""

QUERIES["q_supplier_hhi"] = QuerySpec(
    q_supplier_hhi,
    Q_HHI_SQL,
    "Herfindahl concentration of supplier revenue (decimal-exact squared "
    "shares, effective-supplier count 1/HHI)",
)
