"""Round-8 part G, statistics block (split from extensions_r8g per the
r9 verdict's one-theme-per-file convention; behavior unchanged):
rank/location tests (Mann-Whitney, Welch, KS), multiple-testing
control (BH-FDR), association (mutual information / Cramer's V,
Adamic-Adar link prediction), series statistics (ACF, burstiness,
seasonality strength, per-group OLS slope), weighted median, and the
SMD covariate-balance audit.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: cross-row sums stay integer/decimal;
doubles only in per-cell terms rounded before any decimal sum or in
one final division.
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
    from kcore_spark.caching import transient_persist

    from kcore_spark.operators.relational import spread

    # transient_persist: the deduped bipartite edge list feeds BOTH the
    # degree aggregate and the join probe — uncached, the scan +
    # distinct shuffle ran twice (before-plan: 2 parquet scans).
    # r13: spread on pk first — the serial single-row-group scan no
    # longer runs the distinct's partial dedup, and every downstream
    # pk-clustered op (distinct, degree agg, join, collect_set group)
    # reuses this one exchange.
    li = transient_persist(
        spread(
            load_table(spark, sf_dir, "lineitem").select(
                F.col("l_partkey").alias("pk"), F.col("l_suppkey").alias("sk")
            ),
            "pk",
        ).distinct()
    )
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
        # the pk-spread at the source keeps this stage at full
        # parallelism (explicit repartitions are never AQE-coalesced),
        # so the former extra repartition here is gone
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


# ----------------------------------------- weighted median per group
# Weighted median of lineitem unit price (cents) weighted by quantity,
# per return flag — the survey-statistics quantile: the smallest value
# whose cumulative weight reaches half the group total. Same scale
# shape as the rank tests: one partial-agg shuffle groups identical
# (flag, value) rows, then the window walks the per-group
# distinct-value table with exact integer weights (the >= W/2 test is
# 2*cumw >= W, integer).


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.relational import spread

    # spread on the exact groupBy key: the (flag, cents) hash agg is
    # near-distinct (one group per price), so the serial scan task was
    # building a ~500k-entry hash map; the groupBy below reuses this
    # exchange (same clustering), so the plan pays no extra shuffle
    li = spread(
        load_table(spark, sf_dir, "lineitem").select(
            F.col("l_returnflag").alias("flag"),
            F.round(F.col("l_extendedprice") * 100, 0).cast("long").alias("cents"),
            F.col("l_quantity").cast("long").alias("wt"),
        ),
        "flag",
        "cents",
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


