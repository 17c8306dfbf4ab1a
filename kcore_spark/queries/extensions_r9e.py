"""Round-9 surface extensions, batch E (SURVEY §2.3 N r9):
Nelson-Aalen cumulative hazard (completing the survival family beside
Kaplan-Meier), Hurst exponent by rescaled-range analysis (long-memory
diagnostic), and single-feature best-split information gain (the CART
screening primitive).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: life-table counts are integers;
per-step hazard terms and R/S ratios are rounded doubles summed as
DECIMAL; entropy terms are IEEE-deterministic functions of integer
ratios.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------- Nelson-Aalen cumulative hazard
# The estimator-side complement to q_kaplan_meier (same life table:
# customer "lifetime" = days between first and last order, event =
# reaching 10 orders, else right-censored): H(t) = sum_{t_i<=t}
# d_i/n_i. Unlike KM's order-sensitive product, the NA sum is exact
# under the round-then-decimal-sum idiom — each per-time hazard
# increment is one double rounded to 12, the running sum a decimal
# window cumsum. Scale shape identical to KM: one partial-agg shuffle
# to the (domain-bounded) life table, windows over curve-sized data.

NA_EVENT_MIN_ORDERS = 10  # same event definition as q_kaplan_meier


def q_nelson_aalen(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    life = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.to_date(F.max("o_orderdate")), F.to_date(F.min("o_orderdate"))
        ).alias("dur"),
        (F.count(F.lit(1)) >= NA_EVENT_MIN_ORDERS).cast("int").alias("event"),
    )
    per_t = life.groupBy("dur").agg(
        F.sum("event").cast("long").alias("d"),
        F.sum(1 - F.col("event")).cast("long").alias("c"),
    )
    w_prev = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, -1)
    w_cum = Window.orderBy("dur").rowsBetween(Window.unboundedPreceding, 0)
    risk = per_t.crossJoin(
        F.broadcast(life.agg(F.count(F.lit(1)).alias("total")))
    ).withColumn(
        "n_risk",
        F.col("total")
        - F.coalesce(F.sum(F.col("d") + F.col("c")).over(w_prev), F.lit(0)),
    )
    hazard = risk.withColumn(
        "dh",
        F.round(F.col("d").cast("double") / F.col("n_risk"), 12).cast(
            "decimal(24,12)"
        ),
    )
    return (
        hazard.select(
            "dur",
            "d",
            "c",
            "n_risk",
            F.round(F.sum("dh").over(w_cum).cast("double"), 8).alias("cum_hazard"),
        )
        .orderBy("dur")
    )


Q_NA_SQL = f"""
WITH life AS (
  SELECT o_custkey,
         datediff('day', CAST(MIN(o_orderdate) AS DATE), CAST(MAX(o_orderdate) AS DATE)) AS dur,
         CASE WHEN COUNT(*) >= {NA_EVENT_MIN_ORDERS} THEN 1 ELSE 0 END AS event
  FROM orders GROUP BY o_custkey),
per_t AS (
  SELECT dur, CAST(SUM(event) AS BIGINT) AS d,
         CAST(SUM(1 - event) AS BIGINT) AS c
  FROM life GROUP BY dur),
risk AS (
  SELECT dur, d, c,
         CAST((SELECT COUNT(*) FROM life)
           - COALESCE(SUM(d + c) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
  FROM per_t),
hazard AS (
  SELECT dur, d, c, n_risk,
         CAST(ROUND(CAST(d AS DOUBLE) / n_risk, 12) AS DECIMAL(24,12)) AS dh
  FROM risk)
SELECT dur, d, c, n_risk,
       ROUND(CAST(SUM(dh) OVER (ORDER BY dur
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE), 8)
         AS cum_hazard
FROM hazard
ORDER BY dur
"""

QUERIES["q_nelson_aalen"] = QuerySpec(
    q_nelson_aalen,
    Q_NA_SQL,
    "Nelson-Aalen cumulative hazard on the q_kaplan_meier life table: "
    "exact decimal cumsum of rounded per-time hazard increments",
)


# ----------------------------- Hurst exponent (R/S analysis)
# Long-memory diagnostic over each event_type's per-hour event-count
# series: for window sizes m in {8,16,32}, split the series into
# consecutive m-chunks, compute the rescaled range R/S per chunk
# (range of cumulative mean-deviations over population std), average
# per m, and fit ln E[R/S] = H ln m + c by closed-form OLS over the
# three points — H near 0.5 is memoryless, >0.5 trending. Scale
# shape: the series is domain-bounded (hours), so everything after
# the first groupBy is curve-sized; windows are keyed by
# (type, chunk). Determinism: counts are integers; chunk means are
# decimal-exact; the within-chunk deviation cumsum is exact decimal;
# R is a decimal max-min; only R/S and the final OLS are doubles on
# rounded inputs.

HURST_SIZES = [8, 16, 32]


def q_hurst_exponent(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("h")
    ).agg(F.count(F.lit(1)).alias("x"))
    seq = hourly.select(
        "event_type",
        "x",
        (
            F.row_number().over(Window.partitionBy("event_type").orderBy("h")) - 1
        ).alias("t"),
    )
    rs_parts = []
    for m in HURST_SIZES:
        chunks = seq.select(
            "event_type",
            F.lit(m).alias("m"),
            F.floor(F.col("t") / m).cast("long").alias("chunk"),
            (F.col("t") % m).alias("i"),
            F.col("x").cast("decimal(18,6)").alias("xd"),
        )
        sizes = chunks.groupBy("event_type", "m", "chunk").agg(
            F.count(F.lit(1)).alias("n_c"),
            F.sum("xd").alias("sx"),
            F.sum(F.col("xd") * F.col("xd")).alias("sxx"),
        ).where(F.col("n_c") == m)
        dev = (
            chunks.join(sizes, ["event_type", "m", "chunk"])
            .withColumn(
                "mean_c",
                F.round(F.col("sx").cast("double") / F.col("n_c"), 9).cast(
                    "decimal(18,9)"
                ),
            )
            .withColumn(
                "cumdev",
                F.sum(
                    F.col("xd").cast("decimal(18,9)") - F.col("mean_c")
                ).over(
                    Window.partitionBy("event_type", "m", "chunk")
                    .orderBy("i")
                    .rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
        )
        per_chunk = dev.groupBy("event_type", "m", "chunk").agg(
            (F.max("cumdev") - F.min("cumdev")).cast("double").alias("r"),
            F.first("sx").alias("sx"),
            F.first("sxx").alias("sxx"),
            F.first("n_c").alias("n_c"),
        )
        # zero-variance chunks (constant series segments) have no
        # defined rescaled range — excluded identically on both engines
        var = F.col("sxx").cast("double") / F.col("n_c") - (
            F.col("sx").cast("double") / F.col("n_c")
        ) * (F.col("sx").cast("double") / F.col("n_c"))
        rs = (
            per_chunk.withColumn("s2", var)
            .where(F.col("s2") > 0)
            .select(
                "event_type",
                "m",
                "chunk",
                F.round(F.col("r") / F.sqrt(F.col("s2")), 9)
                .cast("decimal(18,9)")
                .alias("rs"),
            )
        )
        rs_parts.append(rs)
    all_rs = rs_parts[0].unionByName(rs_parts[1]).unionByName(rs_parts[2])
    per_m = all_rs.groupBy("event_type", "m").agg(
        F.round(F.sum("rs").cast("double") / F.count(F.lit(1)), 9).alias("ers")
    )
    pts = per_m.select(
        "event_type",
        F.log(F.col("m").cast("double")).alias("lx"),
        F.log("ers").alias("ly"),
    )
    ols = pts.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    )
    return ols.select(
        "event_type",
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("hurst"),
    ).orderBy("event_type")


def _hurst_sql() -> str:
    m_selects = []
    for m in HURST_SIZES:
        m_selects.append(
            f"""
  SELECT event_type, {m} AS m, CAST(FLOOR(t / {m}) AS BIGINT) AS chunk,
         t % {m} AS i, CAST(x AS DECIMAL(18,6)) AS xd
  FROM seq"""
        )
    chunks_union = "\n  UNION ALL".join(m_selects)
    return f"""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         COUNT(*) AS x
  FROM events GROUP BY event_type, h),
seq AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) - 1 AS t
  FROM hourly),
chunks AS ({chunks_union}),
sizes AS (
  SELECT event_type, m, chunk, COUNT(*) AS n_c,
         SUM(xd) AS sx, SUM(xd * xd) AS sxx
  FROM chunks GROUP BY event_type, m, chunk
  HAVING COUNT(*) = m),
dev AS (
  SELECT c.event_type, c.m, c.chunk, c.i, s.sx, s.sxx, s.n_c,
         SUM(CAST(c.xd AS DECIMAL(18,9))
             - CAST(ROUND(CAST(s.sx AS DOUBLE) / s.n_c, 9) AS DECIMAL(18,9)))
           OVER (PARTITION BY c.event_type, c.m, c.chunk ORDER BY c.i
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumdev
  FROM chunks c JOIN sizes s
    ON c.event_type = s.event_type AND c.m = s.m AND c.chunk = s.chunk),
per_chunk AS (
  SELECT event_type, m, chunk,
         CAST(MAX(cumdev) - MIN(cumdev) AS DOUBLE) AS r,
         MIN(sx) AS sx, MIN(sxx) AS sxx, MIN(n_c) AS n_c
  FROM dev GROUP BY event_type, m, chunk),
rs AS (
  SELECT event_type, m, chunk,
         CAST(ROUND(r / sqrt(s2), 9) AS DECIMAL(18,9)) AS rs
  FROM (SELECT *,
               CAST(sxx AS DOUBLE) / n_c
                 - (CAST(sx AS DOUBLE) / n_c) * (CAST(sx AS DOUBLE) / n_c) AS s2
        FROM per_chunk)
  WHERE s2 > 0),
per_m AS (
  SELECT event_type, m,
         ROUND(CAST(SUM(rs) AS DOUBLE) / COUNT(*), 9) AS ers
  FROM rs GROUP BY event_type, m),
pts AS (
  SELECT event_type, LN(CAST(m AS DOUBLE)) AS lx, LN(ers) AS ly FROM per_m),
ols AS (
  SELECT event_type, COUNT(*) AS k, SUM(lx) AS sx, SUM(ly) AS sy,
         SUM(lx * ly) AS sxy, SUM(lx * lx) AS sxx
  FROM pts GROUP BY event_type)
SELECT event_type,
       ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6) AS hurst
FROM ols
ORDER BY event_type
"""


QUERIES["q_hurst_exponent"] = QuerySpec(
    q_hurst_exponent,
    _hurst_sql(),
    "Hurst exponent by rescaled-range analysis over hourly event counts: "
    "decimal-exact chunk deviations, log-log OLS over window sizes 8/16/32",
)


# ----------------------------- Best-split information gain
# The CART screening primitive for one numeric feature: given label
# y = (event_type = 'purchase') and feature value, evaluate every
# candidate threshold on a fixed data-independent grid (5,10,..,95)
# and report the top 5 splits by information gain. One corpus pass
# bins rows into the 20 fixed intervals (integer partials); the
# threshold sweep is a cum-sum over 20 rows joined to the 19-row
# candidate grid — broadcast-sized. Entropy terms are doubles on
# ratios of integers, IEEE-identical across engines.


def q_best_split_infogain(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        (F.col("event_type") == "purchase").cast("long").alias("y"),
        F.least(
            F.lit(19), F.greatest(F.lit(0), F.floor(F.col("value") / 5).cast("int"))
        ).alias("bin"),
    )
    bins = ev.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("p")
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        F.sum("n").over(wc).alias("cn"),
        F.sum("p").over(wc).alias("cp"),
    ).where(F.col("bin") < 19)
    tot = bins.agg(
        F.sum("n").alias("nt"), F.sum("p").alias("pt")
    )

    def ent(p, n):
        # binary entropy of a p/n split, safe at the boundaries
        q = p.cast("double") / n
        return F.when(
            (q > 0) & (q < 1),
            -(q * F.log2(q) + (1 - q) * F.log2(1 - q)),
        ).otherwise(F.lit(0.0))

    sweep = cum.crossJoin(F.broadcast(tot)).select(
        ((F.col("bin") + 1) * 5).alias("threshold"),
        F.col("cn").alias("n_left"),
        (F.col("nt") - F.col("cn")).alias("n_right"),
        F.round(
            ent(F.col("pt"), F.col("nt"))
            - (
                F.col("cn").cast("double") / F.col("nt") * ent(F.col("cp"), F.col("cn"))
                + (F.col("nt") - F.col("cn")).cast("double")
                / F.col("nt")
                * ent(F.col("pt") - F.col("cp"), F.col("nt") - F.col("cn"))
            ),
            9,
        ).alias("gain"),
    )
    return sweep.orderBy(F.desc("gain"), "threshold").limit(5)


Q_SPLIT_SQL = """
WITH binned AS (
  SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y,
         LEAST(19, GREATEST(0, CAST(FLOOR(value / 5) AS INT))) AS bin
  FROM events),
bins AS (
  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS p
  FROM binned GROUP BY bin),
cum AS (
  SELECT bin,
         SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         SUM(p) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
  FROM bins WHERE bin < 19),
tot AS (SELECT SUM(n) AS nt, SUM(p) AS pt FROM bins),
sweep AS (
  SELECT (bin + 1) * 5 AS threshold,
         CAST(cn AS BIGINT) AS n_left, CAST(nt - cn AS BIGINT) AS n_right,
         ROUND(
           (CASE WHEN pt > 0 AND pt < nt THEN
              -((CAST(pt AS DOUBLE)/nt) * log2(CAST(pt AS DOUBLE)/nt)
                + (1 - CAST(pt AS DOUBLE)/nt) * log2(1 - CAST(pt AS DOUBLE)/nt))
            ELSE 0.0 END)
           - ((CAST(cn AS DOUBLE)/nt) *
                (CASE WHEN cp > 0 AND cp < cn THEN
                   -((CAST(cp AS DOUBLE)/cn) * log2(CAST(cp AS DOUBLE)/cn)
                     + (1 - CAST(cp AS DOUBLE)/cn) * log2(1 - CAST(cp AS DOUBLE)/cn))
                 ELSE 0.0 END)
              + (CAST(nt - cn AS DOUBLE)/nt) *
                (CASE WHEN (pt - cp) > 0 AND (pt - cp) < (nt - cn) THEN
                   -((CAST(pt - cp AS DOUBLE)/(nt - cn)) * log2(CAST(pt - cp AS DOUBLE)/(nt - cn))
                     + (1 - CAST(pt - cp AS DOUBLE)/(nt - cn)) * log2(1 - CAST(pt - cp AS DOUBLE)/(nt - cn)))
                 ELSE 0.0 END)), 9) AS gain
  FROM cum CROSS JOIN tot)
SELECT threshold, n_left, n_right, gain
FROM sweep
ORDER BY gain DESC, threshold
LIMIT 5
"""

QUERIES["q_best_split_infogain"] = QuerySpec(
    q_best_split_infogain,
    Q_SPLIT_SQL,
    "CART best-split screen for one numeric feature: fixed 19-threshold "
    "grid from one integer-partial pass, entropy sweep broadcast-sized",
)
