"""Round-9 surface extensions, batch D (SURVEY §2.3 N r9): isotonic
calibration by the PAVA minimax identity over score bins, Holt's
linear-trend exponential smoothing (the per-key sequential recurrence
checked against a recursive-CTE oracle), and a polymorphic Python UDTF
(static ``analyze`` deriving the output schema from a constant arg).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: isotonic fits are ratios of integer sums (IEEE-identical
cross-engine); the Holt recurrence uses the SAME literal coefficients
and expression shape in Python and SQL so every intermediate double is
bit-identical; final values rounded to 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------- Isotonic calibration (PAVA, minimax)
# Monotone recalibration of a scorer — the standard post-hoc fix when
# a model's probabilities are directionally right but miscalibrated.
# Pool-Adjacent-Violators has a closed "minimax" identity:
#   iso(k) = max_{i<=k} min_{j>=k} weightedAvg(rate, bins i..j)
# so after reducing the corpus to B=20 score bins the fit is pure
# relational algebra over B^2 interval averages — no iteration, no
# UDF, both engines run the identical formula. Scale shape: ONE pass
# reduces N rows to 20 (bin, n, n_pos) partials; everything after is
# broadcast-sized (20 cum rows -> 210 intervals -> 20 fits). The
# sigmoid scorer reuses the q_brier_calibration pinned weights so the
# two calibration rows stay comparable.

from kcore_spark.queries.extensions_r8 import _CAL_W, _CAL_W_SQL  # noqa: E402

ISO_BINS = 20


def q_isotonic_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.similarity import as_double

    emb = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(c) for c in _CAL_W])
    x = as_double(F.col("embedding"))
    logit = F.aggregate(
        F.zip_with(x, w, lambda a, b: a * b), F.lit(0.0), lambda acc, v: acc + v
    )
    p = 1.0 / (1.0 + F.exp(-logit))
    scored = emb.select(
        F.least(F.floor(p * ISO_BINS).cast("long"), F.lit(ISO_BINS - 1)).alias("bin"),
        (F.col("label") >= 5).cast("long").alias("y"),
    )
    bins = scored.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"), F.sum("y").alias("n_pos")
    )
    wc = Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
    cum = bins.select(
        "bin",
        "n",
        "n_pos",
        F.sum("n").over(wc).alias("cn"),
        F.sum("n_pos").over(wc).alias("cp"),
    )
    lo = cum.select(
        F.col("bin").alias("i"),
        (F.col("cn") - F.col("n")).alias("cn_lo"),
        (F.col("cp") - F.col("n_pos")).alias("cp_lo"),
    )
    hi = cum.select(
        F.col("bin").alias("j"), F.col("cn").alias("cn_hi"), F.col("cp").alias("cp_hi")
    )
    intervals = (
        F.broadcast(lo)
        .crossJoin(F.broadcast(hi))
        .where(F.col("i") <= F.col("j"))
        .select(
            "i",
            "j",
            (
                (F.col("cp_hi") - F.col("cp_lo")).cast("double")
                / (F.col("cn_hi") - F.col("cn_lo"))
            ).alias("avg_ij"),
        )
    )
    ks = bins.select(F.col("bin").alias("k"))
    inner = (
        F.broadcast(ks)
        .join(F.broadcast(intervals), (F.col("i") <= F.col("k")) & (F.col("j") >= F.col("k")))
        .groupBy("k", "i")
        .agg(F.min("avg_ij").alias("m_ki"))
    )
    iso = inner.groupBy("k").agg(F.max("m_ki").alias("iso"))
    return (
        bins.join(F.broadcast(iso), bins.bin == iso.k)
        .select(
            "bin",
            "n",
            "n_pos",
            F.round(F.col("n_pos").cast("double") / F.col("n"), 8).alias("raw_rate"),
            F.round("iso", 8).alias("iso_rate"),
        )
        .orderBy("bin")
    )


Q_ISO_SQL = f"""
WITH scored AS (
  SELECT LEAST(CAST(FLOOR((1.0 / (1.0 + exp(-(list_reduce(list_prepend(0.0,
           list_transform(list_zip(embedding::DOUBLE[], [{_CAL_W_SQL}]),
                          p -> p[1] * p[2])), (a, b) -> a + b))))) * {ISO_BINS})
                    AS BIGINT), {ISO_BINS - 1}) AS bin,
         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS y
  FROM embeddings),
bins AS (
  SELECT bin, COUNT(*) AS n, CAST(SUM(y) AS BIGINT) AS n_pos
  FROM scored GROUP BY bin),
cum AS (
  SELECT bin, n, n_pos,
         SUM(n) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cn,
         SUM(n_pos) OVER (ORDER BY bin ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cp
  FROM bins),
intervals AS (
  SELECT l.bin AS i, h.bin AS j,
         CAST(h.cp - (l.cp - l.n_pos) AS DOUBLE) / (h.cn - (l.cn - l.n)) AS avg_ij
  FROM cum l CROSS JOIN cum h WHERE l.bin <= h.bin),
inner_min AS (
  SELECT b.bin AS k, v.i, MIN(v.avg_ij) AS m_ki
  FROM bins b JOIN intervals v ON v.i <= b.bin AND v.j >= b.bin
  GROUP BY b.bin, v.i),
iso AS (
  SELECT k, MAX(m_ki) AS iso FROM inner_min GROUP BY k)
SELECT b.bin, b.n, b.n_pos,
       ROUND(CAST(b.n_pos AS DOUBLE) / b.n, 8) AS raw_rate,
       ROUND(iso.iso, 8) AS iso_rate
FROM bins b JOIN iso ON iso.k = b.bin
ORDER BY b.bin
"""

QUERIES["q_isotonic_calibration"] = QuerySpec(
    q_isotonic_calibration,
    Q_ISO_SQL,
    "Isotonic (PAVA) calibration via the minimax identity over 20 score "
    "bins: one corpus pass to integer partials, then broadcast-sized algebra",
)


# ----------------------------- Holt linear-trend smoothing
# Double exponential smoothing — level + trend — over each
# event_type's hourly mean-value series: the classic short-horizon
# forecaster. The recurrence (l_t, b_t from l_{t-1}, b_{t-1}) is
# inherently sequential PER KEY, so the Spark side runs it in
# applyInPandas (one ordered pass per group — the idiomatic Spark
# shape for per-key state machines; keys are independent, so 100 TB
# parallelism is across keys), while the oracle re-derives it with a
# recursive CTE. Coefficients are binary-representable literals
# (alpha=0.5, beta=0.25) and both sides evaluate the SAME expression
# shapes, so every intermediate double is bit-identical; outputs
# rounded to 6.

H_ALPHA, H_BETA = 0.5, 0.25


def q_holt_forecast(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    hourly = (
        ev.groupBy("event_type", F.date_trunc("hour", F.col("ts")).alias("h"))
        .agg(
            (
                F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
                / F.count(F.lit(1))
            ).alias("x")
        )
    )

    def holt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("h")
        xs = pdf["x"].tolist()
        l, b = xs[0], 0.0
        for x in xs[1:]:
            l_prev = l
            l = H_ALPHA * x + (1.0 - H_ALPHA) * (l + b)
            b = H_BETA * (l - l_prev) + (1.0 - H_BETA) * b
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_steps": [len(xs)],
                "level": [round(l, 6)],
                "trend": [round(b, 6)],
                "forecast_1": [round(l + b, 6)],
            }
        )

    out = hourly.groupBy("event_type").applyInPandas(
        holt,
        schema="event_type string, n_steps long, level double, trend double, forecast_1 double",
    )
    return out.orderBy("event_type")


Q_HOLT_SQL = f"""
WITH RECURSIVE hourly AS (
  SELECT event_type, date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS x
  FROM events GROUP BY event_type, h),
seq AS (
  SELECT event_type, x,
         ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS t,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM hourly),
walk AS (
  SELECT event_type, t, n, x AS l, CAST(0.0 AS DOUBLE) AS b
  FROM seq WHERE t = 1
  UNION ALL
  SELECT s.event_type, s.t, s.n,
         {H_ALPHA} * s.x + (1.0 - {H_ALPHA}) * (w.l + w.b) AS l,
         {H_BETA} * (({H_ALPHA} * s.x + (1.0 - {H_ALPHA}) * (w.l + w.b)) - w.l)
           + (1.0 - {H_BETA}) * w.b AS b
  FROM walk w JOIN seq s ON s.event_type = w.event_type AND s.t = w.t + 1)
SELECT event_type, n AS n_steps,
       ROUND(l, 6) AS level, ROUND(b, 6) AS trend,
       ROUND(l + b, 6) AS forecast_1
FROM walk
WHERE t = n
ORDER BY event_type
"""

QUERIES["q_holt_forecast"] = QuerySpec(
    q_holt_forecast,
    Q_HOLT_SQL,
    "Holt double exponential smoothing per event_type hourly series: "
    "per-key state machine in applyInPandas vs WITH RECURSIVE oracle, "
    "bit-identical doubles",
)


# ----------------------------- Polymorphic UDTF (static analyze)
# The Spark 4 Python-UDTF completion: an ``analyze`` static method
# computes the OUTPUT SCHEMA from the call's constant arguments —
# here NGRAMS(text, n) emits columns g1..gn, one row per word n-gram.
# The engine calls analyze once at plan time; the UDTF then streams
# rows. This pins the polymorphic half of the UDTF contract
# (q_udtf_explode_words pins the fixed-schema half). Oracle: the
# n=2 instantiation is LEAD over exploded words.


def q_udtf_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import udtf
    from pyspark.sql.types import StructType
    from pyspark.sql.udtf import AnalyzeArgument, AnalyzeResult

    class NGrams:
        @staticmethod
        def analyze(text: AnalyzeArgument, n: AnalyzeArgument) -> AnalyzeResult:
            schema = StructType()
            schema = schema.add("pos", "integer")
            for i in range(int(n.value)):
                schema = schema.add(f"g{i + 1}", "string")
            return AnalyzeResult(schema=schema)

        def eval(self, text: str, n: int):
            words = (text or "").lower().split(" ")
            for pos in range(len(words) - n + 1):
                yield (pos, *words[pos : pos + n])

    gen = udtf(NGrams)
    spark.udtf.register("kcore_ngrams", gen)
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs.createOrReplaceTempView("docs_udtf_v")
    return spark.sql(
        """
        SELECT g1, g2, COUNT(*) AS n_occ
        FROM docs_udtf_v, LATERAL kcore_ngrams(text, 2)
        GROUP BY g1, g2
        HAVING COUNT(*) >= 10
        ORDER BY n_occ DESC, g1, g2
        """
    )


Q_UDTF_NGRAMS_SQL = """
WITH words AS (
  SELECT doc_id,
         UNNEST(string_split(lower(text), ' ')) AS w,
         generate_subscripts(string_split(lower(text), ' '), 1) AS pos
  FROM documents),
grams AS (
  SELECT w AS g1,
         LEAD(w) OVER (PARTITION BY doc_id ORDER BY pos) AS g2
  FROM words)
SELECT g1, g2, COUNT(*) AS n_occ
FROM grams
WHERE g2 IS NOT NULL
GROUP BY g1, g2
HAVING COUNT(*) >= 10
ORDER BY n_occ DESC, g1, g2
"""

QUERIES["q_udtf_ngrams"] = QuerySpec(
    q_udtf_ngrams,
    Q_UDTF_NGRAMS_SQL,
    "Polymorphic Python UDTF: static analyze() derives g1..gn output schema "
    "from the constant n at plan time; n=2 instantiation vs LEAD oracle",
)
