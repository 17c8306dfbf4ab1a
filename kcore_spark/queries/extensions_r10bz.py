"""Round-10 surface extensions, batch BZ (SURVEY §2.3 N r10): the
spectral-analysis block, second wave — the normalized spectral entropy
of the daily order series (how concentrated is the spectrum? 0 = pure
tone, 1 = white noise), Fisher's g test for hidden periodicity (is the
largest periodogram ordinate larger than chance? with its closed-form
first-term p-value m(1-g)^(m-1)), and a Bartlett segment-averaged PSD
(4 non-overlapping rectangular segments — the variance-reduced
periodogram that tells signal from one-off bursts). Extends
q_periodogram (named candidate periods) to the FULL Fourier grid
j = 1..floor((n-1)/2).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: DFT phases are reduced EXACTLY before the trig call —
cos(2*pi*((j*t) mod n)/n) with integer j*t mod n — so both engines
evaluate cos/sin on small arguments; products are rounded to 9dp and
decimal-summed (the q_periodogram convention); per-ordinate powers are
rounded before entropy/argmax folds so ties break identically
(lowest frequency wins, pinned).
Scale: the Fourier fan-out is (days x m) rows collapsed map-side into
per-frequency sums — calendar-bounded at any data scale; everything
upstream is one orders scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_TWO_PI = 6.283185307179586
_SEGMENTS = 4


def _centered_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily order counts centered at the global mean, with integer day
    index t and series length n (q_periodogram's base shape)."""
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date(F.date_trunc("day", F.col("o_orderdate"))).alias("d"))
        .agg(F.count(F.lit(1)).alias("y"))
    )
    base = daily.agg(
        F.min("d").alias("d0"),
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").alias("sy"),
    )
    return daily.crossJoin(F.broadcast(base)).select(
        F.datediff(F.col("d"), F.col("d0")).cast("long").alias("t"),
        (
            F.col("y").cast("double")
            - F.col("sy").cast("double") / F.col("n").cast("double")
        ).alias("yc"),
        "n",
    )


_CDAILY_SQL = """
  daily AS (
    SELECT CAST(date_trunc('day', o_orderdate) AS DATE) AS d, COUNT(*) AS y
    FROM orders GROUP BY 1),
  base AS (SELECT MIN(d) AS d0, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy
           FROM daily),
  cdaily AS (
    SELECT CAST(date_diff('day', d0, d) AS BIGINT) AS t,
           CAST(y AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS yc, n
    FROM daily CROSS JOIN base)
"""


def _ordinates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Periodogram ordinates I_j (normalized by n^2) on the full Fourier
    grid j = 1..floor((n-1)/2), with exact integer phase reduction."""
    cd = _centered_daily(spark, sf_dir)
    fan = cd.select(
        "t",
        "yc",
        "n",
        F.explode(
            F.sequence(F.lit(1), F.floor((F.col("n") - 1) / 2).cast("long"))
        ).alias("j"),
    )
    arg = _TWO_PI * ((F.col("j") * F.col("t")) % F.col("n")).cast(
        "double"
    ) / F.col("n").cast("double")
    agg = fan.groupBy("j").agg(
        F.first("n").alias("n"),
        F.sum(F.round(F.col("yc") * F.cos(arg), 9).cast("decimal(28,9)")).alias(
            "sc"
        ),
        F.sum(F.round(F.col("yc") * F.sin(arg), 9).cast("decimal(28,9)")).alias(
            "ss"
        ),
    )
    power = (
        F.col("sc").cast("double") ** 2 + F.col("ss").cast("double") ** 2
    ) / (F.col("n").cast("double") ** 2)
    return agg.select("j", "n", F.round(power, 9).alias("i_j"))


_ORD_SQL = f"""
  fan AS (
    SELECT t, yc, n, tj.j
    FROM cdaily,
         UNNEST(generate_series(1, CAST(FLOOR((n - 1) / 2.0) AS BIGINT)))
             AS tj(j)),
  ords AS (
    SELECT j, ANY_VALUE(n) AS n,
           SUM(CAST(ROUND(yc * COS({_TWO_PI} * CAST((j * t) % n AS DOUBLE)
                                   / CAST(n AS DOUBLE)), 9)
                    AS DECIMAL(28,9))) AS sc,
           SUM(CAST(ROUND(yc * SIN({_TWO_PI} * CAST((j * t) % n AS DOUBLE)
                                   / CAST(n AS DOUBLE)), 9)
                    AS DECIMAL(28,9))) AS ss
    FROM fan GROUP BY j),
  ij AS (
    SELECT j, n,
           ROUND((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                  + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 9) AS i_j
    FROM ords)
"""


# -------------------------------------------------- spectral entropy
# H = -sum p ln p / ln(m), p_j = I_j / sum I.


def q_spectral_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ij = _ordinates(spark, sf_dir)
    tot = ij.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.first("n").alias("n"),
        F.sum(F.round("i_j", 9).cast("decimal(38,9)")).cast("double").alias("s_i"),
    )
    terms = (
        ij.select("i_j").crossJoin(F.broadcast(tot)).where(F.col("i_j") > 0)
    ).select(
        "m",
        "n",
        F.round(
            -(F.col("i_j") / F.col("s_i")) * F.log(F.col("i_j") / F.col("s_i")),
            12,
        )
        .cast("decimal(38,12)")
        .alias("h_t"),
    )
    agg = terms.groupBy("m", "n").agg(F.sum("h_t").cast("double").alias("h"))
    return agg.select(
        F.col("n").alias("n_days"),
        F.col("m").alias("m_freqs"),
        F.round(F.col("h") / F.log(F.col("m").cast("double")), 6).alias(
            "spectral_entropy"
        ),
    )


Q_SPECENT_SQL = f"""
WITH {_CDAILY_SQL},
{_ORD_SQL},
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m, ANY_VALUE(n) AS n,
         CAST(SUM(CAST(ROUND(i_j, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s_i
  FROM ij),
terms AS (
  SELECT m, tot.n AS n,
         CAST(ROUND(-(i_j / s_i) * LN(i_j / s_i), 12) AS DECIMAL(38,12)) AS h_t
  FROM ij CROSS JOIN tot WHERE i_j > 0),
agg AS (SELECT m, n, CAST(SUM(h_t) AS DOUBLE) AS h FROM terms GROUP BY 1, 2)
SELECT n AS n_days, m AS m_freqs,
       ROUND(h / LN(CAST(m AS DOUBLE)), 6) AS spectral_entropy
FROM agg
"""

QUERIES["q_spectral_entropy"] = QuerySpec(
    q_spectral_entropy,
    Q_SPECENT_SQL,
    "normalized spectral entropy of the daily order series over the "
    "full Fourier grid — exact phase reduction, decimal power sums",
)


# --------------------------------------------------- Fisher's g test
# g = max I_j / sum I_j; p ~= m (1 - g)^(m - 1), capped at 1.


def q_fisher_g_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    ij = _ordinates(spark, sf_dir)
    tot = ij.agg(
        F.count(F.lit(1)).cast("long").alias("m"),
        F.first("n").alias("n"),
        F.sum(F.round("i_j", 9).cast("decimal(38,9)")).cast("double").alias("s_i"),
        F.max(F.struct(F.col("i_j"), (-F.col("j")).alias("neg_j"))).alias("b"),
    )
    g = F.col("b.i_j") / F.col("s_i")
    md = F.col("m").cast("double")
    p = F.least(F.lit(1.0), md * F.pow(1.0 - g, md - 1.0))
    return tot.select(
        F.col("n").alias("n_days"),
        F.col("m").alias("m_freqs"),
        (-F.col("b.neg_j")).cast("long").alias("peak_j"),
        F.round(
            F.col("n").cast("double") / (-F.col("b.neg_j")).cast("double"), 2
        ).alias("peak_period_days"),
        F.round(g, 6).alias("g_stat"),
        F.round(p, 6).alias("p_approx"),
    )


Q_FISHERG_SQL = f"""
WITH {_CDAILY_SQL},
{_ORD_SQL},
tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS m, ANY_VALUE(n) AS n,
         CAST(SUM(CAST(ROUND(i_j, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s_i
  FROM ij),
best AS (
  SELECT j AS peak_j, i_j FROM ij ORDER BY i_j DESC, j ASC LIMIT 1)
SELECT n AS n_days, m AS m_freqs, CAST(peak_j AS BIGINT) AS peak_j,
       ROUND(CAST(n AS DOUBLE) / peak_j, 2) AS peak_period_days,
       ROUND(i_j / s_i, 6) AS g_stat,
       ROUND(LEAST(1.0, m * POWER(1.0 - i_j / s_i, m - 1.0)), 6) AS p_approx
FROM tot CROSS JOIN best
"""

QUERIES["q_fisher_g_test"] = QuerySpec(
    q_fisher_g_test,
    Q_FISHERG_SQL,
    "Fisher's g periodicity test over the full Fourier grid — "
    "rounded-ordinate argmax, closed-form first-term p",
)


# ------------------------------------- Bartlett segment-averaged PSD
# 4 non-overlapping rectangular segments; per-segment DFT power at
# named periods, averaged — with the cross-segment CV as stability.

_PSD_PERIODS = [3.5, 7.0, 14.0, 30.0]


def q_segment_avg_psd(spark: SparkSession, sf_dir: str) -> DataFrame:
    cd = _centered_daily(spark, sf_dir)
    span = cd.agg((F.max("t") + 1).alias("span"))
    seg = cd.crossJoin(F.broadcast(span)).select(
        "t",
        "yc",
        F.least(
            F.floor(F.col("t") * _SEGMENTS / F.col("span")).cast("long"),
            F.lit(_SEGMENTS - 1),
        ).alias("seg"),
    )
    fan = seg.select(
        "t",
        "yc",
        "seg",
        F.explode(F.array(*[F.lit(p) for p in _PSD_PERIODS])).alias("p"),
    )
    w = _TWO_PI * F.col("t").cast("double") / F.col("p")
    per_seg = fan.groupBy("seg", "p").agg(
        F.count(F.lit(1)).cast("long").alias("len_s"),
        F.sum(F.round(F.col("yc") * F.cos(w), 9).cast("decimal(28,9)")).alias("sc"),
        F.sum(F.round(F.col("yc") * F.sin(w), 9).cast("decimal(28,9)")).alias("ss"),
    )
    pw = per_seg.select(
        "p",
        F.round(
            (F.col("sc").cast("double") ** 2 + F.col("ss").cast("double") ** 2)
            / (F.col("len_s").cast("double") ** 2),
            9,
        ).alias("pwr"),
    )
    agg = pw.groupBy("p").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum(F.round("pwr", 9).cast("decimal(38,9)")).cast("double").alias("s_p"),
        F.sum(
            F.round(F.col("pwr") * F.col("pwr"), 12).cast("decimal(38,12)")
        )
        .cast("double")
        .alias("s_p2"),
    )
    kd = F.col("k").cast("double")
    mean = F.col("s_p") / kd
    sd = F.sqrt(
        F.greatest(
            (kd * F.col("s_p2") - F.col("s_p") ** 2) / (kd * (kd - 1.0)),
            F.lit(0.0),
        )
    )
    return agg.select(
        F.round("p", 1).alias("period_days"),
        F.col("k").alias("n_segments"),
        F.round(mean, 6).alias("mean_power"),
        F.round(sd / mean, 6).alias("cv_across_segments"),
    ).orderBy("period_days")


Q_SEGPSD_SQL = f"""
WITH {_CDAILY_SQL},
span AS (SELECT MAX(t) + 1 AS span FROM cdaily),
seg AS (
  SELECT t, yc,
         LEAST(CAST(FLOOR(t * {_SEGMENTS} / span) AS BIGINT),
               {_SEGMENTS - 1}) AS seg
  FROM cdaily CROSS JOIN span),
fan AS (
  SELECT t, yc, seg, p
  FROM seg CROSS JOIN
    (SELECT UNNEST([{", ".join(str(p) for p in _PSD_PERIODS)}]) AS p) g),
per_seg AS (
  SELECT seg, p, CAST(COUNT(*) AS BIGINT) AS len_s,
         SUM(CAST(ROUND(yc * COS({_TWO_PI} * CAST(t AS DOUBLE) / p), 9)
                  AS DECIMAL(28,9))) AS sc,
         SUM(CAST(ROUND(yc * SIN({_TWO_PI} * CAST(t AS DOUBLE) / p), 9)
                  AS DECIMAL(28,9))) AS ss
  FROM fan GROUP BY 1, 2),
pw AS (
  SELECT p,
         ROUND((CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                + CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
               / (CAST(len_s AS DOUBLE) * CAST(len_s AS DOUBLE)), 9) AS pwr
  FROM per_seg),
agg AS (
  SELECT p, CAST(COUNT(*) AS BIGINT) AS k,
         CAST(SUM(CAST(ROUND(pwr, 9) AS DECIMAL(38,9))) AS DOUBLE) AS s_p,
         CAST(SUM(CAST(ROUND(pwr * pwr, 12) AS DECIMAL(38,12))) AS DOUBLE)
             AS s_p2
  FROM pw GROUP BY p)
SELECT ROUND(p, 1) AS period_days, k AS n_segments,
       ROUND(s_p / k, 6) AS mean_power,
       ROUND(SQRT(GREATEST((CAST(k AS DOUBLE) * s_p2 - s_p * s_p)
                           / (CAST(k AS DOUBLE) * (CAST(k AS DOUBLE) - 1.0)),
                           0.0)) / (s_p / k), 6) AS cv_across_segments
FROM agg ORDER BY period_days
"""

QUERIES["q_segment_avg_psd"] = QuerySpec(
    q_segment_avg_psd,
    Q_SEGPSD_SQL,
    "Bartlett 4-segment averaged PSD at named periods — per-segment "
    "decimal DFT sums, cross-segment stability CV",
)
