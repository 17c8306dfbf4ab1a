"""Round-10 surface extensions, batch CE (SURVEY §2.3 N r10): the
forecast-evaluation block, second wave — a benchmark-combination table
(naive / seasonal-naive / drift / train-mean / equal-weight combo,
each scored MAE + RMSE on a pinned 80/20 holdout: the sanity panel any
fancier model must beat), the Diebold-Mariano test (are two methods'
losses DIFFERENT, with lag-1 HAC variance — the significance question
q_forecast_accuracy's point estimates can't answer), and empirical
prediction-interval coverage (do +-z*sigma bands actually cover 80/95%
of the holdout?). Complements q_forecast_accuracy / q_theta_method /
q_croston / q_pinball_loss.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: the split is by row_number over the daily series (pinned
floor(0.8 N)); forecasts are closed-form from train stats (no
iteration); per-day losses rounded and decimal-summed; z quantiles are
pinned literals; the pinned A&S Phi gives the DM p-value.
Scale: one orders scan folds to the calendar-bounded daily series;
every window/join after that runs over that curve or 1-row stat
broadcasts (adjudicated).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10ai import _phi, _PHI_SQL

QUERIES: dict[str, QuerySpec] = {}

_TRAIN_FRAC = 0.8
_Z = {"80": 1.281552, "95": 1.959964}


def _series(spark: SparkSession, sf_dir: str) -> DataFrame:
    daily = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.to_date("o_orderdate").alias("d"))
        .agg(F.count(F.lit(1)).cast("long").alias("y"))
    )
    w = Window.orderBy("d")
    return daily.select(
        F.row_number().over(w).cast("long").alias("rn"),
        F.dayofweek("d").cast("int").alias("wd"),
        F.col("y").cast("double").alias("y"),
    )


_SERIES_SQL = """
  series AS (
    SELECT CAST(ROW_NUMBER() OVER (ORDER BY d) AS BIGINT) AS rn,
           CAST(dayofweek(d) + 1 AS INT) AS wd,
           CAST(y AS DOUBLE) AS y
    FROM (SELECT CAST(o_orderdate AS DATE) AS d, COUNT(*) AS y
          FROM orders GROUP BY 1))
"""


def _split(spark: SparkSession, sf_dir: str):
    s = _series(spark, sf_dir)
    n = s.agg(
        F.count(F.lit(1)).cast("long").alias("n_all"),
        F.floor(F.count(F.lit(1)) * _TRAIN_FRAC).cast("long").alias("n_train"),
    )
    tagged = s.crossJoin(F.broadcast(n))
    train = tagged.where(F.col("rn") <= F.col("n_train"))
    test = tagged.where(F.col("rn") > F.col("n_train"))
    stats = train.agg(
        F.max(F.struct(F.col("rn"), F.col("y")))["y"].alias("y_last"),
        F.min(F.struct(F.col("rn"), F.col("y")))["y"].alias("y_first"),
        F.count(F.lit(1)).cast("long").alias("nt"),
        F.sum(F.round("y", 2).cast("decimal(38,2)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("y") * F.col("y"), 2).cast("decimal(38,2)"))
        .cast("double")
        .alias("syy"),
    )
    snaive = train.groupBy("wd").agg(
        F.max(F.struct(F.col("rn"), F.col("y")))["y"].alias("y_wd")
    )
    return test, stats, snaive


_SPLIT_SQL = f"""
  n AS (
    SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
           CAST(FLOOR(COUNT(*) * {_TRAIN_FRAC}) AS BIGINT) AS n_train
    FROM series),
  train AS (
    SELECT series.* FROM series CROSS JOIN n WHERE rn <= n_train),
  test AS (
    SELECT series.*, n_train, n_all FROM series CROSS JOIN n
    WHERE rn > n_train),
  stats AS (
    SELECT ARG_MAX(y, rn) AS y_last, ARG_MIN(y, rn) AS y_first,
           CAST(COUNT(*) AS BIGINT) AS nt,
           CAST(SUM(CAST(ROUND(y, 2) AS DECIMAL(38,2))) AS DOUBLE) AS sy,
           CAST(SUM(CAST(ROUND(y * y, 2) AS DECIMAL(38,2))) AS DOUBLE) AS syy
    FROM train),
  snaive AS (SELECT wd, ARG_MAX(y, rn) AS y_wd FROM train GROUP BY wd)
"""


def _forecasts(test: DataFrame, stats: DataFrame, snaive: DataFrame) -> DataFrame:
    j = test.crossJoin(F.broadcast(stats)).join(F.broadcast(snaive), "wd")
    h = (F.col("rn") - F.col("n_train")).cast("double")
    drift = F.col("y_last") + h * (F.col("y_last") - F.col("y_first")) / (
        F.col("nt").cast("double") - 1.0
    )
    mean = F.col("sy") / F.col("nt").cast("double")
    return j.select(
        "rn",
        "y",
        F.col("y_last").alias("f_naive"),
        F.col("y_wd").alias("f_snaive"),
        drift.alias("f_drift"),
        mean.alias("f_mean"),
        ((F.col("y_last") + F.col("y_wd") + drift + mean) / 4.0).alias("f_combo"),
    )


_FC_SQL = """
  fc AS (
    SELECT rn, y,
           y_last AS f_naive,
           y_wd AS f_snaive,
           y_last + (rn - n_train) * (y_last - y_first)
                    / (CAST(nt AS DOUBLE) - 1.0) AS f_drift,
           sy / CAST(nt AS DOUBLE) AS f_mean,
           (y_last + y_wd
            + (y_last + (rn - n_train) * (y_last - y_first)
                        / (CAST(nt AS DOUBLE) - 1.0))
            + sy / CAST(nt AS DOUBLE)) / 4.0 AS f_combo
    FROM test CROSS JOIN stats JOIN snaive ON test.wd = snaive.wd)
"""

_METHODS = ["combo", "drift", "mean", "naive", "snaive"]


def q_forecast_combination(spark: SparkSession, sf_dir: str) -> DataFrame:
    test, stats, snaive = _split(spark, sf_dir)
    fc = _forecasts(test, stats, snaive)
    arms = F.array(
        *[
            F.struct(
                F.lit(m).alias("method"),
                (F.col("y") - F.col(f"f_{m}")).alias("e"),
            )
            for m in _METHODS
        ]
    )
    errs = fc.select(F.explode(arms).alias("a")).select(
        F.col("a.method").alias("method"), F.col("a.e").alias("e")
    )
    agg = errs.groupBy("method").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.sum(F.round(F.abs("e"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("s_ae"),
        F.sum(F.round(F.col("e") * F.col("e"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("s_se"),
    )
    return agg.select(
        "method",
        "n_test",
        F.round(F.col("s_ae") / F.col("n_test"), 6).alias("mae"),
        F.round(F.sqrt(F.col("s_se") / F.col("n_test")), 6).alias("rmse"),
    ).orderBy("method")


_ARMS_SQL = " UNION ALL ".join(
    f"SELECT '{m}' AS method, y - f_{m} AS e FROM fc" for m in _METHODS
)
Q_FCOMB_SQL = f"""
WITH {_SERIES_SQL},
{_SPLIT_SQL},
{_FC_SQL},
errs AS ({_ARMS_SQL}),
agg AS (
  SELECT method, CAST(COUNT(*) AS BIGINT) AS n_test,
         CAST(SUM(CAST(ROUND(ABS(e), 6) AS DECIMAL(38,6))) AS DOUBLE) AS s_ae,
         CAST(SUM(CAST(ROUND(e * e, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s_se
  FROM errs GROUP BY method)
SELECT method, n_test,
       ROUND(s_ae / n_test, 6) AS mae,
       ROUND(SQRT(s_se / n_test), 6) AS rmse
FROM agg ORDER BY method
"""

QUERIES["q_forecast_combination"] = QuerySpec(
    q_forecast_combination,
    Q_FCOMB_SQL,
    "naive/snaive/drift/mean/combo benchmark panel on the 80/20 holdout "
    "— closed-form forecasts, decimal loss sums",
)


# -------------------------------------------------- Diebold-Mariano
# d_t = |e_naive| - |e_snaive|; DM = dbar / sqrt((g0 + 2 g1)/n), lag-1
# HAC; p two-sided via the pinned Phi.


def q_diebold_mariano(spark: SparkSession, sf_dir: str) -> DataFrame:
    test, stats, snaive = _split(spark, sf_dir)
    fc = _forecasts(test, stats, snaive)
    d = fc.select(
        "rn",
        (F.abs(F.col("y") - F.col("f_naive")) - F.abs(F.col("y") - F.col("f_snaive"))).alias(
            "d"
        ),
    )
    w = Window.orderBy("rn")
    dl = d.withColumn("d_prev", F.lag("d").over(w))
    agg = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("d", 6).cast("decimal(38,6)")).cast("double").alias("sd"),
        F.sum(F.round(F.col("d") * F.col("d"), 6).cast("decimal(38,6)"))
        .cast("double")
        .alias("sdd"),
        F.sum(
            F.when(
                F.col("d_prev").isNotNull(),
                F.round(F.col("d") * F.col("d_prev"), 6).cast("decimal(38,6)"),
            )
        )
        .cast("double")
        .alias("sd1"),
        F.sum(
            F.when(
                F.col("d_prev").isNotNull(),
                F.round(F.col("d") + F.col("d_prev"), 6).cast("decimal(38,6)"),
            )
        )
        .cast("double")
        .alias("s_pair"),
    )
    nd = F.col("n").cast("double")
    dbar = F.col("sd") / nd
    g0 = F.col("sdd") / nd - dbar * dbar
    # g1 = (1/n) sum (d_t - dbar)(d_{t-1} - dbar)
    #    = (sd1 - dbar * s_pair + (n-1) dbar^2) / n
    g1 = (F.col("sd1") - dbar * F.col("s_pair") + (nd - 1.0) * dbar * dbar) / nd
    var = F.greatest(g0 + 2.0 * g1, F.lit(1e-12)) / nd
    dm = dbar / F.sqrt(var)
    return agg.select(
        F.col("n").alias("n_test"),
        F.round(dbar, 6).alias("mean_loss_diff"),
        F.round(dm, 6).alias("dm_stat"),
        F.round(2.0 * (1.0 - _phi(F.abs(dm))), 6).alias("p_two_sided"),
    )


_DM_EXPR = (
    "(sd / n) / SQRT(GREATEST((sdd / n - (sd / n) * (sd / n))"
    " + 2.0 * ((sd1 - (sd / n) * s_pair + (n - 1.0) * (sd / n) * (sd / n)) / n),"
    " 1e-12) / n)"
)
Q_DM_SQL = f"""
WITH {_SERIES_SQL},
{_SPLIT_SQL},
{_FC_SQL},
d AS (
  SELECT rn, ABS(y - f_naive) - ABS(y - f_snaive) AS d FROM fc),
dl AS (SELECT d, LAG(d) OVER (ORDER BY rn) AS d_prev FROM d),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(d, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sd,
         CAST(SUM(CAST(ROUND(d * d, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sdd,
         CAST(SUM(CASE WHEN d_prev IS NOT NULL THEN
              CAST(ROUND(d * d_prev, 6) AS DECIMAL(38,6)) END) AS DOUBLE) AS sd1,
         CAST(SUM(CASE WHEN d_prev IS NOT NULL THEN
              CAST(ROUND(d + d_prev, 6) AS DECIMAL(38,6)) END) AS DOUBLE)
             AS s_pair
  FROM dl)
SELECT n AS n_test,
       ROUND(sd / n, 6) AS mean_loss_diff,
       ROUND({_DM_EXPR}, 6) AS dm_stat,
       ROUND(2.0 * (1.0 - {_PHI_SQL.format(z=f"ABS({_DM_EXPR})")}), 6)
           AS p_two_sided
FROM agg
"""

QUERIES["q_diebold_mariano"] = QuerySpec(
    q_diebold_mariano,
    Q_DM_SQL,
    "Diebold-Mariano naive-vs-snaive loss comparison with lag-1 HAC "
    "variance — holdout series fold, pinned Phi",
)


# ---------------------------------------------- interval coverage
# +-z*sigma bands around the train mean: empirical holdout coverage.


def q_interval_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    test, stats, snaive = _split(spark, sf_dir)
    j = test.crossJoin(F.broadcast(stats))
    nt = F.col("nt").cast("double")
    mean = F.col("sy") / nt
    sd = F.sqrt((nt * F.col("syy") - F.col("sy") ** 2) / (nt * (nt - 1.0)))
    levels = F.array(
        *[
            F.struct(F.lit(k).alias("level"), F.lit(z).alias("z"))
            for k, z in sorted(_Z.items())
        ]
    )
    fan = j.select(
        "y", mean.alias("mu"), sd.alias("sd"), F.explode(levels).alias("l")
    )
    return (
        fan.groupBy(F.col("l.level").alias("level"), F.col("l.z").alias("z"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum(
                (
                    F.abs(F.col("y") - F.col("mu")) <= F.col("l.z") * F.col("sd")
                ).cast("long")
            ).alias("covered"),
        )
        .select(
            "level",
            "z",
            "n_test",
            "covered",
            F.round(F.col("covered") / F.col("n_test").cast("double"), 6).alias(
                "coverage"
            ),
        )
        .orderBy("level")
    )


_LEVELS_SQL = ", ".join(f"('{k}', {z})" for k, z in sorted(_Z.items()))
Q_COVER_SQL = f"""
WITH {_SERIES_SQL},
{_SPLIT_SQL},
j AS (
  SELECT y,
         sy / CAST(nt AS DOUBLE) AS mu,
         SQRT((CAST(nt AS DOUBLE) * syy - sy * sy)
              / (CAST(nt AS DOUBLE) * (CAST(nt AS DOUBLE) - 1.0))) AS sd
  FROM test CROSS JOIN stats),
fan AS (
  SELECT y, mu, sd, l.level, l.z
  FROM j CROSS JOIN (VALUES {_LEVELS_SQL}) AS l(level, z))
SELECT level, z, CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN ABS(y - mu) <= z * sd THEN 1 ELSE 0 END) AS BIGINT)
           AS covered,
       ROUND(SUM(CASE WHEN ABS(y - mu) <= z * sd THEN 1 ELSE 0 END)
             / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
FROM fan GROUP BY 1, 2 ORDER BY level
"""

QUERIES["q_interval_coverage"] = QuerySpec(
    q_interval_coverage,
    Q_COVER_SQL,
    "empirical 80/95 prediction-interval coverage on the holdout — "
    "pinned z literals, train-moment bands",
)
