"""Round-10 surface extensions, batch BI (SURVEY §2.3 N r10): the
in-engine ML III block — a ridge regression path (two-feature closed
form at a λ grid, the regularized sibling of q_ols_two_features),
5-fold cross-validated OLS (train moments = global − fold moments:
the moment-ADDITIVITY trick makes k-fold ONE grouped agg, no
per-fold re-scan), and a bagged-stump ensemble (three decision
stumps on pinned bootstrap halves, majority-vote accuracy — the
minimal ensemble next to q_best_split_infogain).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: decimal-exact moments; ROUND(·,9)-pinned coefficients
between passes; stump thresholds are a literal grid with
deterministic tie-breaks; md5-pinned folds/bags.
Scale: each query is 1-2 scans plus k-row algebra — the k folds and
λ points NEVER multiply the data (additivity + parallel aggregate
expressions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# --------------------------------------------------- ridge path
# Centered normal equations with ridge: b = (S + λI)^{-1} s_y for
# λ ∈ {0, 1e3, 1e5}; one moments pass, 3-row output.


def q_ridge_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("decimal(15,2)").alias("x1"),
        F.col("l_discount").cast("decimal(15,2)").alias("x2"),
        F.col("l_extendedprice").cast("decimal(15,2)").alias("y"),
    )
    m = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
    )
    n = F.col("n").cast("double")
    c11 = F.col("s11").cast("double") - F.col("s1").cast("double") ** 2 / n
    c12 = (
        F.col("s12").cast("double")
        - F.col("s1").cast("double") * F.col("s2").cast("double") / n
    )
    c22 = F.col("s22").cast("double") - F.col("s2").cast("double") ** 2 / n
    c1y = (
        F.col("s1y").cast("double")
        - F.col("s1").cast("double") * F.col("sy").cast("double") / n
    )
    c2y = (
        F.col("s2y").cast("double")
        - F.col("s2").cast("double") * F.col("sy").cast("double") / n
    )
    lams = [0.0, 1000.0, 100000.0]
    rows = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(lam).alias("lam"),
                        F.round(
                            (c1y * (c22 + lam) - c2y * c12)
                            / ((c11 + lam) * (c22 + lam) - c12 * c12),
                            6,
                        ).alias("b1"),
                        F.round(
                            (c2y * (c11 + lam) - c1y * c12)
                            / ((c11 + lam) * (c22 + lam) - c12 * c12),
                            6,
                        ).alias("b2"),
                    )
                    for lam in lams
                ]
            )
        ).alias("g")
    )
    return rows.select(
        F.col("g.lam").alias("ridge_lambda"),
        F.col("g.b1").alias("b1"),
        F.col("g.b2").alias("b2"),
    ).orderBy("ridge_lambda")


def _ridge_sql_row(lam: float) -> str:
    c11 = "(CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n)"
    c12 = "(CAST(s12 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)"
    c22 = "(CAST(s22 AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(s2 AS DOUBLE) / n)"
    c1y = "(CAST(s1y AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(sy AS DOUBLE) / n)"
    c2y = "(CAST(s2y AS DOUBLE) - CAST(s2 AS DOUBLE) * CAST(sy AS DOUBLE) / n)"
    det = f"(({c11} + {lam}) * ({c22} + {lam}) - {c12} * {c12})"
    return (
        f"SELECT {lam} AS ridge_lambda, "
        f"ROUND(({c1y} * ({c22} + {lam}) - {c2y} * {c12}) / {det}, 6) AS b1, "
        f"ROUND(({c2y} * ({c11} + {lam}) - {c1y} * {c12}) / {det}, 6) AS b2 FROM m"
    )


Q_RIDGE_SQL = (
    """
WITH m AS (
  SELECT CAST(COUNT(*) AS DOUBLE) AS n,
         SUM(CAST(l_quantity AS DECIMAL(15,2))) AS s1,
         SUM(CAST(l_discount AS DECIMAL(15,2))) AS s2,
         SUM(CAST(l_extendedprice AS DECIMAL(15,2))) AS sy,
         SUM(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_quantity AS DECIMAL(15,2))) AS s11,
         SUM(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(15,2))) AS s12,
         SUM(CAST(l_discount AS DECIMAL(15,2)) * CAST(l_discount AS DECIMAL(15,2))) AS s22,
         SUM(CAST(l_quantity AS DECIMAL(15,2)) * CAST(l_extendedprice AS DECIMAL(15,2))) AS s1y,
         SUM(CAST(l_discount AS DECIMAL(15,2)) * CAST(l_extendedprice AS DECIMAL(15,2))) AS s2y
  FROM lineitem)
"""
    + "\nUNION ALL ".join(_ridge_sql_row(lam) for lam in [0.0, 1000.0, 100000.0])
    + "\nORDER BY ridge_lambda"
)

QUERIES["q_ridge_regression"] = QuerySpec(
    q_ridge_regression,
    Q_RIDGE_SQL,
    "two-feature ridge path at a λ grid — one decimal-moment pass, "
    "closed-form 2x2 solve per λ",
)


# ---------------------------------------------------- 5-fold CV
# Fold moments are additive: train = global − fold. One grouped agg
# gives all 5 training fits; a second scan scores each row with ITS
# fold's pinned coefficients.


def q_kfold_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln"),
        F.col("l_quantity").cast("decimal(15,2)").alias("x"),
        F.col("l_extendedprice").cast("decimal(15,2)").alias("y"),
    )
    fold = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.col("k").cast("string"), F.lit("#"), F.col("ln").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 5
    )
    src = li.select(fold.alias("f"), "x", "y")
    per_fold = src.groupBy("f").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    tot = per_fold.agg(
        F.sum("n").alias("tn"),
        F.sum(F.col("sx")).alias("tsx"),
        F.sum(F.col("sy")).alias("tsy"),
        F.sum(F.col("sxy")).alias("tsxy"),
        F.sum(F.col("sxx")).alias("tsxx"),
    )
    tr = per_fold.crossJoin(F.broadcast(tot))
    n = (F.col("tn") - F.col("n")).cast("double")
    sx = (F.col("tsx") - F.col("sx")).cast("double")
    sy = (F.col("tsy") - F.col("sy")).cast("double")
    sxy = (F.col("tsxy") - F.col("sxy")).cast("double")
    sxx = (F.col("tsxx") - F.col("sxx")).cast("double")
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    coefs = tr.select(
        "f",
        F.round(b, 9).alias("b"),
        F.round((sy - b * sx) / n, 9).alias("a"),
    )
    scored = src.join(F.broadcast(coefs), "f")
    e = F.col("y").cast("double") - F.col("a") - F.col("b") * F.col("x").cast("double")
    agg = scored.groupBy("f").agg(
        F.count(F.lit(1)).cast("long").alias("n_test"),
        F.first("b").alias("b"),
        F.sum(F.round(e * e, 2).cast("decimal(38,2)")).alias("sse"),
    )
    return agg.select(
        F.col("f").cast("long").alias("fold"),
        "n_test",
        F.round("b", 6).alias("slope"),
        F.round(
            F.col("sse").cast("double") / F.col("n_test").cast("double"), 4
        ).alias("test_mse"),
    ).orderBy("fold")


Q_KFOLD_SQL = """
WITH src AS (
  SELECT ('0x' || substring(md5(CAST(l_orderkey AS VARCHAR) || '#'
                                || CAST(l_linenumber AS VARCHAR)), 1, 8))::BIGINT
             % 5 AS f,
         CAST(l_quantity AS DECIMAL(15,2)) AS x,
         CAST(l_extendedprice AS DECIMAL(15,2)) AS y
  FROM lineitem),
per_fold AS (
  SELECT f, COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
         SUM(x * y) AS sxy, SUM(x * x) AS sxx
  FROM src GROUP BY f),
tot AS (
  SELECT SUM(n) AS tn, SUM(sx) AS tsx, SUM(sy) AS tsy,
         SUM(sxy) AS tsxy, SUM(sxx) AS tsxx
  FROM per_fold),
coefs AS (
  SELECT f,
         ROUND((CAST(tn - n AS DOUBLE) * CAST(tsxy - sxy AS DOUBLE)
                - CAST(tsx - sx AS DOUBLE) * CAST(tsy - sy AS DOUBLE))
               / (CAST(tn - n AS DOUBLE) * CAST(tsxx - sxx AS DOUBLE)
                  - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE)), 9) AS b,
         ROUND((CAST(tsy - sy AS DOUBLE)
                - (CAST(tn - n AS DOUBLE) * CAST(tsxy - sxy AS DOUBLE)
                   - CAST(tsx - sx AS DOUBLE) * CAST(tsy - sy AS DOUBLE))
                  / (CAST(tn - n AS DOUBLE) * CAST(tsxx - sxx AS DOUBLE)
                     - CAST(tsx - sx AS DOUBLE) * CAST(tsx - sx AS DOUBLE))
                  * CAST(tsx - sx AS DOUBLE))
               / CAST(tn - n AS DOUBLE), 9) AS a
  FROM per_fold CROSS JOIN tot),
agg AS (
  SELECT src.f, CAST(COUNT(*) AS BIGINT) AS n_test, ANY_VALUE(b) AS b,
         SUM(CAST(ROUND((CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE))
                        * (CAST(y AS DOUBLE) - a - b * CAST(x AS DOUBLE)), 2)
                  AS DECIMAL(38,2))) AS sse
  FROM src JOIN coefs ON src.f = coefs.f
  GROUP BY src.f)
SELECT CAST(f AS BIGINT) AS fold, n_test,
       ROUND(b, 6) AS slope,
       ROUND(CAST(sse AS DOUBLE) / CAST(n_test AS DOUBLE), 4) AS test_mse
FROM agg
ORDER BY fold
"""

QUERIES["q_kfold_cv"] = QuerySpec(
    q_kfold_cv,
    Q_KFOLD_SQL,
    "5-fold cross-validated OLS via moment additivity (train = "
    "global − fold) — one grouped agg fits all folds",
)


# -------------------------------------------------- bagged stumps
# Three stumps, each trained on a pinned bootstrap half (md5 salts),
# threshold from a literal grid by training accuracy; ensemble =
# majority vote, evaluated on everything.

_THRESHOLDS = [50000.0 + 25000.0 * i for i in range(17)]


def q_bagged_stumps(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").cast("double").alias("x"),
        (F.col("o_orderpriority") == "1-URGENT").cast("int").alias("y"),
    )

    def bag(salt: str):
        return (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.col("k").cast("string"), F.lit(salt))), 1, 8
                ),
                16,
                10,
            ).cast("long")
            % 2
            == 0
        )

    stumps = []
    for s in ["b1", "b2", "b3"]:
        sub = orders.where(bag(s))
        # per threshold: accuracy of (x > t -> 1); pick argmax with
        # smaller-threshold tiebreak via struct max
        agg = sub.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(
                    ((F.col("x") > t).cast("int") == F.col("y")).cast("long")
                ).alias(f"c{i}")
                for i, t in enumerate(_THRESHOLDS)
            ],
        )
        best = agg.select(
            F.greatest(
                *[
                    F.struct(
                        (F.col(f"c{i}").cast("double") / F.col("n").cast("double")).alias("acc"),
                        F.lit(-t).alias("negt"),
                    )
                    for i, t in enumerate(_THRESHOLDS)
                ]
            ).alias("g")
        ).select(
            F.round(F.col("g.acc"), 9).alias(f"acc_{s}"),
            (-F.col("g.negt")).alias(f"t_{s}"),
        )
        stumps.append(best)
    j = stumps[0].crossJoin(stumps[1]).crossJoin(stumps[2])
    scored = orders.crossJoin(F.broadcast(j))
    votes = (
        (F.col("x") > F.col("t_b1")).cast("int")
        + (F.col("x") > F.col("t_b2")).cast("int")
        + (F.col("x") > F.col("t_b3")).cast("int")
    )
    pred = (votes >= 2).cast("int")
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.first("t_b1").alias("t1"),
        F.first("t_b2").alias("t2"),
        F.first("t_b3").alias("t3"),
        F.sum((pred == F.col("y")).cast("long")).alias("correct"),
    )
    return agg.select(
        "n",
        F.round("t1", 1).alias("stump1_threshold"),
        F.round("t2", 1).alias("stump2_threshold"),
        F.round("t3", 1).alias("stump3_threshold"),
        F.round(
            F.col("correct").cast("double") / F.col("n").cast("double"), 6
        ).alias("ensemble_accuracy"),
    )


def _stump_sql(salt: str) -> str:
    grid = ", ".join(str(t) for t in _THRESHOLDS)
    return f"""
  SELECT ROUND(acc, 9) AS acc_{salt}, t AS t_{salt}
  FROM (
    SELECT t,
           SUM(CASE WHEN (CASE WHEN x > t THEN 1 ELSE 0 END) = y
                    THEN 1 ELSE 0 END) / CAST(COUNT(*) AS DOUBLE) AS acc
    FROM src CROSS JOIN (SELECT UNNEST([{grid}]) AS t) g
    WHERE ('0x' || substring(md5(CAST(k AS VARCHAR) || '{salt}'), 1, 8))::BIGINT
          % 2 = 0
    GROUP BY t)
  ORDER BY acc DESC, t ASC
  LIMIT 1
"""


Q_BAGGED_SQL = f"""
WITH src AS (
  SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS x,
         CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
  FROM orders),
s1 AS ({_stump_sql("b1")}),
s2 AS ({_stump_sql("b2")}),
s3 AS ({_stump_sql("b3")}),
j AS (SELECT * FROM s1 CROSS JOIN s2 CROSS JOIN s3),
agg AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         ANY_VALUE(t_b1) AS t1, ANY_VALUE(t_b2) AS t2, ANY_VALUE(t_b3) AS t3,
         CAST(SUM(CASE WHEN (CASE WHEN (CASE WHEN x > t_b1 THEN 1 ELSE 0 END)
                                       + (CASE WHEN x > t_b2 THEN 1 ELSE 0 END)
                                       + (CASE WHEN x > t_b3 THEN 1 ELSE 0 END) >= 2
                                  THEN 1 ELSE 0 END) = y
                        THEN 1 ELSE 0 END) AS BIGINT) AS correct
  FROM src CROSS JOIN j)
SELECT n,
       ROUND(t1, 1) AS stump1_threshold,
       ROUND(t2, 1) AS stump2_threshold,
       ROUND(t3, 1) AS stump3_threshold,
       ROUND(CAST(correct AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ensemble_accuracy
FROM agg
"""

QUERIES["q_bagged_stumps"] = QuerySpec(
    q_bagged_stumps,
    Q_BAGGED_SQL,
    "bagged decision stumps on pinned bootstrap halves, majority "
    "vote — literal threshold grid, parallel accuracy sums",
)
