"""Round-10 surface extensions, batch AW (SURVEY §2.3 N r10): the
analyst-toolbox block — a Gaussian kernel density estimate on a
21-point data-driven grid (Silverman bandwidth; the smooth companion
to q_histogram_bin_planner), the pairwise correlation matrix of the
four numeric lineitem measures from ONE moments pass (the
profiling-notebook heatmap input), and business-day fulfilment
latency (weekday counting with explicit calendar semantics — the
date-arithmetic parity pin).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: bandwidth and grid edges are ROUND(·,9)-pinned from
decimal moments; kernel terms are pinned-decimal sums; the weekday
filter names both engines' day-of-week conventions explicitly.
Scale: KDE is a 21× fan-out collapsed map-side (21-row shuffle);
the correlation matrix is ONE wide aggregate unpivoted to 6 rows;
business days explode bounded (≤ ~4-month) per-order date spans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------------------------------------------- KDE grid
# x = price/1000; h = 1.06·s·n^(−1/5); f̂(g) = Σ φ((x−g)/h)/(n·h) on
# 21 equally spaced grid points between min and max.


def q_kde_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    src = load_table(spark, sf_dir, "orders").select(
        (F.col("o_totalprice").cast("decimal(15,2)") / F.lit(1000).cast("decimal(4,0)"))
        .cast("decimal(19,6)")
        .alias("xd")
    )
    m = src.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("xd").alias("s1"),
        F.sum(F.col("xd") * F.col("xd")).alias("s2"),
        F.min("xd").cast("double").alias("lo"),
        F.max("xd").cast("double").alias("hi"),
    )
    nd = F.col("n").cast("double")
    sd = F.sqrt(
        (nd * F.col("s2").cast("double") - F.col("s1").cast("double") ** 2)
        / (nd * (nd - 1))
    )
    params = m.select(
        "n",
        "lo",
        "hi",
        F.round(1.06 * sd * F.pow(nd, F.lit(-0.2)), 9).alias("h"),
    )
    # all 21 kernel sums as parallel aggregate expressions over ONE
    # scan — no row fan-out, no grid shuffle (21x less work than the
    # explode form at any scale). The repartition exists only for
    # small single-file inputs where the scan yields one split: the
    # 21 exp+decimal sums are CPU-bound and want every core for the
    # partial agg; at real scale the scan is already parallel and
    # this is one cheap extra exchange of the projected column.
    j = src.repartition(
        src.sparkSession.sparkContext.defaultParallelism
    ).crossJoin(F.broadcast(params))

    def _gp(i: int):
        return F.col("lo") + float(i) * (F.col("hi") - F.col("lo")) / 20.0

    def _ks(i: int):
        u = (F.col("xd").cast("double") - _gp(i)) / F.col("h")
        kern = F.exp(-u * u / 2.0) * 0.3989422804014327
        return F.sum(F.round(kern, 12).cast("decimal(28,12)")).alias(f"ks{i}")

    agg = j.agg(
        F.first("n").alias("n"),
        F.first("h").alias("h"),
        F.first("lo").alias("lo"),
        F.first("hi").alias("hi"),
        *[_ks(i) for i in range(21)],
    )
    rows = agg.select(
        "n",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("i"),
                        F.round(_gp(i), 6).alias("grid_x"),
                        F.col(f"ks{i}").cast("double").alias("ks"),
                    )
                    for i in range(21)
                ]
            )
        ).alias("g"),
    )
    return rows.select(
        F.col("g.i").cast("long").alias("i"),
        F.col("g.grid_x").alias("grid_x"),
        F.round(
            F.col("g.ks") / (F.col("n").cast("double") * F.col("h")), 6
        ).alias("density"),
    ).orderBy("i")


Q_KDE_SQL = """
WITH src AS (
  SELECT CAST(CAST(o_totalprice AS DECIMAL(15,2))
              / CAST(1000 AS DECIMAL(4,0)) AS DECIMAL(19,6)) AS xd
  FROM orders),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(xd) AS s1, SUM(xd * xd) AS s2,
         CAST(MIN(xd) AS DOUBLE) AS lo, CAST(MAX(xd) AS DOUBLE) AS hi
  FROM src),
params AS (
  SELECT n, lo, hi,
         ROUND(1.06 * SQRT((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                            - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                           / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
               * POWER(CAST(n AS DOUBLE), -0.2), 9) AS h
  FROM m),
fan AS (
  SELECT xd, n, lo, hi, h, i
  FROM src CROSS JOIN params
  CROSS JOIN (SELECT UNNEST(range(0, 21)) AS i) t),
agg AS (
  SELECT i, ANY_VALUE(n) AS n, ANY_VALUE(h) AS h,
         ROUND(ANY_VALUE(lo + CAST(i AS DOUBLE) * (hi - lo) / 20.0), 6) AS grid_x,
         SUM(CAST(ROUND(EXP(-((CAST(xd AS DOUBLE)
                               - (lo + CAST(i AS DOUBLE) * (hi - lo) / 20.0)) / h)
                            * ((CAST(xd AS DOUBLE)
                                - (lo + CAST(i AS DOUBLE) * (hi - lo) / 20.0)) / h)
                            / 2.0) * 0.3989422804014327, 12)
                  AS DECIMAL(28,12))) AS ks
  FROM fan GROUP BY i)
SELECT CAST(i AS BIGINT) AS i, grid_x,
       ROUND(CAST(ks AS DOUBLE) / (CAST(n AS DOUBLE) * h), 6) AS density
FROM agg
ORDER BY i
"""

QUERIES["q_kde_grid"] = QuerySpec(
    q_kde_grid,
    Q_KDE_SQL,
    "Gaussian KDE on a 21-point grid with Silverman bandwidth — "
    "map-side-collapsed fan-out, pinned kernel sums",
)


# ------------------------------------------------ correlation matrix
# One wide decimal-moment aggregate over (qty, price, discount, tax),
# unpivoted to the 6 unordered pairs.

_COLS = [("qty", "l_quantity"), ("price", "l_extendedprice"),
         ("disc", "l_discount"), ("tax", "l_tax")]
_PAIRS = [(a, b) for i, (a, _) in enumerate(_COLS) for b, _ in _COLS[i + 1:]]


def q_corr_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.relational import spread_if_serial

    # spread_if_serial (r14) on the near-unique price column: the
    # 17-term BigDecimal moment fold otherwise runs in the serial
    # single-row-group scan task; decimal sums are order-free so the
    # result is unchanged. The global aggregate shares no key with the
    # spread, so the exchange is layout-gated: an already-parallel
    # scan feeds the map-side partial moments directly.
    base = load_table(spark, sf_dir, "lineitem")
    li = spread_if_serial(
        base.select(
            *[F.col(src).cast("decimal(15,2)").alias(name) for name, src in _COLS]
        ),
        "price",
        probe=base,
        cache_key=f"{sf_dir}/lineitem",
    )
    aggs = [F.count(F.lit(1)).cast("long").alias("n")]
    for name, _ in _COLS:
        aggs.append(F.sum(name).alias(f"s_{name}"))
        aggs.append(F.sum(F.col(name) * F.col(name)).alias(f"ss_{name}"))
    for a, b in _PAIRS:
        aggs.append(F.sum(F.col(a) * F.col(b)).alias(f"sp_{a}_{b}"))
    m = li.agg(*aggs)
    n = F.col("n").cast("double")

    def corr(a, b):
        sa, sb = F.col(f"s_{a}").cast("double"), F.col(f"s_{b}").cast("double")
        return (n * F.col(f"sp_{a}_{b}").cast("double") - sa * sb) / (
            F.sqrt(n * F.col(f"ss_{a}").cast("double") - sa * sa)
            * F.sqrt(n * F.col(f"ss_{b}").cast("double") - sb * sb)
        )

    rows = m.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(a).alias("col_a"),
                        F.lit(b).alias("col_b"),
                        F.round(corr(a, b), 6).alias("corr"),
                    )
                    for a, b in _PAIRS
                ]
            )
        ).alias("p")
    )
    return rows.select("p.col_a", "p.col_b", "p.corr").orderBy("col_a", "col_b")


def _corr_sql(a: str, b: str) -> str:
    return (
        f"(CAST(n AS DOUBLE) * CAST(sp_{a}_{b} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{b} AS DOUBLE))"
        f" / (SQRT(CAST(n AS DOUBLE) * CAST(ss_{a} AS DOUBLE)"
        f" - CAST(s_{a} AS DOUBLE) * CAST(s_{a} AS DOUBLE))"
        f" * SQRT(CAST(n AS DOUBLE) * CAST(ss_{b} AS DOUBLE)"
        f" - CAST(s_{b} AS DOUBLE) * CAST(s_{b} AS DOUBLE)))"
    )


_M_SQL = (
    "SELECT CAST(COUNT(*) AS BIGINT) AS n, "
    + ", ".join(
        f"SUM({name}) AS s_{name}, SUM({name} * {name}) AS ss_{name}"
        for name, _ in _COLS
    )
    + ", "
    + ", ".join(f"SUM({a} * {b}) AS sp_{a}_{b}" for a, b in _PAIRS)
    + " FROM src"
)

Q_CORR_SQL = (
    "WITH src AS (SELECT "
    + ", ".join(f"CAST({src} AS DECIMAL(15,2)) AS {name}" for name, src in _COLS)
    + " FROM lineitem),\nm AS (" + _M_SQL + ")\n"
    + "\nUNION ALL ".join(
        f"SELECT '{a}' AS col_a, '{b}' AS col_b, ROUND({_corr_sql(a, b)}, 6) AS corr FROM m"
        for a, b in _PAIRS
    )
    + "\nORDER BY col_a, col_b"
)

QUERIES["q_corr_matrix"] = QuerySpec(
    q_corr_matrix,
    Q_CORR_SQL,
    "pairwise correlation matrix of the four lineitem measures — one "
    "wide decimal-moment aggregate, 6-row unpivot",
)


# ---------------------------------------------------- business days
# Weekdays between order date and the order's FIRST ship date,
# end-exclusive, by priority — CLOSED FORM, O(1) per row (no date
# explode: the fixture's fulfilment spans run to ~1.5 years, so a
# per-day fan-out would be a silent 500× row multiplier at scale):
#   bd = floor(total/7)·5 + Σ_{i=0..5} [i < total%7 AND (z+i)%7 ≤ 4]
# with z the Monday-based weekday of the start date. Spark dayofweek
# is 1=Sun..7=Sat (z = (dow+5)%7); DuckDB is 0=Sun..6=Sat
# (z = (dow+6)%7).


def q_business_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    first_ship = li.groupBy(F.col("l_orderkey").alias("o_orderkey")).agg(
        F.min("l_shipdate").alias("ship")
    )
    j = orders.join(first_ship, "o_orderkey").where(
        F.col("ship") > F.col("o_orderdate")
    )
    total = F.datediff(F.to_date("ship"), F.to_date("o_orderdate"))
    z = (F.dayofweek(F.to_date("o_orderdate")) + 5) % 7
    rem = total % 7
    extra = None
    for i in range(6):
        t = (
            (F.lit(i) < rem) & (((z + i) % 7) <= 4)
        ).cast("long")
        extra = t if extra is None else extra + t
    bd = (total - rem) / 7 * 5 + extra
    agg = j.select("o_orderpriority", bd.alias("bd")).groupBy(
        "o_orderpriority"
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("bd").alias("bdays"),
    )
    return agg.select(
        "o_orderpriority",
        "n",
        F.round(
            F.col("bdays").cast("double") / F.col("n").cast("double"), 6
        ).alias("avg_business_days"),
    ).orderBy("o_orderpriority")


_EXTRA_SQL = " + ".join(
    f"CASE WHEN {i} < total % 7 AND (z + {i}) % 7 <= 4 THEN 1 ELSE 0 END"
    for i in range(6)
)

Q_BDAYS_SQL = f"""
WITH first_ship AS (
  SELECT l_orderkey AS o_orderkey, MIN(l_shipdate) AS ship
  FROM lineitem GROUP BY 1),
j AS (
  SELECT o_orderpriority,
         date_diff('day', CAST(o_orderdate AS DATE), CAST(ship AS DATE)) AS total,
         (dayofweek(CAST(o_orderdate AS DATE)) + 6) % 7 AS z
  FROM orders JOIN first_ship USING (o_orderkey)
  WHERE ship > o_orderdate),
per AS (
  SELECT o_orderpriority,
         (total - total % 7) / 7 * 5 + ({_EXTRA_SQL}) AS bd
  FROM j),
agg AS (
  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n, SUM(bd) AS bdays
  FROM per GROUP BY 1)
SELECT o_orderpriority, n,
       ROUND(CAST(bdays AS DOUBLE) / CAST(n AS DOUBLE), 6) AS avg_business_days
FROM agg
ORDER BY o_orderpriority
"""

QUERIES["q_business_days"] = QuerySpec(
    q_business_days,
    Q_BDAYS_SQL,
    "average business-day fulfilment latency by priority — explicit "
    "weekday semantics, bounded date-span explode",
)
