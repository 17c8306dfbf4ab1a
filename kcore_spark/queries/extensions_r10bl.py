"""Round-10 surface extensions, batch BL (SURVEY §2.3 N r10): the
optimization/robust-fit block — a knapsack greedy WITH its LP
relaxation certificate (density-ordered prefix via the repo's
distributed cumsum, plus the fractional-item bound that proves how
far greedy can be from optimal — selection ops should ship their own
optimality gap), LAD (least-absolute-deviations) regression by three
unrolled IRLS rounds (the median-regression sibling of q_huber_m),
and a haversine nearest-neighbor table over deterministic nation
coordinates (the great-circle math surface, token-identical in both
engines).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: density ranks ordered by (density desc, key); IRLS
iterates ROUND(·,9)-pinned; coordinates derive arithmetically from
nationkey; pinned-decimal weighted sums throughout.
Scale: the knapsack prefix is _dist_cumsum (range repartition +
offsets — no single-task sort); IRLS is 3 scans with 1-row
broadcasts; haversine is a 25×25 bounded cross.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8 import _dist_cumsum

QUERIES: dict[str, QuerySpec] = {}



# ------------------------------------------- knapsack + LP certificate
# Items = documents (weight n_chars, value = distinct-token count).
# Budget = half the corpus chars (data-driven, so rejection always
# happens at every scale). Greedy by density with the distributed
# prefix sum; LP bound = greedy value + fractional share of the
# first rejected item's value.


def q_knapsack_bound(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("n_chars").cast("double").alias("w"),
        F.size(
            F.array_distinct(F.split(F.lower(F.col("text")), "\\s+"))
        ).cast("double").alias("v"),
    )
    scored = docs.select(
        "doc_id", "w", "v", F.round(F.col("v") / F.col("w"), 10).alias("density")
    )
    budget = docs.agg((F.sum(F.round(F.col("w"), 0).cast("decimal(28,0)"))
                       .cast("double") / 2.0).alias("budget"))
    ranked = _dist_cumsum(
        scored, [(-F.col("density")), F.col("doc_id")], "w", out_col="cum_w"
    ).crossJoin(F.broadcast(budget))
    taken = ranked.where(F.col("cum_w") <= F.col("budget"))
    greedy = taken.agg(
        F.count(F.lit(1)).cast("long").alias("n_taken"),
        F.sum(F.round(F.col("v"), 4).cast("decimal(28,4)"))
        .cast("double")
        .alias("greedy_value"),
        F.sum(F.round(F.col("w"), 4).cast("decimal(28,4)"))
        .cast("double")
        .alias("used_w"),
    )
    # first rejected item in density order (smallest cum_w above budget)
    reject = (
        ranked.where(F.col("cum_w") > F.col("budget"))
        .orderBy("cum_w")
        .limit(1)
        .select(
            F.col("v").alias("rv"), F.col("w").alias("rw"), F.col("budget")
        )
    )
    j = greedy.crossJoin(reject)
    frac = (F.col("budget") - F.col("used_w")) / F.col("rw")
    lp = F.col("greedy_value") + frac * F.col("rv")
    return j.select(
        "n_taken",
        F.round("greedy_value", 4).alias("greedy_value"),
        F.round(lp, 4).alias("lp_bound"),
        F.round(
            (lp - F.col("greedy_value")) / lp, 6
        ).alias("max_gap"),
    )


Q_KNAPSACK_SQL = """
WITH scored AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS w,
         CAST(len(list_distinct(string_split_regex(lower(text), '\\s+')))
              AS DOUBLE) AS v,
         ROUND(CAST(len(list_distinct(string_split_regex(lower(text), '\\s+')))
                    AS DOUBLE) / CAST(n_chars AS DOUBLE), 10) AS density
  FROM documents),
budget AS (
  SELECT CAST(SUM(CAST(ROUND(w, 0) AS DECIMAL(28,0))) AS DOUBLE) / 2.0 AS budget
  FROM scored),
ranked AS (
  SELECT scored.*, budget,
         SUM(w) OVER (ORDER BY density DESC, doc_id
                      ROWS UNBOUNDED PRECEDING) AS cum_w
  FROM scored CROSS JOIN budget),
greedy AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_taken,
         CAST(SUM(CAST(ROUND(v, 4) AS DECIMAL(28,4))) AS DOUBLE) AS greedy_value,
         CAST(SUM(CAST(ROUND(w, 4) AS DECIMAL(28,4))) AS DOUBLE) AS used_w
  FROM ranked WHERE cum_w <= budget),
reject AS (
  SELECT v AS rv, w AS rw, budget FROM ranked WHERE cum_w > budget
  ORDER BY cum_w LIMIT 1)
SELECT n_taken,
       ROUND(greedy_value, 4) AS greedy_value,
       ROUND(greedy_value + (budget - used_w) / rw * rv, 4) AS lp_bound,
       ROUND(((budget - used_w) / rw * rv)
             / (greedy_value + (budget - used_w) / rw * rv), 6) AS max_gap
FROM greedy CROSS JOIN reject
"""

QUERIES["q_knapsack_bound"] = QuerySpec(
    q_knapsack_bound,
    Q_KNAPSACK_SQL,
    "density-greedy knapsack with its LP-relaxation optimality "
    "certificate — _dist_cumsum prefix, fractional-item bound",
)


# ----------------------------------------------------- LAD regression
# y = extendedprice/1000 on x = quantity; IRLS with w = 1/max(|e|, δ),
# 3 rounds from the OLS start, iterates pinned at 9 dp.


def q_lad_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").cast("double").alias("x"),
        (F.col("l_extendedprice").cast("double") / 1000.0).alias("y"),
    )
    m0 = li.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round(F.col("x"), 2).cast("decimal(28,2)")).alias("sx"),
        F.sum(F.round(F.col("y"), 6).cast("decimal(28,6)")).alias("sy"),
        F.sum(F.round(F.col("x") * F.col("y"), 4).cast("decimal(38,4)")).alias("sxy"),
        F.sum(F.round(F.col("x") * F.col("x"), 4).cast("decimal(38,4)")).alias("sxx"),
    )
    nd = F.col("n").cast("double")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    b0 = (nd * F.col("sxy").cast("double") - sx * sy) / (
        nd * F.col("sxx").cast("double") - sx * sx
    )
    state = m0.select(
        F.col("n"),
        F.round(b0, 9).alias("b"),
        F.round((sy - b0 * sx) / nd, 9).alias("a"),
    )
    for _ in range(3):
        j = li.crossJoin(F.broadcast(state))
        e = F.col("y") - F.col("a") - F.col("b") * F.col("x")
        wgt = 1.0 / F.greatest(F.abs(e), F.lit(0.01))
        upd = j.agg(
            F.first("n").alias("n"),
            F.sum(F.round(wgt, 9).cast("decimal(28,9)")).alias("sw"),
            F.sum(F.round(wgt * F.col("x"), 6).cast("decimal(38,6)")).alias("swx"),
            F.sum(F.round(wgt * F.col("y"), 6).cast("decimal(38,6)")).alias("swy"),
            F.sum(
                F.round(wgt * F.col("x") * F.col("x"), 4).cast("decimal(38,4)")
            ).alias("swxx"),
            F.sum(
                F.round(wgt * F.col("x") * F.col("y"), 4).cast("decimal(38,4)")
            ).alias("swxy"),
        )
        swd = F.col("sw").cast("double")
        swx, swy = F.col("swx").cast("double"), F.col("swy").cast("double")
        bn = (swd * F.col("swxy").cast("double") - swx * swy) / (
            swd * F.col("swxx").cast("double") - swx * swx
        )
        state = upd.select(
            F.col("n"),
            F.round(bn, 9).alias("b"),
            F.round((swy - bn * swx) / swd, 9).alias("a"),
        )
    return state.select(
        "n", F.round("b", 6).alias("lad_slope"), F.round("a", 6).alias("lad_intercept")
    )


def _lad_round_sql(prev: str) -> str:
    e = f"(y - {prev}.a - {prev}.b * x)"
    w = f"(1.0 / GREATEST(ABS({e}), 0.01))"
    return f"""
  SELECT ANY_VALUE(n) AS n,
         ROUND((CAST(SUM(CAST(ROUND({w}, 9) AS DECIMAL(28,9))) AS DOUBLE)
                * CAST(SUM(CAST(ROUND({w} * x * y, 4) AS DECIMAL(38,4))) AS DOUBLE)
                - CAST(SUM(CAST(ROUND({w} * x, 6) AS DECIMAL(38,6))) AS DOUBLE)
                  * CAST(SUM(CAST(ROUND({w} * y, 6) AS DECIMAL(38,6))) AS DOUBLE))
               / (CAST(SUM(CAST(ROUND({w}, 9) AS DECIMAL(28,9))) AS DOUBLE)
                  * CAST(SUM(CAST(ROUND({w} * x * x, 4) AS DECIMAL(38,4))) AS DOUBLE)
                  - CAST(SUM(CAST(ROUND({w} * x, 6) AS DECIMAL(38,6))) AS DOUBLE)
                    * CAST(SUM(CAST(ROUND({w} * x, 6) AS DECIMAL(38,6))) AS DOUBLE)),
               9) AS b,
         ROUND((CAST(SUM(CAST(ROUND({w} * y, 6) AS DECIMAL(38,6))) AS DOUBLE)
                - (CAST(SUM(CAST(ROUND({w}, 9) AS DECIMAL(28,9))) AS DOUBLE)
                   * CAST(SUM(CAST(ROUND({w} * x * y, 4) AS DECIMAL(38,4))) AS DOUBLE)
                   - CAST(SUM(CAST(ROUND({w} * x, 6) AS DECIMAL(38,6))) AS DOUBLE)
                     * CAST(SUM(CAST(ROUND({w} * y, 6) AS DECIMAL(38,6))) AS DOUBLE))
                  / (CAST(SUM(CAST(ROUND({w}, 9) AS DECIMAL(28,9))) AS DOUBLE)
                     * CAST(SUM(CAST(ROUND({w} * x * x, 4) AS DECIMAL(38,4))) AS DOUBLE)
                     - CAST(SUM(CAST(ROUND({w} * x, 6) AS DECIMAL(38,6))) AS DOUBLE)
                       * CAST(SUM(CAST(ROUND({w} * x, 6) AS DECIMAL(38,6))) AS DOUBLE))
                  * CAST(SUM(CAST(ROUND({w} * x, 6) AS DECIMAL(38,6))) AS DOUBLE))
               / CAST(SUM(CAST(ROUND({w}, 9) AS DECIMAL(28,9))) AS DOUBLE), 9) AS a
  FROM src CROSS JOIN {prev}
"""


Q_LAD_SQL = f"""
WITH src AS (
  SELECT CAST(l_quantity AS DOUBLE) AS x,
         CAST(l_extendedprice AS DOUBLE) / 1000.0 AS y
  FROM lineitem),
m0 AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 2) AS DECIMAL(28,2))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * y, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(ROUND(x * x, 4) AS DECIMAL(38,4))) AS DOUBLE) AS sxx
  FROM src),
st0 AS (
  SELECT n,
         ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 9) AS b,
         ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 9) AS a
  FROM m0),
st1 AS ({_lad_round_sql("st0")}),
st2 AS ({_lad_round_sql("st1")}),
st3 AS ({_lad_round_sql("st2")})
SELECT n, ROUND(b, 6) AS lad_slope, ROUND(a, 6) AS lad_intercept
FROM st3
"""

QUERIES["q_lad_regression"] = QuerySpec(
    q_lad_regression,
    Q_LAD_SQL,
    "LAD (median) regression by 3 unrolled IRLS rounds — pinned "
    "iterates, decimal weighted moments",
)


# ------------------------------------------------ haversine nearest
# Deterministic nation coordinates: lat = (nationkey*7 % 120) − 60,
# lon = (nationkey*23 % 360) − 180. Nearest other nation by the
# great-circle distance (R = 6371 km), token-identical formula.


def q_haversine_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    pts = nation.select(
        "n_nationkey",
        "n_name",
        ((F.col("n_nationkey") * 7 % 120) - 60).cast("double").alias("lat"),
        ((F.col("n_nationkey") * 23 % 360) - 180).cast("double").alias("lon"),
    )
    other = pts.select(
        F.col("n_nationkey").alias("k2"),
        F.col("n_name").alias("name2"),
        F.col("lat").alias("lat2"),
        F.col("lon").alias("lon2"),
    )
    rad = 0.017453292519943295
    j = pts.join(F.broadcast(other), F.col("n_nationkey") != F.col("k2"))
    dlat = (F.col("lat2") - F.col("lat")) * rad / 2.0
    dlon = (F.col("lon2") - F.col("lon")) * rad / 2.0
    h = (
        F.sin(dlat) * F.sin(dlat)
        + F.cos(F.col("lat") * rad)
        * F.cos(F.col("lat2") * rad)
        * F.sin(dlon)
        * F.sin(dlon)
    )
    dist = 2.0 * 6371.0 * F.asin(F.sqrt(h))
    scored = j.select(
        "n_name", F.col("name2").alias("nearest"), F.round(dist, 6).alias("km")
    )
    best = scored.groupBy("n_name").agg(F.min(F.struct("km", "nearest")).alias("g"))
    return best.select(
        "n_name",
        F.col("g.nearest").alias("nearest_nation"),
        F.col("g.km").alias("distance_km"),
    ).orderBy("n_name")


Q_HAVERSINE_SQL = """
WITH pts AS (
  SELECT n_nationkey, n_name,
         CAST((n_nationkey * 7 % 120) - 60 AS DOUBLE) AS lat,
         CAST((n_nationkey * 23 % 360) - 180 AS DOUBLE) AS lon
  FROM nation),
j AS (
  SELECT a.n_name, b.n_name AS nearest,
         ROUND(2.0 * 6371.0 * ASIN(SQRT(
           SIN((b.lat - a.lat) * 0.017453292519943295 / 2.0)
             * SIN((b.lat - a.lat) * 0.017453292519943295 / 2.0)
           + COS(a.lat * 0.017453292519943295) * COS(b.lat * 0.017453292519943295)
             * SIN((b.lon - a.lon) * 0.017453292519943295 / 2.0)
             * SIN((b.lon - a.lon) * 0.017453292519943295 / 2.0))), 6) AS km
  FROM pts a JOIN pts b ON a.n_nationkey <> b.n_nationkey),
best AS (
  SELECT n_name, km, nearest,
         ROW_NUMBER() OVER (PARTITION BY n_name ORDER BY km, nearest) AS rn
  FROM j)
SELECT n_name, nearest AS nearest_nation, km AS distance_km
FROM best WHERE rn = 1
ORDER BY n_name
"""

QUERIES["q_haversine_nearest"] = QuerySpec(
    q_haversine_nearest,
    Q_HAVERSINE_SQL,
    "haversine nearest-neighbor over deterministic nation coordinates "
    "— 25x25 bounded cross, token-identical great-circle math",
)
