"""Round-9 surface extensions (SURVEY §2.3 N r9): SCD2 as-of
dimension enrichment, Jaro-Winkler linkage scoring over the
distinct-value domain, and sketch-merged rolling MAU — three patterns
a production event-analytics stack runs daily that the registry did
not yet cover.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`)
and declares the event-streaming data model these operate over
(`/root/reference/README.md:17,25`). Determinism follows FIXTURES.md:
decimal-exact value sums, total tie-breaks on every window, doubles
only in per-row terms or one final division.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------- SCD2 as-of dimension enrichment
# The canonical warehouse join: enrich facts with the dimension row
# that was VALID AT the fact's event time. The SCD2 dimension here is
# derived deterministically from the stream itself — each user's
# purchase history defines tier periods (tier = cumulative purchases
# at/before t: bronze < 3, silver < 6, gold >= 6), one period per
# distinct purchase timestamp — and every click is enriched with the
# tier in force when it happened (inner as-of semantics on both
# engines: clicks before any purchase drop). Scale shape: the as-of
# join runs through
# operators/relational.py::asof_join (union-window rewrite = ONE
# shuffle on user_id, cost linear in clicks+periods regardless of
# per-user fan-out — the 100 TB default); the dimension build is one
# keyed window over purchases only. Oracle: DuckDB's native ASOF JOIN.

TIER_EXPR = (
    "CASE WHEN cum >= 6 THEN 'gold' WHEN cum >= 3 THEN 'silver' ELSE 'bronze' END"
)


def q_scd2_asof_enrich(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.relational import asof_join

    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "ts", "value", "event_id"
    )
    purchases = ev.where(F.col("event_type") == "purchase")
    # one period row per DISTINCT (user, ts): cum = purchases at/<= ts,
    # so two same-timestamp purchases collapse into one unambiguous row
    per_ts = purchases.groupBy("user_id", "ts").agg(F.count(F.lit(1)).alias("k"))
    w = Window.partitionBy("user_id").orderBy("ts")
    periods = per_ts.withColumn(
        "cum", F.sum("k").over(w.rowsBetween(Window.unboundedPreceding, 0))
    ).select("user_id", "ts", F.expr(TIER_EXPR).alias("tier"))
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("ts").alias("c_ts"), "value", "event_id"
    )
    enriched = asof_join(
        clicks,
        periods,
        "user_id",
        "user_id",
        "c_ts",
        "ts",
        ["tier"],
        strategy="union_window",
    )
    return (
        enriched.groupBy("tier")
        .agg(
            F.count(F.lit(1)).alias("n_clicks"),
            F.count_distinct("user_id").alias("users"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .orderBy("tier")
    )


Q_SCD2_ASOF_SQL = f"""
WITH ev AS (
  SELECT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts, value, event_id
  FROM events),
per_ts AS (
  SELECT user_id, ts, COUNT(*) AS k
  FROM ev WHERE event_type = 'purchase' GROUP BY user_id, ts),
periods AS (
  SELECT user_id, ts,
         {TIER_EXPR.replace("cum", "SUM(k) OVER (PARTITION BY user_id ORDER BY ts ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)")} AS tier
  FROM per_ts),
clicks AS (
  SELECT user_id, ts AS c_ts, value, event_id FROM ev WHERE event_type = 'click'),
enriched AS (
  SELECT c.user_id, c.value, p.tier
  FROM clicks c ASOF JOIN periods p
    ON c.user_id = p.user_id AND c.c_ts >= p.ts)
SELECT tier, COUNT(*) AS n_clicks, COUNT(DISTINCT user_id) AS users,
       CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS sum_value
FROM enriched
GROUP BY tier
ORDER BY tier
"""

QUERIES["q_scd2_asof_enrich"] = QuerySpec(
    q_scd2_asof_enrich,
    Q_SCD2_ASOF_SQL,
    "SCD2 dimension enrichment at event time: clicks pick up the tier period "
    "in force when they happened (union-window as-of join, one shuffle)",
)


# ----------------------------- Jaro-Winkler linkage scoring
# The record-linkage scorer family beyond edit distance: JW weights
# shared prefixes and tolerates transpositions, which is why
# Fellegi-Sunter name comparators use it. Spark has no builtin, so
# operators/strsim.py (pinned bit-for-bit against DuckDB's
# jaro_winkler_similarity by tests/test_strsim.py) runs inside an
# Arrow-batched pandas UDF — over the DISTINCT-NAME domain only (the
# r9 q_fuzzy_clusters stance: score the vocabulary, join rows back),
# so the Python cost is vocabulary², not corpus². Output: per
# name-pair bucket histogram of scores + decimal sum of member-pair
# weights, fully tie-broken.

JW_BLOCK_EXPR = "element_at(split(p_name, ' '), 2)"


def q_jaro_winkler_linkage(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.functions import pandas_udf

    from kcore_spark.caching import transient_persist

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    names = transient_persist(
        part.groupBy("p_name")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("blk", F.expr(JW_BLOCK_EXPR))
    )
    cand = (
        names.alias("a")
        .join(
            names.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.p_name") < F.col("b.p_name")),
        )
        .select(
            F.col("a.p_name").alias("n1"),
            F.col("b.p_name").alias("n2"),
            (F.col("a.n_rows") * F.col("b.n_rows")).alias("row_pairs"),
        )
    )

    @pandas_udf("double")
    def jw_udf(s1: pd.Series, s2: pd.Series) -> pd.Series:
        from kcore_spark.operators.strsim import jaro_winkler

        return pd.Series(
            [jaro_winkler(a, b) for a, b in zip(s1, s2)], dtype="float64"
        )

    scored = cand.withColumn("jw", F.round(jw_udf("n1", "n2"), 12))
    return (
        scored.groupBy(F.floor(F.col("jw") * 10).cast("long").alias("jw_decile"))
        .agg(
            F.count(F.lit(1)).alias("n_name_pairs"),
            F.sum("row_pairs").alias("row_pairs"),
            F.round(
                F.sum(F.col("jw").cast("decimal(18,12)")).cast("double"), 10
            ).alias("jw_sum"),
        )
        .orderBy("jw_decile")
    )


Q_JW_SQL = f"""
WITH names AS (
  SELECT p_name, COUNT(*) AS n_rows, string_split(p_name, ' ')[2] AS blk
  FROM part GROUP BY p_name),
cand AS (
  SELECT a.p_name AS n1, b.p_name AS n2, a.n_rows * b.n_rows AS row_pairs,
         ROUND(jaro_winkler_similarity(a.p_name, b.p_name), 12) AS jw
  FROM names a JOIN names b ON a.blk = b.blk AND a.p_name < b.p_name)
SELECT CAST(FLOOR(jw * 10) AS BIGINT) AS jw_decile,
       COUNT(*) AS n_name_pairs,
       CAST(SUM(row_pairs) AS BIGINT) AS row_pairs,
       ROUND(CAST(SUM(CAST(jw AS DECIMAL(18,12))) AS DOUBLE), 10) AS jw_sum
FROM cand
GROUP BY 1
ORDER BY 1
"""

QUERIES["q_jaro_winkler_linkage"] = QuerySpec(
    q_jaro_winkler_linkage,
    Q_JW_SQL,
    "Jaro-Winkler linkage scores over the distinct-name domain (DuckDB-parity "
    "scorer, vocabulary-sized pandas UDF, rows weighted back in)",
)


# ----------------------------- rolling MAU via mergeable sketches
# Rolling 7-day active users is THE sketch-merge showcase: at 100 TB
# you cannot re-scan 7 days per day, so each day builds ONE HLL sketch
# of its user ids and the rolling number is a UNION of 7 daily
# sketches (hll_union_agg over a 6-preceding window) — mergeability
# turns a re-scan into a 7-sketch fold. The oracle pins (a) the exact
# rolling distinct (computed scalably: distinct (day, user) pairs
# exploded to the <=7 rolling days they cover — never a per-day
# re-scan) and (b) the deterministic accuracy-class boolean that the
# sketch estimate lands within 5% of it (the q_hll_sketch_union
# stance: each engine runs its own approximate operator).

MAU_WINDOW_DAYS = 7


def q_rolling_mau_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        F.to_date("ts").alias("day"), "user_id"
    )
    daily = ev.groupBy("day").agg(F.hll_sketch_agg("user_id").alias("sk"))
    w = Window.orderBy("day").rowsBetween(-(MAU_WINDOW_DAYS - 1), 0)
    # NOTE: rowsBetween over days is exact here because every calendar
    # day in the fixture range has events (daily is dense); a gappy
    # calendar would use a rangeBetween over epoch-days instead.
    est = daily.withColumn(
        "rolling_est", F.hll_sketch_estimate(F.hll_union_agg("sk").over(w))
    ).select("day", "rolling_est")
    # exact rolling distinct, shuffle-bounded: distinct (day, user) ->
    # explode each pair to the up-to-7 rolling windows it belongs to
    pairs = ev.distinct()
    exploded = pairs.select(
        F.explode(
            F.sequence(F.lit(0), F.lit(MAU_WINDOW_DAYS - 1))
        ).alias("off"),
        "day",
        "user_id",
    ).select(F.date_add("day", F.col("off")).alias("day"), "user_id")
    exact = (
        exploded.join(daily.select("day"), "day")  # clip to observed days
        .groupBy("day")
        .agg(F.count_distinct("user_id").alias("exact_mau"))
    )
    return (
        est.join(exact, "day")
        .select(
            F.date_format("day", "yyyy-MM-dd").alias("day"),
            "exact_mau",
            (
                (F.abs(F.col("rolling_est") - F.col("exact_mau")) / F.col("exact_mau"))
                < 0.05
            ).alias("sketch_within_5pct"),
        )
        .orderBy("day")
    )


Q_ROLLING_MAU_SQL = f"""
WITH ev AS (
  SELECT CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day, user_id FROM events),
days AS (SELECT DISTINCT day FROM ev),
pairs AS (SELECT DISTINCT day, user_id FROM ev),
exploded AS (
  SELECT CAST(pairs.day + CAST(o.off AS INTEGER) AS DATE) AS day, user_id
  FROM pairs CROSS JOIN (SELECT UNNEST(range({MAU_WINDOW_DAYS})) AS off) o),
exact AS (
  SELECT e.day, COUNT(DISTINCT user_id) AS exact_mau
  FROM exploded e JOIN days d ON e.day = d.day
  GROUP BY e.day)
SELECT strftime(CAST(day AS TIMESTAMP), '%Y-%m-%d') AS day,
       exact_mau, TRUE AS sketch_within_5pct
FROM exact
ORDER BY day
"""

QUERIES["q_rolling_mau_sketch"] = QuerySpec(
    q_rolling_mau_sketch,
    Q_ROLLING_MAU_SQL,
    "rolling 7-day MAU: daily HLL sketches union-merged over a window "
    "(mergeable-sketch fold) vs the exact rolling distinct",
)


# ----------------------------- SQL pipe syntax (Spark 4.0, SQL:2023-ish)
# The |> operator-chaining dialect — each stage consumes the previous
# stage's table, so a query reads top-down like a DataFrame chain.
# Modern-dialect parity row alongside q_sql_dialect_extras (GROUP BY
# ALL / OFFSET / try_divide); the plan compiles to exactly the same
# aggregate-over-scan as the classic form (Catalyst sees one logical
# plan), so there is no perf note — this pins the PARSER surface.


def q_sql_pipe_syntax(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_pipe_v")
    return spark.sql(
        """
        FROM orders_pipe_v
        |> WHERE o_orderstatus <> 'F'
        |> EXTEND CAST(o_totalprice AS DECIMAL(15,2)) AS price_d
        |> AGGREGATE COUNT(*) AS n,
                     CAST(SUM(price_d) AS DOUBLE) AS total_price,
                     COUNT(DISTINCT o_custkey) AS custs
           GROUP BY o_orderpriority
        |> WHERE n > 0
        |> ORDER BY o_orderpriority
        """
    )


Q_PIPE_SQL = """
SELECT o_orderpriority, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total_price,
       COUNT(DISTINCT o_custkey) AS custs
FROM orders
WHERE o_orderstatus <> 'F'
GROUP BY o_orderpriority
HAVING COUNT(*) > 0
ORDER BY o_orderpriority
"""

QUERIES["q_sql_pipe_syntax"] = QuerySpec(
    q_sql_pipe_syntax,
    Q_PIPE_SQL,
    "SQL pipe-syntax dialect (FROM |> WHERE |> EXTEND |> AGGREGATE |> ORDER BY) "
    "— parser-surface parity, same logical plan as the classic form",
)


# ----------------------------- split-conformal prediction intervals
# The distribution-free uncertainty wrapper a model-serving pipeline
# puts around ANY point predictor: hold out a calibration set, take
# q_hat = the ceil((n+1)(1-alpha))-th smallest absolute residual, and
# the interval prediction±q_hat covers new points with probability
# ≥ 1−alpha. Everything stays exact: the three-way split is the
# portable md5-uniform (q_hash_sample idiom), the predictor is the
# train-split per-priority mean in DECIMAL cents, residuals are
# rounded to a fixed grid before ranking, and the rank selection is a
# row_number walk fully tie-broken by orderkey. Scale shape: one
# partial-agg shuffle for the means (k rows, broadcast back), one
# keyed window for the calibration rank, one broadcast join to score
# the test split — linear, no driver numerics.

CONF_ALPHA = 0.10


def q_conformal_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
        (
            F.conv(F.substring(F.md5(F.col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("double")
            / 4294967296.0
        ).alias("u"),
    )
    train = o.where(F.col("u") < 0.5)
    cal = o.where((F.col("u") >= 0.5) & (F.col("u") < 0.75))
    test = o.where(F.col("u") >= 0.75)
    pred = train.groupBy("o_orderpriority").agg(
        (F.sum(F.col("cents").cast("decimal(20,0)")) / F.count(F.lit(1)))
        .cast("decimal(20,4)")
        .alias("yhat")
    )
    resid = cal.join(F.broadcast(pred), "o_orderpriority").select(
        "o_orderpriority",
        "o_orderkey",
        F.abs(F.col("cents") - F.col("yhat")).cast("decimal(20,4)").alias("r"),
    )
    w = Window.partitionBy("o_orderpriority").orderBy("r", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = resid.withColumn("i", F.row_number().over(w)).withColumn(
        "n_cal", F.count(F.lit(1)).over(wn)
    )
    qhat = ranked.where(
        F.col("i")
        == F.least(
            F.ceil((F.col("n_cal") + 1) * F.lit(1.0 - CONF_ALPHA)).cast("int"),
            F.col("n_cal"),
        )
    ).select("o_orderpriority", F.col("r").alias("qhat"), "n_cal")
    scored = test.join(F.broadcast(pred), "o_orderpriority").join(
        F.broadcast(qhat), "o_orderpriority"
    )
    return (
        scored.groupBy("o_orderpriority")
        .agg(
            F.min("n_cal").alias("n_cal"),
            F.count(F.lit(1)).alias("n_test"),
            F.round(F.min("qhat").cast("double") / 100.0, 4).alias("qhat_dollars"),
            F.sum(
                (F.abs(F.col("cents") - F.col("yhat")) <= F.col("qhat")).cast("long")
            ).alias("covered"),
        )
        .withColumn(
            "coverage",
            F.round(F.col("covered").cast("double") / F.col("n_test"), 6),
        )
        .orderBy("o_orderpriority")
    )


Q_CONFORMAL_SQL = f"""
WITH o AS (
  SELECT o_orderkey, o_orderpriority,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         ('0x' || substring(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM orders),
train AS (SELECT * FROM o WHERE u < 0.5),
cal AS (SELECT * FROM o WHERE u >= 0.5 AND u < 0.75),
test AS (SELECT * FROM o WHERE u >= 0.75),
pred AS (
  SELECT o_orderpriority,
         CAST(SUM(CAST(cents AS DECIMAL(20,0))) / COUNT(*) AS DECIMAL(20,4)) AS yhat
  FROM train GROUP BY o_orderpriority),
resid AS (
  SELECT c.o_orderpriority, c.o_orderkey,
         CAST(ABS(c.cents - p.yhat) AS DECIMAL(20,4)) AS r
  FROM cal c JOIN pred p USING (o_orderpriority)),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY r, o_orderkey) AS i,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n_cal
  FROM resid),
qhat AS (
  SELECT o_orderpriority, r AS qhat, n_cal
  FROM ranked
  WHERE i = LEAST(CAST(CEIL((n_cal + 1) * {1.0 - CONF_ALPHA}) AS INTEGER), n_cal)),
scored AS (
  SELECT t.o_orderpriority, t.cents, p.yhat, q.qhat, q.n_cal
  FROM test t JOIN pred p USING (o_orderpriority) JOIN qhat q USING (o_orderpriority))
SELECT o_orderpriority,
       CAST(MIN(n_cal) AS BIGINT) AS n_cal,
       COUNT(*) AS n_test,
       ROUND(CAST(MIN(qhat) AS DOUBLE) / 100.0, 4) AS qhat_dollars,
       CAST(SUM(CASE WHEN ABS(cents - yhat) <= qhat THEN 1 ELSE 0 END) AS BIGINT)
         AS covered,
       ROUND(CAST(SUM(CASE WHEN ABS(cents - yhat) <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS coverage
FROM scored
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

QUERIES["q_conformal_intervals"] = QuerySpec(
    q_conformal_intervals,
    Q_CONFORMAL_SQL,
    "split-conformal prediction intervals: calibration-quantile q_hat "
    "(exact decimal rank walk) wrapped around a train-split predictor, "
    "coverage measured on the test split",
)


# ----------------------------- k-truss decomposition (k = 3)
# The edge-level companion to the vertex-level k-core family
# (q_kcore_subgraph / q_core_numbers): the k-truss keeps every edge
# that participates in ≥ k−2 triangles WITHIN the surviving subgraph,
# peeled to fixpoint — the standard cohesive-community extractor
# (stricter than core: a 3-truss edge is in a triangle of the truss,
# not merely between degree-2 vertices). Same thresholded co-purchase
# graph as the core family (extensions_r7.py:35 for why the ≥2-order
# threshold keeps the projection sparse). Scale shape per round: one
# triangle enumeration (two self-joins on ordered edges — shuffle on
# join keys, never materializing vertex neighborhoods) + one edge-key
# support aggregate + one semi-join, over a shrinking edge set with
# per-round lineage truncation. Early-exit at fixpoint is safe against
# the oracle's fixed unroll because peeling is idempotent at fixpoint
# (every surviving edge keeps support ≥ k−2, so extra rounds no-op).
# Output: the final truss's support histogram — discriminating (a
# wrong peel changes supports, not just edge counts).

TRUSS_K = 3
TRUSS_PEELS = 5


def q_ktruss(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.graph import shared_co_order_edges

    # r14: session-shared materialized edge projection (identical
    # edge set; see operators/graph.py::shared_co_order_edges)
    e = shared_co_order_edges(spark, sf_dir)

    def support(ed: DataFrame) -> DataFrame:
        tri = (
            ed.alias("e1")
            .join(ed.alias("e2"), F.col("e1.p2") == F.col("e2.p1"))
            .join(
                ed.alias("e3"),
                (F.col("e1.p1") == F.col("e3.p1"))
                & (F.col("e2.p2") == F.col("e3.p2")),
                "inner",
            )
            .select(
                F.col("e1.p1").alias("a"),
                F.col("e1.p2").alias("b"),
                F.col("e2.p2").alias("c"),
            )
        )
        return (
            tri.select(F.col("a").alias("p1"), F.col("b").alias("p2"))
            .unionByName(tri.select(F.col("b").alias("p1"), F.col("c").alias("p2")))
            .unionByName(tri.select(F.col("a").alias("p1"), F.col("c").alias("p2")))
            .groupBy("p1", "p2")
            .agg(F.count(F.lit(1)).alias("sup"))
        )

    prev = None
    for _ in range(TRUSS_PEELS):
        kept = support(e).where(F.col("sup") >= TRUSS_K - 2).select("p1", "p2")
        e = e.join(kept, ["p1", "p2"], "left_semi").localCheckpoint()
        n = e.count()  # bounded control-plane fixpoint probe
        if n == prev:
            break
        prev = n
    final_sup = support(e)
    return (
        final_sup.groupBy("sup")
        .agg(
            F.count(F.lit(1)).alias("n_edges"),
            F.min("p1").alias("min_p1"),
            F.max("p2").alias("max_p2"),
        )
        .orderBy("sup")
    )


def _ktruss_sql() -> str:
    layers = [
        """li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
te_0 AS MATERIALIZED (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2)"""
    ]
    for i in range(TRUSS_PEELS):
        layers.append(
            f"""ts_{i} AS MATERIALIZED (
  SELECT p1, p2, COUNT(*) AS sup FROM (
    SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
    FROM te_{i} e1 JOIN te_{i} e2 ON e1.p2 = e2.p1
    JOIN te_{i} e3 ON e1.p1 = e3.p1 AND e2.p2 = e3.p2
  ) t, LATERAL (VALUES (t.a, t.b), (t.b, t.c), (t.a, t.c)) AS ed(p1, p2)
  GROUP BY 1, 2 HAVING COUNT(*) >= {TRUSS_K - 2}),
te_{i + 1} AS MATERIALIZED (
  SELECT e.p1, e.p2 FROM te_{i} e JOIN ts_{i} s USING (p1, p2))"""
        )
    last = f"te_{TRUSS_PEELS}"
    return (
        "WITH "
        + ",\n".join(layers)
        + f""",
final_sup AS (
  SELECT p1, p2, COUNT(*) AS sup FROM (
    SELECT e1.p1 AS a, e1.p2 AS b, e2.p2 AS c
    FROM {last} e1 JOIN {last} e2 ON e1.p2 = e2.p1
    JOIN {last} e3 ON e1.p1 = e3.p1 AND e2.p2 = e3.p2
  ) t, LATERAL (VALUES (t.a, t.b), (t.b, t.c), (t.a, t.c)) AS ed(p1, p2)
  GROUP BY 1, 2)
SELECT sup, COUNT(*) AS n_edges, MIN(p1) AS min_p1, MAX(p2) AS max_p2
FROM final_sup
GROUP BY sup
ORDER BY sup"""
    )


QUERIES["q_ktruss"] = QuerySpec(
    q_ktruss,
    _ktruss_sql(),
    "3-truss decomposition of the co-purchase graph: triangle-support edge "
    "peeling to fixpoint, support histogram of the surviving truss",
)
