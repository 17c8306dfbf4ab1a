"""Round-8 surface extensions, part D (SURVEY §2.3 N r8): HITS
hubs/authorities, seasonal-naive forecast evaluation (MASE), degree
assortativity, and hard-negative mining for contrastive training —
the link-analysis + forecasting + embedding-training-data block.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: integer/decimal domains wherever a
sum crosses rows; doubles only in per-row arithmetic or one final
division; sequential array folds on both engines; orderings fully
tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------------------ HITS
# Hubs & authorities over the customer→part purchase bipartite graph
# (edge weight = times purchased). Two unnormalized iterations keep
# the whole computation in EXACT integers (h0=1 → a1, h1, a2 are all
# integer sums of integer products — no float drift to pin); each
# half-iteration is one keyed partial-agg shuffle over the edge
# table, the standard distributed HITS shape. Production runs more
# rounds with per-round normalization; two exact rounds already rank
# identically to the normalized fixpoint's first-order behavior and
# keep the oracle bit-free. Output: top-20 authorities, tie-broken.

HITS_TOPK = 20


def q_hits_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .agg(F.count(F.lit(1)).alias("w"))
    )
    # NOTE the old code here did persist() + unpersist()-at-construction,
    # which never materialized (the unpersist ran before the caller's
    # action) — so the effective baseline was NO edge cache. Measured
    # A/B at sf0.1 (min-of-2): none 4.83s / edges-only 5.14s / a2-only
    # 4.03s / both 6.52s — materializing the fact join costs more than
    # the pipelined recomputes it saves at every scale where the edge
    # list dwarfs executor storage, while a2 (part-cardinality-sized,
    # lineage = the whole two-round HITS chain) is the cheap, high-value
    # cache. So: edges stays lazy, a2 gets the transient cache below.
    from kcore_spark.caching import transient_persist

    # a1(p) = sum_c w  (h0 = 1)
    a1 = edges.groupBy("p").agg(F.sum("w").cast("long").alias("a1"))
    # h1(c) = sum_p w * a1(p)
    h1 = (
        edges.join(a1, "p")
        .groupBy("c")
        .agg(F.sum(F.col("w") * F.col("a1")).cast("long").alias("h1"))
    )
    # a2(p) = sum_c w * h1(c)
    # a2 feeds both the top-k and the 1-row max normalizer; without the
    # cache the whole two-round HITS lineage ran twice
    a2 = transient_persist(
        edges.join(h1, "c")
        .groupBy("p")
        .agg(F.sum(F.col("w") * F.col("h1")).cast("long").alias("a2"))
    )
    return (
        a2.orderBy(F.col("a2").desc(), F.col("p"))
        .limit(HITS_TOPK)
        .crossJoin(F.broadcast(a2.agg(F.max("a2").alias("amax"))))
        .select(
            "p",
            "a2",
            F.round(F.col("a2").cast("double") / F.col("amax"), 8).alias("authority"),
        )
        .orderBy(F.col("a2").desc(), F.col("p"))
    )


Q_HITS_SQL = f"""
WITH edges AS (
  SELECT o_custkey AS c, l_partkey AS p, COUNT(*) AS w
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
  GROUP BY o_custkey, l_partkey),
a1 AS (SELECT p, CAST(SUM(w) AS BIGINT) AS a1 FROM edges GROUP BY p),
h1 AS (
  SELECT c, CAST(SUM(w * a1) AS BIGINT) AS h1
  FROM edges JOIN a1 USING (p) GROUP BY c),
a2 AS (
  SELECT p, CAST(SUM(w * h1) AS BIGINT) AS a2
  FROM edges JOIN h1 USING (c) GROUP BY p),
amax AS (SELECT MAX(a2) AS amax FROM a2)
SELECT p, a2, ROUND(CAST(a2 AS DOUBLE) / amax, 8) AS authority
FROM a2 CROSS JOIN amax
ORDER BY a2 DESC, p
LIMIT {HITS_TOPK}
"""

QUERIES["q_hits_ranking"] = QuerySpec(
    q_hits_ranking,
    Q_HITS_SQL,
    "HITS authorities over the purchase bipartite graph (2 exact integer iterations)",
)


# --------------------------------------------------- seasonal MASE
# Forecast evaluation: the seasonal-naive forecast (value one week
# earlier) scored per event type with MASE — the scale-free metric a
# forecasting pipeline gates models on (|err| of the model over |err|
# of the one-step naive). Daily totals are one partial-agg shuffle;
# lags ride a per-type window; per-day |errors| are per-row doubles
# rounded before the decimal sum; one final division.


def q_seasonal_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.catalog import normalize_event_ts

    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("d")
    ).agg(F.sum(F.col("value").cast("decimal(28,10)")).cast("double").alias("v"))
    w = Window.partitionBy("event_type").orderBy("d")
    lagged = daily.select(
        "event_type",
        "d",
        "v",
        F.lag("v", 7).over(w).alias("season"),
        F.lag("v", 1).over(w).alias("naive"),
    ).where(F.col("season").isNotNull() & F.col("naive").isNotNull())
    dec = "decimal(38,12)"
    per_type = lagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(F.round(F.abs(F.col("v") - F.col("season")), 10).cast(dec))
        .cast("double")
        .alias("mae_seasonal"),
        F.sum(F.round(F.abs(F.col("v") - F.col("naive")), 10).cast(dec))
        .cast("double")
        .alias("mae_naive"),
    )
    return per_type.select(
        "event_type",
        "n_days",
        F.round("mae_seasonal", 6).alias("mae_seasonal"),
        F.round("mae_naive", 6).alias("mae_naive"),
        F.round(F.col("mae_seasonal") / F.col("mae_naive"), 8).alias("mase"),
    ).orderBy("event_type")


Q_SEASONAL_MASE_SQL = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS d,
         CAST(SUM(CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS v
  FROM events GROUP BY event_type, CAST(ts AS DATE)),
lagged AS (
  SELECT event_type, d, v,
         LAG(v, 7) OVER (PARTITION BY event_type ORDER BY d) AS season,
         LAG(v, 1) OVER (PARTITION BY event_type ORDER BY d) AS naive
  FROM daily),
per AS (
  SELECT event_type, COUNT(*) AS n_days,
         CAST(SUM(CAST(ROUND(ABS(v - season), 10) AS DECIMAL(38,12))) AS DOUBLE) AS mae_seasonal,
         CAST(SUM(CAST(ROUND(ABS(v - naive), 10) AS DECIMAL(38,12))) AS DOUBLE) AS mae_naive
  FROM lagged WHERE season IS NOT NULL AND naive IS NOT NULL
  GROUP BY event_type)
SELECT event_type, n_days,
       ROUND(mae_seasonal, 6) AS mae_seasonal,
       ROUND(mae_naive, 6) AS mae_naive,
       ROUND(mae_seasonal / mae_naive, 8) AS mase
FROM per ORDER BY event_type
"""

QUERIES["q_seasonal_mase"] = QuerySpec(
    q_seasonal_mase,
    Q_SEASONAL_MASE_SQL,
    "seasonal-naive forecast evaluated with MASE per event type (window lags, decimal error sums)",
)


# --------------------------------------------- degree assortativity
# Degree-degree Pearson correlation across the purchase edges (does a
# high-degree customer buy high-degree parts?) — the one-number graph
# diagnostic run before choosing a partitioning strategy. All five
# moments (Σx, Σy, Σxy, Σx², Σy²) are EXACT integer sums pushed
# through one edge-keyed shuffle; r is a single final expression.


def q_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    # transient_persist (see q_hits_ranking): the old persist+unpersist
    # pair released before the caller's action, so the fact join +
    # distinct recomputed for all three consumers (cdeg, pdeg, joined)
    from kcore_spark.caching import transient_persist

    edges = transient_persist(edges)
    cdeg = edges.groupBy("c").agg(F.count(F.lit(1)).alias("x"))
    pdeg = edges.groupBy("p").agg(F.count(F.lit(1)).alias("y"))
    joined = edges.join(cdeg, "c").join(pdeg, "p")
    dec = "decimal(38,0)"
    m = joined.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).alias("sx"),
        F.sum(F.col("y").cast(dec)).alias("sy"),
        F.sum((F.col("x") * F.col("y")).cast(dec)).alias("sxy"),
        F.sum((F.col("x") * F.col("x")).cast(dec)).alias("sxx"),
        F.sum((F.col("y") * F.col("y")).cast(dec)).alias("syy"),
    )
    out = m.select(
        F.col("n").alias("n_edges"),
        F.round(
            (
                F.col("n").cast("double") * F.col("sxy").cast("double")
                - F.col("sx").cast("double") * F.col("sy").cast("double")
            )
            / (
                F.sqrt(
                    F.col("n").cast("double") * F.col("sxx").cast("double")
                    - F.col("sx").cast("double") * F.col("sx").cast("double")
                )
                * F.sqrt(
                    F.col("n").cast("double") * F.col("syy").cast("double")
                    - F.col("sy").cast("double") * F.col("sy").cast("double")
                )
            ),
            8,
        ).alias("assortativity"),
    )
    return out


Q_ASSORTATIVITY_SQL = """
WITH edges AS (
  SELECT DISTINCT o_custkey AS c, l_partkey AS p
  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
cdeg AS (SELECT c, COUNT(*) AS x FROM edges GROUP BY c),
pdeg AS (SELECT p, COUNT(*) AS y FROM edges GROUP BY p),
m AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(y AS DECIMAL(38,0))) AS sy,
         SUM(CAST(x * y AS DECIMAL(38,0))) AS sxy,
         SUM(CAST(x * x AS DECIMAL(38,0))) AS sxx,
         SUM(CAST(y * y AS DECIMAL(38,0))) AS syy
  FROM edges JOIN cdeg USING (c) JOIN pdeg USING (p))
SELECT n AS n_edges,
       ROUND((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (SQRT(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * SQRT(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 8)
         AS assortativity
FROM m
"""

QUERIES["q_degree_assortativity"] = QuerySpec(
    q_degree_assortativity,
    Q_ASSORTATIVITY_SQL,
    "degree assortativity of the purchase graph (exact integer moments, one final expression)",
)


# -------------------------------------------------- hard negatives
# Contrastive-training data mining: for each anchor vector, the most
# cosine-similar vector carrying a DIFFERENT label — the "hard
# negative" a contrastive or reranker training set pairs with each
# anchor. Bounded anchor set broadcast against the corpus (the
# q_cosine_topk shape), per-anchor top-1 by a fully tie-broken
# window. At 100 TB the anchor set stays bounded per batch and the
# corpus side would first shortlist via the IVF/LSH machinery
# (operators/similarity.py) — this query pins the exact-rerank stage.

HN_ANCHORS = 10


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators.similarity import as_double, dot

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e"), "label"
    )
    anchors = emb.where(F.col("vec_id") < HN_ANCHORS).select(
        F.col("vec_id").alias("q_id"),
        F.col("e").alias("q_e"),
        F.col("label").alias("q_label"),
    )
    norm = lambda v: F.sqrt(dot(v, v))  # noqa: E731
    pairs = (
        emb.crossJoin(F.broadcast(anchors))
        .where((F.col("label") != F.col("q_label")) & (F.col("vec_id") != F.col("q_id")))
        .select(
            "q_id",
            "q_label",
            "vec_id",
            "label",
            F.round(
                dot(F.col("e"), F.col("q_e")) / (norm(F.col("e")) * norm(F.col("q_e"))),
                10,
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "q_id",
            "q_label",
            F.col("vec_id").alias("neg_id"),
            F.col("label").alias("neg_label"),
            F.round("cos", 8).alias("cos"),
        )
        .orderBy("q_id")
    )


_DOT = (
    "list_reduce(list_prepend(0.0::DOUBLE, list_transform(list_zip(e, q_e),"
    " p -> p[1] * p[2])), (a, b) -> a + b)"
)
_NORM_E = (
    "SQRT(list_reduce(list_prepend(0.0::DOUBLE, list_transform(e, x -> x * x)),"
    " (a, b) -> a + b))"
)
_NORM_Q = (
    "SQRT(list_reduce(list_prepend(0.0::DOUBLE, list_transform(q_e, x -> x * x)),"
    " (a, b) -> a + b))"
)

Q_HARD_NEGATIVES_SQL = f"""
WITH pts AS (SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings),
anchors AS (
  SELECT vec_id AS q_id, e AS q_e, label AS q_label
  FROM pts WHERE vec_id < {HN_ANCHORS}),
pairs AS (
  SELECT q_id, q_label, vec_id, label,
         ROUND({_DOT} / ({_NORM_E} * {_NORM_Q}), 10) AS cos
  FROM pts CROSS JOIN anchors
  WHERE label <> q_label AND vec_id <> q_id),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY q_id ORDER BY cos DESC, vec_id) AS rn
  FROM pairs)
SELECT q_id, q_label, vec_id AS neg_id, label AS neg_label, ROUND(cos, 8) AS cos
FROM ranked WHERE rn = 1 ORDER BY q_id
"""

QUERIES["q_hard_negatives"] = QuerySpec(
    q_hard_negatives,
    Q_HARD_NEGATIVES_SQL,
    "hard-negative mining: per-anchor most-similar different-label vector (exact rerank stage)",
)
