"""Round-8 surface extensions, part B (SURVEY §2.3 N r8): distributed
k-means (Lloyd), min-label community propagation, key-skew diagnostics
(Gini / top-k concentration), and chi-squared feature association —
the clustering + skew-triage block of a training-data pipeline.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: integer/decimal domains wherever a
sum crosses rows; doubles only in per-row arithmetic (bit-identical
across engines) or one final division; sequential array folds on both
engines (F.aggregate ↔ list_reduce); orderings fully tie-broken.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.similarity import as_double
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r8 import _dist_rank

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------- k-means (Lloyd)
# Distributed Lloyd's algorithm, the canonical Spark shape (MLlib's
# KMeans does the same dance): centroids stay a k-row DataFrame that
# is BROADCAST-crossed against the points for assignment (k·d values
# move, never the corpus), and the update is one partial-aggregated
# shuffle keyed (cluster, dim) — both sides scale to any corpus size;
# nothing is ever collected to the driver. Bit-stability across
# engines: the distance is a sequential left-to-right fold over
# per-dim squares of exact float32→double casts (identical IEEE ops in
# both engines), assignment ties break on centroid id, and centroid
# means divide an exact DECIMAL sum (of per-row-rounded components) by
# an integer count.

KMEANS_K = 8
KMEANS_ITERS = 2  # Lloyd updates; the final pass re-assigns & reports


def _sq_dist(e: F.Column, c: F.Column) -> F.Column:
    return F.aggregate(
        F.zip_with(e, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _assign(points: DataFrame, cent: DataFrame) -> DataFrame:
    """Nearest centroid per point: the k centroids are folded into ONE
    broadcast row (array of (cid, ce) structs) and the argmin is a
    per-row array_min over (dist, cid) structs — tie-break on the
    lower centroid id, same IEEE fold per centroid as the old k-row
    cross. MAP-SIDE ONLY: the old shape crossed k rows per point and
    then shuffled every point's embedding array through a
    groupBy(vec_id) to pick the min — per iteration, one full
    corpus-of-arrays exchange that existed only to undo the k-way
    fan-out (guide §2.4: remove shuffles outright; §2.3: never shuffle
    a payload to make a decision a map-side expression can make)."""
    cent_row = cent.agg(
        F.array_sort(F.collect_list(F.struct("cid", "ce"))).alias("cs")
    )
    m = F.array_min(
        F.transform(
            F.col("cs"),
            lambda s: F.struct(
                _sq_dist(F.col("e"), s["ce"]).alias("dist"), s["cid"].alias("cid")
            ),
        )
    )
    return (
        points.crossJoin(F.broadcast(cent_row))
        .withColumn("m", m)
        .select("vec_id", F.col("m.cid").alias("cid"), F.col("m.dist").alias("dist"), "e")
    )


def q_kmeans_lloyd(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    cent = emb.where(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").alias("cid"), F.col("e").alias("ce")
    )
    for _ in range(KMEANS_ITERS):
        assigned = _assign(emb, cent)
        cent = (
            assigned.select("cid", F.posexplode("e").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(
                (
                    F.sum(F.round(F.col("x"), 9).cast("decimal(30,12)")).cast("double")
                    / F.count(F.lit(1))
                ).alias("m")
            )
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
                ).alias("ce")
            )
        )
    final = _assign(emb, cent)
    return (
        final.groupBy("cid")
        .agg(
            F.count(F.lit(1)).alias("n_points"),
            F.round(
                F.sum(F.round(F.col("dist"), 9).cast("decimal(30,12)")).cast("double"), 6
            ).alias("inertia"),
            F.min("vec_id").alias("min_vec"),
        )
        .orderBy("cid")
    )


def _kmeans_sql() -> str:
    dist = (
        "list_reduce(list_prepend(0.0, list_transform(list_zip(e, ce),"
        " p -> (p[1] - p[2]) * (p[1] - p[2]))), (a, b) -> a + b)"
    )

    def assign(cent: str, out: str) -> str:
        return f"""{out} AS (
  SELECT vec_id, e, cid, {dist} AS dist
  FROM pts CROSS JOIN {cent}
  QUALIFY ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY {dist}, cid) = 1)"""

    def update(assigned: str, out: str) -> str:
        return f"""{out} AS (
  SELECT cid, list(m ORDER BY pos) AS ce FROM (
    SELECT cid, pos,
           CAST(SUM(CAST(ROUND(x, 9) AS DECIMAL(30,12))) AS DOUBLE) / COUNT(*) AS m
    FROM (SELECT cid, UNNEST(e) AS x, generate_subscripts(e, 1) AS pos FROM {assigned})
    GROUP BY cid, pos)
  GROUP BY cid)"""

    steps = ",\n".join(
        [assign("c0", "a0"), update("a0", "c1"), assign("c1", "a1"), update("a1", "c2"),
         assign("c2", "af")]
    )
    return f"""
WITH pts AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
c0 AS (SELECT vec_id AS cid, e AS ce FROM pts WHERE vec_id < {KMEANS_K}),
{steps}
SELECT cid, COUNT(*) AS n_points,
       ROUND(CAST(SUM(CAST(ROUND(dist, 9) AS DECIMAL(30,12))) AS DOUBLE), 6) AS inertia,
       MIN(vec_id) AS min_vec
FROM af GROUP BY cid ORDER BY cid
"""


QUERIES["q_kmeans_lloyd"] = QuerySpec(
    q_kmeans_lloyd,
    _kmeans_sql(),
    "distributed Lloyd k-means: broadcast centroid assignment + partial-agg update",
)


# ------------------------------------- min-label community propagation
# Synchronous label propagation with the min-label update rule — the
# classic distributed community/components kernel (Pregel's hello
# world): each round every vertex takes the minimum of its own and its
# neighbors' labels. Entirely in the INTEGER domain, so the oracle is
# exact by construction. Each round is one shuffle (join labels to the
# edge list, groupBy dst-min); the vertex set never moves. Edges reuse
# the q_core_numbers co-purchase graph so the two graph kernels are
# directly comparable.

LP_ITERS = 3


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count_distinct(F.col("a.l_orderkey")).alias("w"))
        .where(F.col("w") >= 2)
        .select("p1", "p2")
    )


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _copurchase_edges(spark, sf_dir).localCheckpoint()
    und = edges.select(F.col("p1").alias("src"), F.col("p2").alias("dst")).unionByName(
        edges.select(F.col("p2").alias("src"), F.col("p1").alias("dst"))
    )
    labels = und.select(F.col("src").alias("n")).distinct().withColumn("lbl", F.col("n"))
    for _ in range(LP_ITERS):
        # labels is VERTEX-sized (a localCheckpointed RDD scan whose
        # size the planner cannot estimate, so unhinted it planned a
        # sort-merge join that shuffled the EDGE table every round).
        # Broadcasting the vertex-sized sides keeps the edge table
        # un-shuffled all rounds; only vertex-sized aggregates move
        # (guide §3.1: pick the strategy deliberately when estimates
        # are blind; §2.4). At 100 TB the labels table is |V|-sized —
        # the same per-round broadcast the peel loops (q_kcore/core
        # numbers) already use for their kept-vertex semi-joins.
        nb_min = (
            und.join(
                F.broadcast(labels.select(F.col("n").alias("dn"), "lbl")),
                und.dst == F.col("dn"),
            )
            .groupBy("src")
            .agg(F.min("lbl").alias("nl"))
        )
        labels = (
            labels.join(F.broadcast(nb_min), labels.n == nb_min.src, "left")
            .select(
                F.col("n"),
                F.least(F.col("lbl"), F.coalesce(F.col("nl"), F.col("lbl"))).alias("lbl"),
            )
            .localCheckpoint()  # truncate the per-round lineage
        )
    return (
        labels.groupBy(F.col("lbl").alias("community"))
        .agg(F.count(F.lit(1)).alias("n_members"), F.max("n").alias("max_part"))
        .orderBy("community")
    )


Q_LABEL_PROP_SQL = f"""
WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem),
e0 AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
und AS (SELECT p1 AS src, p2 AS dst FROM e0 UNION ALL SELECT p2, p1 FROM e0),
l0 AS (SELECT DISTINCT src AS n, src AS lbl FROM und),
{', '.join(
    f'''l{i + 1} AS (
  SELECT l.n, LEAST(l.lbl, COALESCE(MIN(nl.lbl), l.lbl)) AS lbl
  FROM l{i} l
  LEFT JOIN und u ON u.src = l.n
  LEFT JOIN l{i} nl ON nl.n = u.dst
  GROUP BY l.n, l.lbl)''' for i in range(LP_ITERS)
)}
SELECT lbl AS community, COUNT(*) AS n_members, MAX(n) AS max_part
FROM l{LP_ITERS} GROUP BY lbl ORDER BY community
"""

QUERIES["q_label_propagation"] = QuerySpec(
    q_label_propagation,
    Q_LABEL_PROP_SQL,
    "synchronous min-label propagation communities, one shuffle per round",
)


# ----------------------------------------- key-skew diagnostics (Gini)
# The triage a pipeline runs BEFORE picking a partitioning: how skewed
# is the key distribution? Gini over per-key counts plus top-k
# concentration. Per-key counts are one partial-agg shuffle; the
# global rank over the (much smaller) key table uses the r8
# distributed-rank helper — range-repartition + per-partition offsets,
# NOT a single-partition window, so the diagnostic itself survives a
# billion-key table. Gini numerator/denominator stay integers; the
# two divisions are the only doubles.


def q_key_skew_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    ranked = _dist_rank(per_key, [F.col("c"), F.col("user_id")])  # ascending
    stats = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("total"),
        F.sum(F.col("rk") * F.col("c")).alias("rank_weighted"),
    )
    top10 = (
        per_key.orderBy(F.col("c").desc(), F.col("user_id").asc())
        .limit(10)
        .agg(F.sum("c").alias("top10"))
    )
    return (
        stats.crossJoin(F.broadcast(top10))
        .select(
            "n_keys",
            "total",
            F.round(
                (2 * F.col("rank_weighted") - (F.col("n_keys") + 1) * F.col("total"))
                / (F.col("n_keys") * F.col("total")).cast("double"),
                12,
            ).alias("gini"),
            F.round(F.col("top10") / F.col("total").cast("double"), 12).alias(
                "top10_share"
            ),
        )
    )


Q_KEY_SKEW_SQL = """
WITH per_key AS (SELECT user_id, COUNT(*) AS c FROM events GROUP BY user_id),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c, user_id) AS rk FROM per_key),
stats AS (
  SELECT COUNT(*) AS n_keys, CAST(SUM(c) AS BIGINT) AS total,
         CAST(SUM(rk * c) AS BIGINT) AS rank_weighted
  FROM ranked),
top10 AS (
  SELECT CAST(SUM(c) AS BIGINT) AS top10
  FROM (SELECT c FROM per_key ORDER BY c DESC, user_id ASC LIMIT 10))
SELECT n_keys, total,
       ROUND((2 * rank_weighted - (n_keys + 1) * total)
             / CAST(n_keys * total AS DOUBLE), 12) AS gini,
       ROUND(top10 / CAST(total AS DOUBLE), 12) AS top10_share
FROM stats CROSS JOIN top10
"""

QUERIES["q_key_skew_gini"] = QuerySpec(
    q_key_skew_gini,
    Q_KEY_SKEW_SQL,
    "key-skew triage: Gini + top-10 concentration via distributed rank",
)


# ---------------------------------------- chi-squared feature ranking
# 2×2 chi-squared association between each event_type and a binary
# outcome (value >= 35, ~the median) — the classic feature-selection
# screen. One partial-aggregated shuffle builds every per-type
# contingency row; the grand totals ride along via a 1-row broadcast
# cross. Counts are integers end-to-end; the chi2 statistic is one
# per-type double expression over those integers (bit-identical across
# engines), never summed across rows.

CHI2_THRESHOLD = 35.0


def q_chi2_feature_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("value") >= CHI2_THRESHOLD).cast("long").alias("y")
    )
    per_type = ev.groupBy("event_type").agg(
        F.sum("y").alias("a"),  # type ∧ positive
        F.sum(1 - F.col("y")).alias("b"),  # type ∧ negative
    )
    totals = ev.agg(
        F.sum("y").alias("pos"), F.sum(1 - F.col("y")).alias("neg")
    )
    joined = per_type.crossJoin(F.broadcast(totals)).select(
        "event_type",
        "a",
        "b",
        (F.col("pos") - F.col("a")).alias("c"),  # ¬type ∧ positive
        (F.col("neg") - F.col("b")).alias("d"),
        "pos",
        "neg",
    )
    # the statistic moves to DOUBLE immediately after the exact integer
    # counts: (ad-bc)² overflows int64 once cell counts pass ~2e9·2e9
    # (it did at the derived-sf1 sweep), and per-row double arithmetic
    # over identical integers is bit-identical across engines anyway
    dbl = lambda name: F.col(name).cast("double")  # noqa: E731
    ad_bc = dbl("a") * dbl("d") - dbl("b") * dbl("c")
    chi2 = (
        (dbl("pos") + dbl("neg"))
        * ad_bc
        * ad_bc
        / ((dbl("a") + dbl("b")) * (dbl("c") + dbl("d")) * dbl("pos") * dbl("neg"))
    )
    return (
        joined.select(
            "event_type", "a", "b", "c", "d", F.round(chi2, 12).alias("chi2")
        )
        .orderBy(F.col("chi2").desc(), F.col("event_type").asc())
    )


Q_CHI2_SQL = f"""
WITH ev AS (
  SELECT event_type, CAST(value >= {CHI2_THRESHOLD} AS BIGINT) AS y FROM events),
per_type AS (
  SELECT event_type, CAST(SUM(y) AS BIGINT) AS a, CAST(SUM(1 - y) AS BIGINT) AS b
  FROM ev GROUP BY event_type),
totals AS (SELECT CAST(SUM(y) AS BIGINT) AS pos, CAST(SUM(1 - y) AS BIGINT) AS neg
           FROM ev)
SELECT event_type, a, b, pos - a AS c, neg - b AS d,
       ROUND((CAST(pos AS DOUBLE) + CAST(neg AS DOUBLE))
             * (CAST(a AS DOUBLE) * CAST(neg - b AS DOUBLE)
                - CAST(b AS DOUBLE) * CAST(pos - a AS DOUBLE))
             * (CAST(a AS DOUBLE) * CAST(neg - b AS DOUBLE)
                - CAST(b AS DOUBLE) * CAST(pos - a AS DOUBLE))
             / ((CAST(a AS DOUBLE) + CAST(b AS DOUBLE))
                * (CAST(pos - a AS DOUBLE) + CAST(neg - b AS DOUBLE))
                * CAST(pos AS DOUBLE) * CAST(neg AS DOUBLE)),
             12) AS chi2
FROM per_type CROSS JOIN totals
ORDER BY chi2 DESC, event_type ASC
"""

QUERIES["q_chi2_feature_select"] = QuerySpec(
    q_chi2_feature_select,
    Q_CHI2_SQL,
    "per-feature 2x2 chi-squared screen, integer contingency + broadcast totals",
)


# -------------------------------------- Jensen-Shannon drift (bounded)
# The symmetric, bounded companion to q_unigram_kl_drift: JS divergence
# between the event_type distributions of two user populations (even
# vs odd user_id — a deterministic A/B split). Counts are integers;
# each type's JS contribution is ONE per-row double expression over
# those integers (identical bits in both engines), rounded and emitted
# per type so the hash never depends on summation order. Scale: two
# partial-agg shuffles over event_type (5 keys), then a 5-row compute.


def q_js_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", (F.col("user_id") % 2 == 0).cast("long").alias("grp_a")
    )
    per_type = ev.groupBy("event_type").agg(
        F.sum("grp_a").alias("ca"), F.sum(1 - F.col("grp_a")).alias("cb")
    )
    totals = ev.agg(
        F.sum("grp_a").alias("na"), F.sum(1 - F.col("grp_a")).alias("nb")
    )
    j = per_type.crossJoin(F.broadcast(totals))
    p = F.col("ca") / F.col("na").cast("double")
    q = F.col("cb") / F.col("nb").cast("double")
    m = (p + q) / 2
    contrib = (
        F.when(F.col("ca") > 0, 0.5 * p * F.log(p / m)).otherwise(F.lit(0.0))
        + F.when(F.col("cb") > 0, 0.5 * q * F.log(q / m)).otherwise(F.lit(0.0))
    )
    return j.select(
        "event_type",
        "ca",
        "cb",
        F.round(contrib, 12).alias("js_contrib"),
    ).orderBy("event_type")


Q_JS_SQL = """
WITH ev AS (
  SELECT event_type, CAST(user_id % 2 = 0 AS BIGINT) AS grp_a FROM events),
per_type AS (
  SELECT event_type, CAST(SUM(grp_a) AS BIGINT) AS ca,
         CAST(SUM(1 - grp_a) AS BIGINT) AS cb
  FROM ev GROUP BY event_type),
totals AS (
  SELECT CAST(SUM(grp_a) AS BIGINT) AS na, CAST(SUM(1 - grp_a) AS BIGINT) AS nb
  FROM ev)
SELECT event_type, ca, cb,
       ROUND(
         CASE WHEN ca > 0 THEN 0.5 * (ca / CAST(na AS DOUBLE))
              * LN((ca / CAST(na AS DOUBLE))
                   / (((ca / CAST(na AS DOUBLE)) + (cb / CAST(nb AS DOUBLE))) / 2))
              ELSE 0.0 END
         + CASE WHEN cb > 0 THEN 0.5 * (cb / CAST(nb AS DOUBLE))
              * LN((cb / CAST(nb AS DOUBLE))
                   / (((ca / CAST(na AS DOUBLE)) + (cb / CAST(nb AS DOUBLE))) / 2))
              ELSE 0.0 END, 12) AS js_contrib
FROM per_type CROSS JOIN totals
ORDER BY event_type
"""

QUERIES["q_js_divergence"] = QuerySpec(
    q_js_divergence,
    Q_JS_SQL,
    "Jensen-Shannon drift between A/B user populations, per-type contributions",
)


# --------------------------------------------- n-gram novelty scoring
# Per-document novelty: the share of a document's DISTINCT word
# trigrams whose first corpus appearance (minimum doc_id) is the
# document itself — the cheap streaming-corpus freshness signal used
# to down-weight boilerplate. One explode + two partial-agg shuffles
# (gram -> min doc, then doc -> counts); the corpus-wide first-seen
# table joins back by gram hash, never all-pairs. Integer counts, one
# final division.


def q_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.array_remove(F.split("text", T.WORD_SPLIT), "").alias("ws")
    )
    grams = (
        docs.select(
            "doc_id",
            F.explode(
                F.transform(
                    F.sequence(
                        F.lit(0), F.greatest(F.size("ws") - 3, F.lit(-1))
                    ),
                    lambda i: F.concat_ws(
                        " ",
                        F.col("ws")[i],
                        F.col("ws")[i + 1],
                        F.col("ws")[i + 2],
                    ),
                )
            ).alias("g"),
        )
        .distinct()  # per-doc distinct trigrams
    )
    first_seen = grams.groupBy("g").agg(F.min("doc_id").alias("first_doc"))
    per_doc = (
        grams.join(first_seen, "g")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum((F.col("first_doc") == F.col("doc_id")).cast("long")).alias(
                "n_novel"
            ),
        )
    )
    return per_doc.select(
        "doc_id",
        "n_grams",
        "n_novel",
        F.round(F.col("n_novel") / F.col("n_grams").cast("double"), 12).alias(
            "novelty"
        ),
    ).orderBy("doc_id")


Q_NGRAM_NOVELTY_SQL = r"""
WITH toks AS (
  SELECT doc_id, list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
  FROM documents),
grams AS (
  SELECT DISTINCT doc_id,
         ws[i + 1] || ' ' || ws[i + 2] || ' ' || ws[i + 3] AS g
  FROM toks CROSS JOIN (
    SELECT UNNEST(range(0, (SELECT MAX(len(ws)) FROM (
      SELECT list_filter(string_split_regex(text, '\s+'), w -> w <> '') AS ws
      FROM documents)))) AS i) idx
  WHERE i <= len(ws) - 3),
first_seen AS (SELECT g, MIN(doc_id) AS first_doc FROM grams GROUP BY g),
per_doc AS (
  SELECT grams.doc_id, COUNT(*) AS n_grams,
         CAST(SUM(CAST(first_doc = grams.doc_id AS BIGINT)) AS BIGINT) AS n_novel
  FROM grams JOIN first_seen USING (g)
  GROUP BY grams.doc_id)
SELECT doc_id, n_grams, n_novel,
       ROUND(n_novel / CAST(n_grams AS DOUBLE), 12) AS novelty
FROM per_doc ORDER BY doc_id
"""

QUERIES["q_ngram_novelty"] = QuerySpec(
    q_ngram_novelty,
    Q_NGRAM_NOVELTY_SQL,
    "per-doc trigram novelty vs corpus first-appearance, explode + two partial aggs",
)


# ----------------------------------------------------- RFM segmentation
# Classic recency/frequency/monetary customer scoring: per-customer
# aggregates in one partial-agg shuffle, quartile cutoffs as a 1-row
# broadcast (exact percentile over integer-domain metrics — recency in
# days, frequency as a count, monetary in CENTS so every value and
# every interpolated cutoff is exactly representable), scores by
# comparing against the broadcast cutoffs, one final groupBy on the
# 64-way segment code. No window over the full customer table.


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.col("o_orderdate").cast("date").alias("d"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("cents"),
    )
    ref = orders.agg(F.max("d").alias("ref_date"))
    per_cust = (
        orders.crossJoin(F.broadcast(ref))
        .groupBy("o_custkey")
        .agg(
            F.min(F.datediff(F.col("ref_date"), F.col("d"))).alias("rec"),
            F.count(F.lit(1)).alias("freq"),
            F.sum("cents").alias("mon"),
        )
    )
    qs = per_cust.agg(
        F.percentile("rec", F.lit([0.25, 0.5, 0.75])).alias("qr"),
        F.percentile("freq", F.lit([0.25, 0.5, 0.75])).alias("qf"),
        F.percentile("mon", F.lit([0.25, 0.5, 0.75])).alias("qm"),
    )

    def above(col, q):  # number of cutoffs strictly below the value
        return sum(
            (F.col(col) > F.col(q)[i]).cast("int") for i in range(3)
        )

    scored = per_cust.crossJoin(F.broadcast(qs)).select(
        "o_custkey",
        "mon",
        (4 - above("rec", "qr")).alias("r"),  # recent = low days = high score
        (1 + above("freq", "qf")).alias("f"),
        (1 + above("mon", "qm")).alias("m"),
    )
    return (
        scored.groupBy(
            (F.col("r") * 100 + F.col("f") * 10 + F.col("m")).alias("segment")
        )
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("mon").alias("total_cents"),
        )
        .orderBy("segment")
    )


Q_RFM_SQL = """
WITH o AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
         CAST(ROUND(o_totalprice * 100) AS BIGINT) AS cents
  FROM orders),
ref AS (SELECT MAX(d) AS ref_date FROM o),
per_cust AS (
  SELECT o_custkey,
         MIN(date_diff('day', d, ref_date)) AS rec,
         COUNT(*) AS freq,
         CAST(SUM(cents) AS BIGINT) AS mon
  FROM o CROSS JOIN ref
  GROUP BY o_custkey),
qs AS (
  SELECT quantile_cont(rec, [0.25, 0.5, 0.75]) AS qr,
         quantile_cont(freq, [0.25, 0.5, 0.75]) AS qf,
         quantile_cont(mon, [0.25, 0.5, 0.75]) AS qm
  FROM per_cust),
scored AS (
  SELECT o_custkey, mon,
         4 - (CAST(rec > qr[1] AS INT) + CAST(rec > qr[2] AS INT)
              + CAST(rec > qr[3] AS INT)) AS r,
         1 + CAST(freq > qf[1] AS INT) + CAST(freq > qf[2] AS INT)
           + CAST(freq > qf[3] AS INT) AS f,
         1 + CAST(mon > qm[1] AS INT) + CAST(mon > qm[2] AS INT)
           + CAST(mon > qm[3] AS INT) AS m
  FROM per_cust CROSS JOIN qs)
SELECT r * 100 + f * 10 + m AS segment,
       COUNT(*) AS n_customers,
       CAST(SUM(mon) AS BIGINT) AS total_cents
FROM scored GROUP BY 1 ORDER BY segment
"""

QUERIES["q_rfm_segments"] = QuerySpec(
    q_rfm_segments,
    Q_RFM_SQL,
    "RFM quartile segmentation: per-customer partial agg + 1-row broadcast cutoffs",
)


# --------------------------------------------------- Zipf-law fit
# Log-log least-squares fit of word frequency vs rank — the corpus
# health check (natural text slopes ~ -1). Vocabulary counts are one
# partial-agg shuffle; the global frequency rank uses _dist_rank (no
# single-partition window, survives a billion-word vocab); the
# regression sums are per-row-rounded doubles folded in DECIMAL, so
# the answer is independent of partitioning on both engines.


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.operators import text as T

    docs = load_table(spark, sf_dir, "documents")
    vocab = (
        docs.select(
            F.explode(F.array_remove(F.split("text", T.WORD_SPLIT), "")).alias("w")
        )
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    ranked = _dist_rank(vocab, [(-F.col("c")), F.col("w")])  # freq desc, word asc
    terms = ranked.select(
        F.round(F.log(F.col("rk").cast("double")), 12).alias("x"),
        F.round(F.log(F.col("c").cast("double")), 12).alias("y"),
    ).select(
        "x",
        "y",
        F.round(F.col("x") * F.col("y"), 12).alias("xy"),
        F.round(F.col("x") * F.col("x"), 12).alias("xx"),
    )
    dec = "decimal(38,12)"
    sums = terms.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast(dec)).cast("double").alias("sx"),
        F.sum(F.col("y").cast(dec)).cast("double").alias("sy"),
        F.sum(F.col("xy").cast(dec)).cast("double").alias("sxy"),
        F.sum(F.col("xx").cast(dec)).cast("double").alias("sxx"),
    )
    n = F.col("n").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        F.col("n").alias("n_words"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round((F.col("sy") - slope * F.col("sx")) / n, 6).alias("zipf_intercept"),
    )


Q_ZIPF_SQL = r"""
WITH vocab AS (
  SELECT w, COUNT(*) AS c
  FROM (SELECT UNNEST(list_filter(string_split_regex(text, '\s+'), x -> x <> '')) AS w
        FROM documents)
  GROUP BY w),
ranked AS (
  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, w ASC) AS rk FROM vocab),
terms AS (
  SELECT ROUND(LN(CAST(rk AS DOUBLE)), 12) AS x,
         ROUND(LN(CAST(c AS DOUBLE)), 12) AS y
  FROM ranked),
terms2 AS (
  SELECT x, y, ROUND(x * y, 12) AS xy, ROUND(x * x, 12) AS xx FROM terms),
sums AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(38,12))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(y AS DECIMAL(38,12))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(xy AS DECIMAL(38,12))) AS DOUBLE) AS sxy,
         CAST(SUM(CAST(xx AS DECIMAL(38,12))) AS DOUBLE) AS sxx
  FROM terms2)
SELECT n AS n_words,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS zipf_slope,
       ROUND((sy - ((n * sxy - sx * sy) / (n * sxx - sx * sx)) * sx) / n, 6)
         AS zipf_intercept
FROM sums
"""

QUERIES["q_zipf_fit"] = QuerySpec(
    q_zipf_fit,
    Q_ZIPF_SQL,
    "log-log Zipf slope over the distributed frequency rank, decimal-folded sums",
)


# -------------------------------------- PCA top component (power iteration)
# Dominant principal direction of the embedding second-moment matrix
# via power iteration — WITHOUT ever materializing the d x d Gram
# matrix: each round computes G·v = sum_rows e·(e^T v) in one scan
# (per-row dot fold s = e^T v, contribution e_i * s, posexplode +
# decimal partial-agg per dim), so the shuffle is d rows no matter the
# corpus size. The iterate stays a 1-row broadcast. Start vector is
# the exactly-representable uniform 1/8 (= 1/sqrt(64)); 3 rounds.
# Per-row arithmetic is bit-identical across engines; cross-row sums
# are per-row-rounded DECIMAL folds — hash-stable by construction.

PCA_ITERS = 3
PCA_DIM = 64


def q_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings").select(
        as_double(F.col("embedding")).alias("e")
    )
    v = spark.range(1).select(
        F.array(*[F.lit(0.125) for _ in range(PCA_DIM)]).alias("v")
    )
    dec = "decimal(38,12)"
    for _ in range(PCA_ITERS):
        s = F.aggregate(
            F.zip_with(F.col("e"), F.col("v"), lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        g = (
            emb.crossJoin(F.broadcast(v))
            .select(F.posexplode(F.transform(F.col("e"), lambda x: x * s)).alias("pos", "contrib"))
            .groupBy("pos")
            .agg(F.sum(F.round(F.col("contrib"), 12).cast(dec)).cast("double").alias("g"))
        )
        norm = g.agg(
            F.sqrt(
                F.sum(F.round(F.col("g") * F.col("g"), 12).cast(dec)).cast("double")
            ).alias("nrm")
        )
        v = (
            g.crossJoin(F.broadcast(norm))
            .groupBy()
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("pos", (F.col("g") / F.col("nrm")).alias("vi")))
                    ),
                    lambda st: st["vi"],
                ).alias("v")
            )
        )
    return v.select(F.posexplode("v").alias("pos", "loading")).select(
        "pos", F.round("loading", 8).alias("loading")
    ).orderBy("pos")


def _pca_sql() -> str:
    dot = (
        "list_reduce(list_prepend(0.0, list_transform(list_zip(e, v),"
        " p -> p[1] * p[2])), (a, b) -> a + b)"
    )

    def step(vin: str, out: str) -> str:
        return f"""g_{out} AS (
  SELECT pos, CAST(SUM(CAST(ROUND(comp * s, 12) AS DECIMAL(38,12))) AS DOUBLE) AS g
  FROM (SELECT UNNEST(e) AS comp, generate_subscripts(e, 1) AS pos, {dot} AS s
        FROM pts CROSS JOIN {vin})
  GROUP BY pos),
n_{out} AS (
  SELECT SQRT(CAST(SUM(CAST(ROUND(g * g, 12) AS DECIMAL(38,12))) AS DOUBLE)) AS nrm
  FROM g_{out}),
{out} AS (
  SELECT list(g / nrm ORDER BY pos) AS v FROM g_{out} CROSS JOIN n_{out})"""

    steps = ",\n".join(step(f"v{i}", f"v{i + 1}") for i in range(PCA_ITERS))
    ones = ", ".join(["0.125"] * PCA_DIM)
    return f"""
WITH pts AS (SELECT embedding::DOUBLE[] AS e FROM embeddings),
v0 AS (SELECT [{ones}]::DOUBLE[] AS v),
{steps}
SELECT pos - 1 AS pos, ROUND(vi, 8) AS loading
FROM (SELECT UNNEST(v) AS vi, generate_subscripts(v, 1) AS pos FROM v{PCA_ITERS})
ORDER BY pos
"""


QUERIES["q_pca_power_iteration"] = QuerySpec(
    q_pca_power_iteration,
    _pca_sql(),
    "dominant PCA component by Gram-free power iteration (G.v in one scan per round)",
)
