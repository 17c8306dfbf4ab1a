"""Round-10 surface extensions, batch P (SURVEY §2.3 N r10): the
lambda-function surface block II — map higher-order functions
(transform_values / map_filter / map_zip_with), array set algebra
(intersect / except / overlap + exists / forall predicates), and
struct-tuple ordering. Completes the collection-function matrix that
q_array_funcs (transform/filter/aggregate/slice) started.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: everything reduces to integer counts/sums; the oracle
mirrors the map lambdas with plain arithmetic (the API is the
subject, the numbers are the contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# --------------------------------- map higher-order functions
# Build a 3-entry map per event from the JSON payload, then:
# transform_values (double each), map_filter (keep values > 50),
# map_zip_with (pairwise max against the doubled map). The aggregate
# folds the surviving entry values — the oracle reproduces the same
# numbers with plain arithmetic, pinning the lambda semantics.


def q_map_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )
    m = F.create_map(
        F.lit("base"), F.col("k"),
        F.lit("twice"), F.col("k") * 2,
        F.lit("mod7"), F.col("k") % 7,
    )
    doubled = F.transform_values(m, lambda _, v: v * 2)
    kept = F.map_filter(doubled, lambda _, v: v > 50)
    paired = F.map_zip_with(m, doubled, lambda _, a, b: F.greatest(a, b))
    folded_kept = F.aggregate(
        F.map_values(kept), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    folded_max = F.aggregate(
        F.map_values(paired), F.lit(0).cast("long"), lambda acc, v: acc + v
    )
    return (
        ev.select(
            "event_type",
            F.size(kept).alias("n_kept"),
            folded_kept.alias("kept_sum"),
            folded_max.alias("pairmax_sum"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum("n_kept").cast("long").alias("entries_kept"),
            F.sum("kept_sum").cast("long").alias("kept_value_sum"),
            F.sum("pairmax_sum").cast("long").alias("pairmax_value_sum"),
        )
        .orderBy("event_type")
    )


Q_MAPHOF_SQL = """
WITH src AS (
  SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events),
calc AS (
  SELECT event_type,
         -- map entries: base=k, twice=2k, mod7=k%7; doubled: 2k, 4k, 2(k%7)
         (CASE WHEN 2*k > 50 THEN 1 ELSE 0 END
          + CASE WHEN 4*k > 50 THEN 1 ELSE 0 END
          + CASE WHEN 2*(k%7) > 50 THEN 1 ELSE 0 END) AS n_kept,
         (CASE WHEN 2*k > 50 THEN 2*k ELSE 0 END
          + CASE WHEN 4*k > 50 THEN 4*k ELSE 0 END
          + CASE WHEN 2*(k%7) > 50 THEN 2*(k%7) ELSE 0 END) AS kept_sum,
         -- pairwise max(original, doubled) = doubled for k >= 0
         (2*k + 4*k + 2*(k%7)) AS pairmax_sum
  FROM src)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(n_kept) AS BIGINT) AS entries_kept,
       CAST(SUM(kept_sum) AS BIGINT) AS kept_value_sum,
       CAST(SUM(pairmax_sum) AS BIGINT) AS pairmax_value_sum
FROM calc
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["q_map_higher_order"] = QuerySpec(
    q_map_higher_order,
    Q_MAPHOF_SQL,
    "map higher-order surface: transform_values / map_filter / "
    "map_zip_with folded to integer sums — lambda semantics pin",
)


# ------------------------------------------- array set algebra
# Per language: distinct-word arrays vs the pinned stopword list —
# intersect/except sizes, arrays_overlap, and the exists/forall
# predicates, all aggregated to integer counts.

_STOP = ["the", "a", "of", "to", "and", "in"]


def q_array_set_algebra(spark: SparkSession, sf_dir: str) -> DataFrame:
    sw = F.array(*[F.lit(w) for w in _STOP])
    docs = load_table(spark, sf_dir, "documents").select(
        "lang",
        F.array_distinct(F.split(F.lower(F.col("text")), " ")).alias("ws"),
    )
    inter = F.size(F.array_intersect(F.col("ws"), sw))
    minus = F.size(F.array_except(F.col("ws"), sw))
    overlap = F.arrays_overlap(F.col("ws"), sw)
    has_long = F.exists(F.col("ws"), lambda w: F.length(w) > 8)
    all_short = F.forall(F.col("ws"), lambda w: F.length(w) <= 12)
    return (
        docs.select(
            "lang",
            inter.alias("n_stop"),
            minus.alias("n_content"),
            overlap.cast("int").alias("ov"),
            has_long.cast("int").alias("hl"),
            all_short.cast("int").alias("as_"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_stop").cast("long").alias("stop_vocab_hits"),
            F.sum("n_content").cast("long").alias("content_vocab_size"),
            F.sum("ov").cast("long").alias("n_docs_with_stopword"),
            F.sum("hl").cast("long").alias("n_docs_with_long_word"),
            F.sum("as_").cast("long").alias("n_docs_all_short"),
        )
        .orderBy("lang")
    )


Q_SETALG_SQL = f"""
WITH docs AS (
  SELECT lang,
         list_distinct(string_split(lower(text), ' ')) AS ws
  FROM documents),
calc AS (
  SELECT lang,
         len(list_filter(ws, w -> list_contains({_STOP!r}, w))) AS n_stop,
         len(list_filter(ws, w -> NOT list_contains({_STOP!r}, w)))
           AS n_content,
         CASE WHEN len(list_filter(ws, w -> list_contains({_STOP!r}, w))) > 0
              THEN 1 ELSE 0 END AS ov,
         CASE WHEN len(list_filter(ws, w -> LENGTH(w) > 8)) > 0
              THEN 1 ELSE 0 END AS hl,
         CASE WHEN len(list_filter(ws, w -> LENGTH(w) > 12)) = 0
              THEN 1 ELSE 0 END AS as_
  FROM docs)
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_stop) AS BIGINT) AS stop_vocab_hits,
       CAST(SUM(n_content) AS BIGINT) AS content_vocab_size,
       CAST(SUM(ov) AS BIGINT) AS n_docs_with_stopword,
       CAST(SUM(hl) AS BIGINT) AS n_docs_with_long_word,
       CAST(SUM(as_) AS BIGINT) AS n_docs_all_short
FROM calc
GROUP BY lang
ORDER BY lang
"""

QUERIES["q_array_set_algebra"] = QuerySpec(
    q_array_set_algebra,
    Q_SETALG_SQL,
    "array set algebra per language (intersect/except/overlap + "
    "exists/forall) — the collection-predicate surface",
)


# ------------------------------------------- struct-tuple ordering
# ORDER BY a composite struct (priority, negated price, key) — the
# tuple-comparison semantics pin (struct ordering in Spark ==
# lexicographic tuple ORDER BY in ANSI SQL). Top-10 rows.


def q_struct_ordering(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    key = F.struct(
        F.col("o_orderpriority"), (-F.col("cents")).alias("neg"), F.col("o_orderkey")
    )
    return (
        orders.orderBy(key.asc())
        .limit(10)
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("cents") / 100.0, 2).alias("totalprice"),
        )
    )


Q_STRUCT_SQL = """
SELECT o_orderkey, o_orderpriority,
       ROUND(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) / 100.0, 2)
         AS totalprice
FROM orders
ORDER BY o_orderpriority, -CAST(ROUND(o_totalprice * 100, 0) AS BIGINT),
         o_orderkey
LIMIT 10
"""

QUERIES["q_struct_ordering"] = QuerySpec(
    q_struct_ordering,
    Q_STRUCT_SQL,
    "composite struct ORDER BY (tuple-comparison semantics) vs the "
    "lexicographic multi-key sort — top-10 pin",
)
