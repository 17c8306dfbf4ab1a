"""Round-10 surface extensions, batch CF (SURVEY §2.3 N r10): the
winnowing-fingerprint block — the MOSS algorithm (Schleimer, Wilkerson
& Aiken 2003) as three queries. Robust winnowing selects, from every
window of w consecutive word-3-gram hashes, the minimum (rightmost on
ties) — guaranteeing any shared run of >= w+k-1 tokens shares a
fingerprint. Then: the per-source density report (theory says selected
fraction ~ 2/(w+1)), the overlap-pair detector (documents sharing >= 3
winnowed prints, with a document-frequency cutoff so stopword prints
can't go quadratic), and shared-print containment (the asymmetric
"how much of the smaller doc is covered" score). Complements
q_fingerprints (rolling hash), q_minhash_lsh_pairs and
q_ngram_containment with the guarantee-bearing selection scheme.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: 3-gram hashes are 32-bit md5 prefixes; window minima are
struct-min with the rightmost-position tie pinned in both engines; all
outputs are integer counts or exact ratios.
Scale: every window is PARTITIONED by doc_id; the pair join runs on
print-hash buckets AFTER a df <= 50 cutoff (the PPJoin-style stopword
guard) — no all-pairs stage anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_K = 3  # words per gram
_W = 4  # winnowing window (in grams)
_DF_CUT = 50  # prints in more docs than this are stopword noise
_MIN_SHARED = 3


def _prints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed fingerprints (doc_id, source, pos, h) per document."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    tok = docs.select(
        "doc_id",
        "source",
        F.posexplode(F.split(F.lower("text"), " ")).alias("pos", "w1"),
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    grams = (
        tok.withColumn("w2", F.lead("w1", 1).over(wd))
        .withColumn("w3", F.lead("w1", 2).over(wd))
        .where(F.col("w3").isNotNull())
        .select(
            "doc_id",
            "source",
            "pos",
            F.conv(
                F.substring(
                    F.md5(F.concat_ws(" ", "w1", "w2", "w3")), 1, 8
                ),
                16,
                10,
            )
            .cast("long")
            .alias("h"),
        )
    )
    # robust winnowing: min hash in each w-gram window, rightmost tie —
    # min(struct(h, -pos)) = smallest h, then LARGEST pos
    ww = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, _W - 1)
    sel = grams.withColumn(
        "pick", F.min(F.struct(F.col("h"), (-F.col("pos")).alias("np"))).over(ww)
    ).withColumn("n_in_win", F.count(F.lit(1)).over(ww))
    return (
        sel.where(F.col("n_in_win") == _W)  # full windows only
        .select(
            "doc_id",
            "source",
            F.col("pick.h").alias("h"),
            (-F.col("pick.np")).cast("long").alias("ppos"),
        )
        .distinct()
    )


_PRINTS_SQL = f"""
  tok AS (
    SELECT doc_id, source,
           generate_subscripts(string_split(lower(text), ' '), 1) - 1 AS pos,
           unnest(string_split(lower(text), ' ')) AS w1
    FROM documents),
  grams AS (
    SELECT doc_id, source, pos,
           ('0x' || substring(md5(w1 || ' ' || w2 || ' ' || w3), 1, 8))::BIGINT
               AS h
    FROM (
      SELECT doc_id, source, pos, w1,
             LEAD(w1, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS w2,
             LEAD(w1, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS w3
      FROM tok)
    WHERE w3 IS NOT NULL),
  sel AS (
    SELECT doc_id, source,
           MIN({{'h': h, 'np': -pos}}) OVER
             (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS pick,
           COUNT(*) OVER
             (PARTITION BY doc_id ORDER BY pos
              ROWS BETWEEN CURRENT ROW AND {_W - 1} FOLLOWING) AS n_in_win
    FROM grams),
  prints AS (
    SELECT DISTINCT doc_id, source, pick.h AS h,
           CAST(-pick.np AS BIGINT) AS ppos
    FROM sel WHERE n_in_win = {_W})
"""


def q_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = _prints(spark, sf_dir)
    per_doc = pr.groupBy("doc_id", "source").agg(
        F.count(F.lit(1)).cast("long").alias("n_prints")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_prints").cast("long").alias("total_prints"),
            F.round(
                F.sum("n_prints").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_prints_per_doc"),
        )
        .orderBy("source")
    )


Q_WINNOW_SQL = f"""
WITH {_PRINTS_SQL},
per_doc AS (
  SELECT doc_id, source, CAST(COUNT(*) AS BIGINT) AS n_prints
  FROM prints GROUP BY 1, 2)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_prints) AS BIGINT) AS total_prints,
       ROUND(CAST(SUM(n_prints) AS DOUBLE) / COUNT(*), 4)
           AS avg_prints_per_doc
FROM per_doc GROUP BY source ORDER BY source
"""

QUERIES["q_winnowing_fingerprints"] = QuerySpec(
    q_winnowing_fingerprints,
    Q_WINNOW_SQL,
    "robust winnowing (k=3 words, w=4) fingerprint density per source — "
    "doc-partitioned window minima, rightmost tie pinned",
)


def _shared_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = _prints(spark, sf_dir).select("doc_id", "h").distinct()
    df = pr.groupBy("h").agg(F.count(F.lit(1)).alias("df"))
    keep = pr.join(df.where(F.col("df") <= _DF_CUT), "h")
    a = keep.select(F.col("h"), F.col("doc_id").alias("da"))
    b = keep.select(F.col("h").alias("h2"), F.col("doc_id").alias("db"))
    return (
        a.join(b, (a.h == b.h2) & (F.col("da") < F.col("db")))
        .groupBy("da", "db")
        .agg(F.count(F.lit(1)).cast("long").alias("shared"))
        .where(F.col("shared") >= _MIN_SHARED)
    )


_SHARED_SQL = f"""
  dpr AS (SELECT DISTINCT doc_id, h FROM prints),
  keep AS (
    SELECT dpr.doc_id, dpr.h FROM dpr
    JOIN (SELECT h, COUNT(*) AS df FROM dpr GROUP BY h) d
      ON dpr.h = d.h AND d.df <= {_DF_CUT}),
  shared_pairs AS (
    SELECT a.doc_id AS da, b.doc_id AS db,
           CAST(COUNT(*) AS BIGINT) AS shared
    FROM keep a JOIN keep b ON a.h = b.h AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    HAVING COUNT(*) >= {_MIN_SHARED})
"""


def q_fingerprint_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _shared_pairs(spark, sf_dir)
    return pairs.orderBy(
        F.col("shared").desc(), F.col("da"), F.col("db")
    ).limit(20)


Q_OVERLAP_SQL = f"""
WITH {_PRINTS_SQL},
{_SHARED_SQL}
SELECT da, db, shared FROM shared_pairs
ORDER BY shared DESC, da, db LIMIT 20
"""

QUERIES["q_fingerprint_overlap_pairs"] = QuerySpec(
    q_fingerprint_overlap_pairs,
    Q_OVERLAP_SQL,
    "top winnowed-print overlap pairs (>=3 shared, df<=50 cutoff) — "
    "print-bucket join, fully tie-broken top-k",
)


def q_fingerprint_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _shared_pairs(spark, sf_dir)
    pr = _prints(spark, sf_dir).select("doc_id", "h").distinct()
    sizes = pr.groupBy("doc_id").agg(F.count(F.lit(1)).cast("long").alias("np"))
    j = (
        pairs.join(sizes.withColumnRenamed("doc_id", "da").withColumnRenamed("np", "na"), "da")
        .join(sizes.withColumnRenamed("doc_id", "db").withColumnRenamed("np", "nb"), "db")
        .select(
            "shared",
            F.round(
                F.col("shared").cast("double")
                / F.least(F.col("na"), F.col("nb")).cast("double"),
                6,
            ).alias("containment"),
        )
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(
            F.sum(F.round("containment", 6).cast("decimal(38,6)")).cast("double")
            / F.count(F.lit(1)),
            6,
        ).alias("avg_containment"),
        F.max("containment").alias("max_containment"),
        F.max("shared").alias("max_shared"),
    )


Q_CONTAIN_SQL = f"""
WITH {_PRINTS_SQL},
{_SHARED_SQL},
sizes AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS np
  FROM (SELECT DISTINCT doc_id, h FROM prints) GROUP BY doc_id),
j AS (
  SELECT shared,
         ROUND(CAST(shared AS DOUBLE)
               / CAST(LEAST(sa.np, sb.np) AS DOUBLE), 6) AS containment
  FROM shared_pairs
  JOIN sizes sa ON da = sa.doc_id
  JOIN sizes sb ON db = sb.doc_id)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(CAST(SUM(CAST(ROUND(containment, 6) AS DECIMAL(38,6))) AS DOUBLE)
             / COUNT(*), 6) AS avg_containment,
       MAX(containment) AS max_containment,
       CAST(MAX(shared) AS BIGINT) AS max_shared
FROM j
"""

QUERIES["q_fingerprint_containment"] = QuerySpec(
    q_fingerprint_containment,
    Q_CONTAIN_SQL,
    "containment of shared winnowed prints over the smaller document — "
    "pair table joined to per-doc print sizes",
)
