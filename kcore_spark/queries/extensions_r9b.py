"""Round-9 surface extensions, batch B (SURVEY §2.3 N r9): DSIR-style
hashed-n-gram importance weighting (data selection for LM pretraining,
Xie et al. 2023 "Data Selection for Language Models via Importance
Resampling" — public method), quantile normalization across groups,
a grouped ``applyInArrow`` z-score (the Spark 4 Arrow-native grouped
UDF surface), and Theil inequality decomposition.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: per-row doubles rounded then summed
as DECIMAL, totals broadcast as 1-row frames (never collected), every
computed column aliased identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------- DSIR importance weights
# Data Selection via Importance Resampling, the hashed-n-gram variant:
# score every raw document by how target-like its token distribution
# is, where "target" is a trusted subset (here lang='en' — the stand-in
# for a curated corpus) and features are md5-hashed unigram buckets
# (64 bins). Per-bucket log-ratio lw(b) = ln p_target(b) - ln p_raw(b)
# with add-one smoothing; a document's weight is the sum of lw over
# its tokens. Scale shape (100 TB): ONE token explode scans the
# corpus; the feature table is 64 rows (broadcast), the token totals
# are a 1-row frame (broadcast cross) — scoring is a map-side join,
# no shuffle beyond the per-doc/per-source aggregation. The md5 bucket
# (conv(hex,16,10) % 64) is the repo's portable-hash idiom, identical
# in DuckDB, so the oracle reproduces the weights bit-for-bit: lw is
# rounded to 9 and decimal-summed per doc.

N_BUCKETS = 64


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "text"
    )
    toks = docs.select(
        "doc_id",
        "lang",
        "source",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    ).withColumn(
        "b",
        F.conv(F.substring(F.md5(F.col("w")), 1, 4), 16, 10).cast("long")
        % N_BUCKETS,
    )
    raw = toks.groupBy("b").agg(F.count(F.lit(1)).alias("cr"))
    tgt = toks.where(F.col("lang") == "en").groupBy("b").agg(
        F.count(F.lit(1)).alias("ct")
    )
    totals = toks.agg(
        F.count(F.lit(1)).alias("nr"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("nt"),
    )
    lw = (
        raw.join(tgt, "b", "left")
        .na.fill({"ct": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "b",
            F.round(
                F.log((F.col("ct") + 1.0) / (F.col("nt") + F.lit(float(N_BUCKETS))))
                - F.log((F.col("cr") + 1.0) / (F.col("nr") + F.lit(float(N_BUCKETS)))),
                9,
            )
            .cast("decimal(28,9)")
            .alias("lw"),
        )
    )
    per_doc = (
        toks.join(F.broadcast(lw), "b")
        .groupBy("doc_id", "source")
        .agg(F.sum("lw").alias("w_doc"))
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("w_doc") > 0, 1).otherwise(0)).alias("n_targetlike"),
            F.round(F.sum("w_doc").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_weight"
            ),
        )
        .orderBy("source")
    )


Q_DSIR_SQL = f"""
WITH toks AS (
  SELECT doc_id, lang, source,
         ('0x' || substring(md5(w), 1, 4))::BIGINT % {N_BUCKETS} AS b
  FROM (SELECT doc_id, lang, source,
               UNNEST(string_split(lower(text), ' ')) AS w
        FROM documents)),
raw AS (SELECT b, COUNT(*) AS cr FROM toks GROUP BY b),
tgt AS (SELECT b, COUNT(*) AS ct FROM toks WHERE lang = 'en' GROUP BY b),
totals AS (
  SELECT COUNT(*) AS nr,
         SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS nt
  FROM toks),
lw AS (
  SELECT raw.b,
         CAST(ROUND(LN((COALESCE(ct, 0) + 1.0) / (nt + {N_BUCKETS}.0))
                    - LN((cr + 1.0) / (nr + {N_BUCKETS}.0)), 9)
              AS DECIMAL(28,9)) AS lw
  FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN totals),
per_doc AS (
  SELECT doc_id, source, SUM(lw) AS w_doc
  FROM toks JOIN lw ON toks.b = lw.b
  GROUP BY doc_id, source)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN w_doc > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_targetlike,
       ROUND(CAST(SUM(w_doc) AS DOUBLE) / COUNT(*), 6) AS avg_weight
FROM per_doc
GROUP BY source
ORDER BY source
"""

QUERIES["q_dsir_importance"] = QuerySpec(
    q_dsir_importance,
    Q_DSIR_SQL,
    "DSIR hashed-unigram importance weights (target = lang'en'): 64-bucket "
    "log-ratio table broadcast onto one token-explode scan",
)


# ----------------------------- Quantile normalization
# Force each group's metric onto a common reference distribution —
# the batch-effect remover (microarray heritage) that feature
# pipelines use to make per-segment metrics comparable. Variant here:
# 20 equal-frequency bins per event_type (NTILE over a fully
# tie-broken order), reference value per bin = mean over event_types
# of the per-(type,bin) mean, every mean a ratio of a decimal-exact
# sum. Scale shape: two keyed window/agg passes over events plus a
# 120-row broadcast back-join — linear, one shuffle on event_type.


def q_quantile_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "value", "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    binned = ev.withColumn("bin", F.ntile(20).over(w))
    per_bin = binned.groupBy("event_type", "bin").agg(
        F.count(F.lit(1)).alias("n_bin"),
        F.round(
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double")
            / F.count(F.lit(1)),
            9,
        )
        .cast("decimal(18,9)")
        .alias("m_bin"),
    )
    ref = per_bin.groupBy("bin").agg(
        F.round(F.sum("m_bin").cast("double") / F.count(F.lit(1)), 6)
        .cast("decimal(18,6)")
        .alias("ref_val")
    )
    return (
        per_bin.join(F.broadcast(ref), "bin")
        .groupBy("event_type")
        .agg(
            F.sum("n_bin").alias("n"),
            F.sum(F.col("n_bin") * F.col("ref_val")).cast("double").alias("qn_sum"),
        )
        .orderBy("event_type")
    )


Q_QNORM_SQL = """
WITH binned AS (
  SELECT event_type, value,
         NTILE(20) OVER (PARTITION BY event_type ORDER BY value, event_id) AS bin
  FROM events),
per_bin AS (
  SELECT event_type, bin, COUNT(*) AS n_bin,
         CAST(ROUND(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*), 9)
              AS DECIMAL(18,9)) AS m_bin
  FROM binned GROUP BY event_type, bin),
ref AS (
  SELECT bin,
         CAST(ROUND(CAST(SUM(m_bin) AS DOUBLE) / COUNT(*), 6) AS DECIMAL(18,6))
           AS ref_val
  FROM per_bin GROUP BY bin)
SELECT event_type, CAST(SUM(n_bin) AS BIGINT) AS n,
       CAST(SUM(n_bin * ref_val) AS DOUBLE) AS qn_sum
FROM per_bin JOIN ref USING (bin)
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["q_quantile_normalize"] = QuerySpec(
    q_quantile_normalize,
    Q_QNORM_SQL,
    "Quantile normalization: 20 equal-frequency bins per event_type mapped "
    "onto the cross-group reference distribution (120-row broadcast)",
)


# ----------------------------- Grouped applyInArrow z-score
# The Spark 4 Arrow-NATIVE grouped UDF (GroupedData.applyInArrow):
# the group arrives as one pyarrow.Table, zero pandas conversion —
# the lowest-overhead Python escape hatch for per-group numerics.
# Registered as the API-matrix row alongside applyInPandas /
# mapInArrow (queries/udfs.py). Semantics: per event_type, population
# z-scores of value; emit n, rounded mean/stddev, and the |z|>2 tail
# count. Scale shape: one shuffle on event_type; groups stream
# through Arrow batches; per-group cost linear.


def q_apply_in_arrow_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("event_type", "value")

    def zstats(table):
        import math

        import pyarrow as pa

        vals = [v for v in table.column("value").to_pylist() if v is not None]
        n = len(vals)
        mean = math.fsum(vals) / n
        var = math.fsum((v - mean) ** 2 for v in vals) / n
        sd = math.sqrt(var)
        n_tail = sum(1 for v in vals if sd > 0 and round(abs(v - mean) / sd, 6) > 2)
        return pa.table(
            {
                "event_type": [table.column("event_type")[0].as_py()],
                "n": [n],
                "mean_r": [round(mean, 6)],
                "sd_r": [round(sd, 6)],
                "n_tail": [n_tail],
            }
        )

    out = ev.groupBy("event_type").applyInArrow(
        zstats, schema="event_type string, n long, mean_r double, sd_r double, n_tail long"
    )
    return out.orderBy("event_type")


Q_ARROW_Z_SQL = """
WITH stats AS (
  SELECT event_type, COUNT(value) AS n,
         AVG(value) AS mean, STDDEV_POP(value) AS sd
  FROM events GROUP BY event_type)
SELECT s.event_type, s.n,
       ROUND(s.mean, 6) AS mean_r, ROUND(s.sd, 6) AS sd_r,
       CAST(SUM(CASE WHEN s.sd > 0 AND ROUND(ABS(e.value - s.mean) / s.sd, 6) > 2
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_tail
FROM events e JOIN stats s USING (event_type)
WHERE e.value IS NOT NULL
GROUP BY s.event_type, s.n, s.mean, s.sd
ORDER BY s.event_type
"""

QUERIES["q_apply_in_arrow_zscore"] = QuerySpec(
    q_apply_in_arrow_zscore,
    Q_ARROW_Z_SQL,
    "Grouped applyInArrow (Arrow-native Spark 4 UDF): per-type population "
    "z-score tail counts, fsum-exact per group",
)


# ----------------------------- Theil inequality decomposition
# The additively-decomposable inequality index: total Theil T over
# customer revenue splits exactly into within-nation + between-nation
# terms — the lens for "is revenue concentration a country story or a
# customer story". Complements q_lorenz_gini (r8) which cannot
# decompose. Per-row terms ((x/mu) ln(x/mu)) are doubles rounded to 9
# and decimal-summed; group means are ratios of decimal-exact sums —
# the FIXTURES.md float idiom. Scale: two keyed aggs (customer, then
# nation) plus a 1-row broadcast of the grand mean; no window over
# the full table.


def q_theil_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey", F.col("o_totalprice").cast("decimal(18,2)").alias("p")
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rev = (
        orders.groupBy("o_custkey")
        .agg(F.sum("p").alias("x"))
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.col("x").cast("double").alias("x"))
    )
    grand = rev.agg(
        F.count(F.lit(1)).alias("n_all"),
        (F.sum(F.col("x").cast("decimal(28,6)")) / F.count(F.lit(1)))
        .cast("double")
        .alias("mu_all"),
    )
    per_nation = rev.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n_g"),
        (F.sum(F.col("x").cast("decimal(28,6)")) / F.count(F.lit(1)))
        .cast("double")
        .alias("mu_g"),
    )
    within = (
        rev.join(F.broadcast(per_nation), "n_name")
        .withColumn(
            "t_term",
            F.round(
                (F.col("x") / F.col("mu_g")) * F.log(F.col("x") / F.col("mu_g")), 9
            ).cast("decimal(28,9)"),
        )
        .groupBy("n_name")
        .agg(
            F.first("n_g").alias("n_cust"),
            F.first("mu_g").alias("mu_g"),
            F.round(
                F.sum("t_term").cast("double") / F.first("n_g").cast("double"), 6
            ).alias("theil_within"),
        )
    )
    return (
        within.crossJoin(F.broadcast(grand))
        .select(
            "n_name",
            "n_cust",
            F.round("mu_g", 6).alias("mean_rev"),
            "theil_within",
            F.round(
                (F.col("mu_g") / F.col("mu_all")) * F.log(F.col("mu_g") / F.col("mu_all")),
                6,
            ).alias("between_term"),
        )
        .orderBy("n_name")
    )


Q_THEIL_SQL = """
WITH rev AS (
  SELECT n_name, CAST(x AS DOUBLE) AS x
  FROM (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS x
        FROM orders GROUP BY o_custkey) r
  JOIN customer ON o_custkey = c_custkey
  JOIN nation ON c_nationkey = n_nationkey),
grand AS (
  SELECT COUNT(*) AS n_all,
         CAST(SUM(CAST(x AS DECIMAL(28,6))) / COUNT(*) AS DOUBLE) AS mu_all
  FROM rev),
per_nation AS (
  SELECT n_name, COUNT(*) AS n_g,
         CAST(SUM(CAST(x AS DECIMAL(28,6))) / COUNT(*) AS DOUBLE) AS mu_g
  FROM rev GROUP BY n_name),
within AS (
  SELECT rev.n_name, MIN(n_g) AS n_cust, MIN(mu_g) AS mu_g,
         ROUND(CAST(SUM(CAST(ROUND((x / mu_g) * LN(x / mu_g), 9) AS DECIMAL(28,9)))
                    AS DOUBLE) / MIN(n_g), 6) AS theil_within
  FROM rev JOIN per_nation USING (n_name)
  GROUP BY rev.n_name)
SELECT n_name, n_cust, ROUND(mu_g, 6) AS mean_rev, theil_within,
       ROUND((mu_g / mu_all) * LN(mu_g / mu_all), 6) AS between_term
FROM within CROSS JOIN grand
ORDER BY n_name
"""

QUERIES["q_theil_index"] = QuerySpec(
    q_theil_index,
    Q_THEIL_SQL,
    "Theil inequality decomposition of customer revenue by nation: "
    "within-group entropy terms decimal-summed, between-group from broadcast means",
)
