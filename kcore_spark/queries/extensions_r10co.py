"""Round-10 surface extensions, batch CO (SURVEY §2.3 N r10): the
population/richness-estimator block — capture-recapture (Chapman's
bias-corrected Lincoln-Petersen: estimate the user population from two
"capture occasions" = activity in the two halves of the event window,
scored against the true distinct-user count the fixture lets us see),
Chao1 species richness (how many vocabulary words EXIST, estimated
from singletons/doubletons — the corpus-coverage question), and the
Good-Turing missing mass (what probability mass belongs to words never
seen — the smoothing constant of language modeling). Ecology math that
a data-curation engine genuinely uses; next to q_heaps_law /
q_hapax_profile / q_linear_counting.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: all inputs are exact integer counts (distinct users,
count-of-count frequencies); estimator formulas are pinned literal
algebra.
Scale: capture-recapture is two distinct-aggregates over one events
scan; Chao1/Good-Turing fold the token explode to the count-of-counts
domain (value-bounded).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_capture_recapture(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", F.unix_timestamp("ts").alias("t")
    )
    bounds = ev.agg(
        F.min("t").alias("t0"),
        F.max("t").alias("t1"),
        F.countDistinct("user_id").cast("long").alias("true_n"),
    )
    tagged = ev.crossJoin(F.broadcast(bounds)).select(
        "user_id",
        "true_n",
        (F.col("t") < (F.col("t0") + F.col("t1")) / 2).alias("h1"),
    )
    per_user = tagged.groupBy("user_id", "true_n").agg(
        F.max(F.col("h1").cast("int")).alias("in1"),
        F.max((~F.col("h1")).cast("int")).alias("in2"),
    )
    agg = per_user.groupBy("true_n").agg(
        F.sum("in1").cast("long").alias("n1"),
        F.sum("in2").cast("long").alias("n2"),
        F.sum(F.col("in1") * F.col("in2")).cast("long").alias("m"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m = F.col("m").cast("double")
    nhat = (n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0
    se = F.sqrt(
        (n1 + 1.0)
        * (n2 + 1.0)
        * (n1 - m)
        * (n2 - m)
        / ((m + 1.0) * (m + 1.0) * (m + 2.0))
    )
    return agg.select(
        "n1",
        "n2",
        F.col("m").alias("recaptured"),
        F.round(nhat, 2).alias("chapman_estimate"),
        F.round(se, 2).alias("se"),
        F.col("true_n").alias("true_population"),
        F.round(nhat / F.col("true_n").cast("double"), 6).alias("ratio_to_truth"),
    )


Q_CAPTURE_SQL = """
WITH ev AS (
  SELECT user_id,
         epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS t
  FROM events),
bounds AS (
  SELECT MIN(t) AS t0, MAX(t) AS t1,
         CAST(COUNT(DISTINCT user_id) AS BIGINT) AS true_n
  FROM ev),
per_user AS (
  SELECT user_id, true_n,
         MAX(CASE WHEN t < (t0 + t1) / 2 THEN 1 ELSE 0 END) AS in1,
         MAX(CASE WHEN t < (t0 + t1) / 2 THEN 0 ELSE 1 END) AS in2
  FROM ev CROSS JOIN bounds GROUP BY 1, 2),
agg AS (
  SELECT true_n,
         CAST(SUM(in1) AS BIGINT) AS n1,
         CAST(SUM(in2) AS BIGINT) AS n2,
         CAST(SUM(in1 * in2) AS BIGINT) AS m
  FROM per_user GROUP BY 1)
SELECT n1, n2, m AS recaptured,
       ROUND((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0, 2) AS chapman_estimate,
       ROUND(SQRT((n1 + 1.0) * (n2 + 1.0) * (n1 - m) * (n2 - m)
                  / ((m + 1.0) * (m + 1.0) * (m + 2.0))), 2) AS se,
       true_n AS true_population,
       ROUND(((n1 + 1.0) * (n2 + 1.0) / (m + 1.0) - 1.0)
             / CAST(true_n AS DOUBLE), 6) AS ratio_to_truth
FROM agg
"""

QUERIES["q_capture_recapture"] = QuerySpec(
    q_capture_recapture,
    Q_CAPTURE_SQL,
    "Chapman capture-recapture estimate of the user population from "
    "half-window activity, scored against the true distinct count",
)


def _word_cc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-of-counts over the corpus vocabulary: (c, f_c)."""
    tok = (
        load_table(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), " ")).alias("w"))
        .where(F.col("w") != "")
    )
    wc = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    return wc.groupBy("c").agg(F.count(F.lit(1)).cast("long").alias("f"))


_WORD_CC_SQL = """
  tok AS (
    SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents),
  wc AS (SELECT w, COUNT(*) AS c FROM tok WHERE w <> '' GROUP BY w),
  cc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS f FROM wc GROUP BY c)
"""


def q_chao1_richness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = _word_cc(spark, sf_dir)
    agg = cc.agg(
        F.sum("f").cast("long").alias("s_obs"),
        F.sum(F.when(F.col("c") == 1, F.col("f")).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, F.col("f")).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.col("s_obs").cast("double") + f1 * (f1 - 1.0) / (2.0 * (f2 + 1.0))
    return agg.select(
        "s_obs",
        "f1",
        "f2",
        F.round(chao1, 2).alias("chao1"),
        F.round(F.col("s_obs").cast("double") / chao1, 6).alias(
            "coverage_of_richness"
        ),
    )


Q_CHAO_SQL = f"""
WITH {_WORD_CC_SQL}
SELECT CAST(SUM(f) AS BIGINT) AS s_obs,
       CAST(SUM(CASE WHEN c = 1 THEN f ELSE 0 END) AS BIGINT) AS f1,
       CAST(SUM(CASE WHEN c = 2 THEN f ELSE 0 END) AS BIGINT) AS f2,
       ROUND(SUM(f) + SUM(CASE WHEN c = 1 THEN f ELSE 0 END)
             * (SUM(CASE WHEN c = 1 THEN f ELSE 0 END) - 1.0)
             / (2.0 * (SUM(CASE WHEN c = 2 THEN f ELSE 0 END) + 1.0)), 2)
           AS chao1,
       ROUND(SUM(f) / (SUM(f) + SUM(CASE WHEN c = 1 THEN f ELSE 0 END)
             * (SUM(CASE WHEN c = 1 THEN f ELSE 0 END) - 1.0)
             / (2.0 * (SUM(CASE WHEN c = 2 THEN f ELSE 0 END) + 1.0))), 6)
           AS coverage_of_richness
FROM cc
"""

QUERIES["q_chao1_richness"] = QuerySpec(
    q_chao1_richness,
    Q_CHAO_SQL,
    "Chao1 vocabulary-richness estimate from singleton/doubleton "
    "counts — count-of-counts fold",
)


def q_good_turing_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    cc = _word_cc(spark, sf_dir)
    agg = cc.agg(
        F.sum(F.col("c") * F.col("f")).cast("long").alias("n_tokens"),
        F.sum("f").cast("long").alias("s_obs"),
        F.sum(F.when(F.col("c") == 1, F.col("f")).otherwise(0))
        .cast("long")
        .alias("f1"),
        F.sum(F.when(F.col("c") == 2, F.col("f")).otherwise(0))
        .cast("long")
        .alias("f2"),
    )
    n = F.col("n_tokens").cast("double")
    p0 = F.col("f1").cast("double") / n
    # GT-adjusted probability of a CURRENTLY-singleton word (0 when the
    # corpus has no singletons at all — this fixture's vocab is dense)
    p1_star = F.when(
        F.col("f1") > 0,
        2.0 * F.col("f2").cast("double") / (n * F.col("f1").cast("double")),
    ).otherwise(0.0)
    return agg.select(
        "n_tokens",
        "s_obs",
        "f1",
        F.round(p0, 6).alias("missing_mass_p0"),
        F.round(p1_star, 10).alias("gt_singleton_prob"),
        F.round(F.col("f1").cast("double") / F.col("s_obs").cast("double"), 6)
        .alias("singleton_share"),
    )


Q_GT_SQL = f"""
WITH {_WORD_CC_SQL}
SELECT CAST(SUM(c * f) AS BIGINT) AS n_tokens,
       CAST(SUM(f) AS BIGINT) AS s_obs,
       CAST(SUM(CASE WHEN c = 1 THEN f ELSE 0 END) AS BIGINT) AS f1,
       ROUND(SUM(CASE WHEN c = 1 THEN f ELSE 0 END)
             / CAST(SUM(c * f) AS DOUBLE), 6) AS missing_mass_p0,
       ROUND(CASE WHEN SUM(CASE WHEN c = 1 THEN f ELSE 0 END) > 0 THEN
               2.0 * SUM(CASE WHEN c = 2 THEN f ELSE 0 END)
               / (CAST(SUM(c * f) AS DOUBLE)
                  * SUM(CASE WHEN c = 1 THEN f ELSE 0 END))
             ELSE 0.0 END, 10) AS gt_singleton_prob,
       ROUND(SUM(CASE WHEN c = 1 THEN f ELSE 0 END)
             / CAST(SUM(f) AS DOUBLE), 6) AS singleton_share
FROM cc
"""

QUERIES["q_good_turing_mass"] = QuerySpec(
    q_good_turing_mass,
    Q_GT_SQL,
    "Good-Turing missing mass + smoothed singleton probability — "
    "count-of-counts fold over the vocabulary",
)
