"""Round-9 surface extensions, batch C (SURVEY §2.3 N r9):
t-closeness (completing the k-anonymity / l-diversity privacy-audit
family), SPRT sequential stopping, Flesch readability scoring, and the
Spark 4 SQL session-variable dialect (DECLARE VARIABLE / SET VAR /
EXECUTE IMMEDIATE).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md: integer counts everywhere possible,
per-row doubles rounded then decimal-summed, IEEE-deterministic
ratios of integers for the distribution terms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------- t-closeness audit
# The third leg of the release-audit family (k-anonymity: group size;
# l-diversity: sensitive-value variety; t-closeness: sensitive-value
# DISTRIBUTION distance). For an ORDERED sensitive attribute the
# Earth-Mover's Distance has the closed form
# EMD = (1/(m-1)) * sum_k |CumP_group(k) - CumP_global(k)| over the m
# ordered bins — no LP solve. Sensitive attribute: account balance in
# 5 fixed-width bins (data-independent edges, so bin ids are stable
# across engines); quasi-identifiers: (nation, mktsegment). Scale
# shape: one keyed agg to (group, bin) counts, densified against the
# 5-bin domain by a tiny cross join (groups x 5), cum sums by window
# over 5 rows per group, global distribution a 5-row broadcast —
# linear, one shuffle. Every |diff| term is a double on ratios of
# integers (IEEE-identical cross-engine), rounded 9, decimal-summed.

N_BINS = 5
BIN_EXPR = "LEAST(4, GREATEST(0, CAST(FLOOR((c_acctbal + 1000.0) / 2200.0) AS INT)))"


def q_t_closeness(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey", "c_mktsegment", "c_acctbal"
    )
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    rows = cust.join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey).select(
        "n_name",
        F.col("c_mktsegment").alias("segment"),
        F.expr(BIN_EXPR).alias("bin"),
    )
    per_bin = rows.groupBy("n_name", "segment", "bin").agg(
        F.count(F.lit(1)).alias("c")
    )
    groups = rows.groupBy("n_name", "segment").agg(F.count(F.lit(1)).alias("n_g"))
    dense = (
        groups.select(
            "n_name", "segment", "n_g", F.explode(F.sequence(F.lit(0), F.lit(N_BINS - 1))).alias("bin")
        )
        .join(per_bin, ["n_name", "segment", "bin"], "left")
        .na.fill({"c": 0})
    )
    w = (
        Window.partitionBy("n_name", "segment")
        .orderBy("bin")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum_g = dense.withColumn("cum_g", F.sum("c").over(w))
    glob = (
        rows.groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cg"))
        .withColumn(
            "cum_all",
            F.sum("cg").over(
                Window.orderBy("bin").rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .crossJoin(F.broadcast(rows.agg(F.count(F.lit(1)).alias("n_all"))))
        .select("bin", "cum_all", "n_all")
    )
    terms = (
        cum_g.join(F.broadcast(glob), "bin")
        .where(F.col("bin") < N_BINS - 1)  # last cum term is always 0
        .withColumn(
            "d",
            F.round(
                F.abs(
                    F.col("cum_g").cast("double") / F.col("n_g")
                    - F.col("cum_all").cast("double") / F.col("n_all")
                ),
                9,
            ).cast("decimal(18,9)"),
        )
    )
    return (
        terms.groupBy("n_name", "segment")
        .agg(
            F.first("n_g").alias("n_rows"),
            F.round(
                F.sum("d").cast("double") / F.lit(float(N_BINS - 1)), 6
            ).alias("t_emd"),
        )
        .orderBy("n_name", "segment")
    )


Q_TCLOSE_SQL = f"""
WITH rows_b AS (
  SELECT n_name, c_mktsegment AS segment,
         {BIN_EXPR} AS bin
  FROM customer JOIN nation ON c_nationkey = n_nationkey),
per_bin AS (
  SELECT n_name, segment, bin, COUNT(*) AS c
  FROM rows_b GROUP BY n_name, segment, bin),
groups AS (
  SELECT n_name, segment, COUNT(*) AS n_g FROM rows_b GROUP BY n_name, segment),
dense AS (
  SELECT g.n_name, g.segment, g.n_g, b.bin, COALESCE(p.c, 0) AS c
  FROM groups g
  CROSS JOIN (SELECT UNNEST(generate_series(0, {N_BINS - 1})) AS bin) b
  LEFT JOIN per_bin p
    ON p.n_name = g.n_name AND p.segment = g.segment AND p.bin = b.bin),
cum_g AS (
  SELECT n_name, segment, n_g, bin,
         SUM(c) OVER (PARTITION BY n_name, segment ORDER BY bin
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_g
  FROM dense),
gdist AS (
  SELECT bin,
         SUM(cg) OVER (ORDER BY bin
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_all,
         (SELECT COUNT(*) FROM rows_b) AS n_all
  FROM (SELECT bin, COUNT(*) AS cg FROM rows_b GROUP BY bin)),
terms AS (
  SELECT c.n_name, c.segment, c.n_g,
         CAST(ROUND(ABS(CAST(c.cum_g AS DOUBLE) / c.n_g
                        - CAST(g.cum_all AS DOUBLE) / g.n_all), 9)
              AS DECIMAL(18,9)) AS d
  FROM cum_g c JOIN gdist g USING (bin)
  WHERE c.bin < {N_BINS - 1})
SELECT n_name, segment, MIN(n_g) AS n_rows,
       ROUND(CAST(SUM(d) AS DOUBLE) / {N_BINS - 1}.0, 6) AS t_emd
FROM terms
GROUP BY n_name, segment
ORDER BY n_name, segment
"""

QUERIES["q_t_closeness"] = QuerySpec(
    q_t_closeness,
    Q_TCLOSE_SQL,
    "t-closeness audit (ordered-EMD closed form) of acctbal bins per "
    "(nation, segment) quasi-identifier group — completes k-anon/l-div family",
)


# ----------------------------- SPRT sequential stopping
# Wald's Sequential Probability Ratio Test over the event stream: per
# experiment arm (md5-parity of user_id — the repo's deterministic
# assignment idiom), walk the cumulative log-likelihood ratio of
# "purchase rate is p1=0.3" vs "p0=0.2" in event-time order and stop
# at the first boundary crossing (alpha=0.05, beta=0.2). The per-event
# LLR takes exactly two values (purchase / non-purchase constants),
# rounded to 9 and decimal-summed, so the walk is exact. Scale shape:
# one window cumsum per arm (keyed shuffle), crossing rows filtered,
# min(step) per arm — no driver iteration; at 100 TB the walk is one
# range-partitioned window.

P0, P1 = 0.2, 0.3
ALPHA, BETA = 0.05, 0.2


def q_sprt_stopping(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    lr_hit = round(math.log(P1 / P0), 9)
    lr_miss = round(math.log((1 - P1) / (1 - P0)), 9)
    up = round(math.log((1 - BETA) / ALPHA), 6)
    lo = round(math.log(BETA / (1 - ALPHA)), 6)
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    arm = (
        F.conv(F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10)
        .cast("long")
        % 2
    )
    walk = ev.select(
        arm.alias("arm"),
        "ts",
        "event_id",
        F.when(F.col("event_type") == "purchase", F.lit(lr_hit))
        .otherwise(F.lit(lr_miss))
        .cast("decimal(18,9)")
        .alias("lr"),
    )
    w = Window.partitionBy("arm").orderBy("ts", "event_id")
    cum = walk.select(
        "arm",
        F.row_number().over(w).alias("step"),
        F.sum("lr").over(w.rowsBetween(Window.unboundedPreceding, 0)).alias("llr"),
    )
    crossings = cum.where(
        (F.col("llr") >= up) | (F.col("llr") <= lo)
    ).groupBy("arm").agg(F.min("step").alias("n_at_decision"))
    return (
        crossings.join(
            cum.withColumnRenamed("step", "n_at_decision"), ["arm", "n_at_decision"]
        )
        .select(
            "arm",
            "n_at_decision",
            F.round(F.col("llr").cast("double"), 6).alias("llr_at_decision"),
            F.when(F.col("llr") >= up, F.lit("accept_h1"))
            .otherwise(F.lit("accept_h0"))
            .alias("decision"),
        )
        .orderBy("arm")
    )


def _sprt_sql() -> str:
    import math

    lr_hit = round(math.log(P1 / P0), 9)
    lr_miss = round(math.log((1 - P1) / (1 - P0)), 9)
    up = round(math.log((1 - BETA) / ALPHA), 6)
    lo = round(math.log(BETA / (1 - ALPHA)), 6)
    return f"""
WITH walk AS (
  SELECT ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT % 2 AS arm,
         ts, event_id,
         CAST(CASE WHEN event_type = 'purchase' THEN {lr_hit} ELSE {lr_miss} END
              AS DECIMAL(18,9)) AS lr
  FROM events),
cum AS (
  SELECT arm,
         ROW_NUMBER() OVER (PARTITION BY arm ORDER BY ts, event_id) AS step,
         SUM(lr) OVER (PARTITION BY arm ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS llr
  FROM walk),
crossings AS (
  SELECT arm, MIN(step) AS n_at_decision
  FROM cum WHERE llr >= {up} OR llr <= {lo}
  GROUP BY arm)
SELECT c.arm, c.n_at_decision,
       ROUND(CAST(m.llr AS DOUBLE), 6) AS llr_at_decision,
       CASE WHEN m.llr >= {up} THEN 'accept_h1' ELSE 'accept_h0' END AS decision
FROM crossings c JOIN cum m ON m.arm = c.arm AND m.step = c.n_at_decision
ORDER BY c.arm
"""


QUERIES["q_sprt_stopping"] = QuerySpec(
    q_sprt_stopping,
    _sprt_sql(),
    "Wald SPRT early stopping per experiment arm: exact decimal LLR walk "
    "in event-time order, first boundary crossing (no driver iteration)",
)


# ----------------------------- Flesch reading ease
# The standard readability score per source: 206.835 - 1.015 * (words
# / sentences) - 84.6 * (syllables / words). Syllables by the classic
# vowel-group heuristic (each maximal [aeiouy]+ run is one syllable);
# sentences = max(1, terminal-punctuation runs) — the fixture corpus
# is unpunctuated so that floor binds, which is fine: the formula and
# counts are what's pinned. All three counts are integers from regexp
# arithmetic riding the scan (JVM expressions, no UDF); the score is
# one double per doc rounded 9 and decimal-averaged per source.


def q_flesch_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    lower = F.lower(F.col("text"))
    words = F.size(F.split(lower, " "))
    # each maximal vowel run collapses to one '#': syllables = count('#')
    collapsed = F.regexp_replace(lower, "[aeiouy]+", "#")
    syllables = F.length(collapsed) - F.length(F.regexp_replace(collapsed, "#", ""))
    sentences = F.greatest(
        F.lit(1),
        F.length(F.regexp_replace(lower, "[^.!?]", ""))
    )
    scored = docs.select(
        "source",
        F.round(
            F.lit(206.835)
            - F.lit(1.015) * (words.cast("double") / sentences)
            - F.lit(84.6) * (syllables.cast("double") / words),
            9,
        )
        .cast("decimal(18,9)")
        .alias("flesch"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.sum("flesch").cast("double") / F.count(F.lit(1)), 6).alias(
                "avg_flesch"
            ),
        )
        .orderBy("source")
    )


Q_FLESCH_SQL = """
WITH scored AS (
  SELECT source,
         CAST(ROUND(206.835
                    - 1.015 * (CAST(len(string_split(lower(text), ' ')) AS DOUBLE)
                               / GREATEST(1, length(regexp_replace(lower(text), '[^.!?]', '', 'g'))))
                    - 84.6 * (CAST(length(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'))
                                   - length(replace(regexp_replace(lower(text), '[aeiouy]+', '#', 'g'), '#', ''))
                              AS DOUBLE)
                              / len(string_split(lower(text), ' '))), 9)
              AS DECIMAL(18,9)) AS flesch
  FROM documents)
SELECT source, COUNT(*) AS n_docs,
       ROUND(CAST(SUM(flesch) AS DOUBLE) / COUNT(*), 6) AS avg_flesch
FROM scored
GROUP BY source
ORDER BY source
"""

QUERIES["q_flesch_readability"] = QuerySpec(
    q_flesch_readability,
    Q_FLESCH_SQL,
    "Flesch reading ease per source: vowel-run syllable heuristic and word/"
    "sentence counts as pure JVM regexp arithmetic riding the scan",
)


# ----------------------------- SQL session variables
# Spark 4's SQL-variable dialect (DECLARE [OR REPLACE] VARIABLE /
# SET VAR / EXECUTE IMMEDIATE ... USING): parameterize a query with a
# value computed BY SQL — the scripting surface warehouse users expect
# (threshold tables, dashboard params). The variable holds the mean
# account balance; EXECUTE IMMEDIATE binds it as a positional
# parameter. Oracle: the same query with the scalar subquery inlined.
# Scale: identical plan to the inline form once bound — variables are
# literals at optimization time, so pruning/pushdown still apply.


def q_sql_variables(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    cust.createOrReplaceTempView("cust_sqlvar_v")
    spark.sql("DECLARE OR REPLACE VARIABLE bal_cut DOUBLE")
    spark.sql(
        "SET VAR bal_cut = (SELECT ROUND(AVG(c_acctbal), 2) FROM cust_sqlvar_v)"
    )
    return spark.sql(
        """
        EXECUTE IMMEDIATE
          'SELECT c_mktsegment AS segment, COUNT(*) AS n_above,
                  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
           FROM cust_sqlvar_v WHERE c_acctbal > ?
           GROUP BY c_mktsegment ORDER BY segment'
          USING bal_cut
        """
    )


Q_SQLVAR_SQL = """
SELECT c_mktsegment AS segment, COUNT(*) AS n_above,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal_sum
FROM customer
WHERE c_acctbal > (SELECT ROUND(AVG(c_acctbal), 2) FROM customer)
GROUP BY c_mktsegment
ORDER BY segment
"""

QUERIES["q_sql_variables"] = QuerySpec(
    q_sql_variables,
    Q_SQLVAR_SQL,
    "Spark 4 SQL session variables: DECLARE VARIABLE + SET VAR from a scalar "
    "subquery + EXECUTE IMMEDIATE ... USING positional bind",
)
