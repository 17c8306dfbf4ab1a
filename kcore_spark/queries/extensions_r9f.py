"""Round-9 surface extensions, batch F (SURVEY §2.3 N r9): Heaps'-law
vocabulary-growth fit (corpus analytics via first-occurrence ranks —
no quadratic rolling distinct), McNemar's paired test (completing the
paired-comparison corner of the stats family), and the Spark 4.1 SQL
scripting block (BEGIN ... END with local variables).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism follows FIXTURES.md.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ----------------------------- Heaps' law vocabulary growth
# V(N) ~ k N^b: how fast the vocabulary grows as the corpus grows —
# the planning number behind tokenizer vocab sizing and dedup sizing.
# The naive rolling COUNT(DISTINCT) is quadratic; the scale-right
# rewrite is FIRST-OCCURRENCE ranks: each word contributes exactly at
# the first doc (in doc_id order) that contains it, so V at any
# checkpoint is a cumsum over per-doc first-occurrence counts — one
# token explode + one min-aggregate, linear. Checkpoints at corpus
# deciles; b from closed-form OLS on the log-log points.


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    )
    first_occ = toks.groupBy("w").agg(F.min("doc_id").alias("fd"))
    per_doc0 = (
        toks.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tok"))
        .join(
            first_occ.groupBy("fd").agg(F.count(F.lit(1)).alias("n_new")),
            F.col("doc_id") == F.col("fd"),
            "left",
        )
        .na.fill({"n_new": 0})
    )
    # Global prefix sums WITHOUT a single-partition window: range-
    # partition on doc_id, per-partition running sums, then add the
    # broadcast cumulative per-partition totals (the _dist_rank /
    # topic-log offset-assignment pattern, extensions_r8.py:36 — the
    # collect is a <=32-row control-plane aggregate).
    src = (
        per_doc0.repartitionByRange(32, F.col("doc_id").asc())
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint()
    )
    part_tot = {
        r["__pid"]: (r["c"], r["st"], r["sn"])
        for r in src.groupBy("__pid")
        .agg(
            F.count(F.lit(1)).alias("c"),
            F.sum("n_tok").alias("st"),
            F.sum("n_new").alias("sn"),
        )
        .collect()
    }
    off_r, off_t, off_v = {}, {}, {}
    acc_r = acc_t = acc_v = 0
    for pid in sorted(part_tot):
        off_r[pid], off_t[pid], off_v[pid] = acc_r, acc_t, acc_v
        c, st, sn = part_tot[pid]
        acc_r, acc_t, acc_v = acc_r + c, acc_t + st, acc_v + sn
    def _map(d):
        return F.create_map(*[x for k, v in d.items() for x in (F.lit(k), F.lit(v))])
    wp = Window.partitionBy("__pid").orderBy("doc_id")
    wpc = wp.rowsBetween(Window.unboundedPreceding, 0)
    per_doc = src.select(
        "doc_id",
        (F.sum("n_tok").over(wpc) + F.element_at(_map(off_t), F.col("__pid"))).alias(
            "cum_tok"
        ),
        (F.sum("n_new").over(wpc) + F.element_at(_map(off_v), F.col("__pid"))).alias(
            "cum_vocab"
        ),
        (F.row_number().over(wp) + F.element_at(_map(off_r), F.col("__pid"))).alias(
            "r"
        ),
    )
    n_docs = per_doc.groupBy().agg(F.max("r").alias("nd"))
    # decile checkpoints: ranks at exact multiples of step=floor(nd/10)
    # (label = r/step — robust when nd is not a multiple of 10)
    checkpoints = (
        per_doc.crossJoin(F.broadcast(n_docs))
        .withColumn("step", F.greatest(F.floor(F.col("nd") / 10), F.lit(1)))
        .where(F.col("r") % F.col("step") == 0)
        .withColumn("decile", (F.col("r") / F.col("step")).cast("int"))
        .where(F.col("decile") <= 10)
        .select(
            "decile",
            F.col("cum_tok").alias("n_tokens"),
            F.col("cum_vocab").alias("vocab"),
        )
    )
    pts = checkpoints.select(
        "decile",
        "n_tokens",
        "vocab",
        F.log(F.col("n_tokens").cast("double")).alias("lx"),
        F.log(F.col("vocab").cast("double")).alias("ly"),
    )
    ols = pts.groupBy().agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("lx").alias("sx"),
        F.sum("ly").alias("sy"),
        F.sum(F.col("lx") * F.col("ly")).alias("sxy"),
        F.sum(F.col("lx") * F.col("lx")).alias("sxx"),
    ).select(
        F.round(
            (F.col("k") * F.col("sxy") - F.col("sx") * F.col("sy"))
            / (F.col("k") * F.col("sxx") - F.col("sx") * F.col("sx")),
            6,
        ).alias("heaps_b")
    )
    return (
        pts.crossJoin(F.broadcast(ols))
        .select("decile", "n_tokens", "vocab", "heaps_b")
        .orderBy("decile")
    )


Q_HEAPS_SQL = """
WITH toks AS (
  SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM documents),
first_occ AS (
  SELECT w, MIN(doc_id) AS fd FROM toks GROUP BY w),
per_doc AS (
  SELECT t.doc_id,
         SUM(t.n_tok) OVER (ORDER BY t.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tok,
         SUM(COALESCE(f.n_new, 0)) OVER (ORDER BY t.doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vocab,
         ROW_NUMBER() OVER (ORDER BY t.doc_id) AS r
  FROM (SELECT doc_id, COUNT(*) AS n_tok FROM toks GROUP BY doc_id) t
  LEFT JOIN (SELECT fd, COUNT(*) AS n_new FROM first_occ GROUP BY fd) f
    ON t.doc_id = f.fd),
nd AS (SELECT MAX(r) AS nd FROM per_doc),
checkpoints AS (
  SELECT CAST(r / GREATEST(CAST(FLOOR(nd / 10) AS BIGINT), 1) AS INT) AS decile,
         cum_tok AS n_tokens, cum_vocab AS vocab
  FROM per_doc CROSS JOIN nd
  WHERE r % GREATEST(CAST(FLOOR(nd / 10) AS BIGINT), 1) = 0
    AND CAST(r / GREATEST(CAST(FLOOR(nd / 10) AS BIGINT), 1) AS INT) <= 10),
pts AS (
  SELECT decile, CAST(n_tokens AS BIGINT) AS n_tokens,
         CAST(vocab AS BIGINT) AS vocab,
         LN(CAST(n_tokens AS DOUBLE)) AS lx, LN(CAST(vocab AS DOUBLE)) AS ly
  FROM checkpoints),
ols AS (
  SELECT ROUND((COUNT(*) * SUM(lx * ly) - SUM(lx) * SUM(ly))
               / (COUNT(*) * SUM(lx * lx) - SUM(lx) * SUM(lx)), 6) AS heaps_b
  FROM pts)
SELECT decile, n_tokens, vocab, heaps_b
FROM pts CROSS JOIN ols
ORDER BY decile
"""

QUERIES["q_heaps_law"] = QuerySpec(
    q_heaps_law,
    Q_HEAPS_SQL,
    "Heaps'-law vocabulary growth via first-occurrence ranks (linear, no "
    "rolling distinct): decile checkpoints + closed-form log-log OLS exponent",
)


# ----------------------------- McNemar's paired test
# The right test for "is classifier B better than A ON THE SAME
# ROWS" — marginal accuracies can't answer it; the discordant pairs
# do. Rules under comparison (stand-ins for two model versions):
# A = value > 50, B = second md5 hex digit parity (a deliberately
# weak baseline); truth = event_type = 'purchase'. Statistic:
# (|b - c| - 1)^2 / (b + c) with continuity correction — pure integer
# counts until one final division. One map-side pass, one 1-row agg.


def q_mcnemar_paired(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    truth = (F.col("event_type") == "purchase").cast("int")
    pred_a = (F.col("value") > 50).cast("int")
    pred_b = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 2, 1), 16, 10)
        .cast("long")
        % 2
    ).cast("int")
    marked = ev.select(
        (pred_a == truth).cast("int").alias("a_ok"),
        (pred_b == truth).cast("int").alias("b_ok"),
    )
    counts = marked.groupBy().agg(
        F.sum(F.when((F.col("a_ok") == 1) & (F.col("b_ok") == 0), 1).otherwise(0)).alias("b_disc"),
        F.sum(F.when((F.col("a_ok") == 0) & (F.col("b_ok") == 1), 1).otherwise(0)).alias("c_disc"),
        F.count(F.lit(1)).alias("n"),
    )
    return counts.select(
        "n",
        F.col("b_disc").cast("long").alias("a_only_correct"),
        F.col("c_disc").cast("long").alias("b_only_correct"),
        F.round(
            (F.abs(F.col("b_disc") - F.col("c_disc")) - 1)
            * (F.abs(F.col("b_disc") - F.col("c_disc")) - 1)
            / (F.col("b_disc") + F.col("c_disc")).cast("double"),
            6,
        ).alias("mcnemar_chi2"),
    )


Q_MCNEMAR_SQL = """
WITH marked AS (
  SELECT CASE WHEN (CASE WHEN value > 50 THEN 1 ELSE 0 END)
              = (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         THEN 1 ELSE 0 END AS a_ok,
         CASE WHEN (('0x' || substring(md5(CAST(event_id AS VARCHAR)), 2, 1))::BIGINT % 2)
              = (CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
         THEN 1 ELSE 0 END AS b_ok
  FROM events),
counts AS (
  SELECT CAST(SUM(CASE WHEN a_ok = 1 AND b_ok = 0 THEN 1 ELSE 0 END) AS BIGINT) AS b_disc,
         CAST(SUM(CASE WHEN a_ok = 0 AND b_ok = 1 THEN 1 ELSE 0 END) AS BIGINT) AS c_disc,
         COUNT(*) AS n
  FROM marked)
SELECT n, b_disc AS a_only_correct, c_disc AS b_only_correct,
       ROUND((ABS(b_disc - c_disc) - 1) * (ABS(b_disc - c_disc) - 1)
             / CAST(b_disc + c_disc AS DOUBLE), 6) AS mcnemar_chi2
FROM counts
"""

QUERIES["q_mcnemar_paired"] = QuerySpec(
    q_mcnemar_paired,
    Q_MCNEMAR_SQL,
    "McNemar's paired test (continuity-corrected) comparing two rules on "
    "the same rows: integer discordant-pair counts, one 1-row aggregate",
)


# ----------------------------- SQL scripting block
# Spark 4.1's SQL scripting (BEGIN ... END compound statements with
# DECLARE'd local variables, SET, and control flow) — the procedural
# dialect for warehouse migrations. The script computes a threshold
# into a local variable and returns the aggregate filtered by it; the
# oracle inlines the same logic. Gated: if the scripting parser is
# absent (flag or build without it), fall back to the equivalent
# two-statement session-variable form so the query keeps one plan
# shape either way.


def q_sql_scripting(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("orders_script_v")
    script = """
    BEGIN
      DECLARE cut DOUBLE;
      SET cut = (SELECT ROUND(AVG(o_totalprice), 2) FROM orders_script_v);
      SELECT o_orderpriority AS priority, COUNT(*) AS n_above,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
      FROM orders_script_v WHERE o_totalprice > cut
      GROUP BY o_orderpriority ORDER BY priority;
    END
    """
    try:
        return spark.sql(script)
    except Exception:
        # scripting parser unavailable: same computation via session
        # variables (q_sql_variables pins that surface independently)
        spark.sql("DECLARE OR REPLACE VARIABLE cut DOUBLE")
        spark.sql(
            "SET VAR cut = (SELECT ROUND(AVG(o_totalprice), 2) FROM orders_script_v)"
        )
        return spark.sql(
            """
            SELECT o_orderpriority AS priority, COUNT(*) AS n_above,
                   CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
            FROM orders_script_v WHERE o_totalprice > cut
            GROUP BY o_orderpriority ORDER BY priority
            """
        )


Q_SCRIPT_SQL = """
SELECT o_orderpriority AS priority, COUNT(*) AS n_above,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS price_sum
FROM orders
WHERE o_totalprice > (SELECT ROUND(AVG(o_totalprice), 2) FROM orders)
GROUP BY o_orderpriority
ORDER BY priority
"""

QUERIES["q_sql_scripting"] = QuerySpec(
    q_sql_scripting,
    Q_SCRIPT_SQL,
    "Spark 4.1 SQL scripting: BEGIN..END block with a DECLAREd local "
    "variable and SET from a scalar subquery (session-variable fallback)",
)
