"""Round-9 surface extensions, batch M (SURVEY §2.3 N r9): the
nearest-neighbor temporal join (bidirectional — the as-of family's
missing member: q_asof_event_order looks BACKWARD only), the
parse_url scalar surface (host/path/query extraction), and Box-Cox
transform selection by profile log-likelihood over a λ grid.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------- nearest-event temporal join (bidirectional)
# For every purchase, the NEAREST error event of the same user in
# either time direction (as-of = backward only; "nearest" needs both).
# Implemented WITHOUT a join: one user-partitioned window pass with
# IGNORE NULLS last_value (backward error ts) and first_value
# (forward), then pick the smaller gap, ties to the earlier event.
# Scale: no join state at all — a single shuffle on user_id and two
# ordered window frames; the classic range-join formulation would
# shuffle both sides AND hold interval state.


def q_nearest_event_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_timestamp("ts").alias("t"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    err_t = F.when(F.col("event_type") == "error", F.col("t"))
    marked = ev.select(
        "user_id",
        "event_id",
        "event_type",
        "t",
        F.last(err_t, ignorenulls=True)
        .over(w.rowsBetween(Window.unboundedPreceding, -1))
        .alias("prev_err"),
        F.first(err_t, ignorenulls=True)
        .over(w.rowsBetween(1, Window.unboundedFollowing))
        .alias("next_err"),
    )
    purchases = marked.where(F.col("event_type") == "purchase")
    back_gap = F.col("t") - F.col("prev_err")
    fwd_gap = F.col("next_err") - F.col("t")
    nearest = purchases.select(
        "user_id",
        F.when(F.col("prev_err").isNull(), fwd_gap)
        .when(F.col("next_err").isNull(), back_gap)
        .when(back_gap <= fwd_gap, back_gap)  # tie → earlier (backward)
        .otherwise(fwd_gap)
        .alias("gap_s"),
    ).where(F.col("gap_s").isNotNull())
    return (
        nearest.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_purchases"),
            F.min("gap_s").cast("long").alias("min_gap_s"),
            F.round(F.avg("gap_s"), 2).alias("avg_gap_s"),
        )
        .orderBy("user_id")
    )


Q_NEAREST_SQL = """
WITH ev AS (
  SELECT user_id, event_id, event_type,
         CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t
  FROM events),
marked AS (
  SELECT user_id, event_id, event_type, t,
         LAST_VALUE(CASE WHEN event_type = 'error' THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_err,
         FIRST_VALUE(CASE WHEN event_type = 'error' THEN t END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY t, event_id
                 ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS next_err
  FROM ev),
nearest AS (
  SELECT user_id,
         CASE WHEN prev_err IS NULL THEN next_err - t
              WHEN next_err IS NULL THEN t - prev_err
              WHEN t - prev_err <= next_err - t THEN t - prev_err
              ELSE next_err - t END AS gap_s
  FROM marked WHERE event_type = 'purchase')
SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(MIN(gap_s) AS BIGINT) AS min_gap_s,
       ROUND(AVG(gap_s), 2) AS avg_gap_s
FROM nearest WHERE gap_s IS NOT NULL
GROUP BY user_id
ORDER BY user_id
"""

QUERIES["q_nearest_event_join"] = QuerySpec(
    q_nearest_event_join,
    Q_NEAREST_SQL,
    "nearest-event temporal join (bidirectional as-of) via IGNORE "
    "NULLS window frames — one shuffle, zero join state",
)


# ------------------------------------- parse_url scalar surface
# URL decomposition (protocol/host/path/query-param) over URLs
# synthesized deterministically from document metadata — the log-
# analytics scalar family (SURVEY §2.3 H covers strings/dates/JSON;
# URLs were the missing decomposer). The oracle recomputes the parts
# with regexes since the oracle dialect has no parse_url.


def q_url_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "lang")
    urls = docs.select(
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v=2"),
        ).alias("url")
    )
    parsed = urls.select(
        F.parse_url(F.col("url"), F.lit("HOST")).alias("host"),
        F.parse_url(F.col("url"), F.lit("QUERY"), F.lit("lang")).alias("lang_param"),
    )
    return (
        parsed.groupBy("host", "lang_param")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .orderBy("host", "lang_param")
    )


Q_URL_SQL = """
WITH urls AS (
  SELECT 'https://' || source || '.example.com/docs/' || CAST(doc_id AS VARCHAR)
         || '?lang=' || lang || '&v=2' AS url
  FROM documents)
SELECT regexp_extract(url, 'https://([^/]+)/', 1) AS host,
       regexp_extract(url, '[?&]lang=([^&]*)', 1) AS lang_param,
       CAST(COUNT(*) AS BIGINT) AS n
FROM urls
GROUP BY 1, 2
ORDER BY host, lang_param
"""

QUERIES["q_url_funcs"] = QuerySpec(
    q_url_funcs,
    Q_URL_SQL,
    "parse_url scalar surface: HOST + QUERY-param extraction over "
    "synthesized URLs, grouped — the log-analytics decomposer",
)


# -------------------------- Box-Cox λ selection (profile likelihood)
# LL(λ) = −n/2·ln(σ̂²_λ) + (λ−1)·Σ ln x over the standard λ grid —
# picks the variance-stabilizing power transform for a positive
# metric. One scan computes every λ's moments simultaneously (the
# grid is a column fan-out, not extra passes); the argmax rides a
# 5-row window. Float sums are order-dependent → ll rounded to 4.

_BC_GRID = [-1.0, -0.5, 0.0, 0.5, 1.0]


def q_box_cox(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_totalprice").alias("x")
    )
    aggs = [F.count(F.lit(1)).alias("n"), F.sum(F.log("x")).alias("slx")]
    for i, lam in enumerate(_BC_GRID):
        y = (
            F.log("x")
            if lam == 0.0
            else (F.pow(F.col("x"), F.lit(lam)) - 1.0) / F.lit(lam)
        )
        aggs += [F.sum(y).alias(f"s{i}"), F.sum(y * y).alias(f"q{i}")]
    m = orders.agg(*aggs)
    rows = None
    for i, lam in enumerate(_BC_GRID):
        var = F.col(f"q{i}") / F.col("n") - (F.col(f"s{i}") / F.col("n")) * (
            F.col(f"s{i}") / F.col("n")
        )
        ll = (
            -F.col("n") / 2.0 * F.log(var)
            + (F.lit(lam) - 1.0) * F.col("slx")
        )
        r = m.select(
            F.lit(lam).alias("lam"), F.round(ll, 4).alias("log_likelihood")
        )
        rows = r if rows is None else rows.unionByName(r)
    w = Window.orderBy(F.lit(1))
    return rows.withColumn(
        "is_best",
        (F.col("log_likelihood") == F.max("log_likelihood").over(w)).cast("int"),
    ).orderBy("lam")


def _bc_sql() -> str:
    def y_expr(lam: float) -> str:
        return "LN(x)" if lam == 0.0 else f"(POW(x, {lam}) - 1.0) / {lam}"

    moments = ", ".join(
        f"SUM({y_expr(lam)}) AS s{i}, SUM({y_expr(lam)} * {y_expr(lam)}) AS q{i}"
        for i, lam in enumerate(_BC_GRID)
    )
    union = " UNION ALL ".join(
        f"SELECT CAST({lam} AS DOUBLE) AS lam, "
        f"ROUND(-n / 2.0 * LN(q{i} / n - (s{i} / n) * (s{i} / n)) "
        f"+ ({lam} - 1.0) * slx, 4) AS log_likelihood FROM m"
        for i, lam in enumerate(_BC_GRID)
    )
    return f"""
WITH src AS (SELECT o_totalprice AS x FROM orders),
m AS (SELECT COUNT(*) AS n, SUM(LN(x)) AS slx, {moments} FROM src),
grid AS ({union})
SELECT lam, log_likelihood,
       CASE WHEN log_likelihood = MAX(log_likelihood) OVER () THEN 1 ELSE 0 END
         AS is_best
FROM grid
ORDER BY lam
"""


Q_BOX_COX_SQL = _bc_sql()

QUERIES["q_box_cox"] = QuerySpec(
    q_box_cox,
    Q_BOX_COX_SQL,
    "Box-Cox λ selection by profile log-likelihood over the standard "
    "grid — one scan computes every λ's moments as a column fan-out",
)
