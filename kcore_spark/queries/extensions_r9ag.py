"""Round-9 surface extensions, batch AG (SURVEY §2.3 N r9): the
time-weighted average (TWAP — each observation weighted by how long
it REMAINED current, the correct mean for irregularly-sampled state)
and budgeted greedy selection (maximize quality under a token budget
by quality-density ranking + running-sum cutoff — the data-selection
step when the training budget is fixed).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------- time-weighted average (TWAP)
# Per event type: Σ(value·Δt)/ΣΔt with Δt = seconds until the type's
# next event — the irregular-sampling mean (a value that persisted
# 10× longer counts 10× more; the plain AVG q_agg_extras computes
# treats them equally). One lead() per type partition; last
# observation per type carries no interval (standard convention).


def q_twap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "event_type", F.unix_timestamp("ts").alias("t"), "value", "event_id"
    )
    w = Window.partitionBy("event_type").orderBy("t", "event_id")
    spans = ev.withColumn("dt", F.lead("t").over(w) - F.col("t")).where(
        F.col("dt").isNotNull() & (F.col("dt") > 0)
    )
    return (
        spans.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_spans"),
            F.round(
                F.sum(F.col("value") * F.col("dt")) / F.sum("dt"), 6
            ).alias("twap"),
            F.round(F.avg("value"), 6).alias("plain_avg"),
        )
        .orderBy("event_type")
    )


Q_TWAP_SQL = """
WITH ev AS (
  SELECT event_type, CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS t,
         value, event_id
  FROM events),
spans AS (
  SELECT event_type, value,
         LEAD(t) OVER (PARTITION BY event_type ORDER BY t, event_id) - t AS dt
  FROM ev)
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_spans,
       ROUND(SUM(value * dt) / SUM(dt), 6) AS twap,
       ROUND(AVG(value), 6) AS plain_avg
FROM spans
WHERE dt IS NOT NULL AND dt > 0
GROUP BY event_type
ORDER BY event_type
"""

QUERIES["q_twap"] = QuerySpec(
    q_twap,
    Q_TWAP_SQL,
    "time-weighted average per event type (Δt-weighted vs plain mean) "
    "— the irregular-sampling correction, one lead() per partition",
)


# --------------------- budgeted greedy selection (data curation)
# Select documents maximizing quality density (distinct-word ratio /
# chars) under a fixed character budget: rank by density, take while
# the running char sum stays under budget — the classic greedy
# knapsack relaxation every budget-bound curation run uses. The
# running sum is the distributed prefix-sum (_dist_cumsum,
# extensions_r8.py) — range-repartitioned, parallel per partition —
# so the plan survives a corpus-sized input; output is the selection
# SUMMARY (count/chars/quality), curve-sized.

_SELECT_BUDGET = 200_000  # characters


def q_budgeted_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.lower(F.col("text")).alias("t"),
    )
    words = F.split(F.col("t"), " ")
    scored = docs.select(
        "doc_id",
        "n_chars",
        F.round(
            F.size(F.array_distinct(words)) / F.size(words), 10
        ).alias("quality"),
    )
    # global running char sum over (quality desc, doc_id) via the
    # distributed prefix-sum machinery (_dist_cumsum: range-repartition
    # + per-partition running sums + broadcast partition offsets) —
    # no single-partition window over the corpus-sized table.
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    ranked = _dist_cumsum(
        scored,
        [(-F.col("quality")), F.col("doc_id")],
        "n_chars",
        out_col="cum_chars",
    )
    selected = ranked.where(F.col("cum_chars") <= _SELECT_BUDGET)
    return selected.agg(
        F.count(F.lit(1)).cast("long").alias("n_selected"),
        F.sum("n_chars").cast("long").alias("chars_used"),
        F.round(F.avg("quality"), 6).alias("avg_quality_selected"),
        F.min(F.round(F.col("quality"), 6)).alias("quality_cutoff"),
    )


Q_BUDGET_SQL = f"""
WITH scored AS (
  SELECT doc_id, n_chars,
         ROUND(len(list_distinct(string_split(lower(text), ' '))) * 1.0
               / len(string_split(lower(text), ' ')), 10) AS quality
  FROM documents),
ranked AS (
  SELECT *, SUM(n_chars) OVER (ORDER BY quality DESC, doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_chars
  FROM scored)
SELECT CAST(COUNT(*) AS BIGINT) AS n_selected,
       CAST(SUM(n_chars) AS BIGINT) AS chars_used,
       ROUND(AVG(quality), 6) AS avg_quality_selected,
       MIN(ROUND(quality, 6)) AS quality_cutoff
FROM ranked WHERE cum_chars <= {_SELECT_BUDGET}
"""

QUERIES["q_budgeted_selection"] = QuerySpec(
    q_budgeted_selection,
    Q_BUDGET_SQL,
    "budgeted greedy selection: top quality-density docs under a "
    "character budget (rank + running-sum cutoff) — data curation "
    "under a fixed training budget",
)
