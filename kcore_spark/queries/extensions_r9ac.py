"""Round-9 surface extensions, batch AC (SURVEY §2.3 N r9): pinball
(quantile) loss of the seasonal-naive forecaster — the probabilistic-
forecast eval that q_seasonal_mase (point) and q_conformal_intervals
(coverage) bracket — and the malformed-CSV handling surface
(PERMISSIVE + columnNameOfCorruptRecord vs DROPMALFORMED row
accounting over a deterministically corrupted staging file).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------------- pinball (quantile) loss, seasonal naive
# For q ∈ {0.1, 0.5, 0.9}: L_q = mean over hours of
# max(q·(y−f), (q−1)·(y−f)) with f = the value 24 hours earlier (the
# seasonal-naive forecaster q_seasonal_mase scores with MAE). The
# 3-quantile grid is a broadcast fan-out over the lagged curve.


def q_pinball_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    hourly = ev.groupBy(F.date_trunc("hour", F.col("ts")).alias("h")).agg(
        F.count(F.lit(1)).alias("y")
    )
    w = Window.orderBy("h")
    lagged = hourly.withColumn("f", F.lag("y", 24).over(w)).where(
        F.col("f").isNotNull()
    )
    qs = spark.createDataFrame([(0.1,), (0.5,), (0.9,)], "q double")
    fanned = lagged.crossJoin(F.broadcast(qs)).select(
        "q",
        F.greatest(
            F.col("q") * (F.col("y") - F.col("f")),
            (F.col("q") - 1.0) * (F.col("y") - F.col("f")),
        ).alias("loss"),
    )
    return (
        fanned.groupBy("q")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_hours"),
            F.round(F.avg("loss"), 6).alias("pinball_loss"),
        )
        .orderBy("q")
    )


Q_PINBALL_SQL = """
WITH hourly AS (
  SELECT date_trunc('hour', CAST(ts AS TIMESTAMP)) AS h, COUNT(*) AS y
  FROM events GROUP BY h),
lagged AS (
  SELECT y, LAG(y, 24) OVER (ORDER BY h) AS f FROM hourly),
qs AS (SELECT unnest([0.1, 0.5, 0.9]) AS q)
SELECT q, CAST(COUNT(*) AS BIGINT) AS n_hours,
       ROUND(AVG(GREATEST(q * (y - f), (q - 1.0) * (y - f))), 6) AS pinball_loss
FROM lagged CROSS JOIN qs
WHERE f IS NOT NULL
GROUP BY q
ORDER BY q
"""

QUERIES["q_pinball_loss"] = QuerySpec(
    q_pinball_loss,
    Q_PINBALL_SQL,
    "pinball (quantile) loss of the seasonal-naive hourly forecaster "
    "at q ∈ {0.1, 0.5, 0.9} — the probabilistic forecast eval",
)


# ---------------------------- malformed-CSV handling surface
# A staged CSV where every 13th row is corrupted (a non-numeric key
# column). PERMISSIVE mode keeps the row with the raw text in
# _corrupt_record; DROPMALFORMED silently drops it. The query pins
# BOTH modes' row accounting — the source-robustness contract
# q_events_corrupt_json pins for JSON. Scale: a CSV scan is
# splittable; mode handling is per-row, no shuffle added.

_CSV_STAGED: dict[str, str] = {}


def _stage_bad_csv(spark: SparkSession, sf_dir: str) -> str:
    if sf_dir in _CSV_STAGED:
        return _CSV_STAGED[sf_dir]
    d = tempfile.mkdtemp(prefix="kcore_bad_csv_")
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    lines = orders.select(
        F.when(
            F.col("o_orderkey") % 13 == 0,
            F.concat(F.lit("CORRUPT_"), F.col("o_orderkey").cast("string"), F.lit(",x")),
        )
        .otherwise(
            F.concat_ws(
                ",",
                F.col("o_orderkey").cast("string"),
                F.col("o_custkey").cast("string"),
                F.col("o_totalprice").cast("string"),
            )
        )
        .alias("value")
    )
    lines.coalesce(1).write.mode("overwrite").text(os.path.join(d, "csv"))
    _CSV_STAGED[sf_dir] = d
    return d


def q_csv_malformed(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _stage_bad_csv(spark, sf_dir)
    path = os.path.join(d, "csv")
    schema = "o_orderkey long, o_custkey long, o_totalprice double, _corrupt_record string"
    permissive = (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .csv(path)
    )
    # cache: Spark requires referencing _corrupt_record only on a
    # materialized frame (the raw-record column cannot be pushed)
    permissive = permissive.cache()
    perm = permissive.agg(
        F.count(F.lit(1)).alias("rows_permissive"),
        F.sum(F.col("_corrupt_record").isNotNull().cast("int")).alias("corrupt_rows"),
        F.sum("o_orderkey").alias("key_sum_clean"),
    )
    # a bare count() on a CSV scan SKIPS parsing entirely (the
    # count-without-parse shortcut), so DROPMALFORMED never fires and
    # the count silently includes malformed rows (measured: 15000 vs
    # the true 13846). Referencing every schema column forces the full
    # parse — the pitfall this query exists to pin.
    dropped = (
        spark.read.schema("o_orderkey long, o_custkey long, o_totalprice double")
        .option("mode", "DROPMALFORMED")
        .csv(path)
        .agg(
            # count(col), NOT count(*): the bare count compiles to the
            # parse-free CSV count shortcut where DROPMALFORMED never
            # fires (measured 15000 vs true 13846); counting a REAL
            # column forces the parse, and the corruption lives in
            # this very column, so the malformed rows drop. x*0
            # padding tricks don't survive constant folding — this is
            # the one reliable form.
            F.count("o_orderkey").alias("rows_dropmalformed"),
        )
    )
    out = perm.crossJoin(dropped).select(
        F.col("rows_permissive").cast("long").alias("rows_permissive"),
        F.col("corrupt_rows").cast("long").alias("corrupt_rows"),
        F.col("rows_dropmalformed").cast("long").alias("rows_dropmalformed"),
        F.col("key_sum_clean").cast("long").alias("key_sum_clean"),
    )
    res = out.localCheckpoint()
    permissive.unpersist()
    return res


Q_CSV_MALFORMED_SQL = """
WITH stats AS (
  SELECT COUNT(*) AS total,
         SUM(CASE WHEN o_orderkey % 13 = 0 THEN 1 ELSE 0 END) AS corrupt,
         SUM(CASE WHEN o_orderkey % 13 <> 0 THEN o_orderkey END) AS key_sum
  FROM orders)
SELECT CAST(total AS BIGINT) AS rows_permissive,
       CAST(corrupt AS BIGINT) AS corrupt_rows,
       CAST(total - corrupt AS BIGINT) AS rows_dropmalformed,
       CAST(key_sum AS BIGINT) AS key_sum_clean
FROM stats
"""

QUERIES["q_csv_malformed"] = QuerySpec(
    q_csv_malformed,
    Q_CSV_MALFORMED_SQL,
    "malformed-CSV contract: PERMISSIVE _corrupt_record accounting vs "
    "DROPMALFORMED row loss over a deterministically corrupted file",
)
