"""Round-10 surface extensions, batch DQ (SURVEY §2.3 N r10): the
percentile-semantics pin block — percent_rank + cume_dist (the two
normalized ranks whose off-by-one conventions differ across engines:
(rank-1)/(n-1) vs count(<=)/n, pinned on user-partitioned windows),
PERCENTILE_CONT vs PERCENTILE_DISC quartiles per group (linear
interpolation vs witness-row pick — the quartile-report corner), and
the rolling window median (exact percentile as a WINDOW function over
a 7-row frame — the robust moving average). Completes §2.3 E/H next to
q_percentiles / q_window_ranks / q_quantile_bands.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: inputs are integer cents; windows fully ordered by
unique keys; interpolated quantiles are exact halves of integers.
Scale: partitioned windows only; row-level outputs sample 1-in-50
keys then LIMIT with total tiebreaks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_percent_rank_cume_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_prv")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
               ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cume,
               NTILE(4) OVER w AS quartile
        FROM orders_prv
        WHERE o_custkey % 50 = 0
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY ROUND(o_totalprice * 100, 0), o_orderkey)
        ORDER BY o_custkey, o_orderkey
        LIMIT 200
        """
    )


Q_PRCD_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
       ROUND(PERCENT_RANK() OVER w, 6) AS pct_rank,
       ROUND(CUME_DIST() OVER w, 6) AS cume,
       NTILE(4) OVER w AS quartile
FROM orders
WHERE o_custkey % 50 = 0
WINDOW w AS (PARTITION BY o_custkey
             ORDER BY ROUND(o_totalprice * 100, 0), o_orderkey)
ORDER BY o_custkey, o_orderkey
LIMIT 200
"""

QUERIES["q_percent_rank_cume_dist"] = QuerySpec(
    q_percent_rank_cume_dist,
    Q_PRCD_SQL,
    "percent_rank / cume_dist / ntile(4) pins on user-partitioned "
    "windows — normalized-rank conventions agree byte-for-byte",
)


def q_percentile_cont_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"),
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("cents"),
    )
    orders.createOrReplaceTempView("orders_pcd")
    return spark.sql(
        """
        SELECT grp,
               ROUND(percentile_cont(0.25) WITHIN GROUP (ORDER BY cents) / 100.0,
                     4) AS q1_cont,
               ROUND(percentile_cont(0.5) WITHIN GROUP (ORDER BY cents) / 100.0,
                     4) AS median_cont,
               ROUND(percentile_cont(0.75) WITHIN GROUP (ORDER BY cents) / 100.0,
                     4) AS q3_cont,
               ROUND(percentile_disc(0.5) WITHIN GROUP (ORDER BY cents) / 100.0,
                     4) AS median_disc
        FROM orders_pcd
        GROUP BY grp
        ORDER BY grp
        """
    )


Q_PCD_SQL = """
SELECT o_orderpriority AS grp,
       ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.25)
             / 100.0, 4) AS q1_cont,
       ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.5)
             / 100.0, 4) AS median_cont,
       ROUND(quantile_cont(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.75)
             / 100.0, 4) AS q3_cont,
       ROUND(quantile_disc(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT), 0.5)
             / 100.0, 4) AS median_disc
FROM orders
GROUP BY 1 ORDER BY grp
"""

QUERIES["q_percentile_cont_disc"] = QuerySpec(
    q_percentile_cont_disc,
    Q_PCD_SQL,
    "PERCENTILE_CONT vs DISC quartiles per priority — interpolation "
    "vs witness-row semantics pinned",
)


def q_rolling_median_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rmv")
    # Spark refuses median() with a window frame — emulate the exact
    # frame median via a sorted frame array (even case averages the two
    # middles, matching DuckDB's windowed median())
    return spark.sql(
        """
        WITH framed AS (
          SELECT o_custkey, o_orderkey,
                 CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
                 sort_array(collect_list(CAST(ROUND(o_totalprice * 100, 0)
                                              AS BIGINT))
                   OVER (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)) AS arr
          FROM orders_rmv
          WHERE o_custkey % 50 = 0)
        SELECT o_custkey, o_orderkey, cents,
               ROUND(CASE WHEN size(arr) % 2 = 1
                          THEN CAST(element_at(arr, CAST((size(arr) + 1) DIV 2 AS INT))
                                    AS DOUBLE)
                          ELSE (element_at(arr, CAST(size(arr) DIV 2 AS INT))
                                + element_at(arr, CAST(size(arr) DIV 2 + 1 AS INT))) / 2.0
                     END / 100.0, 4) AS rolling_median_7
        FROM framed
        ORDER BY o_custkey, o_orderkey
        LIMIT 200
        """
    )


Q_RMED_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
       ROUND(median(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT))
             OVER (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey
                   ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) / 100.0, 4)
           AS rolling_median_7
FROM orders
WHERE o_custkey % 50 = 0
ORDER BY o_custkey, o_orderkey
LIMIT 200
"""

QUERIES["q_rolling_median_window"] = QuerySpec(
    q_rolling_median_window,
    Q_RMED_SQL,
    "exact rolling median over a 7-row frame as a window aggregate — "
    "user-partitioned, the robust moving average",
)
