"""Round-10 surface extensions, batch CR (SURVEY §2.3 N r10): the
window-dialect block — three SQL-surface pins both engines must parse
AND evaluate identically. The WINDOW clause (one named, shared window
definition referenced by several functions — the dedup-your-OVER
surface), the IGNORE NULLS family (lag / lead / first_value /
last_value / nth_value skipping nulls: the gap-fill idiom), and a
frame-bounds matrix (shifted past/future ROWS frames plus an
unbounded-following sum in ONE select — the frame grammar corners
q_window_running_totals / q_window_time_range don't touch).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: every window is fully ordered by a unique key; sampled
row-level outputs are keyed and LIMITed with total tiebreaks; sums are
integer cents.
Scale: all windows are PARTITIONED by customer/user; the row-level
outputs sample one key in 50 before the limit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def q_named_window_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_winv")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey,
               RANK() OVER w AS rk,
               CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER w
                    AS BIGINT) AS run_cents,
               LAG(o_orderkey) OVER w AS prev_key
        FROM orders_winv
        WINDOW w AS (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey)
        ORDER BY o_custkey, o_orderkey
        LIMIT 100
        """
    )


Q_NAMED_WIN_SQL = """
SELECT o_custkey, o_orderkey,
       RANK() OVER w AS rk,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) OVER w
            AS BIGINT) AS run_cents,
       LAG(o_orderkey) OVER w AS prev_key
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
ORDER BY o_custkey, o_orderkey
LIMIT 100
"""

QUERIES["q_named_window_clause"] = QuerySpec(
    q_named_window_clause,
    Q_NAMED_WIN_SQL,
    "WINDOW clause pin: one named window shared by rank/sum/lag — "
    "identical resolution in both dialects",
)


def q_ignore_nulls_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    normalize_event_ts(load_table(spark, sf_dir, "events")).createOrReplaceTempView(
        "events_inv"
    )
    return spark.sql(
        """
        WITH ev AS (
          SELECT user_id, event_id,
                 unix_timestamp(ts) AS t,
                 CASE WHEN event_type = 'error' THEN NULL
                      ELSE CAST(ROUND(value * 10000, 0) AS BIGINT) END AS v
          FROM events_inv
          WHERE user_id % 50 = 0),
        x AS (
          SELECT user_id, event_id, v,
                 LAG(v) IGNORE NULLS OVER w AS prev_nn,
                 LEAD(v) IGNORE NULLS OVER w AS next_nn,
                 FIRST_VALUE(v) IGNORE NULLS OVER w AS first_nn,
                 LAST_VALUE(v) IGNORE NULLS OVER
                   (PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS filled_v,
                 NTH_VALUE(v, 2) IGNORE NULLS OVER w AS second_nn
          FROM ev
          WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
        SELECT user_id, event_id, v, prev_nn, next_nn, first_nn,
               filled_v, second_nn
        FROM x
        ORDER BY user_id, event_id
        LIMIT 200
        """
    )


Q_IGNORE_NULLS_SQL = """
WITH ev AS (
  SELECT user_id, event_id,
         epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS t,
         CASE WHEN event_type = 'error' THEN NULL
              ELSE CAST(ROUND(value * 10000, 0) AS BIGINT) END AS v
  FROM events
  WHERE user_id % 50 = 0),
x AS (
  SELECT user_id, event_id, v,
         LAG(v IGNORE NULLS) OVER w AS prev_nn,
         LEAD(v IGNORE NULLS) OVER w AS next_nn,
         FIRST_VALUE(v IGNORE NULLS) OVER w AS first_nn,
         LAST_VALUE(v IGNORE NULLS) OVER
           (PARTITION BY user_id ORDER BY t, event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_v,
         NTH_VALUE(v, 2 IGNORE NULLS) OVER w AS second_nn
  FROM ev
  WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id))
SELECT user_id, event_id, v, prev_nn, next_nn, first_nn,
       filled_v, second_nn
FROM x
ORDER BY user_id, event_id
LIMIT 200
"""

QUERIES["q_ignore_nulls_family"] = QuerySpec(
    q_ignore_nulls_family,
    Q_IGNORE_NULLS_SQL,
    "IGNORE NULLS pin across lag/lead/first/last/nth_value — the "
    "gap-fill idiom, user-partitioned windows",
)


def q_frame_bounds_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_fbv")
    return spark.sql(
        """
        WITH o AS (
          SELECT o_custkey, o_orderkey,
                 CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
          FROM orders_fbv
          WHERE o_custkey % 50 = 0),
        x AS (
          SELECT o_custkey, o_orderkey, cents,
                 CAST(SUM(cents) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS BIGINT)
                   AS past_two,
                 CAST(SUM(cents) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS BIGINT)
                   AS next_two,
                 CAST(SUM(cents) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
                    AS BIGINT) AS tail_sum,
                 CAST(COUNT(*) OVER
                   (PARTITION BY o_custkey ORDER BY o_orderkey
                    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT)
                   AS win5_n
          FROM o)
        SELECT * FROM x ORDER BY o_custkey, o_orderkey LIMIT 200
        """
    )


Q_FRAME_MATRIX_SQL = """
WITH o AS (
  SELECT o_custkey, o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
  WHERE o_custkey % 50 = 0),
x AS (
  SELECT o_custkey, o_orderkey, cents,
         CAST(SUM(cents) OVER
           (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING) AS BIGINT) AS past_two,
         CAST(SUM(cents) OVER
           (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING) AS BIGINT) AS next_two,
         CAST(SUM(cents) OVER
           (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS BIGINT)
           AS tail_sum,
         CAST(COUNT(*) OVER
           (PARTITION BY o_custkey ORDER BY o_orderkey
            ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING) AS BIGINT) AS win5_n
  FROM o)
SELECT * FROM x ORDER BY o_custkey, o_orderkey LIMIT 200
"""

QUERIES["q_frame_bounds_matrix"] = QuerySpec(
    q_frame_bounds_matrix,
    Q_FRAME_MATRIX_SQL,
    "frame-grammar pin: shifted past/future ROWS frames + tail sum + "
    "centered count in one select — customer-partitioned",
)
