"""Round-10 surface extensions, batch AK (SURVEY §2.3 N r10): the
modern-SQL-surface pins — GROUP BY ALL / ORDER BY ALL resolution
(both dialects must pick the same non-aggregate grouping set), the
try_* arithmetic family (NULL-on-error semantics: division by zero,
bigint overflow, bad casts — pinned against an oracle that spells
the NULL cases out), and the IDENTIFIER() clause (parameterized
table/column names — SQL-injection-safe dynamic SQL).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: count/decimal-sum aggregates only.
Scale: single grouped scans; the pins cost nothing at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F  # noqa: F401  (parity with sibling batches)

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------- GROUP BY ALL / ORDER BY ALL
# Spark resolves ALL to every SELECT item that contains no aggregate;
# DuckDB does the same. The query mixes plain columns, a computed
# non-aggregate expression, and aggregates — if either engine resolved
# ALL differently the shapes would diverge, so a hash match IS the pin.


def q_group_by_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gba_v")
    return spark.sql(
        """
        SELECT o_orderstatus,
               substring(o_orderpriority, 1, 1) AS prio_code,
               COUNT(*) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
        FROM orders_gba_v
        GROUP BY ALL
        ORDER BY ALL
        """
    )


Q_GBA_SQL = """
SELECT o_orderstatus,
       substring(o_orderpriority, 1, 1) AS prio_code,
       COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS total
FROM orders
GROUP BY ALL
ORDER BY ALL
"""

QUERIES["q_group_by_all"] = QuerySpec(
    q_group_by_all,
    Q_GBA_SQL,
    "GROUP BY ALL + ORDER BY ALL resolution pin — both dialects must "
    "derive the same grouping set from the SELECT list",
)


# --------------------------------------------------- try_* arithmetic
# Spark's try_divide/try_multiply/try_cast return NULL instead of
# raising. The oracle spells out every NULL case explicitly (DuckDB's
# own /0 is NULL, its overflow RAISES), so the row-level agreement
# pins the semantics, not the accident of a shared default.


def q_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("li_try_v")
    return spark.sql(
        """
        SELECT
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(COUNT(try_divide(l_extendedprice,
                                CAST(l_quantity AS INT) % 7)) AS BIGINT)
              AS div_defined,
          CAST(SUM(CASE WHEN try_divide(l_extendedprice,
                                        CAST(l_quantity AS INT) % 7) IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS div_nulls,
          CAST(COUNT(try_multiply(CAST(l_orderkey AS BIGINT),
                                  CAST(4611686018427387904 AS BIGINT))) AS BIGINT)
              AS mul_defined,
          CAST(COUNT(try_cast(substring(l_returnflag, 1, 1) AS INT)) AS BIGINT)
              AS cast_defined
        FROM li_try_v
        """
    )


Q_TRY_SQL = """
SELECT
  CAST(COUNT(*) AS BIGINT) AS n,
  CAST(COUNT(CASE WHEN CAST(l_quantity AS INT) % 7 = 0 THEN NULL
                  ELSE l_extendedprice / (CAST(l_quantity AS INT) % 7) END)
       AS BIGINT) AS div_defined,
  CAST(SUM(CASE WHEN CAST(l_quantity AS INT) % 7 = 0 THEN 1 ELSE 0 END)
       AS BIGINT) AS div_nulls,
  CAST(COUNT(CASE WHEN l_orderkey >= 2 THEN NULL ELSE 1 END)
       AS BIGINT) AS mul_defined,
  CAST(COUNT(TRY_CAST(substring(l_returnflag, 1, 1) AS INT)) AS BIGINT)
      AS cast_defined
FROM lineitem
"""

QUERIES["q_try_arithmetic"] = QuerySpec(
    q_try_arithmetic,
    Q_TRY_SQL,
    "try_divide/try_multiply/try_cast NULL-on-error pin — oracle "
    "spells out the NULL cases (div/0, bigint overflow, bad cast)",
)


# ------------------------------------------------- IDENTIFIER() clause
# Table and column names arrive as string parameters — the
# SQL-injection-safe dynamic-SQL surface. The oracle is the same
# query with the names inlined.


def q_identifier_clause(spark: SparkSession, sf_dir: str) -> DataFrame:
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("cust_ident_v")
    return spark.sql(
        """
        SELECT IDENTIFIER(:grp) AS segment,
               COUNT(*) AS n,
               CAST(SUM(CAST(IDENTIFIER(:val) AS DECIMAL(15,2))) AS DOUBLE)
                   AS total_bal
        FROM IDENTIFIER(:tbl)
        GROUP BY IDENTIFIER(:grp)
        ORDER BY segment
        """,
        args={"tbl": "cust_ident_v", "grp": "c_mktsegment", "val": "c_acctbal"},
    )


Q_IDENT_SQL = """
SELECT c_mktsegment AS segment,
       COUNT(*) AS n,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(15,2))) AS DOUBLE) AS total_bal
FROM customer
GROUP BY c_mktsegment
ORDER BY segment
"""

QUERIES["q_identifier_clause"] = QuerySpec(
    q_identifier_clause,
    Q_IDENT_SQL,
    "IDENTIFIER() parameterized names — injection-safe dynamic SQL, "
    "oracle is the inlined query",
)
