"""Scale-path operators: skew salting and bucketed co-located joins.

These exist for the 100 TB case:

- ``salted_join``: when one join key carries a disproportionate share
  of rows (power-law users, null-ish defaults), a plain shuffle join
  puts the whole hot key in one task. Salting splits each hot key into
  ``salt_factor`` sub-keys on the fact side and replicates the
  dimension side per salt — turning 1 straggler task into
  ``salt_factor`` even tasks. AQE's skew-join handles sort-merge
  skew automatically; salting is for the cases AQE can't split
  (aggregations keyed on the hot key, broadcast-ineligible dims).
- ``write_bucketed`` / bucketed joins: pre-shuffling both fact tables
  into the same bucket layout makes every subsequent equi-join on the
  bucket key exchange-free — the join becomes a per-bucket zip. At
  100 TB this converts the dominant repeated shuffle into a one-time
  layout cost. (Parquet bucketed tables via saveAsTable, the same
  mechanism a production Hive/Unity catalog would use.)

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
realizes the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    salt_factor: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with salted keys; result identical to a plain join.

    fact rows get a deterministic salt in [0, salt_factor); the dim
    side is exploded ×salt_factor so every (key, salt) pair finds its
    match. Deterministic salt (xxhash64 of the whole row) keeps replays
    byte-identical — important for the oracle and for retries at scale.
    """
    fact_s = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact.columns]), F.lit(salt_factor)).cast("int")
    )
    dim_s = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(salt_factor - 1)))
    )
    out = fact_s.join(
        dim_s,
        (fact_s[fact_key] == dim_s[dim_key]) & (fact_s["__salt"] == dim_s["__salt"]),
        how,
    )
    return out.drop("__salt")


def write_bucketed(
    df: DataFrame, table: str, bucket_col: str, num_buckets: int = 8
) -> None:
    """Materialize a bucketed+sorted table (one-time layout shuffle).

    Drops any previous incarnation including an orphaned warehouse
    directory left by a dead session (managed-table locations survive
    the catalog that knew about them)."""
    import shutil

    spark = df.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
    loc = os.path.join(warehouse.removeprefix("file:"), table.lower())
    if os.path.isdir(loc):
        shutil.rmtree(loc)
    (
        df.write.mode("overwrite")
        .bucketBy(num_buckets, bucket_col)
        .sortBy(bucket_col)
        .format("parquet")
        .saveAsTable(table)
    )


def bucketed_join(spark, left_table: str, right_table: str, on: list[str] | F.Column, how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — Catalyst elides both exchanges."""
    return spark.table(left_table).join(spark.table(right_table), on, how)
