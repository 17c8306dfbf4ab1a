"""Round-10 modern-SQL-surface pin invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_group_by_all_grouping_set(spark):
    """ALL resolves to (status, prio_code): row count equals the
    distinct pair count, and output is fully ordered."""
    from kcore_spark.queries.extensions_r10ak import q_group_by_all

    rows = q_group_by_all(spark, SF_DIR).collect()
    keys = [(r.o_orderstatus, r.prio_code) for r in rows]
    assert len(keys) == len(set(keys))
    assert keys == sorted(keys)
    assert all(r.n > 0 and r.total > 0 for r in rows)


def test_try_arithmetic_null_accounting(spark):
    """Defined + null division counts partition the table; overflow
    multiply is NULL for every orderkey >= 2."""
    from kcore_spark.queries.extensions_r10ak import q_try_arithmetic

    r = q_try_arithmetic(spark, SF_DIR).collect()[0]
    assert r.div_defined + r.div_nulls == r.n
    assert r.div_nulls > 0  # qty % 7 == 0 happens
    assert r.mul_defined < r.n  # overflow really nulls
    assert r.cast_defined == 0  # letters never cast to INT


def test_identifier_clause_matches_static(spark):
    """IDENTIFIER-parameterized query equals the static equivalent."""
    from kcore_spark.queries.extensions_r10ak import q_identifier_clause
    from kcore_spark.catalog import load_table
    from pyspark.sql import functions as F

    rows = q_identifier_clause(spark, SF_DIR).collect()
    static = (
        load_table(spark, SF_DIR, "customer")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("c_acctbal").cast("decimal(15,2)")).cast("double").alias("total_bal"),
        )
        .orderBy("segment")
        .collect()
    )
    assert [tuple(r) for r in rows] == [tuple(r) for r in static]
