"""The NOT-IN-with-NULL three-valued-logic pin."""

from __future__ import annotations

from .conftest import SF_DIR


def test_null_poisoned_not_in_returns_zero(spark):
    from kcore_spark.queries.extensions_r9x import q_null_semantics_antijoin

    r = q_null_semantics_antijoin(spark, SF_DIR).collect()[0]
    assert r.not_in_poisoned == 0  # the ANSI trap
    assert r.not_exists_poisoned == r.not_in_clean  # the intuitive answer
