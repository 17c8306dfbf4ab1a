"""Round-10 econometrics-diagnostics block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_breusch_pagan_bounds(spark):
    """LM = n R2: non-negative, consistent with its own pieces."""
    from kcore_spark.queries.extensions_r10aj import q_breusch_pagan

    r = q_breusch_pagan(spark, SF_DIR).collect()[0]
    assert r.n > 5000
    assert 0 <= r.r2_aux < 1
    assert abs(r.bp_lm - r.n * r.r2_aux) < 0.01
    assert r.bp_lm >= 0


def test_chow_ssr_decomposition(spark):
    """Split SSR can never exceed pooled SSR; F is non-negative."""
    from kcore_spark.queries.extensions_r10aj import q_chow_test

    r = q_chow_test(spark, SF_DIR).collect()[0]
    assert r.n > 5000
    assert 0 < r.n_pre < r.n
    assert r.ssr_split <= r.ssr_pooled
    assert r.chow_f >= 0


def test_granger_ssr_nesting(spark):
    """Unrestricted SSR <= restricted SSR (nested models); F >= 0 and
    finite on the fixture's independent-ish series."""
    from kcore_spark.queries.extensions_r10aj import q_granger_lite

    r = q_granger_lite(spark, SF_DIR).collect()[0]
    assert r.n >= 20
    assert r.ssr_unrestricted <= r.ssr_restricted
    assert 0 <= r.granger_f < 100
