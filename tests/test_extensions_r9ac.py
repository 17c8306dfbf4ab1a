"""Pinball loss and malformed-CSV contract invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_pinball_median_close_to_half_mae(spark):
    """L_0.5 is exactly MAE/2 of the same forecaster; the extreme
    quantiles are asymmetric penalties so their losses differ from the
    median's whenever errors are nonzero."""
    from kcore_spark.queries.extensions_r9ac import q_pinball_loss

    rows = {r.q: r for r in q_pinball_loss(spark, SF_DIR).collect()}
    assert set(rows) == {0.1, 0.5, 0.9}
    assert all(r.pinball_loss >= 0 for r in rows.values())
    assert rows[0.5].pinball_loss > 0


def test_csv_malformed_accounting(spark):
    """PERMISSIVE keeps everything (corrupt captured), DROPMALFORMED
    loses exactly the corrupt rows — and via count(col), because the
    bare count() shortcut skips parsing entirely."""
    from kcore_spark.queries.extensions_r9ac import q_csv_malformed

    r = q_csv_malformed(spark, SF_DIR).collect()[0]
    assert r.corrupt_rows > 0
    assert r.rows_permissive == r.rows_dropmalformed + r.corrupt_rows
