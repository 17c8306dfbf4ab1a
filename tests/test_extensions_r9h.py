"""Structural invariants of the round-9 batch-H additions (Levene,
naive Bayes, two-feature OLS, modularity)."""

from __future__ import annotations

from .conftest import SF_DIR


def test_levene_nonnegative_and_k5(spark):
    from kcore_spark.queries.extensions_r9h import q_levene_test

    r = q_levene_test(spark, SF_DIR).collect()[0]
    assert r.k_groups == 5
    assert r.w_stat >= 0.0


def test_naive_bayes_learns_separable_corpus(spark, tmp_path):
    """On a corpus whose classes have disjoint signature vocabulary the
    classifier must be perfect — this pins the whole train/score
    pipeline (smoothing, priors, argmax), which the fixture run cannot
    (fixture lang is independent of text by construction)."""
    import duckdb

    from kcore_spark.queries.extensions_r9h import q_naive_bayes

    sig = {"aa": "alpha apple anchor", "bb": "bravo banana bay", "cc": "cedar coral cliff"}
    rows = [
        (i, lang, f"{words} {words} filler{i % 7}")
        for i, (lang, words) in enumerate(
            (l, w) for l, w in sig.items() for _ in range(40)
        )
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE d (doc_id BIGINT, lang VARCHAR, text VARCHAR)")
    con.executemany("INSERT INTO d VALUES (?, ?, ?)", rows)
    con.execute(f"COPY d TO '{tmp_path}/documents.parquet' (FORMAT PARQUET)")
    out = q_naive_bayes(spark, str(tmp_path)).collect()
    assert out and sum(r.n_test for r in out) > 0
    for r in out:
        assert r.accuracy == 1.0


def test_naive_bayes_fixture_accuracy_in_chance_band(spark):
    """Fixture lang is independent of text, so held-out accuracy must
    sit in a loose band around chance — far from 0 (pipeline broken)
    and far from 1 (leakage)."""
    from kcore_spark.queries.extensions_r9h import q_naive_bayes

    rows = q_naive_bayes(spark, SF_DIR).collect()
    n = sum(r.n_test for r in rows)
    correct = sum(r.n_correct for r in rows)
    for r in rows:
        assert 0.0 <= r.accuracy <= 1.0
    assert 0.05 < correct / n < 0.95


def test_ols_two_features_residual_orthogonality(spark):
    """R² in [0, 1]; the fitted coefficients must reproduce pandas'
    closed-form solution on the same data (third engine)."""
    import duckdb
    import numpy as np

    from kcore_spark.queries.extensions_r9h import q_ols_two_features

    r = q_ols_two_features(spark, SF_DIR).collect()[0]
    assert 0.0 <= r.r2 <= 1.0
    pdf = duckdb.sql(
        f"SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y "
        f"FROM '{SF_DIR}/lineitem.parquet'"
    ).df()
    X = np.column_stack([np.ones(len(pdf)), pdf.x1, pdf.x2])
    beta = np.linalg.lstsq(X, pdf.y.to_numpy(), rcond=None)[0]
    assert abs(r.b0 - beta[0]) < 1e-3
    assert abs(r.b1 - beta[1]) < 1e-5
    assert abs(r.b2 - beta[2]) < 1e-5


def test_modularity_bounds(spark):
    """Directed modularity of any partition lies in [-1, 1], and the
    3-community hash partition covers all transition weight."""
    from kcore_spark.queries.extensions_r9h import q_modularity_score

    r = q_modularity_score(spark, SF_DIR).collect()[0]
    assert -1.0 <= r.modularity <= 1.0
    assert r.total_weight > 0
    assert 1 <= r.n_communities <= 3
