"""Round-10 marketing-science block invariants."""

from __future__ import annotations

from .conftest import SF_DIR


def test_shapley_efficiency_axiom(spark):
    """Sum of Shapley values = v(grand coalition) - v(empty set):
    recompute both sides from the coalition table."""
    from pyspark.sql import functions as F

    from kcore_spark.catalog import load_table
    from kcore_spark.queries.extensions_r10s import q_shapley_attribution

    rows = q_shapley_attribution(spark, SF_DIR).collect()
    assert len(rows) == 3
    total = sum(r.shapley_value for r in rows)
    ev = load_table(spark, SF_DIR, "events")
    per = ev.groupBy("user_id").agg(
        F.max((F.col("event_type") == "view").cast("int")).alias("c0"),
        F.max((F.col("event_type") == "click").cast("int")).alias("c1"),
        F.max((F.col("event_type") == "signup").cast("int")).alias("c2"),
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    co = {
        r.coalition: (r.n, r.k)
        for r in per.select(
            (F.col("c0") + F.col("c1") * 2 + F.col("c2") * 4).alias("coalition"),
            "conv",
        )
        .groupBy("coalition")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k"))
        .collect()
    }
    v7 = co.get(7, (1, 0))[1] / co.get(7, (1, 0))[0]
    v0 = co.get(0, (1, 0))[1] / co.get(0, (1, 0))[0]
    assert abs(total - (v7 - v0)) < 1e-6


def test_beta_posterior_shrinkage(spark):
    """Posterior mean lies between the MLE and 0.5 (the prior mean);
    posterior sd shrinks with n."""
    from kcore_spark.queries.extensions_r10s import q_beta_posterior

    rows = q_beta_posterior(spark, SF_DIR).collect()
    assert len(rows) == 5
    for r in rows:
        lo, hi = sorted((r.mle_rate, 0.5))
        assert lo - 1e-6 <= r.posterior_mean <= hi + 1e-6
        assert r.posterior_sd > 0
