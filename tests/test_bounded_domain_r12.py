"""Pins for the r12 bounded-domain probe outcomes.

scripts/probe_bounded_domains.py measured, for every class-(a)
global-window adjudication, the cardinality of the windowed table at
sf0.01 vs sf0.1. Nine queries' tables proved row/user-count-sized, so
they were rewritten on the distributed prefix-sum machinery
(_dist_cumsum / _dist_rank_cumsum) and their ALLOWED_GLOBAL_WINDOW
entries removed. These tests make the outcome permanent:

1. none of the nine plans a single-partition window anymore (the
   rotating plan-audit slice would only catch a regression on its
   round — this pins them every run);
2. the fused _dist_rank_cumsum helper agrees exactly with the
   single-partition reference on rank AND prefix sum, including ties
   in the sort key and nulls in the value column.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

REWRITTEN = [
    "q_spearman_corr",
    "q_kruskal_wallis",
    "q_wilcoxon_signed_rank",
    "q_pr_auc",
    "q_auc_roc",
    "q_sample_quantile_error",
    "q_mood_median_test",
    "q_conover_squared_ranks",
    "q_time_to_convert",
]

SF_DIR = "/root/testdata/sf0.001"


@pytest.mark.parametrize("name", REWRITTEN)
def test_rewritten_query_plans_no_global_window(spark, name):
    import sys
    import os

    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))
    import explain_audit as ea

    from kcore_spark.queries import all_queries

    spec = dict(all_queries())[name]
    df = spec.spark(spark, SF_DIR)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    gw = ea.global_window_lines(plan)
    assert gw == [], f"{name} regressed to a single-partition window: {gw[0]}"
    assert name not in ea.ALLOWED_GLOBAL_WINDOW, (
        f"{name} must stay OFF the allowlist so the audit gate covers it"
    )


def test_dist_rank_cumsum_matches_single_partition_reference(spark):
    from pyspark.sql import Window

    from kcore_spark.queries.extensions_r8 import _dist_rank_cumsum

    # ties in the sort key, a null value, negative values — the cases
    # where a fused rank+cumsum can drift from the window form
    rows = [(5, 2), (1, 1), (3, None), (3, 4), (8, -2), (1, 0), (7, 3), (5, 5)]
    df = spark.createDataFrame(rows, "k int, v int")
    got = {
        (r["k"], r["v"]): (r["rk"], r["cum"])
        for r in _dist_rank_cumsum(df, [F.col("k"), F.col("v")], "v", n_parts=3).collect()
    }
    w = Window.orderBy("k", "v")
    want = {
        (r["k"], r["v"]): (r["rk"], r["cum"])
        for r in df.withColumn("rk", F.row_number().over(w))
        .withColumn("cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, 0)))
        .collect()
    }
    assert got == want
