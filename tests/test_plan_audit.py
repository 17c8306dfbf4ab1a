"""The plan audit is a FAILING gate (VERDICT r5 #2): scripts/
explain_audit.py exits non-zero on any unadjudicated scale flag, and
this suite proves both directions — an injected bad plan flags, and a
representative slice of the registry stays clean."""

from __future__ import annotations

import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo/scripts")

from explain_audit import (
    ALLOWED_GLOBAL_WINDOW,
    KNOWN_UNPUSHABLE,
    SF_DIR,
    audit,
    global_window_lines,
    run_audit,
)


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    return plan


def test_audit_flags_injected_unpushed_filter(spark):
    """A filter on a derived expression (sha2 of a column) cannot reach
    the scan; a query doing only that, NOT on the adjudicated allow
    list, must flag."""
    # coalesce kills the implicit IsNotNull guard, so NOTHING is pushed
    df = (
        spark.read.parquet(f"{SF_DIR}/nation.parquet")
        .where(F.sha2(F.coalesce(F.col("n_name"), F.lit("")), 256).startswith("a"))
        .select("n_name")
    )
    plan = _executed_plan(df)
    assert "injected_query" not in KNOWN_UNPUSHABLE
    assert "no pushed filters on any scan" in audit("injected_query", plan)


def test_audit_flags_cartesian(spark):
    a = spark.range(3)
    b = spark.range(3).withColumnRenamed("id", "id2")
    plan = _executed_plan(a.crossJoin(b))
    flags = audit("injected_cross", plan)
    assert any("CartesianProduct" in f or "BroadcastNestedLoopJoin" in f for f in flags)


def test_audit_accepts_pushed_filter(spark):
    df = (
        spark.read.parquet(f"{SF_DIR}/nation.parquet")
        .where(F.col("n_regionkey") == 1)
        .select("n_name")
    )
    assert audit("clean_query", _executed_plan(df)) == []


def test_audit_flags_global_window(spark):
    """A Window with no partition spec over any real input is the
    single-task-sort anti-pattern (VERDICT r9 #2); an unadjudicated
    query planning one must flag."""
    from pyspark.sql import Window

    df = spark.range(100).withColumn(
        "rk", F.row_number().over(Window.orderBy("id"))
    )
    plan = _executed_plan(df)
    assert "injected_global_window" not in ALLOWED_GLOBAL_WINDOW
    flags = audit("injected_global_window", plan)
    assert any("global (no-partition) Window" in f for f in flags), flags


def test_audit_accepts_partitioned_and_partition_only_windows(spark):
    """Partitioned windows — including partition-WITHOUT-order frames,
    whose plan line also has only one trailing spec group — must NOT
    flag (the q02 false-positive regression)."""
    from pyspark.sql import Window

    g = (F.col("id") % 5).alias("g")
    ordered = spark.range(100).select("id", g).withColumn(
        "rk", F.row_number().over(Window.partitionBy("g").orderBy("id"))
    )
    assert global_window_lines(_executed_plan(ordered)) == []
    part_only = spark.range(100).select("id", g).withColumn(
        "mx", F.max("id").over(Window.partitionBy("g"))
    )
    assert global_window_lines(_executed_plan(part_only)) == []


def test_registry_slice_plan_clean(spark):
    """Fast regression net: audit a cross-family slice of the registry
    (the full sweep runs via `python scripts/explain_audit.py`, which
    now exits non-zero on any flag)."""
    flagged = run_audit(
        ["q01", "q03", "q_dedup_exact", "q_minhash_lsh_pairs", "q_cosine_topk",
         "q_tfidf_top_terms", "q_window_ranks", "q_topk_orders"]
    )
    assert flagged == {}, f"plan regressions: {flagged}"


def test_rotating_registry_slice_plan_clean(spark):
    """VERDICT r10 #3: a 25-query slice that ADVANCES by round number
    (read from the newest CORRECTNESS_r*.json), so the full registry's
    plans are machine-checked by pytest within ~29 rounds on top of the
    full `--json` sweeps. Deterministic: the same round always audits
    the same slice, so a failure here reproduces."""
    from explain_audit import rotating_slice

    names = rotating_slice(25)
    assert len(names) == 25
    stats: dict = {}
    flagged = run_audit(exact_names=set(names), stats=stats)
    assert stats["audited"] == 25
    assert flagged == {}, f"plan regressions in rotating slice: {flagged}"
