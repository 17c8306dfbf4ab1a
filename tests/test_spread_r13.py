"""Focused pins for the r13 `spread` operator
(operators/relational.py::spread) — the serial-scan parallelization
helper the r13 optimization round threads through ~15 queries.

Pins three properties the optimizations rely on:

1. **Result identity.** A decimal aggregate over a spread frame equals
   the same aggregate over the raw frame (decimal sums are order-free,
   so the repartition must never change values).
2. **Scale-adaptive partitioning.** The spread frame has exactly
   ``defaultParallelism`` partitions — no hard-coded local[32]
   constant, per the optimization-round rule.
3. **Exchange reuse.** A groupBy whose keys are a superset of the
   spread key does NOT add a second shuffle: the executed plan carries
   exactly one Exchange (EnsureRequirements subset rule) — the
   property that makes spread free in q_croston / q_weighted_median /
   q_xyz_classification / q_link_prediction_aa.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.operators.relational import spread

SF_DIR = "/root/testdata/sf0.001"


def _executed_plan(df) -> str:
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    if "== Initial Plan ==" in plan:
        plan = plan.split("== Initial Plan ==")[0]
    return plan


def test_spread_preserves_decimal_aggregate(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", F.col("l_quantity").cast("decimal(15,2)").alias("q")
    )
    raw = li.groupBy("l_orderkey").agg(F.sum("q").alias("s")).orderBy("l_orderkey")
    spr = (
        spread(li, "l_orderkey")
        .groupBy("l_orderkey")
        .agg(F.sum("q").alias("s"))
        .orderBy("l_orderkey")
    )
    assert raw.collect() == spr.collect()


def test_spread_partition_count_follows_default_parallelism(spark):
    li = load_table(spark, SF_DIR, "lineitem").select("l_orderkey")
    n = spread(li, "l_orderkey").rdd.getNumPartitions()
    assert n == spark.sparkContext.defaultParallelism


def test_spread_exchange_reused_by_superset_groupby(spark):
    li = load_table(spark, SF_DIR, "lineitem").select(
        "l_orderkey", "l_linenumber", F.col("l_quantity").cast("long").alias("q")
    )
    agg = (
        spread(li, "l_orderkey")
        .groupBy("l_orderkey", "l_linenumber")
        .agg(F.sum("q").alias("s"))
    )
    plan = _executed_plan(agg)
    # one Exchange total: the spread repartition; the (orderkey,
    # linenumber) groupBy must cluster on the subset partitioning
    assert plan.count("Exchange") == 1, plan
