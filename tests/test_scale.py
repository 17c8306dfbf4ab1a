"""Scale-operator semantics + plan assertions: salting preserves join
results; bucketed joins are exchange-free; broadcast hints hold."""

from __future__ import annotations

from pyspark.sql import functions as F

from kcore_spark.operators.scale import bucketed_join, salted_join, write_bucketed

from .conftest import SF_DIR


def _plan(df) -> str:
    df.collect()
    p = df._jdf.queryExecution().executedPlan().toString()
    return p.split("== Initial Plan ==")[0]


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    plain = (
        li.join(part, li.l_partkey == part.p_partkey)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q"))
    )
    salted = (
        salted_join(li, part, "l_partkey", "p_partkey", salt_factor=4)
        .groupBy("p_brand")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.col("l_quantity").cast("decimal(15,2)")).alias("q"))
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_matches(spark):
    cust = spark.read.parquet(f"{SF_DIR}/customer.parquet")
    nat = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    plain = cust.join(nat, cust.c_nationkey == nat.n_nationkey, "left").select(
        "c_custkey", "n_name"
    )
    salted = salted_join(cust, nat, "c_nationkey", "n_nationkey", 4, "left").select(
        "c_custkey", "n_name"
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_bucketed_join_has_no_shuffle(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    write_bucketed(li.select("l_orderkey", "l_quantity"), "b_lineitem", "l_orderkey", 4)
    write_bucketed(orders.select("o_orderkey", "o_totalprice"), "b_orders", "o_orderkey", 4)
    j = bucketed_join(
        spark, "b_lineitem", "b_orders", spark.table("b_lineitem").l_orderkey == spark.table("b_orders").o_orderkey
    )
    # disable broadcast so the test exercises the bucketed SMJ path
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(j)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    assert "Exchange" not in plan, plan
    assert j.count() == li.count()  # every line matches its order


def test_broadcast_hint_respected(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_DIR}/part.parquet")
    plan = _plan(li.join(F.broadcast(part), li.l_partkey == part.p_partkey).groupBy("p_brand").count())
    assert "BroadcastHashJoin" in plan


def test_connected_components_semantics(spark):
    from kcore_spark.operators.graph import connected_components

    # chain 1-2-3-4, triangle 10-11-12 (+chord), pair 20-21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
        "src long, dst long",
    )
    got = {r["id"]: r["component"] for r in connected_components(edges).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}
