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


def test_connected_components_paths_agree(spark):
    """The r9 adaptive driver union-find (tiny graphs skip the
    distributed rounds) must produce exactly the distributed path's
    labels — pin both on a graph with a long chain (exercises pointer
    jumping), a clique (exercises contraction), and an isolated pair."""
    import random

    from kcore_spark.operators.graph import connected_components

    rng = random.Random(9)
    chain = [(i, i + 1) for i in range(100, 140)]
    clique = [(a, b) for a in range(200, 210) for b in range(a + 1, 210)]
    extra = [(rng.randint(300, 350), rng.randint(300, 350)) for _ in range(40)]
    edges = spark.createDataFrame(
        chain + clique + [(400, 401)] + [(a, b) for a, b in extra if a != b],
        "src long, dst long",
    )
    fast = {
        r["id"]: r["component"] for r in connected_components(edges).collect()
    }
    dist = {
        r["id"]: r["component"]
        for r in connected_components(edges, driver_uf_edge_limit=0).collect()
    }
    assert fast == dist and fast[140] == 100 and fast[209] == 200


def test_lsh_verify_broadcasts_candidate_ids(spark):
    """The MinHash verify's semi-join must BROADCAST the candidate id
    set so the shingle table is never shuffled on id (VERDICT r2 #5)."""
    from kcore_spark.operators.dedup import jaccard_for_pairs, word_shingles

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    sh = word_shingles(docs, "doc_id", "text", n=3)
    pairs = spark.createDataFrame([(1, 2), (3, 4)], "id1 long, id2 long")
    # pre-execution plan (post-run AQE may fold the tiny fixture result
    # into an EmptyRelation, hiding the join strategy under test)
    plan = (
        jaccard_for_pairs(pairs, sh, min_jaccard=0.0)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the semi-join itself is broadcast...
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan, plan
    # ...and no sort-merge machinery touches the shingle stream
    assert "SortMergeJoin LeftSemi" not in plan, plan


def test_jaccard_hot_shingle_cutoff_filters_and_broadcasts(spark):
    from kcore_spark.operators.dedup import jaccard_pairs

    sh = spark.createDataFrame(
        # docs 1,2 share a rare shingle; 'hot' appears in all 30 docs
        [(i, "hot") for i in range(30)] + [(1, "rare x y"), (2, "rare x y")],
        "id long, shingle string",
    )
    got = jaccard_pairs(sh, min_jaccard=0.0, max_df=5).collect()
    # only the rare-shingle pair survives; its sizes exclude 'hot'
    assert [(r.id1, r.id2, r.jaccard) for r in got] == [(1, 2, 1.0)]
    plan = _plan(jaccard_pairs(sh, min_jaccard=0.0, max_df=5))
    # the cutoff is a count-over-window on shingle that rides the pair
    # join's own hash partitioning — no anti-join, no extra exchange
    assert "windowspecdefinition(shingle" in plan, plan
    assert "__df" in plan and "LeftAnti" not in plan, plan
