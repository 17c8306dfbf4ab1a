"""Round-7 surface extensions (SURVEY §2.3 N r7): graph cores, join
pruning, privacy, materialized-view maintenance, set-similarity
joins, and tokenizer/LM statistics — operators a training-data
pipeline and an analytics engine at 100 TB both need.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`)
and its README's analytics ambitions stop at "stateful consumers".
Every query pairs with a DuckDB oracle per the FIXTURES.md
determinism rules (identical aliases, decimal-exact sums, portable
md5 arithmetic, fully tie-broken orderings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# ------------------------------------------------------------ k-core
# The namesake operator: kcore-the-reference never implements a k-core
# (or any query operator); this is the graph-degeneracy decomposition
# its name evokes, Spark-first. Fixed peel count on BOTH engines so the
# oracle is exact whether or not the fixpoint converges earlier.

KCORE_K = 2
KCORE_PEELS = 8


def q_kcore_subgraph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-core decomposition by iterative peeling: repeatedly drop
    vertices with degree < k until (fixed-point or) KCORE_PEELS
    rounds. Graph: parts co-ordered in ≥2 common orders (the
    thresholded co-purchase projection — unthresholded, the projection
    of a busy bipartite graph is near-complete and every core is the
    whole graph). k=2 — the cycle core — is the one k that stays
    non-degenerate across fixture scales: the thresholded graph gets
    SPARSER as SF grows (repeat co-orders dilute), so any higher k
    empties at sf0.1 while k=3 at sf0.01 would keep 935 of ~1800
    vertices.

    Scale: each peel is one degree-aggregate + two semi-joins against
    a shrinking vertex set — the standard distributed k-core loop; the
    vertex set only shrinks, so later rounds get cheaper, and
    localCheckpoint truncates the iterative lineage. Returns the core
    vertices with their within-core degrees (the discriminating
    output: a wrong peel changes degrees, not just membership)."""
    from kcore_spark.operators.graph import shared_co_order_edges

    # map-side pair explode (operators/graph.py::co_order_edges) —
    # identical edge set to the former lineitem self-join, ~2.4x
    # faster; r14: materialized once per session and shared with
    # q_core_numbers / q_ktruss (operators/graph.py::_CO_EDGES)
    edges = shared_co_order_edges(spark, sf_dir)
    # Peel on the VERTEX set: because the kept set shrinks
    # monotonically, filtering the ORIGINAL edge table by the current
    # kept set is identical to iteratively filtering edges — so only
    # the (small) kept set materializes per round, not the edge set.
    # One localCheckpoint+count per peel instead of three jobs.
    e = edges
    prev_nodes = None
    for _ in range(KCORE_PEELS):
        deg = (
            e.select(F.col("p1").alias("n"))
            .unionByName(e.select(F.col("p2").alias("n")))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("d"))
        )
        kept = deg.where(F.col("d") >= KCORE_K).select("n").localCheckpoint()
        n_nodes = kept.count()
        if n_nodes == prev_nodes:
            # fixpoint: no node dropped, so the remaining peels are
            # no-ops — the RESULT is identical to running all
            # KCORE_PEELS (which is what the unrolled oracle does),
            # only the wasted rounds are skipped
            break
        prev_nodes = n_nodes
        keep = F.broadcast(kept)
        e = edges.join(keep, edges.p1 == keep.n, "left_semi").join(
            keep, F.col("p2") == keep.n, "left_semi"
        )
    return (
        e.select(F.col("p1").alias("part"))
        .unionByName(e.select(F.col("p2").alias("part")))
        .groupBy("part")
        .agg(F.count(F.lit(1)).alias("core_degree"))
        .orderBy("part")
    )


def _kcore_sql() -> str:
    layers = [
        """li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
e0 AS MATERIALIZED (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2)"""
    ]
    for i in range(KCORE_PEELS):
        layers.append(
            f"""k{i} AS MATERIALIZED (
  SELECT n FROM (SELECT p1 AS n FROM e{i} UNION ALL SELECT p2 FROM e{i})
  GROUP BY n HAVING COUNT(*) >= {KCORE_K}),
e{i + 1} AS MATERIALIZED (
  SELECT p1, p2 FROM e{i}
  WHERE p1 IN (SELECT n FROM k{i}) AND p2 IN (SELECT n FROM k{i}))"""
        )
    last = f"e{KCORE_PEELS}"
    return (
        "WITH "
        + ",\n".join(layers)
        + f"""
SELECT part, COUNT(*) AS core_degree
FROM (SELECT p1 AS part FROM {last} UNION ALL SELECT p2 FROM {last})
GROUP BY part
ORDER BY part"""
    )


QUERIES["q_kcore_subgraph"] = QuerySpec(
    q_kcore_subgraph, _kcore_sql(), "k-core decomposition by iterative peeling"
)


# ------------------------------------------- bloom-prefilter join
# Semi-join pushdown with a PORTABLE bloom filter: the small side's
# keys are folded into an m-bit bitmap (256 longs, k=3 md5-derived
# hashes) entirely in-plan (bit_or aggregate — no driver collect), the
# bitmap words broadcast, and the fact side pre-filtered by 3 probe
# joins before the exact join. At 100 TB this is the runtime-filter
# pattern: the scan-side prefilter drops most of the fact table before
# the shuffle join; the exact join then removes bloom false positives,
# so the RESULT is identical to the plain join — which is exactly what
# the oracle asserts (the bloom changes the plan, never the answer).
# tests/test_extensions_r7.py separately asserts real pruning.

BLOOM_M = 16384  # bits
BLOOM_WORDS = BLOOM_M // 64
BLOOM_HASHES = 3


def _bloom_hash(col, i: int):
    return (
        F.conv(
            F.substring(F.md5(F.concat(col.cast("string"), F.lit(f"#{i}"))), 1, 12),
            16,
            10,
        ).cast("long")
        % BLOOM_M
    )


def q_bloom_prefilter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = (
        load_table(spark, sf_dir, "customer")
        .where(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    hashes = F.array(*[_bloom_hash(F.col("c_custkey"), i) for i in range(BLOOM_HASHES)])
    words = (
        cust.select(F.explode(hashes).alias("h"))
        .select(
            (F.col("h") / 64).cast("long").alias("word_idx"),
            F.expr("shiftleft(1L, cast(h % 64 AS int))").alias("bit"),
        )
        .groupBy("word_idx")
        .agg(F.bit_or("bit").alias("bits"))
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority", "o_totalprice"
    )
    probes = orders.select(
        "o_orderkey",
        F.explode(
            F.array(*[_bloom_hash(F.col("o_custkey"), i) for i in range(BLOOM_HASHES)])
        ).alias("h"),
    ).select("o_orderkey", (F.col("h") / 64).cast("long").alias("word_idx"), (F.col("h") % 64).cast("int").alias("pos"))
    hits = (
        probes.join(F.broadcast(words), "word_idx", "left")
        .withColumn(
            "hit",
            F.when(
                F.col("bits").isNotNull()
                & (F.col("bits").bitwiseAND(F.expr("shiftleft(1L, pos)")) != 0),
                1,
            ).otherwise(0),
        )
        .groupBy("o_orderkey")
        .agg(F.sum("hit").alias("n_hits"))
        .where(F.col("n_hits") == BLOOM_HASHES)
        .select("o_orderkey")
    )
    candidates = orders.join(hits, "o_orderkey", "left_semi")
    joined = candidates.join(F.broadcast(cust), candidates.o_custkey == cust.c_custkey)
    return (
        joined.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(28,2)"))
            .cast("double")
            .alias("revenue"),
        )
        .orderBy("o_orderpriority")
    )


Q_BLOOM_SQL = """
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS revenue
FROM orders JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

QUERIES["q_bloom_prefilter_join"] = QuerySpec(
    q_bloom_prefilter_join,
    Q_BLOOM_SQL,
    "bloom-filter semi-join pushdown (in-plan bitmap build + probe)",
)


# ------------------------------------------------ DP noisy counts
# Differential-privacy release shape: per-group counts + Laplace(1/ε)
# noise via inverse-CDF over the portable md5-uniform, so the "noise"
# is deterministic and value-checkable across engines (a real release
# uses a secret RNG seed; the MECHANISM — sensitivity-1 count, b=1/ε,
# inverse-CDF transform — is what this pins).

DP_EPS = 0.5


def q_dp_noisy_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    h = F.conv(F.substring(F.md5(F.col("event_type")), 1, 12), 16, 10).cast("double")
    u = (h + 0.5) / 281474976710656.0  # 2^48 → uniform in (0,1)
    b = 1.0 / DP_EPS
    noise = (
        -F.lit(b)
        * F.signum(u - 0.5)
        * F.log(1.0 - 2.0 * F.abs(u - 0.5))
    )
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(
            "event_type",
            F.round(F.col("n") + noise, 6).alias("noisy_n"),
        )
        .orderBy("event_type")
    )


Q_DP_SQL = f"""
SELECT event_type,
       ROUND(
         COUNT(*) + (
           -(1.0/{DP_EPS}) * SIGN(u - 0.5) * LN(1.0 - 2.0 * ABS(u - 0.5))
         ), 6) AS noisy_n
FROM (
  SELECT event_type,
         (('0x' || substring(md5(event_type), 1, 12))::BIGINT + 0.5)
           / 281474976710656.0 AS u
  FROM events)
GROUP BY event_type, u
ORDER BY event_type
"""

QUERIES["q_dp_noisy_counts"] = QuerySpec(
    q_dp_noisy_counts,
    Q_DP_SQL,
    "Laplace-mechanism noisy counts (deterministic inverse-CDF noise)",
)


# -------------------------------- incremental aggregate maintenance
# Materialized-view delta maintenance: a per-customer order aggregate
# is kept current by merging ONLY a CDC delta batch (inserts +
# deletes) into the existing aggregate — the base table is never
# rescanned. At 100 TB this is the difference between an O(delta)
# trigger and an O(base) recompute. Fixture roles are carved
# deterministically from orders: the snapshot is o_orderkey % 10 != 0;
# the delta INSERTS the % 10 == 0 rows and DELETES snapshot rows with
# o_orderkey % 13 == 0. The oracle recomputes the final state from
# scratch — equality proves the delta algebra (count/sum are
# self-maintainable; min/max would need the full group on delete).


def q_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    price = F.col("o_totalprice").cast("decimal(28,2)")
    snapshot = orders.where(F.col("o_orderkey") % 10 != 0)
    # the maintained aggregate (in production: read back from the MV)
    base_agg = snapshot.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum(price).alias("total")
    )
    inserts = orders.where(F.col("o_orderkey") % 10 == 0).select(
        "o_custkey", F.lit(1).alias("dn"), price.alias("dtotal")
    )
    deletes = snapshot.where(F.col("o_orderkey") % 13 == 0).select(
        "o_custkey", F.lit(-1).alias("dn"), (-price).alias("dtotal")
    )
    delta_agg = (
        inserts.unionByName(deletes)
        .groupBy("o_custkey")
        .agg(F.sum("dn").alias("n"), F.sum("dtotal").alias("total"))
    )
    merged = (
        base_agg.unionByName(delta_agg)
        .groupBy("o_custkey")
        .agg(F.sum("n").alias("n_orders"), F.sum("total").alias("total"))
        .where(F.col("n_orders") > 0)
    )
    return merged.select(
        "o_custkey",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("total").cast("double").alias("total_price"),
    ).orderBy("o_custkey")


Q_INCR_AGG_SQL = """
SELECT o_custkey,
       COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS total_price
FROM orders
WHERE o_orderkey % 10 = 0
   OR (o_orderkey % 10 <> 0 AND o_orderkey % 13 <> 0)
GROUP BY o_custkey
ORDER BY o_custkey
"""

QUERIES["q_incremental_agg_maintenance"] = QuerySpec(
    q_incremental_agg_maintenance,
    Q_INCR_AGG_SQL,
    "delta-based materialized-aggregate maintenance vs full recompute",
)


# ------------------------------------------------ k-anonymity audit
# Privacy risk audit before a data release: quasi-identifier
# combinations held by fewer than K individuals re-identify them.
# One aggregate over the QID tuple; the release gate a training-data
# pipeline runs on any user-derived table.

KANON_K = 5


def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer")
    qid = cust.select(
        F.col("c_nationkey").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / 2000).cast("long").alias("balance_band"),
    )
    groups = qid.groupBy("nation", "segment", "balance_band").agg(
        F.count(F.lit(1)).alias("n")
    )
    return (
        groups.where(F.col("n") < KANON_K)
        .orderBy("nation", "segment", "balance_band")
    )


Q_KANON_SQL = f"""
SELECT c_nationkey AS nation, c_mktsegment AS segment,
       CAST(FLOOR(c_acctbal / 2000) AS BIGINT) AS balance_band,
       COUNT(*) AS n
FROM customer
GROUP BY 1, 2, 3
HAVING COUNT(*) < {KANON_K}
ORDER BY nation, segment, balance_band
"""

QUERIES["q_k_anonymity"] = QuerySpec(
    q_k_anonymity, Q_KANON_SQL, "k-anonymity quasi-identifier risk audit"
)


# --------------------------------- prefix-filtered set-similarity join
# Exact Jaccard-threshold self-join with POSITIONAL PREFIX FILTERING
# (the PPJoin family): tokens of each record sorted by ascending
# global frequency; two sets with Jaccard ≥ t MUST share a token in
# each other's first (n − ⌈t·n⌉ + 1) rarest tokens, so candidates come
# from an equi-join on prefix tokens only — never all pairs — and the
# exact verify runs on candidates. LSH (operators/dedup.py) trades
# recall for speed; PPJoin is EXACT with the same bucketed-join shape,
# which is why the quadratic oracle matches it identically. Sets are
# word 3-shingles (distinct single words of the synthetic corpus are
# near-universal and carry no signal).

SETSIM_T = 0.5


def q_setsim_ppjoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.caching import transient_persist

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # Shingles built ROW-wise (posexplode + two leads), not via an
    # array HOF: transform(sequence, element_at×3) measured 10s for
    # 5000 docs and — unpersisted — re-evaluates once per consumer.
    # The flat (doc_id, tok) table is the shared persisted base for
    # df counts, prefix selection, sizes, and the verify.
    w = docs.select(
        "doc_id", F.posexplode(F.split(F.lower(F.col("text")), " ")).alias("pos", "wd")
    )
    win = Window.partitionBy("doc_id").orderBy("pos")
    sh = w.select(
        "doc_id",
        F.concat_ws(
            " ", F.col("wd"), F.lead("wd", 1).over(win), F.lead("wd", 2).over(win)
        ).alias("tok"),
        F.lead("wd", 2).over(win).alias("w3"),
    ).where(F.col("w3").isNotNull())
    flat = transient_persist(sh.select("doc_id", "tok").distinct())
    sized = flat.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    df_tbl = flat.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ranked = flat.join(df_tbl, "tok").withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("doc_id").orderBy(F.col("df").asc(), F.col("tok").asc())
        ),
    )
    prefix = (
        ranked.join(sized, "doc_id")
        .where(F.col("rk") <= F.col("sz") - F.ceil(F.lit(SETSIM_T) * F.col("sz")) + 1)
        .select("doc_id", "tok", "rk", "sz")
    )
    # POSITIONAL bound (the second P in PPJoin): at a pair's first
    # shared token — positions (i, j) in the df-sorted orders — every
    # common token sits at/after those positions, so
    # overlap ≤ 1 + min(s1−i, s2−j); a true match needs overlap ≥
    # α = ⌈t/(1+t)·(s1+s2)⌉, so occurrences violating the bound can't
    # be a pair's first shared token and pairs with NO satisfying
    # occurrence are complete to prune (the first-token occurrence of
    # any true match satisfies it). Complete, so the quadratic oracle
    # still matches exactly.
    alpha = F.ceil(
        F.lit(SETSIM_T / (1.0 + SETSIM_T)) * (F.col("x.sz") + F.col("y.sz"))
    )
    cand = (
        prefix.alias("x")
        .join(
            prefix.alias("y"),
            (F.col("x.tok") == F.col("y.tok"))
            & (F.col("x.doc_id") < F.col("y.doc_id"))
            & (
                1
                + F.least(
                    F.col("x.sz") - F.col("x.rk"), F.col("y.sz") - F.col("y.rk")
                )
                >= alpha
            ),
        )
        .select(F.col("x.doc_id").alias("id1"), F.col("y.doc_id").alias("id2"))
        .distinct()
    )
    toks = transient_persist(
        flat.groupBy("doc_id").agg(F.collect_set("tok").alias("toks"))
    )
    t1 = toks.select(F.col("doc_id").alias("id1"), F.col("toks").alias("t1"))
    t2 = toks.select(F.col("doc_id").alias("id2"), F.col("toks").alias("t2"))
    verified = (
        cand.join(t1, "id1")
        .join(t2, "id2")
        .withColumn("inter", F.size(F.array_intersect("t1", "t2")))
        .withColumn(
            "jac",
            F.col("inter") / (F.size("t1") + F.size("t2") - F.col("inter")),
        )
        .where(F.col("jac") >= SETSIM_T)
    )
    return verified.select(
        "id1", "id2", F.round("jac", 6).alias("jaccard")
    ).orderBy("id1", "id2")


Q_SETSIM_SQL = f"""
WITH toks AS (
  SELECT doc_id,
         list_distinct([
           w[i] || ' ' || w[i+1] || ' ' || w[i+2]
           FOR i IN range(1, len(w) - 1)
         ]) AS toks
  FROM (SELECT doc_id, string_split(lower(text), ' ') AS w FROM documents)
  WHERE len(w) >= 3),
pairs AS (
  SELECT x.doc_id AS id1, y.doc_id AS id2,
         len(list_intersect(x.toks, y.toks)) AS inter,
         len(x.toks) AS s1, len(y.toks) AS s2
  FROM toks x JOIN toks y ON x.doc_id < y.doc_id)
SELECT id1, id2,
       ROUND(inter * 1.0 / (s1 + s2 - inter), 6) AS jaccard
FROM pairs
WHERE inter * 1.0 / (s1 + s2 - inter) >= {SETSIM_T}
ORDER BY id1, id2
"""

QUERIES["q_setsim_ppjoin"] = QuerySpec(
    q_setsim_ppjoin,
    Q_SETSIM_SQL,
    "exact Jaccard join via positional prefix filtering (PPJoin)",
)


# ----------------------------------------------- bigram LM scoring
# Language-model quality scoring without a model: per-source average
# bigram log-probability under the corpus's own add-one-smoothed
# bigram counts — the cheap LM-perplexity proxy curation pipelines
# use to rank sources before an expensive model pass. One corpus scan
# builds the counts; scoring is two broadcast joins. Floats follow
# the FIXTURES.md idiom: per-bigram contribution rounded to 9, summed
# as DECIMAL(28,9), final average rounded to 6.


def q_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    from kcore_spark.caching import transient_persist

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "source", "text")
    ws = F.split(F.lower(F.col("text")), " ")
    # Adjacent-word bigrams straight from the split array (zip of the
    # array against itself shifted by one) — MAP-SIDE, riding the scan.
    # The old formulation posexploded every token and ran a lead()
    # window partitioned by doc_id, which shuffled + sorted the whole
    # token table just to pair neighbors that were already adjacent in
    # the array (guide §2.4: remove shuffles outright).
    bigrams = docs.select(
        "doc_id",
        "source",
        F.explode(
            F.arrays_zip(
                F.slice(ws, 1, F.size(ws) - 1).alias("w"),
                F.slice(ws, 2, F.size(ws) - 1).alias("w2"),
            )
        ).alias("bg"),
    ).select("doc_id", "source", F.col("bg.w").alias("w"), F.col("bg.w2").alias("w2"))
    toks = docs.select(F.explode(ws).alias("w"))
    # uni is vocabulary-sized and feeds BOTH the vocab count and the
    # scoring broadcast; persisting it (transient, harness-released)
    # replaces the old separate explode+distinct pass for vocab with a
    # row count over the already-materialized unigram table.
    uni = transient_persist(toks.groupBy("w").agg(F.count(F.lit(1)).alias("cu")))
    vocab = uni.count()
    big = bigrams.groupBy("w", "w2").agg(F.count(F.lit(1)).alias("cb"))
    scored = (
        bigrams.join(F.broadcast(big), ["w", "w2"])
        .join(F.broadcast(uni), "w")
        .withColumn(
            "lp",
            F.round(
                F.log((F.col("cb") + 1.0) / (F.col("cu") + F.lit(float(vocab)))), 9
            ).cast("decimal(28,9)"),
        )
    )
    per_doc = scored.groupBy("doc_id", "source").agg(
        F.sum("lp").alias("sum_lp"), F.count(F.lit(1)).alias("n_bi")
    )
    return (
        per_doc.groupBy("source")
        .agg(
            F.round(
                (F.sum("sum_lp") / F.sum("n_bi")).cast("double"), 6
            ).alias("avg_bigram_logprob"),
            F.count(F.lit(1)).alias("n_docs"),
        )
        .orderBy("source")
    )


Q_BIGRAM_SQL = """
WITH docs2 AS (
  SELECT doc_id, source, string_split(lower(text), ' ') AS ws FROM documents),
toks AS (
  SELECT doc_id, source, unnest(ws) AS w FROM docs2),
b2 AS (
  SELECT doc_id, source, bg.w AS w, bg.w2 AS w2
  FROM (
    SELECT doc_id, source,
           unnest([{'w': ws[i], 'w2': ws[i+1]} FOR i IN range(1, len(ws))]) AS bg
    FROM docs2 WHERE len(ws) >= 2)),
uni AS (SELECT w, COUNT(*) AS cu FROM toks GROUP BY w),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM toks),
big AS (SELECT w, w2, COUNT(*) AS cb FROM b2 GROUP BY w, w2),
scored AS (
  SELECT b2.doc_id, b2.source,
         CAST(ROUND(LN((big.cb + 1.0) / (uni.cu + vocab.v)), 9) AS DECIMAL(28,9)) AS lp
  FROM b2 JOIN big ON b2.w = big.w AND b2.w2 = big.w2
          JOIN uni ON b2.w = uni.w
          CROSS JOIN vocab),
per_doc AS (
  SELECT doc_id, source, SUM(lp) AS sum_lp, COUNT(*) AS n_bi
  FROM scored GROUP BY doc_id, source)
SELECT source,
       ROUND(CAST(SUM(sum_lp) / SUM(n_bi) AS DOUBLE), 6) AS avg_bigram_logprob,
       COUNT(*) AS n_docs
FROM per_doc
GROUP BY source
ORDER BY source
"""

QUERIES["q_bigram_lm_score"] = QuerySpec(
    q_bigram_lm_score,
    Q_BIGRAM_SQL,
    "add-one-smoothed bigram LM quality scoring per source",
)


# ----------------------------------------------- BPE pair statistics
# The inner loop of BPE tokenizer training, distributed: symbol-pair
# frequencies over the corpus (round 1: characters within words, the
# pair whose count is highest is the merge a trainer would apply).
# One explode + one aggregate; at 100 TB the pair table is the only
# shuffle and is bounded by |alphabet|² per merge round.

BPE_TOP = 25


def q_bpe_pair_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("text")
    words = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("word")
    ).where(F.length("word") >= 2)
    pairs = words.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(1), F.length("word") - 1),
                lambda i: F.col("word").substr(i, F.lit(2)),
            )
        ).alias("pair")
    )
    return (
        pairs.groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("pair").asc())
        .limit(BPE_TOP)
    )


Q_BPE_SQL = f"""
WITH words AS (
  SELECT w
  FROM (SELECT unnest(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE length(w) >= 2),
pairs AS (
  SELECT unnest([substring(w, i, 2) FOR i IN range(1, length(w))]) AS pair
  FROM words)
SELECT pair, COUNT(*) AS n
FROM pairs
GROUP BY pair
ORDER BY n DESC, pair ASC
LIMIT {BPE_TOP}
"""

QUERIES["q_bpe_pair_stats"] = QuerySpec(
    q_bpe_pair_stats,
    Q_BPE_SQL,
    "BPE tokenizer training inner loop: corpus symbol-pair frequencies",
)


# --------------------------------------------- WOE feature binning
# Feature-engineering staple: equal-frequency (decile) binning of a
# numeric feature + per-bin Weight of Evidence against a binary label
# — the supervised discretization step credit/risk pipelines run
# before model training. One window for the binning (ntile), one
# aggregate for the WOE; smoothing (+0.5) keeps empty cells finite.

WOE_BINS = 10


def q_woe_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equal-frequency binning WITHOUT the single-partition global
    sort: a naive NTILE over an unpartitioned window moves the whole
    table through one task (Spark warns exactly this), which is the
    one shape that cannot survive 100×. Instead the global rank is
    computed distributed — range-repartition on the sort key, per-
    partition row_number (parallel windows), plus broadcast cumulative
    partition offsets (32-row control-plane collect, the same pattern
    as topic-log offset assignment) — and NTILE's exact fill semantics
    (first n mod k bins get one extra row) are reproduced from the
    rank arithmetically, so the oracle can still say NTILE."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    n = orders.count()
    # localCheckpoint pins the range partitioning: repartitionByRange
    # SAMPLES its boundaries per job, so without materialization the
    # offsets job and the rank job would see different partitionings
    ranked_src = (
        orders.repartitionByRange(
            32, F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
        )
        .withColumn("pid", F.spark_partition_id())
        .localCheckpoint()
    )
    counts = {
        r["pid"]: r["c"]
        for r in ranked_src.groupBy("pid").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    offsets, acc = {}, 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    off_map = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("pid").orderBy(
        F.col("o_totalprice").asc(), F.col("o_orderkey").asc()
    )
    ranked = ranked_src.withColumn(
        "rk", F.row_number().over(w) + F.element_at(off_map, F.col("pid"))
    )
    q, r = divmod(n, WOE_BINS)
    binned = ranked.select(
        F.when(
            F.col("rk") <= r * (q + 1), (F.col("rk") - 1) / (q + 1)
        )
        .otherwise(r + (F.col("rk") - r * (q + 1) - 1) / q)
        .cast("long")
        .alias("bin0"),
        (F.col("o_orderstatus") == "F").cast("int").alias("bad"),
    ).select((F.col("bin0") + 1).alias("bin"), "bad")
    per_bin = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("bad").alias("n_bad"),
    )
    totals = per_bin.agg(F.sum("n").alias("t_n"), F.sum("n_bad").alias("t_bad"))
    return (
        per_bin.crossJoin(F.broadcast(totals))
        .select(
            "bin",
            "n",
            F.col("n_bad").cast("long").alias("n_bad"),
            F.round(
                F.log(
                    ((F.col("n") - F.col("n_bad") + 0.5) / (F.col("t_n") - F.col("t_bad")))
                    / ((F.col("n_bad") + 0.5) / F.col("t_bad"))
                ),
                6,
            ).alias("woe"),
        )
        .orderBy("bin")
    )


Q_WOE_SQL = f"""
WITH binned AS (
  SELECT NTILE({WOE_BINS}) OVER (ORDER BY o_totalprice ASC, o_orderkey ASC) AS bin,
         CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS bad
  FROM orders),
per_bin AS (
  SELECT bin, COUNT(*) AS n, SUM(bad) AS n_bad FROM binned GROUP BY bin),
totals AS (SELECT SUM(n) AS t_n, SUM(n_bad) AS t_bad FROM per_bin)
SELECT bin, n, CAST(n_bad AS BIGINT) AS n_bad,
       ROUND(LN(((n - n_bad + 0.5) / (t_n - t_bad)) / ((n_bad + 0.5) / t_bad)), 6) AS woe
FROM per_bin CROSS JOIN totals
ORDER BY bin
"""

QUERIES["q_woe_binning"] = QuerySpec(
    q_woe_binning,
    Q_WOE_SQL,
    "equal-frequency binning + Weight-of-Evidence supervised discretization",
)


# --------------------------------------- local clustering coefficient
# Per-node clustering coefficient over the same thresholded co-purchase
# graph as the k-core: closed-wedge fraction cc(v) = 2·tri(v) /
# (deg(v)·(deg(v)−1)). Triangles via the ordered two-path + closing
# semi-join (never per-node neighborhood materialization); the output
# is the per-degree average coefficient — the graph-topology profile
# (hub locality) at a size the oracle can recompute exactly.


def q_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    edges = (
        li.alias("a")
        .join(
            li.alias("b"),
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2"))
        .agg(F.count_distinct(F.col("a.l_orderkey")).alias("w"))
        .where(F.col("w") >= 2)
        .select("p1", "p2")
        .localCheckpoint()
    )
    sym = edges.unionByName(
        edges.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    )
    deg = sym.groupBy(F.col("p1").alias("n")).agg(F.count(F.lit(1)).alias("deg"))
    # triangles per node: count closed ordered wedges through each vertex
    tri = (
        sym.alias("e1")
        .join(
            sym.alias("e2"),
            (F.col("e1.p2") == F.col("e2.p1")) & (F.col("e1.p1") < F.col("e2.p2")),
        )
        .join(
            edges.alias("e3"),
            (F.col("e1.p1") == F.col("e3.p1")) & (F.col("e2.p2") == F.col("e3.p2")),
            "left_semi",
        )
        .groupBy(F.col("e1.p2").alias("n"))
        .agg(F.count(F.lit(1)).alias("tri"))
    )
    cc = (
        deg.join(tri, "n", "left")
        .where(F.col("deg") >= 2)
        .select(
            "n",
            "deg",
            (
                2.0
                * F.coalesce(F.col("tri"), F.lit(0))
                / (F.col("deg") * (F.col("deg") - 1))
            ).alias("cc"),
        )
    )
    return (
        cc.groupBy("deg")
        .agg(
            F.count(F.lit(1)).alias("n_nodes"),
            F.round(
                F.sum(F.round(F.col("cc"), 9).cast("decimal(28,9)")).cast("double")
                / F.count(F.lit(1)),
                6,
            ).alias("avg_cc"),
        )
        .orderBy("deg")
    )


Q_CLUSTERING_SQL = """
WITH li AS MATERIALIZED (SELECT l_orderkey, l_partkey FROM lineitem),
edges AS MATERIALIZED (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(DISTINCT a.l_orderkey) >= 2),
sym AS MATERIALIZED (
  SELECT p1, p2 FROM edges UNION ALL SELECT p2, p1 FROM edges),
deg AS (SELECT p1 AS n, COUNT(*) AS deg FROM sym GROUP BY p1),
tri AS (
  SELECT e1.p2 AS n, COUNT(*) AS tri
  FROM sym e1 JOIN sym e2 ON e1.p2 = e2.p1 AND e1.p1 < e2.p2
  WHERE EXISTS (SELECT 1 FROM edges e3 WHERE e3.p1 = e1.p1 AND e3.p2 = e2.p2)
  GROUP BY e1.p2),
cc AS (
  SELECT deg.n, deg.deg,
         2.0 * COALESCE(tri.tri, 0) / (deg.deg * (deg.deg - 1)) AS cc
  FROM deg LEFT JOIN tri ON deg.n = tri.n
  WHERE deg.deg >= 2)
SELECT deg, COUNT(*) AS n_nodes,
       ROUND(CAST(SUM(CAST(ROUND(cc, 9) AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6) AS avg_cc
FROM cc
GROUP BY deg
ORDER BY deg
"""

QUERIES["q_clustering_coefficient"] = QuerySpec(
    q_clustering_coefficient,
    Q_CLUSTERING_SQL,
    "per-degree average local clustering coefficient (ordered wedge close)",
)
