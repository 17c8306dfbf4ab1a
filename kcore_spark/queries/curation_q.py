"""Round-6 curation / profiling / sketch block (SURVEY §2.3 N).

Training-data-pipeline and warehouse-operations queries: deterministic
dataset splitting, PII scrubbing, count-min heavy hitters, sketch
accuracy evaluation, snapshot diffing, association rules, sweep-line
concurrency, data profiling, and next-event training-pair assembly.
Every query pairs with an exact DuckDB oracle; all hashing uses the
portable md5-prefix arithmetic shared with operators/dedup.py.

Provenance: declared surface of OUR engine (SURVEY §2.3). The reference
implements no relational/data operators — its one dispatch arm is
ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`); this module
extends the driver-mandated query surface over the reference's declared
event-streaming data model (`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

# ------------------------------------------- deterministic dataset split


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified deterministic train/val/test assignment: split by a
    content-independent hash of the document id (md5-prefix mod 100 →
    80/10/10), reported per source stratum. The hash is the split
    CONTRACT: any engine re-deriving it assigns every doc identically,
    which is what makes splits reproducible across a 1000-executor
    fleet and across engines (the DuckDB oracle runs the same
    arithmetic). Plan: pure column math riding the scan + one
    partial-aggregated groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
            "long"
        ),
        F.lit(100),
    )
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select("source", split.alias("split"))
        .groupBy("source", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("source", "split")
    )


Q_DATASET_SPLIT_SQL = """
WITH b AS (
  SELECT source,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS bk
  FROM documents)
SELECT source,
       CASE WHEN bk < 80 THEN 'train' WHEN bk < 90 THEN 'val' ELSE 'test' END AS split,
       COUNT(*) AS n_docs
FROM b
GROUP BY 1, 2
ORDER BY source, split
"""

# ------------------------------------------------------- PII redaction

_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\d{3}[-.]\d{3}[-.]\d{4}"
_PII_LONGNUM = r"\d{9,}"


def q_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over the corpus: regex-redact emails / phone
    numbers / long digit runs and account per source. The fixture text
    carries no PII, so a deterministic synthetic contact line is
    appended to every 7th document BEFORE scrubbing (both sides do) —
    the point under test is the redaction pipeline, which is pure
    JVM-side regexp column work riding the scan (the production shape:
    scrub + count in one pass, no second scan for the audit
    numbers)."""
    docs = load_table(spark, sf_dir, "documents")
    salted = F.when(
        F.col("doc_id") % 7 == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact: user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or 555-010-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ),
    ).otherwise(F.col("text"))
    n_email = F.size(F.regexp_extract_all(salted, F.lit(_PII_EMAIL), F.lit(0)))
    red1 = F.regexp_replace(salted, _PII_EMAIL, "<EMAIL>")
    n_phone = F.size(F.regexp_extract_all(red1, F.lit(_PII_PHONE), F.lit(0)))
    red2 = F.regexp_replace(red1, _PII_PHONE, "<PHONE>")
    n_num = F.size(F.regexp_extract_all(red2, F.lit(_PII_LONGNUM), F.lit(0)))
    red3 = F.regexp_replace(red2, _PII_LONGNUM, "<NUM>")
    return (
        docs.select(
            "source",
            n_email.alias("ne"),
            n_phone.alias("np"),
            n_num.alias("nn"),
            F.length(red3).alias("redacted_len"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum((F.col("ne") + F.col("np") + F.col("nn") > 0).cast("int")).alias(
                "n_docs_with_pii"
            ),
            F.sum("ne").alias("n_emails"),
            F.sum("np").alias("n_phones"),
            F.sum("nn").alias("n_longnums"),
            F.sum("redacted_len").alias("total_redacted_len"),
        )
        .orderBy("source")
    )


Q_PII_REDACT_SQL = f"""
WITH salted AS (
  SELECT source,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' contact: user' || CAST(doc_id AS VARCHAR)
                   || '@example.com or 555-010-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS t
  FROM documents),
steps AS (
  SELECT source,
         len(regexp_extract_all(t, '{_PII_EMAIL}')) AS ne,
         regexp_replace(t, '{_PII_EMAIL}', '<EMAIL>', 'g') AS t1
  FROM salted),
steps2 AS (
  SELECT source, ne,
         len(regexp_extract_all(t1, '{_PII_PHONE}')) AS np,
         regexp_replace(t1, '{_PII_PHONE}', '<PHONE>', 'g') AS t2
  FROM steps),
steps3 AS (
  SELECT source, ne, np,
         len(regexp_extract_all(t2, '{_PII_LONGNUM}')) AS nn,
         regexp_replace(t2, '{_PII_LONGNUM}', '<NUM>', 'g') AS t3
  FROM steps2)
SELECT source, COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN ne + np + nn > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
       CAST(SUM(ne) AS BIGINT) AS n_emails, CAST(SUM(np) AS BIGINT) AS n_phones,
       CAST(SUM(nn) AS BIGINT) AS n_longnums,
       CAST(SUM(len(t3)) AS BIGINT) AS total_redacted_len
FROM steps3
GROUP BY source
ORDER BY source
"""

# --------------------------------------------- count-min heavy hitters


def q_countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter detection via count-min sketch: build a 4×256
    sketch over lineitem part keys (one partial-aggregated shuffle to
    ≤1024 counter rows, CONSTANT in key cardinality), then estimate
    the top-20 true parts through the broadcast sketch. est ≥ true
    always (collisions only add); the oracle replicates the sketch
    bit-for-bit, pinning the estimates, not just the truth."""
    from kcore_spark.operators.sketches import cms_estimate, count_min_sketch

    li = load_table(spark, sf_dir, "lineitem")
    key = F.col("l_partkey").cast("string")
    sketch = count_min_sketch(li, key, depth=4, width=256)
    # transient_persist: truth (20 rows, but its lineage is a full
    # groupBy + top-k over the fact table) feeds both the estimate
    # probe and the final join — uncached it computed twice
    from kcore_spark.caching import transient_persist

    truth = transient_persist(
        li.groupBy("l_partkey")
        .agg(F.count(F.lit(1)).alias("true_cnt"))
        .orderBy(F.col("true_cnt").desc(), F.col("l_partkey"))
        .limit(20)
    )
    est = cms_estimate(
        sketch, truth, F.col("l_partkey").cast("string"), depth=4, width=256
    )
    return (
        truth.join(est, truth.l_partkey.cast("string") == est.k)
        .select("l_partkey", "true_cnt", "est")
        .orderBy("l_partkey")
    )


Q_COUNTMIN_SQL = """
WITH hashes AS (
  SELECT l_partkey, j,
         ('0x' || substring(md5(CAST(l_partkey AS VARCHAR)), 1 + 8 * j, 8))::BIGINT % 256 AS bucket
  FROM lineitem, UNNEST([0, 1, 2, 3]) t(j)),
sketch AS (
  SELECT j, bucket, COUNT(*) AS cnt FROM hashes GROUP BY j, bucket),
truth AS (
  SELECT l_partkey, COUNT(*) AS true_cnt
  FROM lineitem GROUP BY l_partkey
  ORDER BY true_cnt DESC, l_partkey LIMIT 20),
probes AS (
  SELECT t.l_partkey, t.true_cnt, h.j,
         ('0x' || substring(md5(CAST(t.l_partkey AS VARCHAR)), 1 + 8 * h.j, 8))::BIGINT % 256 AS bucket
  FROM truth t, UNNEST([0, 1, 2, 3]) h(j))
SELECT p.l_partkey, p.true_cnt, MIN(s.cnt) AS est
FROM probes p JOIN sketch s ON s.j = p.j AND s.bucket = p.bucket
GROUP BY p.l_partkey, p.true_cnt
ORDER BY l_partkey
"""

# --------------------------------------------- sketch accuracy (minhash)


def q_minhash_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-quality monitoring: for every LSH candidate pair, the
    MinHash ESTIMATE of Jaccard (fraction of agreeing signature
    components) against the TRUE Jaccard computed only on the
    candidates — the production check that the banding/signature
    budget still delivers the recall the dedup pipeline assumes.
    Reuses the persisted shingle table and the 6-hash signatures of
    the LSH query (same md5 arithmetic, so the oracle pins the
    estimates bit-for-bit)."""
    from kcore_spark.operators.dedup import (
        jaccard_for_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )
    from kcore_spark.queries.dedup import shared_shingles

    sh = shared_shingles(spark, sf_dir)
    from kcore_spark.caching import transient_persist

    sigs = transient_persist(minhash_signatures(sh, num_hashes=6))
    cands = transient_persist(lsh_candidate_pairs(sigs, bands=3, rows=2))
    a = sigs.select(
        F.col("id").alias("id1"), *[F.col(f"sig{j}").alias(f"a{j}") for j in range(6)]
    )
    b = sigs.select(
        F.col("id").alias("id2"), *[F.col(f"sig{j}").alias(f"b{j}") for j in range(6)]
    )
    est = (
        cands.join(a, "id1")
        .join(b, "id2")
        .select(
            "id1",
            "id2",
            (
                sum((F.col(f"a{j}") == F.col(f"b{j}")).cast("int") for j in range(6))
                / F.lit(6.0)
            ).alias("est_jaccard"),
        )
    )
    true = jaccard_for_pairs(cands, sh, min_jaccard=0.0).select(
        "id1", "id2", F.col("jaccard").alias("true_jaccard")
    )
    return (
        est.join(true, ["id1", "id2"])
        .select("id1", "id2", "true_jaccard", "est_jaccard")
        .orderBy("id1", "id2")
    )


# NOTE: shares the shingle/signature CTEs with the minhash oracle
def _minhash_error_sql() -> str:
    from kcore_spark.queries.dedup import SHINGLES_CTE

    sig_cols = ",\n         ".join(
        f"MIN(('0x' || substring(md5('{j}|' || shingle), 1, 8))::BIGINT) AS sig{j}"
        for j in range(6)
    )
    agree = " + ".join(f"(x.sig{j} = y.sig{j})::INT" for j in range(6))
    return f"""
WITH {SHINGLES_CTE},
sigs AS (
  SELECT id,
         {sig_cols}
  FROM sh GROUP BY id),
cands AS (
  SELECT DISTINCT id1, id2 FROM (
    SELECT x.id AS id1, y.id AS id2 FROM sigs x JOIN sigs y
      ON x.sig0 = y.sig0 AND x.sig1 = y.sig1 AND x.id < y.id
    UNION
    SELECT x.id, y.id FROM sigs x JOIN sigs y
      ON x.sig2 = y.sig2 AND x.sig3 = y.sig3 AND x.id < y.id
    UNION
    SELECT x.id, y.id FROM sigs x JOIN sigs y
      ON x.sig4 = y.sig4 AND x.sig5 = y.sig5 AND x.id < y.id)),
est AS (
  SELECT c.id1, c.id2, ({agree}) / 6.0 AS est_jaccard
  FROM cands c JOIN sigs x ON x.id = c.id1 JOIN sigs y ON y.id = c.id2),
cid AS (SELECT id1 AS id FROM cands UNION SELECT id2 FROM cands),
shc AS (SELECT sh.id, sh.shingle FROM sh JOIN cid USING (id)),
sizes AS (SELECT id, COUNT(*) AS sz FROM shc GROUP BY id),
inter AS (
  SELECT c.id1, c.id2, COUNT(*) AS i
  FROM cands c
  JOIN shc a ON a.id = c.id1
  JOIN shc b ON b.id = c.id2 AND b.shingle = a.shingle
  GROUP BY 1, 2),
tru AS (
  SELECT c.id1, c.id2,
         CAST(COALESCE(i.i, 0) AS DOUBLE) / (sa.sz + sb.sz - COALESCE(i.i, 0)) AS true_jaccard
  FROM cands c
  LEFT JOIN inter i ON i.id1 = c.id1 AND i.id2 = c.id2
  JOIN sizes sa ON sa.id = c.id1
  JOIN sizes sb ON sb.id = c.id2)
SELECT e.id1, e.id2, t.true_jaccard, e.est_jaccard
FROM est e JOIN tru t ON t.id1 = e.id1 AND t.id2 = e.id2
ORDER BY e.id1, e.id2
"""


# ------------------------------------------------------- snapshot diff


def q_table_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff (the CDC/audit primitive): compare the orders
    table against a deterministically mutated next version (price
    bumps on keys ≡0 mod 13, deletions ≡0 mod 17, new keys cloned
    from ≡0 mod 19) and classify every key added / removed / changed /
    unchanged, with per-column change counts — one full outer join on
    the key, the shape a 100 TB snapshot reconciliation runs (hash-
    partitioned on the join key, no skew: keys are unique)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", "o_orderstatus"
    )
    shift = F.lit(1_000_000_000)
    new_rows = (
        orders.where(F.col("o_orderkey") % 19 == 0)
        .select(
            (F.col("o_orderkey") + shift).alias("o_orderkey"),
            "o_totalprice",
            "o_orderstatus",
        )
    )
    v2 = (
        orders.where(~(F.col("o_orderkey") % 17 == 0))
        .select(
            "o_orderkey",
            F.when(
                F.col("o_orderkey") % 13 == 0, F.col("o_totalprice") + 10
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
            "o_orderstatus",
        )
        .unionByName(new_rows)
    )
    a = orders.alias("a")
    b = v2.alias("b")
    joined = a.join(b, F.col("a.o_orderkey") == F.col("b.o_orderkey"), "full_outer")
    status = (
        F.when(F.col("a.o_orderkey").isNull(), F.lit("added"))
        .when(F.col("b.o_orderkey").isNull(), F.lit("removed"))
        .when(
            (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            | (F.col("a.o_orderstatus") != F.col("b.o_orderstatus")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return (
        joined.select(
            status.alias("status"),
            (
                F.col("a.o_orderkey").isNotNull()
                & F.col("b.o_orderkey").isNotNull()
                & (F.col("a.o_totalprice") != F.col("b.o_totalprice"))
            )
            .cast("int")
            .alias("price_changed"),
        )
        .groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n_keys"),
            F.sum("price_changed").alias("n_price_changed"),
        )
        .orderBy("status")
    )


Q_TABLE_DIFF_SQL = """
WITH v1 AS (SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders),
v2 AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 13 = 0 THEN o_totalprice + 10 ELSE o_totalprice END AS o_totalprice,
         o_orderstatus
  FROM orders WHERE NOT (o_orderkey % 17 = 0)
  UNION ALL
  SELECT o_orderkey + 1000000000, o_totalprice, o_orderstatus
  FROM orders WHERE o_orderkey % 19 = 0),
j AS (
  SELECT a.o_orderkey AS ka, b.o_orderkey AS kb,
         a.o_totalprice AS pa, b.o_totalprice AS pb,
         a.o_orderstatus AS sa, b.o_orderstatus AS sb
  FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey)
SELECT CASE WHEN ka IS NULL THEN 'added'
            WHEN kb IS NULL THEN 'removed'
            WHEN pa <> pb OR sa <> sb THEN 'changed'
            ELSE 'unchanged' END AS status,
       COUNT(*) AS n_keys,
       CAST(SUM(CASE WHEN ka IS NOT NULL AND kb IS NOT NULL AND pa <> pb THEN 1 ELSE 0 END) AS BIGINT) AS n_price_changed
FROM j
GROUP BY 1
ORDER BY status
"""

# --------------------------------------------------- association rules


def q_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed association rules brand_a → brand_b over order baskets:
    support, confidence, and lift for pairs with support ≥ 20 orders.
    The co-occurrence join is per-order (bounded basket width), never
    catalog²; single-brand supports broadcast onto the pair table.
    Complements q_basket_pmi (symmetric information) with the directed
    recommendation-rule form."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    baskets = (
        li.join(F.broadcast(part.select("p_partkey", "p_brand")), li.l_partkey == part.p_partkey)
        .select("l_orderkey", "p_brand")
        .distinct()
    )
    n_orders = baskets.select("l_orderkey").distinct().count()
    single = baskets.groupBy("p_brand").agg(F.count(F.lit(1)).alias("supp_single"))
    a = baskets.withColumnsRenamed({"p_brand": "brand_a"})
    b = baskets.withColumnsRenamed({"p_brand": "brand_b"})
    pair = (
        a.join(b, "l_orderkey")
        .where(F.col("brand_a") != F.col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(F.count(F.lit(1)).alias("supp_pair"))
        .where(F.col("supp_pair") >= 20)
    )
    sa = single.withColumnsRenamed({"p_brand": "brand_a", "supp_single": "supp_a"})
    sb = single.withColumnsRenamed({"p_brand": "brand_b", "supp_single": "supp_b"})
    return (
        pair.join(F.broadcast(sa), "brand_a")
        .join(F.broadcast(sb), "brand_b")
        .select(
            "brand_a",
            "brand_b",
            "supp_pair",
            (F.col("supp_pair") / F.col("supp_a")).alias("confidence"),
            (
                F.col("supp_pair")
                * F.lit(float(n_orders))
                / (F.col("supp_a") * F.col("supp_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("confidence").desc(), "brand_a", "brand_b")
        .limit(50)
    )


Q_ASSOC_RULES_SQL = """
WITH baskets AS (
  SELECT DISTINCT l_orderkey, p_brand
  FROM lineitem JOIN part ON l_partkey = p_partkey),
n AS (SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM baskets),
single AS (SELECT p_brand, COUNT(*) AS supp FROM baskets GROUP BY p_brand),
pair AS (
  SELECT a.p_brand AS brand_a, b.p_brand AS brand_b, COUNT(*) AS supp_pair
  FROM baskets a JOIN baskets b
    ON a.l_orderkey = b.l_orderkey AND a.p_brand <> b.p_brand
  GROUP BY 1, 2
  HAVING COUNT(*) >= 20)
SELECT brand_a, brand_b, supp_pair,
       supp_pair / sa.supp AS confidence,
       supp_pair * (SELECT CAST(n_orders AS DOUBLE) FROM n) / (sa.supp * sb.supp) AS lift
FROM pair
JOIN single sa ON sa.p_brand = brand_a
JOIN single sb ON sb.p_brand = brand_b
ORDER BY confidence DESC, brand_a, brand_b
LIMIT 50
"""

# --------------------------------------------- sweep-line concurrency


def q_max_concurrent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrency per event type via sweep line: each event
    holds a 30-minute slot; +1/-1 deltas sorted by time give a running
    occupancy whose max is the answer (the classic interval problem
    that range joins can't do in one pass). Half-open intervals: an
    end at instant t frees its slot before a start at t claims one
    (delta −1 sorts first). One explode + one window per type — no
    pair joins, no quadratic interval overlap."""
    ev = load_table(spark, sf_dir, "events")
    slot_ms = 30 * 60 * 1000
    t0 = (F.unix_millis(F.col("ts").cast("timestamp"))).alias("t0")
    pts = ev.select(
        "event_type",
        F.col("event_id"),
        F.explode(
            F.array(
                F.struct(t0, F.lit(1).alias("delta")),
                F.struct(
                    (F.unix_millis(F.col("ts").cast("timestamp")) + slot_ms).alias(
                        "t0"
                    ),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("p"),
    ).select(
        "event_type",
        F.col("p.t0").alias("t"),
        F.col("p.delta").alias("delta"),
        "event_id",
    )
    w = Window.partitionBy("event_type").orderBy("t", "delta", "event_id")
    running = pts.withColumn("occ", F.sum("delta").over(w))
    mx = running.groupBy("event_type").agg(F.max("occ").alias("max_concurrent"))
    return (
        running.join(F.broadcast(mx), "event_type")
        .where(F.col("occ") == F.col("max_concurrent"))
        .groupBy("event_type", "max_concurrent")
        .agg(F.min("t").alias("first_peak_ms"))
        .orderBy("event_type")
    )


Q_MAX_CONCURRENT_SQL = """
WITH pts AS (
  SELECT event_type, epoch_ms(CAST(ts AS TIMESTAMP)) AS t, 1 AS delta, event_id
  FROM events
  UNION ALL
  SELECT event_type, epoch_ms(CAST(ts AS TIMESTAMP)) + 1800000, -1, event_id
  FROM events),
run AS (
  SELECT event_type, t, delta,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta, event_id) AS occ
  FROM pts),
mx AS (SELECT event_type, CAST(MAX(occ) AS BIGINT) AS max_concurrent FROM run GROUP BY event_type)
SELECT r.event_type, m.max_concurrent, MIN(r.t) AS first_peak_ms
FROM run r JOIN mx m ON m.event_type = r.event_type AND r.occ = m.max_concurrent
GROUP BY r.event_type, m.max_concurrent
ORDER BY r.event_type
"""

# ------------------------------------------------------- data profiling


def q_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column profiling (the warehouse intake step): an equi-width
    10-bucket histogram of o_totalprice plus per-bucket share. The
    min/max bounds come from a 1-row broadcast cross (control-plane
    aggregate), then bucketing is pure column math riding the scan —
    the single-pass profile shape that scales to any table width by
    adding columns, not jobs."""
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.min("o_totalprice").alias("lo"), F.max("o_totalprice").alias("hi")
    )
    n_total = orders.count()
    width = (F.col("hi") - F.col("lo")) / 10.0
    bucketed = orders.crossJoin(F.broadcast(bounds)).select(
        F.least(
            F.floor((F.col("o_totalprice") - F.col("lo")) / width).cast("int"),
            F.lit(9),
        ).alias("bucket")
    )
    return (
        bucketed.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            (F.count(F.lit(1)) / F.lit(float(n_total))).alias("share"),
        )
        .orderBy("bucket")
    )


Q_PROFILE_ORDERS_SQL = """
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi,
         CAST(COUNT(*) AS DOUBLE) AS n FROM orders)
SELECT LEAST(CAST(FLOOR((o_totalprice - lo) / ((hi - lo) / 10.0)) AS INT), 9) AS bucket,
       COUNT(*) AS n_rows,
       COUNT(*) / (SELECT n FROM bounds) AS share
FROM orders, bounds
GROUP BY 1
ORDER BY bucket
"""

# -------------------------------------- next-event training pairs


def q_next_event_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-model training-pair assembly: per user, each event
    becomes a (prev2, prev1 → label) example via lag windows; output
    is the aggregated label distribution per 2-gram context — the
    dataset-statistics view a next-event model trains against. One
    window per user (the already-partitioned layout), one
    partial-aggregated groupBy; no self-joins."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.lag("event_type", 2).over(w).alias("ctx1"),
        F.lag("event_type", 1).over(w).alias("ctx2"),
        F.col("event_type").alias("label"),
    ).where(F.col("ctx1").isNotNull())
    return (
        pairs.groupBy("ctx1", "ctx2", "label")
        .agg(F.count(F.lit(1)).alias("n_examples"))
        .orderBy("ctx1", "ctx2", "label")
    )


Q_NEXT_EVENT_SQL = """
WITH seq AS (
  SELECT user_id,
         LAG(event_type, 2) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ctx1,
         LAG(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS ctx2,
         event_type AS label
  FROM events)
SELECT ctx1, ctx2, label, COUNT(*) AS n_examples
FROM seq
WHERE ctx1 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY ctx1, ctx2, label
"""


QUERIES = {
    "q_dataset_split": QuerySpec(
        q_dataset_split, Q_DATASET_SPLIT_SQL, "deterministic stratified train/val/test split"
    ),
    "q_pii_redact": QuerySpec(q_pii_redact, Q_PII_REDACT_SQL, "regex PII scrubbing + audit counts"),
    "q_countmin_heavy_hitters": QuerySpec(
        q_countmin_heavy_hitters, Q_COUNTMIN_SQL, "count-min sketch heavy hitters"
    ),
    "q_minhash_error": QuerySpec(
        q_minhash_error, _minhash_error_sql(), "MinHash estimate vs true Jaccard"
    ),
    "q_table_diff": QuerySpec(q_table_diff, Q_TABLE_DIFF_SQL, "snapshot diff / CDC classify"),
    "q_assoc_rules": QuerySpec(
        q_assoc_rules, Q_ASSOC_RULES_SQL, "association rules (support/confidence/lift)"
    ),
    "q_max_concurrent": QuerySpec(
        q_max_concurrent, Q_MAX_CONCURRENT_SQL, "sweep-line peak concurrency"
    ),
    "q_profile_orders": QuerySpec(
        q_profile_orders, Q_PROFILE_ORDERS_SQL, "equi-width histogram profiling"
    ),
    "q_next_event_pairs": QuerySpec(
        q_next_event_pairs, Q_NEXT_EVENT_SQL, "next-event training-pair assembly"
    ),
}

# ------------------------------------------- per-dimension feature scaling


def q_feature_scaling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension z-score normalization audit — the embedding
    preprocessing step before quantization/indexing. One posexplode →
    one partial-aggregated groupBy per dimension computing mean/std
    via decimal-exact sums (bit-stable under any accumulation order,
    the FIXTURES.md determinism rule), plus the |z| > 3 outlier-entry
    count a feature-drift monitor alarms on. Dimensions scale the
    GROUP count, not the shuffle width — at 100 TB this is one scan
    and one shuffle of (dim, partial-sums) rows."""
    emb = load_table(spark, sf_dir, "embeddings")
    x = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x")
    )
    stats = x.groupBy("pos").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("x").cast("decimal(28,12)")).alias("s"),
        F.sum((F.col("x") * F.col("x")).cast("decimal(28,12)")).alias("s2"),
    )
    m = (F.col("s").cast("double") / F.col("n")).alias("mean")
    var = (F.col("s2").cast("double") / F.col("n")) - (
        F.col("s").cast("double") / F.col("n")
    ) * (F.col("s").cast("double") / F.col("n"))
    stats = stats.select(
        "pos", "n", m, F.sqrt(var).alias("std")
    )
    z = x.join(F.broadcast(stats), "pos").select(
        "pos", ((F.col("x") - F.col("mean")) / F.col("std")).alias("z")
    )
    return (
        z.groupBy("pos")
        .agg(F.sum((F.abs(F.col("z")) > 3).cast("int")).alias("n_outliers"))
        .join(stats, "pos")
        .select("pos", "n", "mean", "std", "n_outliers")
        .orderBy("pos")
    )


Q_FEATURE_SCALING_SQL = """
WITH x AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS pos,
         UNNEST(embedding::DOUBLE[]) AS x
  FROM embeddings),
stats AS (
  SELECT pos, COUNT(*) AS n,
         CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*) AS mean,
         sqrt(CAST(SUM(CAST(x * x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*)
              - (CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*))
              * (CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) / COUNT(*))) AS std
  FROM x GROUP BY pos)
SELECT s.pos, s.n, s.mean, s.std,
       CAST(SUM(CASE WHEN abs((x.x - s.mean) / s.std) > 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
FROM x JOIN stats s ON s.pos = x.pos
GROUP BY s.pos, s.n, s.mean, s.std
ORDER BY s.pos
"""

# ------------------------------------------------ inter-rater agreement


def q_cohens_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-annotator agreement (Cohen's kappa) between two derived
    'raters' of order value — the label-quality gate an annotation
    pipeline runs before training on labels. Rater A: price tercile by
    fixed thresholds; rater B: the order priority collapsed to 3
    buckets. One groupBy builds the confusion matrix; kappa =
    (po − pe) / (1 − pe) from its margins (1-row reduction)."""
    orders = load_table(spark, sf_dir, "orders")
    ra = (
        F.when(F.col("o_totalprice") < 75000, F.lit(0))
        .when(F.col("o_totalprice") < 150000, F.lit(1))
        .otherwise(F.lit(2))
    )
    rb = (
        F.when(F.col("o_orderpriority").isin("1-URGENT", "2-HIGH"), F.lit(0))
        .when(F.col("o_orderpriority") == "3-MEDIUM", F.lit(1))
        .otherwise(F.lit(2))
    )
    conf = (
        orders.select(ra.alias("a"), rb.alias("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    tot = conf.agg(
        F.sum("n").alias("n_total"),
        F.sum(F.when(F.col("a") == F.col("b"), F.col("n")).otherwise(0)).alias("agree"),
    )
    ma = conf.groupBy("a").agg(F.sum("n").alias("na"))
    mb = conf.groupBy("b").agg(F.sum("n").alias("nb"))
    pe = (
        ma.join(mb, ma.a == mb.b)
        .select(F.sum(F.col("na") * F.col("nb")).alias("pe_num"))
    )
    return (
        tot.crossJoin(pe)
        .select(
            F.col("n_total"),
            (F.col("agree") / F.col("n_total")).alias("po"),
            (F.col("pe_num") / (F.col("n_total") * F.col("n_total"))).alias("pe"),
            (
                (
                    (F.col("agree") / F.col("n_total"))
                    - (F.col("pe_num") / (F.col("n_total") * F.col("n_total")))
                )
                / (1 - (F.col("pe_num") / (F.col("n_total") * F.col("n_total"))))
            ).alias("kappa"),
        )
    )


Q_COHENS_KAPPA_SQL = """
WITH lab AS (
  SELECT CASE WHEN o_totalprice < 75000 THEN 0
              WHEN o_totalprice < 150000 THEN 1 ELSE 2 END AS a,
         CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0
              WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 2 END AS b
  FROM orders),
conf AS (SELECT a, b, COUNT(*) AS n FROM lab GROUP BY a, b),
tot AS (
  SELECT CAST(SUM(n) AS BIGINT) AS n_total,
         SUM(CASE WHEN a = b THEN n ELSE 0 END) AS agree
  FROM conf),
ma AS (SELECT a, SUM(n) AS na FROM conf GROUP BY a),
mb AS (SELECT b, SUM(n) AS nb FROM conf GROUP BY b),
pe AS (SELECT SUM(na * nb) AS pe_num FROM ma JOIN mb ON ma.a = mb.b)
SELECT n_total,
       agree / CAST(n_total AS DOUBLE) AS po,
       pe_num / (CAST(n_total AS DOUBLE) * n_total) AS pe,
       ((agree / CAST(n_total AS DOUBLE)) - pe_num / (CAST(n_total AS DOUBLE) * n_total))
       / (1 - pe_num / (CAST(n_total AS DOUBLE) * n_total)) AS kappa
FROM tot, pe
"""


QUERIES["q_feature_scaling"] = QuerySpec(
    q_feature_scaling, Q_FEATURE_SCALING_SQL, "per-dimension z-score audit"
)
QUERIES["q_cohens_kappa"] = QuerySpec(
    q_cohens_kappa, Q_COHENS_KAPPA_SQL, "inter-annotator agreement (Cohen's kappa)"
)

# ------------------------------------------------ data-quality expectations


def q_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative DQ suite over orders (operators/expectations.py):
    seven checks — null/duplicate/domain/range/format/referential —
    where the scan-able ones fold into ONE aggregate pass and only
    uniqueness/referential pay their own (necessary) shuffles. The
    oracle recomputes every violation count relationally; the fixture
    is clean, so the interesting content is the check algebra itself
    (null-aware accepted_values, composite-key uniqueness, anti-join
    referential integrity), each pinned exactly."""
    from kcore_spark.operators.expectations import ExpectationSuite

    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    suite = (
        ExpectationSuite(orders)
        .not_null("o_orderkey")
        .not_null("o_orderdate")
        .accepted_values("o_orderstatus", ["O", "F", "P"])
        .in_range("o_totalprice", 0, 1_000_000)
        .matches("o_orderpriority", r"^[1-5]-[A-Z ]+$")
        .unique("o_orderkey")
        .relationship("o_custkey", customer, "c_custkey")
    )
    return suite.run().orderBy("expectation", "column")


Q_DQ_EXPECTATIONS_SQL = """
WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_rows FROM orders)
SELECT * FROM (
  SELECT 'accepted_values' AS expectation, 'o_orderstatus' AS "column",
         CAST(COUNT(*) FILTER (o_orderstatus NOT IN ('O','F','P') OR o_orderstatus IS NULL) AS BIGINT) AS violations,
         (SELECT n_rows FROM n) AS n_rows
  FROM orders
  UNION ALL
  SELECT 'in_range', 'o_totalprice',
         CAST(COUNT(*) FILTER (o_totalprice IS NULL OR o_totalprice < 0 OR o_totalprice > 1000000) AS BIGINT),
         (SELECT n_rows FROM n)
  FROM orders
  UNION ALL
  SELECT 'matches', 'o_orderpriority',
         CAST(COUNT(*) FILTER (o_orderpriority IS NULL OR NOT regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')) AS BIGINT),
         (SELECT n_rows FROM n)
  FROM orders
  UNION ALL
  SELECT 'not_null', 'o_orderdate',
         CAST(COUNT(*) FILTER (o_orderdate IS NULL) AS BIGINT), (SELECT n_rows FROM n)
  FROM orders
  UNION ALL
  SELECT 'not_null', 'o_orderkey',
         CAST(COUNT(*) FILTER (o_orderkey IS NULL) AS BIGINT), (SELECT n_rows FROM n)
  FROM orders
  UNION ALL
  SELECT 'relationship', 'o_custkey',
         CAST((SELECT COUNT(*) FROM orders o
               WHERE o.o_custkey IS NOT NULL
                 AND NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)) AS BIGINT),
         (SELECT n_rows FROM n)
  UNION ALL
  SELECT 'unique', 'o_orderkey',
         CAST(COALESCE((SELECT SUM(cnt - 1) FROM
               (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey HAVING COUNT(*) > 1)), 0) AS BIGINT),
         (SELECT n_rows FROM n)
)
ORDER BY expectation, "column"
"""

QUERIES["q_dq_expectations"] = QuerySpec(
    q_dq_expectations, Q_DQ_EXPECTATIONS_SQL, "one-pass declarative DQ suite"
)

# ------------------------------------------------- rolling-origin backtest


def q_backtest_folds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-origin cross-validation folds — the leakage-safe
    time-series evaluation protocol: fold k trains on everything
    before a cutoff and tests on the next window. Four monthly
    cutoffs over the events range; each fold reports train/test sizes
    and the train-vs-test mean-value shift (the drift signal that
    invalidates a fold). One scan crossed with a 4-row broadcast fold
    table — never one job per fold."""
    ev = load_table(spark, sf_dir, "events")
    folds = spark.createDataFrame(
        [(1, "2024-01-08"), (2, "2024-01-15"), (3, "2024-01-22"), (4, "2024-01-29")],
        "fold int, cutoff string",
    ).select("fold", F.to_timestamp("cutoff").alias("cutoff"))
    tagged = ev.crossJoin(F.broadcast(folds)).withColumn(
        "role",
        F.when(F.col("ts") < F.col("cutoff"), F.lit("train"))
        .when(F.col("ts") < F.col("cutoff") + F.expr("INTERVAL 7 DAYS"), F.lit("test"))
        .otherwise(F.lit(None)),
    ).where(F.col("role").isNotNull())
    per_role = tagged.groupBy("fold", "role").agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum(F.col("value").cast("decimal(18,6)")).cast("double") / F.count(F.lit(1))).alias("mean_value"),
    )
    train = per_role.where(F.col("role") == "train").select(
        "fold", F.col("n").alias("n_train"), F.col("mean_value").alias("train_mean")
    )
    test = per_role.where(F.col("role") == "test").select(
        "fold", F.col("n").alias("n_test"), F.col("mean_value").alias("test_mean")
    )
    return (
        train.join(test, "fold")
        .select(
            "fold",
            "n_train",
            "n_test",
            "train_mean",
            "test_mean",
            (F.col("test_mean") - F.col("train_mean")).alias("mean_shift"),
        )
        .orderBy("fold")
    )


Q_BACKTEST_SQL = """
WITH folds AS (
  SELECT * FROM (VALUES (1, TIMESTAMP '2024-01-08'), (2, TIMESTAMP '2024-01-15'),
                        (3, TIMESTAMP '2024-01-22'), (4, TIMESTAMP '2024-01-29'))
  t(fold, cutoff)),
tagged AS (
  SELECT f.fold,
         CASE WHEN CAST(e.ts AS TIMESTAMP) < f.cutoff THEN 'train'
              WHEN CAST(e.ts AS TIMESTAMP) < f.cutoff + INTERVAL 7 DAY THEN 'test'
              END AS role,
         e.value
  FROM events e CROSS JOIN folds f),
per_role AS (
  SELECT fold, role, COUNT(*) AS n,
         CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) / COUNT(*) AS mean_value
  FROM tagged WHERE role IS NOT NULL
  GROUP BY fold, role)
SELECT tr.fold, tr.n AS n_train, te.n AS n_test,
       tr.mean_value AS train_mean, te.mean_value AS test_mean,
       te.mean_value - tr.mean_value AS mean_shift
FROM per_role tr JOIN per_role te
  ON tr.fold = te.fold AND tr.role = 'train' AND te.role = 'test'
ORDER BY tr.fold
"""

QUERIES["q_backtest_folds"] = QuerySpec(
    q_backtest_folds, Q_BACKTEST_SQL, "rolling-origin backtest folds + drift"
)

# ------------------------------------------------- embedding truncation


def q_matryoshka_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-dimension ablation (the Matryoshka/MRL question: how
    much similarity signal survives truncating vectors to the first k
    dims). For each budget k, the mean and worst absolute gap between
    truncated-dim cosine and full cosine over the label-blocked pair
    set of q_embedding_neardup — pure array-slice folds riding the
    same equi-join, no extra shuffles per budget."""
    from kcore_spark.operators.similarity import as_double, dot

    emb = load_table(spark, sf_dir, "embeddings")
    n = emb.select(
        F.col("vec_id").alias("id"),
        as_double(F.col("embedding")).alias("e"),
        "label",
    )
    # element products/squares are computed ONCE per pair; each budget's
    # dot/norm is then a prefix-slice fold over the shared arrays —
    # 5 cosines for the price of one zip_with pass (9.0s → ~3s at sf0.1)
    sq = lambda c: F.zip_with(c, c, lambda x, y: x * y)  # noqa: E731
    a = n.select(
        F.col("id").alias("id1"), F.col("e").alias("e1"), sq(F.col("e")).alias("sq1"), "label"
    )
    b = n.select(
        F.col("id").alias("id2"), F.col("e").alias("e2"), sq(F.col("e")).alias("sq2"), "label"
    )
    pairs = (
        a.join(b, "label")
        .where(F.col("id1") < F.col("id2"))
        .withColumn("prod", F.zip_with("e1", "e2", lambda x, y: x * y))
    )
    fold = lambda c: F.aggregate(c, F.lit(0.0), lambda acc, v: acc + v)  # noqa: E731

    def cos_k(k: int | None):
        pick = (lambda c: c) if k is None else (lambda c: F.slice(c, 1, k))
        return fold(pick(F.col("prod"))) / (
            F.sqrt(fold(pick(F.col("sq1")))) * F.sqrt(fold(pick(F.col("sq2"))))
        )

    budgets = [4, 8, 16, 32]
    scored = pairs.select(
        *[F.abs(cos_k(k) - cos_k(None)).alias(f"gap{k}") for k in budgets]
    )
    rows = scored.agg(
        *[F.avg(f"gap{k}").alias(f"avg{k}") for k in budgets],
        *[F.max(f"gap{k}").alias(f"max{k}") for k in budgets],
    )
    out = rows.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("dims"),
                        F.col(f"avg{k}").alias("mean_abs_gap"),
                        F.col(f"max{k}").alias("max_abs_gap"),
                    )
                    for k in budgets
                ]
            )
        ).alias("r")
    )
    return out.select("r.dims", "r.mean_abs_gap", "r.max_abs_gap").orderBy("dims")


def _matryoshka_sql():
    budgets = [4, 8, 16, 32]
    arms = []
    for k in budgets:
        arms.append(f"""
  SELECT {k} AS dims,
         AVG(ABS(list_inner_product(e1[1:{k}], e2[1:{k}])
                 / (sqrt(list_inner_product(e1[1:{k}], e1[1:{k}]))
                    * sqrt(list_inner_product(e2[1:{k}], e2[1:{k}])))
                 - full_cos)) AS mean_abs_gap,
         MAX(ABS(list_inner_product(e1[1:{k}], e2[1:{k}])
                 / (sqrt(list_inner_product(e1[1:{k}], e1[1:{k}]))
                    * sqrt(list_inner_product(e2[1:{k}], e2[1:{k}])))
                 - full_cos)) AS max_abs_gap
  FROM pairs""")
    return f"""
WITH n AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings),
pairs AS (
  SELECT a.e AS e1, b.e AS e2,
         list_inner_product(a.e, b.e)
         / (sqrt(list_inner_product(a.e, a.e)) * sqrt(list_inner_product(b.e, b.e))) AS full_cos
  FROM n a JOIN n b ON a.label = b.label AND a.vec_id < b.vec_id)
{" UNION ALL ".join(arms)}
ORDER BY dims
"""


QUERIES["q_matryoshka_ablation"] = QuerySpec(
    q_matryoshka_ablation, _matryoshka_sql(), "embedding truncation ablation (MRL)"
)
