"""Data-quality / curation queries (SURVEY §2 block M extensions):
TF-IDF salient terms, asymmetric containment dedup, char-class
entropy, unigram KL source drift, MAD robust outliers, MERGE-style
snapshot upsert.

These are the corpus-health signals a training-data pipeline computes
next to dedup: per-document salience (TF-IDF), subset duplication
(containment — what Jaccard misses), gibberish detection (entropy),
distribution drift between sources (KL divergence), robust outlier
flagging (median/MAD, immune to the outliers themselves), and the
upsert that folds a correction batch into a snapshot.

Determinism: every floating aggregate either sums decimals (exact,
order-free) or is an order-free min/max/count; ln() appears only in
per-row expressions whose integer inputs are identical on both
engines. See FIXTURES.md for the general rules.

Provenance: declared surface of OUR engine (SURVEY §2.3/§2-M). The
reference implements no relational/data operators — its one dispatch
arm is ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:84-97`);
this module realizes the driver-mandated query surface over the
reference's declared event-streaming data model
(`/root/reference/README.md:17,27`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.caching import transient_persist
from kcore_spark.catalog import load_table
from kcore_spark.operators.dedup import containment_pairs
from kcore_spark.operators.text import words
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.dedup import SHINGLES_CTE, shared_shingles

# -------------------------------------------------- TF-IDF top terms


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per document by TF-IDF (tf · ln(N/df)).

    Plan: explode → (doc, term) counts → term df aggregate (vocab-
    sized, broadcast back) → per-doc top-k window. At 100 TB the only
    big shuffles are the two aggregations, both partial-aggregated
    map-side; the df table is vocabulary-sized (≪ corpus) so the join
    back is a broadcast, and the top-k window repartitions by doc_id
    only the (doc, term) count table, never raw tokens."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("doc_id", F.explode(words("text")).alias("term"))
    tf = terms.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    total = docs.agg(F.count(F.lit(1)).cast("double").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(total))
        .withColumn(
            "tfidf", F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6)
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .where(F.col("rk") <= 3)
        .select("doc_id", "rk", "term", "tf", "df", "tfidf")
        .orderBy("doc_id", "rk")
    )


Q_TFIDF_SQL = """
WITH w AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w GROUP BY 1, 2),
dfq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
tot AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs FROM documents),
scored AS (
  SELECT doc_id, t.term, tf, df, ROUND(tf * ln(n_docs / df), 6) AS tfidf
  FROM tf t JOIN dfq USING (term) CROSS JOIN tot),
rk AS (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY doc_id
                 ORDER BY tfidf DESC, term) AS INT) AS rk
  FROM scored)
SELECT doc_id, rk, term, tf, df, tfidf
FROM rk WHERE rk <= 3
ORDER BY doc_id, rk
"""

# -------------------------------------------------- asymmetric containment


def q_ngram_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subset-duplication pairs: smaller doc ≥60%-contained in larger.

    The production df cutoff (max_df) is applied on BOTH engines —
    unlike the oracle-pinned exact Jaccard, this query pins the
    bounded production path itself."""
    sh = shared_shingles(spark, sf_dir)
    return containment_pairs(sh, min_containment=0.6, max_df=10_000).orderBy(
        "src_id", "dst_id"
    )


Q_CONTAINMENT_SQL = f"""
WITH {SHINGLES_CTE},
shf AS (
  SELECT id, shingle FROM sh
  QUALIFY COUNT(*) OVER (PARTITION BY shingle) <= 10000),
sizes AS (SELECT id, COUNT(*) AS sz FROM shf GROUP BY id),
inter AS (
  SELECT a.id AS id1, b.id AS id2, COUNT(*) AS i
  FROM shf a JOIN shf b ON a.shingle = b.shingle AND a.id < b.id
  GROUP BY 1, 2),
dir AS (
  SELECT CASE WHEN sa.sz <= sb.sz THEN id1 ELSE id2 END AS src_id,
         CASE WHEN sa.sz <= sb.sz THEN id2 ELSE id1 END AS dst_id,
         i, LEAST(sa.sz, sb.sz) AS sz_src, GREATEST(sa.sz, sb.sz) AS sz_dst
  FROM inter JOIN sizes sa ON sa.id = id1 JOIN sizes sb ON sb.id = id2)
SELECT src_id, dst_id, CAST(i AS DOUBLE) / sz_src AS containment, sz_src, sz_dst
FROM dir
WHERE CAST(i AS DOUBLE) / sz_src >= 0.6
ORDER BY src_id, dst_id
"""

# -------------------------------------------------- char-class entropy


def q_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language character-class entropy profile (gibberish signal).

    Entropy over {letter, digit, whitespace, other} per document —
    natural-text entropy sits in a narrow band; binary junk and
    repeated-char spam fall outside it. The per-doc entropy is pure
    per-row arithmetic riding the scan; the per-language aggregate
    sums decimals (exact, order-free) so the answer is bit-stable
    under any partitioning."""
    docs = load_table(spark, sf_dir, "documents")
    n = F.length("text").cast("double")
    a = F.regexp_count("text", F.lit("[A-Za-z]")).cast("double")
    d = F.regexp_count("text", F.lit("[0-9]")).cast("double")
    s = F.regexp_count("text", F.lit("\\s")).cast("double")
    o = n - a - d - s

    def term(c: F.Column) -> F.Column:
        p = c / n
        return F.when(c > 0, -p * F.log(p)).otherwise(F.lit(0.0))

    ent = term(a) + term(d) + term(s) + term(o)
    per_doc = docs.select("lang", F.round(ent, 9).alias("ent"))
    return (
        per_doc.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("ent").alias("min_ent"),
            F.max("ent").alias("max_ent"),
            F.sum(F.col("ent").cast("decimal(28,9)")).cast("double").alias("sum_ent"),
        )
        .withColumn("avg_ent", F.round(F.col("sum_ent") / F.col("n_docs"), 6))
        .orderBy("lang")
    )


Q_CHAR_ENTROPY_SQL = """
WITH cls AS (
  SELECT lang,
         CAST(LENGTH(text) AS DOUBLE) AS n,
         CAST(LEN(regexp_extract_all(text, '[A-Za-z]')) AS DOUBLE) AS a,
         CAST(LEN(regexp_extract_all(text, '[0-9]')) AS DOUBLE) AS d,
         CAST(LEN(regexp_extract_all(text, '\\s')) AS DOUBLE) AS s
  FROM documents),
ent AS (
  SELECT lang,
         ROUND(
           (CASE WHEN a > 0 THEN -(a/n) * ln(a/n) ELSE 0.0 END)
         + (CASE WHEN d > 0 THEN -(d/n) * ln(d/n) ELSE 0.0 END)
         + (CASE WHEN s > 0 THEN -(s/n) * ln(s/n) ELSE 0.0 END)
         + (CASE WHEN (n-a-d-s) > 0 THEN -((n-a-d-s)/n) * ln((n-a-d-s)/n) ELSE 0.0 END),
         9) AS ent
  FROM cls)
SELECT lang, COUNT(*) AS n_docs, MIN(ent) AS min_ent, MAX(ent) AS max_ent,
       CAST(SUM(CAST(ent AS DECIMAL(28,9))) AS DOUBLE) AS sum_ent,
       ROUND(CAST(SUM(CAST(ent AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*), 6) AS avg_ent
FROM ent
GROUP BY lang
ORDER BY lang
"""

# -------------------------------------------------- unigram KL drift


def q_unigram_kl_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL(source ‖ corpus) over word unigrams — distribution drift of
    each source against the corpus mixture.

    Every source term exists in the corpus by construction, so q > 0
    always. Per-term contributions are per-row doubles rounded then
    summed as decimals (exact, order-free). Plan: one explode, two
    partial-aggregated shuffles; the corpus term table is vocabulary-
    sized and broadcasts into the per-source join."""
    docs = load_table(spark, sf_dir, "documents")
    terms = docs.select("source", F.explode(words("text")).alias("t"))
    # persisted: the (source, term) count table feeds FOUR plan branches
    # (per-source totals, corpus term counts, grand total, contribution
    # join) — unpersisted, each branch re-runs the corpus explode+agg.
    # The table itself is vocabulary × sources, tiny at any corpus size.
    sc = transient_persist(
        terms.groupBy("source", "t").agg(F.count(F.lit(1)).alias("c"))
    )
    stot = sc.groupBy("source").agg(F.sum("c").alias("s_tot"))
    ct = sc.groupBy("t").agg(F.sum("c").alias("c_t"))
    tot = ct.agg(F.sum("c_t").cast("double").alias("t_tot"))
    p = F.col("c") / F.col("s_tot")
    q = F.col("c_t") / F.col("t_tot")
    contrib = F.round(p * F.log(p / q), 12)
    joined = (
        sc.join(F.broadcast(stot), "source")
        .join(F.broadcast(ct), "t")
        .crossJoin(F.broadcast(tot))
        .select(
            "source",
            F.col("c"),
            contrib.cast("decimal(30,12)").alias("contrib"),
        )
    )
    return (
        joined.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("c").alias("total_words"),
            F.round(F.sum("contrib").cast("double"), 9).alias("kl"),
        )
        .orderBy("source")
    )


Q_KL_DRIFT_SQL = """
WITH w AS (
  SELECT source,
         unnest(list_filter(string_split_regex(text, '\\s+'), x -> x <> '')) AS t
  FROM documents),
sc AS (SELECT source, t, COUNT(*) AS c FROM w GROUP BY 1, 2),
stot AS (SELECT source, SUM(c) AS s_tot FROM sc GROUP BY 1),
ct AS (SELECT t, SUM(c) AS c_t FROM sc GROUP BY 1),
tot AS (SELECT CAST(SUM(c_t) AS DOUBLE) AS t_tot FROM ct),
contribs AS (
  SELECT source, c,
         CAST(ROUND((c / CAST(s_tot AS DOUBLE))
               * ln((c / CAST(s_tot AS DOUBLE)) / (c_t / t_tot)), 12)
              AS DECIMAL(30,12)) AS contrib
  FROM sc JOIN stot USING (source) JOIN ct USING (t) CROSS JOIN tot)
SELECT source, COUNT(*) AS n_terms, CAST(SUM(c) AS BIGINT) AS total_words,
       ROUND(CAST(SUM(contrib) AS DOUBLE), 9) AS kl
FROM contribs
GROUP BY source
ORDER BY source
"""

# -------------------------------------------------- MAD robust outliers


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier counts on events.value via median/MAD.

    Median and MAD are immune to the outliers being hunted (unlike
    mean/stddev, which the outliers drag). Threshold: |v − med| >
    3.5 · 1.4826 · MAD (the 1.4826 factor makes MAD σ-consistent for
    normal data). Exact medians — both engines interpolate even
    counts identically; threshold comparisons use the raw medians,
    rounding applies only to the surfaced columns."""
    ev = load_table(spark, sf_dir, "events")
    med = ev.groupBy("event_type").agg(F.median("value").alias("med"))
    j = ev.join(F.broadcast(med), "event_type")
    mad = j.groupBy("event_type", "med").agg(
        F.count(F.lit(1)).alias("n"),
        F.median(F.abs(F.col("value") - F.col("med"))).alias("mad"),
    )
    out = (
        ev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.sum(
                (
                    F.abs(F.col("value") - F.col("med"))
                    > 3.5 * 1.4826 * F.col("mad")
                ).cast("long")
            ).alias("n_outliers")
        )
    )
    return (
        mad.join(out, "event_type")
        .select(
            "event_type",
            "n",
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "n_outliers",
        )
        .orderBy("event_type")
    )


Q_MAD_SQL = """
WITH med AS (SELECT event_type, median(value) AS med FROM events GROUP BY 1),
mad AS (
  SELECT e.event_type, med, COUNT(*) AS n,
         median(abs(value - med)) AS mad
  FROM events e JOIN med USING (event_type)
  GROUP BY 1, 2),
outl AS (
  SELECT e.event_type,
         CAST(SUM(CASE WHEN abs(value - med) > 3.5 * 1.4826 * mad
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
  FROM events e JOIN mad USING (event_type)
  GROUP BY 1)
SELECT m.event_type, n, ROUND(med, 6) AS med, ROUND(mad, 6) AS mad, n_outliers
FROM mad m JOIN outl USING (event_type)
ORDER BY event_type
"""

# -------------------------------------------------- binned range join

# Irregular price bands (no equi key anywhere): the shape that forces
# a nested-loop join unless binned. lo <= price < hi.
PRICE_BANDS = [
    ("tiny", 0.0, 950.0),
    ("small", 950.0, 2000.0),
    ("mid", 2000.0, 5000.0),
    ("large", 5000.0, 20000.0),
    ("xl", 20000.0, 60000.0),
    ("xxl", 60000.0, 150000.0),
    ("whale", 150000.0, 600000.0),
]


def q_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-key-free range join via interval binning: orders classified
    into irregular price bands through a plain shuffle equi-join on
    bin ids (plan-audited: NO nested-loop join), with the range
    predicate as a residual filter. The oracle runs the same join as a
    naive BETWEEN theta join — same answer, different physical plan."""
    from kcore_spark.operators.relational import range_join_binned

    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(PRICE_BANDS, "band string, lo double, hi double")
    joined = range_join_binned(
        orders.select("o_orderkey", "o_totalprice"),
        "o_totalprice",
        bands,
        "lo",
        "hi",
        bin_width=1000.0,
    )
    return (
        joined.groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("o_totalprice").cast("decimal(15,2)"))
            .cast("double")
            .alias("sum_price"),
        )
        .orderBy("band")
    )


_BANDS_SQL = " UNION ALL ".join(
    f"SELECT '{b}' AS band, {lo} AS lo, {hi} AS hi" for b, lo, hi in PRICE_BANDS
)

Q_RANGE_JOIN_SQL = f"""
WITH bands AS ({_BANDS_SQL})
SELECT band, COUNT(*) AS n,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(15,2))) AS DOUBLE) AS sum_price
FROM orders JOIN bands
  ON o_totalprice >= lo AND o_totalprice < hi
GROUP BY band
ORDER BY band
"""

# -------------------------------------------------- fuzzy clustering


def q_fuzzy_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution step 3: transitive clusters over the fuzzy
    match graph (blocked Levenshtein pairs → connected components →
    per-cluster membership counts). A matched to B and B to C puts all
    three in one cluster even when A↮C directly — the step that turns
    pairwise linkage into dedupable entities. Oracle: the same closure
    as a recursive CTE."""
    # r9 plan: verify over DISTINCT NAMES, not row pairs. The match
    # graph is fully determined by the distinct (name, block) domain —
    # dist(a,b) depends only on the strings — so the quadratic verify
    # runs on #distinct-names² candidates (64² here; Zipf-bounded in
    # any real corpus) instead of the 25M row-pair candidates the
    # blocked row self-join formed. Row mass then flows back through
    # ONE hash join on name. Exactness (why no completeness test is
    # needed, unlike a block-key change): every same-name row pair is
    # a dist-0 edge in the old graph, so rows of one name are always
    # one cluster; cross-name edges exist iff the name pair matches;
    # component labels are preserved because rep(name) = MIN(partkey)
    # and min-reachable-rep = min-reachable-partkey. Prior A/Bs that
    # motivated abandoning row-level pruning (r7/r8 negative results:
    # char-count L1 bands cost more than the thresholded-Levenshtein
    # early exit; mapInPandas spanning forests pay more Arrow transfer
    # than they save) are superseded by shrinking the verify DOMAIN
    # rather than the verify COST. Measured at sf0.1: 12.0s → ~2s.
    from kcore_spark.caching import transient_persist
    from kcore_spark.operators.graph import connected_components

    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_name")
    # persisted: feeds both self-join sides AND the rep re-expansion —
    # one distinct-domain scan instead of three
    names = transient_persist(
        part.groupBy("p_name")
        .agg(F.min("p_partkey").alias("rep"), F.count(F.lit(1)).alias("n_parts"))
        .withColumn("blk", F.element_at(F.split("p_name", " "), 2))
        .withColumn("ln", F.length("p_name"))
    )
    # distinct-name candidate pairs: same block + length band (edit
    # distance ≤ d implies |len diff| ≤ d), Levenshtein-verified.
    # The name table is tiny by construction — Catalyst broadcasts it.
    name_edges = (
        names.alias("a")
        .join(
            names.alias("b"),
            (F.col("a.blk") == F.col("b.blk"))
            & (F.col("a.rep") < F.col("b.rep"))
            & (F.abs(F.col("a.ln") - F.col("b.ln")) <= 4),
        )
        .where(F.levenshtein(F.col("a.p_name"), F.col("b.p_name"), 4) >= 0)
        .select(F.col("a.rep").alias("src"), F.col("b.rep").alias("dst"))
    )
    cc = connected_components(name_edges)  # (id=rep, component)
    # names with no fuzzy neighbor still cluster their OWN rows when
    # n_parts ≥ 2 (dist-0 edges in the row-level graph); true
    # singletons have no edges and are excluded, matching edge-only CC
    reps = (
        names.join(cc, names.rep == cc.id, "left")
        .withColumn(
            "component",
            F.coalesce(
                F.col("component"), F.when(F.col("n_parts") >= 2, F.col("rep"))
            ),
        )
        .where(F.col("component").isNotNull())
        .select("p_name", "component")
    )
    return (
        part.join(F.broadcast(reps), "p_name")
        .groupBy(F.col("component").alias("canonical_id"))
        .agg(F.count(F.lit(1)).alias("n_members"))
        .orderBy("canonical_id")
    )


Q_FUZZY_CLUSTERS_SQL = """
WITH RECURSIVE b AS (
  SELECT p_partkey AS id, p_name AS nm, length(p_name) AS ln,
         string_split(p_name, ' ')[2] AS blk
  FROM part),
pairs AS (
  SELECT x.id AS id1, y.id AS id2
  FROM b x JOIN b y
    ON x.blk = y.blk AND x.id < y.id AND abs(x.ln - y.ln) <= 4
  WHERE levenshtein(x.nm, y.nm) <= 4),
edges AS (SELECT id1 AS a, id2 AS b FROM pairs
          UNION SELECT id2, id1 FROM pairs),
reach AS (
  SELECT a, b FROM edges
  UNION
  SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
),
assign AS (
  SELECT a AS id, LEAST(a, MIN(b)) AS canonical_id
  FROM reach
  GROUP BY a)
SELECT canonical_id, COUNT(*) AS n_members
FROM assign
GROUP BY canonical_id
ORDER BY canonical_id
"""

# -------------------------------------------------- table checksums


def q_table_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table fingerprints — the data-integrity
    primitive for validating a 100 TB migration/replication without
    sorting anything: per-row portable hash (md5-prefix of a canonical
    string form), folded with the two classic order-free combiners
    (sum — catches any value change; xor — catches duplicate-row
    swaps sum can miss when paired with a compensating change). One
    scan per table, pure map-side until a 1-row aggregate.

    Canonical form uses only types whose string rendering is identical
    on both engines (ints, strings, DECIMAL(15,2)); NULLs coalesce to
    '' explicitly rather than relying on concat_ws skipping."""

    def table_sum(df: DataFrame, name: str, cols: list) -> DataFrame:
        canon = F.concat_ws("|", *[F.coalesce(c.cast("string"), F.lit("")) for c in cols])
        h = F.conv(F.substring(F.md5(canon), 1, 8), 16, 10).cast("long")
        return df.select(h.alias("h")).agg(
            F.lit(name).alias("tbl"),
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("h").alias("hash_sum"),
            F.bit_xor("h").alias("hash_xor"),
        )

    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    money = lambda c: F.col(c).cast("decimal(15,2)")  # noqa: E731
    return (
        table_sum(
            li,
            "lineitem",
            [F.col("l_orderkey"), F.col("l_partkey"), F.col("l_suppkey"),
             money("l_quantity"), F.col("l_returnflag")],
        )
        .unionByName(
            table_sum(
                orders,
                "orders",
                [F.col("o_orderkey"), F.col("o_custkey"), F.col("o_orderstatus"),
                 money("o_totalprice")],
            )
        )
        .unionByName(
            table_sum(
                cust,
                "customer",
                [F.col("c_custkey"), F.col("c_name"), F.col("c_nationkey")],
            )
        )
        .orderBy("tbl")
    )


Q_TABLE_CHECKSUM_SQL = """
WITH li AS (
  SELECT ('0x' || substring(md5(
           concat_ws('|', COALESCE(CAST(l_orderkey AS VARCHAR), ''),
                          COALESCE(CAST(l_partkey AS VARCHAR), ''),
                          COALESCE(CAST(l_suppkey AS VARCHAR), ''),
                          COALESCE(CAST(CAST(l_quantity AS DECIMAL(15,2)) AS VARCHAR), ''),
                          COALESCE(l_returnflag, ''))), 1, 8))::BIGINT AS h
  FROM lineitem),
ord AS (
  SELECT ('0x' || substring(md5(
           concat_ws('|', COALESCE(CAST(o_orderkey AS VARCHAR), ''),
                          COALESCE(CAST(o_custkey AS VARCHAR), ''),
                          COALESCE(o_orderstatus, ''),
                          COALESCE(CAST(CAST(o_totalprice AS DECIMAL(15,2)) AS VARCHAR), ''))), 1, 8))::BIGINT AS h
  FROM orders),
cst AS (
  SELECT ('0x' || substring(md5(
           concat_ws('|', COALESCE(CAST(c_custkey AS VARCHAR), ''),
                          COALESCE(c_name, ''),
                          COALESCE(CAST(c_nationkey AS VARCHAR), ''))), 1, 8))::BIGINT AS h
  FROM customer)
SELECT 'customer' AS tbl, COUNT(*) AS n_rows,
       CAST(SUM(h) AS BIGINT) AS hash_sum, bit_xor(h) AS hash_xor FROM cst
UNION ALL
SELECT 'lineitem', COUNT(*), CAST(SUM(h) AS BIGINT), bit_xor(h) FROM li
UNION ALL
SELECT 'orders', COUNT(*), CAST(SUM(h) AS BIGINT), bit_xor(h) FROM ord
ORDER BY tbl
"""

# -------------------------------------------------- split leakage


def q_split_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/eval leakage audit: after a deterministic hash split
    (portable md5 arithmetic — the same rows land in the same split on
    any engine, any run), how many documents in EVAL share exact text
    with a TRAIN document. The leak join is a semi-join on the text
    hash — one aggregation plus a broadcast-sized eval side, never a
    pairwise comparison. Complements q_decontaminate_ngram (which
    catches PARTIAL overlap); this is the exact-copy gate every split
    pipeline runs first."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10
    ).cast("long") % 10
    hashed = docs.select(
        "doc_id",
        "source",
        F.sha2("text", 256).alias("h"),
        (bucket < 8).alias("is_train"),  # 80/20 split
    )
    train_h = hashed.where("is_train").select("h").distinct()
    evals = hashed.where(~F.col("is_train"))
    leaked = evals.join(train_h, "h", "left_semi")
    return (
        evals.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_eval"))
        .join(
            leaked.groupBy("source").agg(F.count(F.lit(1)).alias("n_leaked")),
            "source",
            "left",
        )
        .select(
            "source",
            "n_eval",
            F.coalesce("n_leaked", F.lit(0)).alias("n_leaked"),
        )
        .orderBy("source")
    )


Q_SPLIT_LEAKAGE_SQL = """
WITH hashed AS (
  SELECT doc_id, source, sha256(text) AS h,
         (('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10) < 8
           AS is_train
  FROM documents),
train_h AS (SELECT DISTINCT h FROM hashed WHERE is_train),
evals AS (SELECT * FROM hashed WHERE NOT is_train),
leaked AS (
  SELECT source, COUNT(*) AS n_leaked
  FROM evals WHERE h IN (SELECT h FROM train_h)
  GROUP BY source)
SELECT e.source, COUNT(*) AS n_eval,
       COALESCE(MAX(n_leaked), 0) AS n_leaked
FROM evals e LEFT JOIN leaked USING (source)
GROUP BY e.source
ORDER BY e.source
"""

# -------------------------------------------------- SCD2 history build


def q_scd2_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2: collapse a change stream into
    validity intervals (valid_from / valid_to, NULL = current). The
    change stream is derived deterministically from orders — each
    order's (custkey, orderdate, orderpriority) is a priority-change
    event for that customer — so the oracle can rebuild it. Dedup of
    same-instant changes keeps the highest order key (last writer).

    One shuffle (by key), one ordered window pass — the standard SCD2
    build; at 100 TB the window partitions by entity key so each
    customer's history sorts independently."""
    orders = load_table(spark, sf_dir, "orders")
    changes = (
        orders.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderdate").alias("ts"),
            F.col("o_orderpriority").alias("attr"),
            F.col("o_orderkey").alias("ord"),
        )
        .withColumn(
            "__rn",
            F.row_number().over(
                Window.partitionBy("custkey", "ts").orderBy(F.col("ord").desc())
            ),
        )
        .where(F.col("__rn") == 1)
        .drop("__rn", "ord")
    )
    w = Window.partitionBy("custkey").orderBy("ts")
    hist = changes.select(
        "custkey",
        F.col("attr"),
        F.unix_timestamp("ts").alias("valid_from"),
        F.unix_timestamp(F.lead("ts").over(w)).alias("valid_to"),
    )
    return (
        hist.groupBy("custkey")
        .agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum(F.col("valid_to").isNull().cast("long")).alias("n_current"),
            F.max(F.col("valid_to") - F.col("valid_from")).alias("longest_s"),
        )
        .orderBy("custkey")
    )


Q_SCD2_SQL = """
WITH changes AS (
  SELECT o_custkey AS custkey, CAST(o_orderdate AS TIMESTAMP) AS ts,
         o_orderpriority AS attr
  FROM orders
  QUALIFY ROW_NUMBER() OVER (PARTITION BY o_custkey, o_orderdate
                             ORDER BY o_orderkey DESC) = 1),
hist AS (
  SELECT custkey,
         CAST(FLOOR(epoch(ts)) AS BIGINT) AS valid_from,
         CAST(FLOOR(epoch(LEAD(ts) OVER (PARTITION BY custkey ORDER BY ts))) AS BIGINT)
           AS valid_to
  FROM changes)
SELECT custkey, COUNT(*) AS n_versions,
       CAST(SUM(CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_current,
       MAX(valid_to - valid_from) AS longest_s
FROM hist
GROUP BY custkey
ORDER BY custkey
"""

# -------------------------------------------------- survivorship


def q_dedup_survivorship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution step 2 (after matching): collapse each
    duplicate cluster to one golden record by survivorship rules —
    longest text wins, ties to the lowest doc_id; the survivor also
    aggregates cluster-level facts (copies, sources represented).
    Clusters here are exact-text duplicates (sha2 groups), the same
    clustering q_dedup_exact pins; the rules are where this query adds
    semantics."""
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("text_hash").orderBy(
        F.col("n_chars").desc(), F.col("doc_id").asc()
    )
    clustered = docs.withColumn("text_hash", F.sha2("text", 256))
    ranked = clustered.withColumn("__rn", F.row_number().over(w))
    facts = clustered.groupBy("text_hash").agg(
        F.count(F.lit(1)).alias("n_copies"),
        F.count_distinct("source").alias("n_sources"),
    )
    survivors = ranked.where(F.col("__rn") == 1).select(
        "text_hash", F.col("doc_id").alias("survivor_id"), "n_chars", "lang"
    )
    return (
        survivors.join(facts, "text_hash")
        .select("survivor_id", "n_copies", "n_sources", "n_chars", "lang")
        .orderBy("survivor_id")
    )


Q_SURVIVORSHIP_SQL = """
WITH clustered AS (SELECT *, sha256(text) AS text_hash FROM documents),
ranked AS (
  SELECT doc_id, text_hash, n_chars, lang,
         ROW_NUMBER() OVER (PARTITION BY text_hash
                            ORDER BY n_chars DESC, doc_id) AS rn
  FROM clustered),
facts AS (
  SELECT text_hash, COUNT(*) AS n_copies, COUNT(DISTINCT source) AS n_sources
  FROM clustered GROUP BY text_hash)
SELECT r.doc_id AS survivor_id, n_copies, n_sources, n_chars, lang
FROM ranked r JOIN facts USING (text_hash)
WHERE rn = 1
ORDER BY survivor_id
"""

# -------------------------------------------------- blocked fuzzy matching


def q_fuzzy_blocked_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage over part names: block on the noun (last word),
    verify length-banded candidates with thresholded Levenshtein — per
    block, candidates compared, fuzzy matches (d ≤ 4), exact dupes.

    The blocked-salted shape is the 100 TB story: comparisons are
    quadratic per block, the sub-bucket salt restores parallelism on a
    low-cardinality key, the length band drops can't-match candidates
    before scoring, and the bounded Levenshtein never pays O(len²) for
    a non-match (operators/text.py::blocked_fuzzy_pairs)."""
    from kcore_spark.operators.text import blocked_fuzzy_pairs

    part = load_table(spark, sf_dir, "part")
    block = F.element_at(F.split("p_name", " "), 2)
    pairs = blocked_fuzzy_pairs(part, "p_partkey", "p_name", block, max_dist=4)
    return (
        pairs.groupBy("blk")
        .agg(
            F.count(F.lit(1)).alias("n_candidates"),
            F.sum((F.col("dist") >= 0).cast("long")).alias("n_matches"),
            F.sum((F.col("dist") == 0).cast("long")).alias("n_exact"),
        )
        .orderBy("blk")
    )


Q_FUZZY_BLOCKED_SQL = """
WITH b AS (
  SELECT p_partkey AS id, p_name AS nm, length(p_name) AS ln,
         string_split(p_name, ' ')[2] AS blk
  FROM part),
pairs AS (
  SELECT x.blk, levenshtein(x.nm, y.nm) AS dist
  FROM b x JOIN b y
    ON x.blk = y.blk AND x.id < y.id AND abs(x.ln - y.ln) <= 4)
SELECT blk,
       COUNT(*) AS n_candidates,
       CAST(SUM(CASE WHEN dist <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS n_matches,
       CAST(SUM(CASE WHEN dist = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_exact
FROM pairs
GROUP BY blk
ORDER BY blk
"""

# -------------------------------------------------- winsorized mean


def q_winsorized_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized per-type statistics on events.value: clip to the
    exact [p10, p90] band, then average — the standard way to stop a
    handful of outliers from dragging a metric, complementing
    q_mad_outliers (which FLAGS them). Exact percentiles (both engines
    interpolate identically); the clipped mean sums rounded decimals
    so the answer is bit-stable under any aggregation order."""
    ev = load_table(spark, sf_dir, "events")
    pcts = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.1)").alias("p10"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.count(F.lit(1)).alias("n"),
    )
    clipped = ev.join(F.broadcast(pcts), "event_type").select(
        "event_type",
        "n",
        F.round(
            F.least(F.greatest(F.col("value"), F.col("p10")), F.col("p90")), 6
        ).alias("cv"),
    )
    return (
        clipped.groupBy("event_type", "n")
        .agg(
            F.round(
                F.sum(F.col("cv").cast("decimal(24,6)")).cast("double") / F.col("n"), 6
            ).alias("winsorized_mean"),
            F.round(F.min("cv"), 6).alias("clip_lo"),
            F.round(F.max("cv"), 6).alias("clip_hi"),
        )
        .select("event_type", "n", "winsorized_mean", "clip_lo", "clip_hi")
        .orderBy("event_type")
    )


Q_WINSORIZED_SQL = """
WITH pcts AS (
  SELECT event_type,
         quantile_cont(value, 0.1) AS p10,
         quantile_cont(value, 0.9) AS p90,
         COUNT(*) AS n
  FROM events GROUP BY event_type),
clipped AS (
  SELECT e.event_type, n,
         ROUND(LEAST(GREATEST(value, p10), p90), 6) AS cv
  FROM events e JOIN pcts USING (event_type))
SELECT event_type, n,
       ROUND(CAST(SUM(CAST(cv AS DECIMAL(24,6))) AS DOUBLE) / n, 6) AS winsorized_mean,
       ROUND(MIN(cv), 6) AS clip_lo,
       ROUND(MAX(cv), 6) AS clip_hi
FROM clipped
GROUP BY event_type, n
ORDER BY event_type
"""

# -------------------------------------------------- MERGE-style upsert


def q_merge_upsert_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE semantics over the orders snapshot: a correction batch of
    updates (repriced, re-statused) and inserts folded in with
    last-writer-wins, then summarized by status.

    The batch is derived deterministically from the snapshot itself
    (keys ≡ 0 mod 37 → update; keys ≡ 0 mod 41 → insert under a new
    key) so the oracle can rebuild the identical batch. The merge is
    the batch expression of the foreachBatch upsert sink
    (streaming/sinks.py): full-outer join on the key, COALESCE picks
    the update. All money arithmetic in DECIMAL(15,2) — exact and
    order-free under any aggregation order."""
    orders = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice").cast("decimal(15,2)")
    updates = orders.where(F.col("o_orderkey") % 37 == 0).select(
        F.col("o_orderkey").alias("u_key"),
        F.lit("X").alias("u_status"),
        F.round(price * F.lit(1.10), 2).cast("decimal(15,2)").alias("u_price"),
    )
    inserts = orders.where(F.col("o_orderkey") % 41 == 0).select(
        (F.col("o_orderkey") + 100_000_000).alias("u_key"),
        F.lit("N").alias("u_status"),
        price.alias("u_price"),
    )
    batch = updates.unionByName(inserts)
    base = orders.select(
        F.col("o_orderkey").alias("key"),
        F.col("o_orderstatus").alias("status"),
        price.alias("price"),
    )
    merged = base.join(batch, base.key == batch.u_key, "full_outer").select(
        F.coalesce(F.col("u_key"), F.col("key")).alias("key"),
        F.coalesce(F.col("u_status"), F.col("status")).alias("status"),
        F.coalesce(F.col("u_price"), F.col("price")).alias("price"),
    )
    return (
        merged.groupBy("status")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("price").cast("double").alias("sum_price"),
            F.min("key").alias("min_key"),
            F.max("key").alias("max_key"),
        )
        .orderBy("status")
    )


Q_MERGE_SQL = """
WITH batch AS (
  SELECT o_orderkey AS u_key, 'X' AS u_status,
         CAST(ROUND(CAST(o_totalprice AS DECIMAL(15,2)) * 1.10, 2)
              AS DECIMAL(15,2)) AS u_price
  FROM orders WHERE o_orderkey % 37 = 0
  UNION ALL
  SELECT o_orderkey + 100000000, 'N',
         CAST(o_totalprice AS DECIMAL(15,2))
  FROM orders WHERE o_orderkey % 41 = 0),
base AS (
  SELECT o_orderkey AS key, o_orderstatus AS status,
         CAST(o_totalprice AS DECIMAL(15,2)) AS price
  FROM orders),
merged AS (
  SELECT COALESCE(u_key, key) AS key,
         COALESCE(u_status, status) AS status,
         COALESCE(u_price, price) AS price
  FROM base FULL OUTER JOIN batch ON key = u_key)
SELECT status, COUNT(*) AS n,
       CAST(SUM(price) AS DOUBLE) AS sum_price,
       MIN(key) AS min_key, MAX(key) AS max_key
FROM merged
GROUP BY status
ORDER BY status
"""


QUERIES = {
    "q_tfidf_top_terms": QuerySpec(
        q_tfidf_top_terms, Q_TFIDF_SQL, "TF-IDF top-3 salient terms per doc"
    ),
    "q_ngram_containment": QuerySpec(
        q_ngram_containment, Q_CONTAINMENT_SQL, "asymmetric n-gram containment dedup"
    ),
    "q_char_entropy": QuerySpec(
        q_char_entropy, Q_CHAR_ENTROPY_SQL, "char-class entropy per language"
    ),
    "q_unigram_kl_drift": QuerySpec(
        q_unigram_kl_drift, Q_KL_DRIFT_SQL, "unigram KL divergence per source"
    ),
    "q_mad_outliers": QuerySpec(
        q_mad_outliers, Q_MAD_SQL, "median/MAD robust outlier counts"
    ),
    "q_merge_upsert_orders": QuerySpec(
        q_merge_upsert_orders, Q_MERGE_SQL, "MERGE-style snapshot upsert summary"
    ),
    "q_fuzzy_blocked_match": QuerySpec(
        q_fuzzy_blocked_match, Q_FUZZY_BLOCKED_SQL, "blocked Levenshtein record linkage"
    ),
    "q_fuzzy_clusters": QuerySpec(
        q_fuzzy_clusters, Q_FUZZY_CLUSTERS_SQL, "transitive fuzzy-match clusters"
    ),
    "q_table_checksum": QuerySpec(
        q_table_checksum, Q_TABLE_CHECKSUM_SQL, "order-independent table fingerprints"
    ),
    "q_split_leakage": QuerySpec(
        q_split_leakage, Q_SPLIT_LEAKAGE_SQL, "train/eval exact-copy leakage audit"
    ),
    "q_scd2_history": QuerySpec(
        q_scd2_history, Q_SCD2_SQL, "SCD2 validity intervals from a change stream"
    ),
    "q_dedup_survivorship": QuerySpec(
        q_dedup_survivorship, Q_SURVIVORSHIP_SQL, "duplicate-cluster survivorship rules"
    ),
    "q_winsorized_mean": QuerySpec(
        q_winsorized_mean, Q_WINSORIZED_SQL, "winsorized per-group robust means"
    ),
    "q_range_join_binned": QuerySpec(
        q_range_join_binned, Q_RANGE_JOIN_SQL, "equi-key-free range join via interval binning"
    ),
}
