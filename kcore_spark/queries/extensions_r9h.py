"""Round-9 surface extensions, batch H (SURVEY §2.3 N r9): variance-
homogeneity testing (Brown-Forsythe Levene), a trained-and-scored
multinomial naive-Bayes text classifier (the classical pre-LLM quality
router), closed-form two-feature OLS (normal equations — one step up
from q_ols_slope), and graph modularity (the missing quality score for
the community family: q_label_propagation found communities, this
grades a partition).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Float discipline follows FIXTURES.md: log-probabilities are
ROUND(ln,9) cast DECIMAL(28,9) so per-doc score sums are EXACT and the
argmax is deterministic (the q_bigram_lm_score idiom,
extensions_r7.py:538); deviation sums in the Levene test are
DECIMAL(18,6)-exact around a 6-rounded median.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------- Brown-Forsythe Levene (variance homogeneity)
# W = ((N−k)/(k−1)) · Σ n_j (z̄_j − z̄)² / Σ_ij (z_ij − z̄_j)² with
# z = |x − median_j| — the median-centered (Brown-Forsythe) variant,
# robust to non-normality. Pairs with q_welch_ttest (means) and
# q_kruskal_wallis (distributions): this one asks whether SPREADS
# differ by group. Exactness: the group median is rounded to 6 then
# every |x − med| is DECIMAL(18,6), so Σz and Σz² are exact and the
# final W is a handful of identical IEEE ops in both engines.
# Scale: one partial-agg pass for medians (percentile over each
# group), one map-side z computation riding a second scan, k-row
# finishing math.


def q_levene_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("grp"), F.col("o_totalprice").alias("x")
    )
    med = orders.groupBy("grp").agg(
        F.round(F.expr("percentile(x, 0.5)"), 6).alias("med")
    )
    z = orders.join(F.broadcast(med), "grp").select(
        "grp", F.round(F.abs(F.col("x") - F.col("med")), 6).cast("decimal(18,6)").alias("z")
    )
    per_grp = z.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum("z").alias("sz"),
        F.sum(F.col("z") * F.col("z")).alias("szz"),
    )
    # all remaining math on k exact rows
    return per_grp.agg(
        F.count(F.lit(1)).cast("long").alias("k_groups"),
        F.sum("n_j").cast("long").alias("n"),
        F.round(
            (
                (F.sum("n_j") - F.count(F.lit(1)))
                / (F.count(F.lit(1)) - 1)
                * (
                    F.sum(
                        F.col("sz").cast("double")
                        * F.col("sz")
                        / F.col("n_j")
                    )
                    - F.sum(F.col("sz").cast("double"))
                    * F.sum(F.col("sz").cast("double"))
                    / F.sum("n_j")
                )
            )
            / F.nullif(
                F.sum(F.col("szz").cast("double"))
                - F.sum(F.col("sz").cast("double") * F.col("sz") / F.col("n_j")),
                F.lit(0.0),
            ),
            6,
        ).alias("w_stat"),
    )


Q_LEVENE_SQL = """
WITH src AS (SELECT o_orderpriority AS grp, o_totalprice AS x FROM orders),
med AS (SELECT grp, ROUND(quantile_cont(x, 0.5), 6) AS med FROM src GROUP BY grp),
z AS (
  SELECT src.grp, CAST(ROUND(ABS(x - med), 6) AS DECIMAL(18,6)) AS z
  FROM src JOIN med ON src.grp = med.grp),
per_grp AS (
  SELECT grp, COUNT(*) AS n_j, SUM(z) AS sz,
         SUM(CAST(z AS DECIMAL(19,6)) * CAST(z AS DECIMAL(19,6))) AS szz
  FROM z GROUP BY grp)
SELECT CAST(COUNT(*) AS BIGINT) AS k_groups,
       CAST(SUM(n_j) AS BIGINT) AS n,
       ROUND(((SUM(n_j) - COUNT(*)) * 1.0 / (COUNT(*) - 1)
              * (SUM(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n_j)
                 - SUM(CAST(sz AS DOUBLE)) * SUM(CAST(sz AS DOUBLE)) / SUM(n_j)))
             / NULLIF(SUM(CAST(szz AS DOUBLE))
                - SUM(CAST(sz AS DOUBLE) * CAST(sz AS DOUBLE) / n_j), 0.0), 6) AS w_stat
FROM per_grp
"""

QUERIES["q_levene_test"] = QuerySpec(
    q_levene_test,
    Q_LEVENE_SQL,
    "Brown-Forsythe Levene test of variance homogeneity across order "
    "priorities — decimal-exact median-deviation sums",
)


# --------------------------- multinomial naive Bayes (train + score)
# The classical count-based text classifier, trained and scored
# entirely inside the engine: 80% of docs (md5-uniform) train
# add-one-smoothed word-given-lang counts; the held-out 20% are
# scored argmax_c [log prior_c + Σ_w n_w · log P(w|c)]. Score sums
# are DECIMAL(28,9)-exact (ROUND(ln,9) per term), so the argmax — a
# row_number over (score DESC, class) — is deterministic, never a
# float-race between engines. Output: per-lang held-out accuracy.
# Scale: the model is a vocab×k table built by one explode+groupBy;
# scoring joins test words to it on the word key (shuffle bounded by
# corpus token count), and the k-way class fan-out is a broadcast.


def q_naive_bayes(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    u = F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10).cast(
        "long"
    )
    docs = docs.withColumn("is_train", (u % 5 < 4).cast("int"))
    toks = docs.select(
        "doc_id", "lang", "is_train",
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w"),
    )
    train_toks = toks.where(F.col("is_train") == 1)
    classes = (
        docs.where(F.col("is_train") == 1)
        .groupBy(F.col("lang").alias("cls"))
        .agg(F.count(F.lit(1)).alias("docs_c"))
    )
    totals = classes.agg(
        F.sum("docs_c").alias("docs_train"), F.count(F.lit(1)).alias("k")
    )
    vocab = train_toks.select("w").distinct().count()
    wc = train_toks.groupBy("w", F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot_c = train_toks.groupBy(F.col("lang").alias("cls")).agg(
        F.count(F.lit(1)).alias("tok_c")
    )
    test_words = (
        toks.where(F.col("is_train") == 0)
        .groupBy("doc_id", "lang", "w")
        .agg(F.count(F.lit(1)).alias("n_w"))
    )
    # fan each test word out to every class, left-join trained counts
    scored = (
        test_words.crossJoin(F.broadcast(classes.select("cls")))
        .join(wc, ["w", "cls"], "left")
        .join(F.broadcast(tot_c), "cls")
        .select(
            "doc_id", "lang", "cls",
            (
                F.round(
                    F.log(
                        (F.coalesce(F.col("cnt"), F.lit(0)) + 1.0)
                        / (F.col("tok_c") + F.lit(float(vocab)))
                    ),
                    9,
                ).cast("decimal(28,9)")
                * F.col("n_w")
            ).alias("lp"),
        )
    )
    prior = (
        classes.crossJoin(F.broadcast(totals))
        .select(
            "cls",
            F.round(
                F.log((F.col("docs_c") + 1.0) / (F.col("docs_train") + F.col("k"))), 9
            ).cast("decimal(28,9)").alias("log_prior"),
        )
    )
    doc_cls = (
        scored.groupBy("doc_id", "lang", "cls")
        .agg(F.sum("lp").alias("sum_lp"))
        .join(F.broadcast(prior), "cls")
        .withColumn("score", F.col("sum_lp") + F.col("log_prior"))
    )
    w_pick = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("cls"))
    picked = doc_cls.withColumn("rn", F.row_number().over(w_pick)).where(
        F.col("rn") == 1
    )
    return (
        picked.groupBy(F.col("lang").alias("actual"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_test"),
            F.sum((F.col("cls") == F.col("lang")).cast("int")).cast("long").alias(
                "n_correct"
            ),
        )
        .withColumn("accuracy", F.round(F.col("n_correct") / F.col("n_test"), 6))
        .orderBy("actual")
    )


Q_NB_SQL = """
WITH docs2 AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS ws,
         CASE WHEN ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 5 < 4
              THEN 1 ELSE 0 END AS is_train
  FROM documents),
toks AS (SELECT doc_id, lang, is_train, unnest(ws) AS w FROM docs2),
classes AS (
  SELECT lang AS cls, COUNT(*) AS docs_c FROM docs2 WHERE is_train = 1 GROUP BY lang),
totals AS (SELECT SUM(docs_c) AS docs_train, COUNT(*) AS k FROM classes),
vocab AS (SELECT COUNT(DISTINCT w) AS v FROM toks WHERE is_train = 1),
wc AS (SELECT w, lang AS cls, COUNT(*) AS cnt FROM toks WHERE is_train = 1 GROUP BY w, lang),
tot_c AS (SELECT lang AS cls, COUNT(*) AS tok_c FROM toks WHERE is_train = 1 GROUP BY lang),
test_words AS (
  SELECT doc_id, lang, w, COUNT(*) AS n_w FROM toks WHERE is_train = 0
  GROUP BY doc_id, lang, w),
scored AS (
  SELECT t.doc_id, t.lang, c.cls,
         CAST(ROUND(LN((COALESCE(wc.cnt, 0) + 1.0) / (tc.tok_c + vocab.v)), 9)
              AS DECIMAL(28,9)) * t.n_w AS lp
  FROM test_words t
  CROSS JOIN (SELECT cls FROM classes) c
  LEFT JOIN wc ON t.w = wc.w AND c.cls = wc.cls
  JOIN tot_c tc ON c.cls = tc.cls
  CROSS JOIN vocab),
prior AS (
  SELECT cls, CAST(ROUND(LN((docs_c + 1.0) / (totals.docs_train + totals.k)), 9)
                   AS DECIMAL(28,9)) AS log_prior
  FROM classes CROSS JOIN totals),
doc_cls AS (
  SELECT s.doc_id, s.lang, s.cls, SUM(s.lp) + ANY_VALUE(p.log_prior) AS score
  FROM scored s JOIN prior p ON s.cls = p.cls
  GROUP BY s.doc_id, s.lang, s.cls),
picked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
              ORDER BY score DESC, cls) AS rn
  FROM doc_cls)
SELECT lang AS actual, CAST(COUNT(*) AS BIGINT) AS n_test,
       CAST(SUM(CASE WHEN cls = lang THEN 1 ELSE 0 END) AS BIGINT) AS n_correct,
       ROUND(SUM(CASE WHEN cls = lang THEN 1 ELSE 0 END) * 1.0 / COUNT(*), 6)
         AS accuracy
FROM picked WHERE rn = 1
GROUP BY lang
ORDER BY lang
"""

QUERIES["q_naive_bayes"] = QuerySpec(
    q_naive_bayes,
    Q_NB_SQL,
    "multinomial naive Bayes trained on an 80% md5 split and scored "
    "on the held-out 20% — decimal-exact log-prob sums make the "
    "argmax deterministic; per-lang accuracy",
)


# ------------------------------ two-feature OLS (normal equations)
# y = b0 + b1·x1 + b2·x2 closed-form via centered moments and
# Cramer's rule — the one-step-up from q_ols_slope that covers the
# "small multiple regression inside the warehouse" ask. Two passes:
# a 1-row means broadcast, then centered second moments (no Σx²~N³
# cancellation). R² from the same moments.
# Scale: both passes are map-side partial aggregations; nothing
# global but two 1-row reductions.


def q_ols_two_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_quantity").alias("x1"),
        F.col("l_discount").alias("x2"),
        F.col("l_extendedprice").alias("y"),
    )
    means = li.agg(
        F.avg("x1").alias("m1"), F.avg("x2").alias("m2"), F.avg("y").alias("my")
    )
    c = li.crossJoin(F.broadcast(means))
    d1, d2, dy = (
        F.col("x1") - F.col("m1"),
        F.col("x2") - F.col("m2"),
        F.col("y") - F.col("my"),
    )
    m = c.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(d1 * d1).alias("s11"),
        F.sum(d1 * d2).alias("s12"),
        F.sum(d2 * d2).alias("s22"),
        F.sum(d1 * dy).alias("s1y"),
        F.sum(d2 * dy).alias("s2y"),
        F.sum(dy * dy).alias("syy"),
        F.max("m1").alias("m1"),
        F.max("m2").alias("m2"),
        F.max("my").alias("my"),
    )
    det = F.col("s11") * F.col("s22") - F.col("s12") * F.col("s12")
    b1 = (F.col("s1y") * F.col("s22") - F.col("s2y") * F.col("s12")) / det
    b2 = (F.col("s2y") * F.col("s11") - F.col("s1y") * F.col("s12")) / det
    return m.select(
        F.col("n").cast("long").alias("n"),
        F.round(b1, 6).alias("b1"),
        F.round(b2, 6).alias("b2"),
        F.round(F.col("my") - b1 * F.col("m1") - b2 * F.col("m2"), 6).alias("b0"),
        F.round((b1 * F.col("s1y") + b2 * F.col("s2y")) / F.col("syy"), 6).alias("r2"),
    )


Q_OLS2_SQL = """
WITH src AS (
  SELECT l_quantity AS x1, l_discount AS x2, l_extendedprice AS y FROM lineitem),
means AS (SELECT AVG(x1) AS m1, AVG(x2) AS m2, AVG(y) AS my FROM src),
m AS (
  SELECT COUNT(*) AS n,
         SUM((x1 - m1) * (x1 - m1)) AS s11,
         SUM((x1 - m1) * (x2 - m2)) AS s12,
         SUM((x2 - m2) * (x2 - m2)) AS s22,
         SUM((x1 - m1) * (y - my)) AS s1y,
         SUM((x2 - m2) * (y - my)) AS s2y,
         SUM((y - my) * (y - my)) AS syy,
         MAX(m1) AS m1, MAX(m2) AS m2, MAX(my) AS my
  FROM src CROSS JOIN means)
SELECT CAST(n AS BIGINT) AS n,
       ROUND((s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12), 6) AS b1,
       ROUND((s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12), 6) AS b2,
       ROUND(my - (s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) * m1
                - (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) * m2, 6) AS b0,
       ROUND(((s1y * s22 - s2y * s12) / (s11 * s22 - s12 * s12) * s1y
              + (s2y * s11 - s1y * s12) / (s11 * s22 - s12 * s12) * s2y) / syy, 6)
         AS r2
FROM m
"""

QUERIES["q_ols_two_features"] = QuerySpec(
    q_ols_two_features,
    Q_OLS2_SQL,
    "closed-form two-feature OLS (centered normal equations, Cramer) "
    "of extended price on quantity and discount, with R²",
)


# ------------------------------------------- directed modularity
# Q = Σ_c [ w_cc/W − (out_c/W)(in_c/W) ] over the event-type
# transition graph (consecutive events per user), communities =
# md5(type) % 3 — grades how well a partition captures the flow
# structure. Completes the graph-metric family: q_label_propagation
# FINDS communities, this SCORES a partition; weights stay integers
# until the k-term final sum.
# Scale: transitions are one lead() over user-partitioned windows
# (the q_event_transitions shape); everything after is |types|²-sized.


def q_modularity_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id", "event_type")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("a"), F.col("nxt").alias("b"))
        .agg(F.count(F.lit(1)).alias("w_ab"))
    )
    com = lambda c: (
        F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long") % 3
    )
    t = trans.select(
        com(F.col("a")).alias("ca"), com(F.col("b")).alias("cb"), "w_ab"
    )
    tot = t.agg(F.sum("w_ab").alias("W"))
    per_c = (
        t.groupBy("ca")
        .agg(F.sum("w_ab").alias("out_c"))
        .join(
            t.groupBy(F.col("cb").alias("ca")).agg(F.sum("w_ab").alias("in_c")),
            "ca",
            "full",
        )
        .na.fill({"out_c": 0, "in_c": 0})
        .join(
            t.where(F.col("ca") == F.col("cb"))
            .groupBy("ca")
            .agg(F.sum("w_ab").alias("w_cc")),
            "ca",
            "left",
        )
        .na.fill({"w_cc": 0})
    )
    return per_c.crossJoin(F.broadcast(tot)).agg(
        F.count(F.lit(1)).cast("long").alias("n_communities"),
        F.max("W").cast("long").alias("total_weight"),
        F.round(
            F.sum(
                F.col("w_cc") / F.col("W")
                - (F.col("out_c").cast("double") / F.col("W"))
                * (F.col("in_c") / F.col("W"))
            ),
            6,
        ).alias("modularity"),
    )


Q_MODULARITY_SQL = """
WITH ev AS (
  SELECT user_id, ts, event_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nxt
  FROM events),
trans AS (
  SELECT event_type AS a, nxt AS b, COUNT(*) AS w_ab
  FROM ev WHERE nxt IS NOT NULL GROUP BY a, b),
t AS (
  SELECT ('0x' || substring(md5(a), 1, 8))::BIGINT % 3 AS ca,
         ('0x' || substring(md5(b), 1, 8))::BIGINT % 3 AS cb, w_ab
  FROM trans),
tot AS (SELECT SUM(w_ab) AS W FROM t),
per_c AS (
  SELECT COALESCE(o.ca, i.ca) AS ca,
         COALESCE(o.out_c, 0) AS out_c, COALESCE(i.in_c, 0) AS in_c,
         COALESCE(s.w_cc, 0) AS w_cc
  FROM (SELECT ca, SUM(w_ab) AS out_c FROM t GROUP BY ca) o
  FULL JOIN (SELECT cb AS ca, SUM(w_ab) AS in_c FROM t GROUP BY cb) i
    ON o.ca = i.ca
  LEFT JOIN (SELECT ca, SUM(w_ab) AS w_cc FROM t WHERE ca = cb GROUP BY ca) s
    ON COALESCE(o.ca, i.ca) = s.ca)
SELECT CAST(COUNT(*) AS BIGINT) AS n_communities,
       CAST(MAX(W) AS BIGINT) AS total_weight,
       ROUND(SUM(w_cc * 1.0 / W - (out_c * 1.0 / W) * (in_c * 1.0 / W)), 6)
         AS modularity
FROM per_c CROSS JOIN tot
"""

QUERIES["q_modularity_score"] = QuerySpec(
    q_modularity_score,
    Q_MODULARITY_SQL,
    "directed modularity of a pinned 3-community partition over the "
    "event-type transition graph — integer weights, k-term final sum",
)
