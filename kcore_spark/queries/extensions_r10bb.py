"""Round-10 surface extensions, batch BB (SURVEY §2.3 N r10): the
NLP II block — TextRank keyword extraction (PageRank over the
adjacent-word co-occurrence graph, 3 unrolled damped iterations —
composes the repo's pagerank pattern with the token explode),
character-trigram conditional entropy per language (H(c₃|c₁c₂) =
H(tri) − H(bi), the sequence-model difficulty number next to
q_char_entropy's unigram view), and PMI collocations (adjacent word
pairs scored by pointwise mutual information with a count floor —
the bigram twin of q_basket_pmi).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: integer n-gram/edge counts; rank iterates are
ROUND(·,12)-pinned between rounds; entropy sums pinned-decimal.
Scale: token/char explodes are linear scans with map-side partial
aggs; each TextRank round is ONE keyed shuffle over the vocabulary-
sized edge table (the known keyed-iteration shape); top-k outputs
use sort+limit pushdown.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


def _adjacent_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adjacent lowercase word pairs (a, b) per document position."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    words = docs.select(
        "doc_id", F.split(F.lower(F.col("text")), "\\s+").alias("ws")
    )
    return words.select(
        F.explode(
            F.arrays_zip(
                F.slice(F.col("ws"), 1, F.size("ws") - 1).alias("a"),
                F.slice(F.col("ws"), 2, F.size("ws") - 1).alias("b"),
            )
        ).alias("p")
    ).select(F.col("p.a").alias("a"), F.col("p.b").alias("b")).where(
        (F.col("a") != "") & (F.col("b") != "")
    )


_PAIRS_SQL = """
  SELECT p[1] AS a, p[2] AS b
  FROM (
    SELECT UNNEST(list_zip(ws[1:len(ws)-1], ws[2:len(ws)])) AS p
    FROM (SELECT string_split_regex(lower(text), '\\s+') AS ws FROM documents))
  WHERE p[1] <> '' AND p[2] <> ''
"""


# -------------------------------------------------------- TextRank
# Undirected co-occurrence edges with counts; 3 damped rounds
# r <- 0.15 + 0.85·Σ_in r(v)·w(v,u)/wdeg(v), pinned at 12 decimals
# per round; top-15 keywords.


def q_keyword_textrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _adjacent_pairs(spark, sf_dir)
    und = pairs.union(
        pairs.select(F.col("b").alias("a"), F.col("a").alias("b"))
    )
    edges = und.groupBy("a", "b").agg(F.count(F.lit(1)).alias("w")).persist()
    wdeg = edges.groupBy("a").agg(F.sum("w").alias("wd"))
    out_frac = edges.join(wdeg, "a").select(
        F.col("a").alias("src"),
        F.col("b").alias("dst"),
        (F.col("w").cast("double") / F.col("wd").cast("double")).alias("frac"),
    )
    ranks = wdeg.select(F.col("a").alias("w_node"), F.lit(1.0).alias("r"))
    for _ in range(3):
        contrib = (
            out_frac.join(ranks, F.col("src") == F.col("w_node"))
            .groupBy("dst")
            .agg(
                F.sum(
                    F.round(F.col("r") * F.col("frac"), 12).cast("decimal(28,12)")
                ).alias("s")
            )
        )
        ranks = contrib.select(
            F.col("dst").alias("w_node"),
            F.round(0.15 + 0.85 * F.col("s").cast("double"), 12).alias("r"),
        )
    return (
        ranks.select(F.col("w_node").alias("word"), F.round("r", 6).alias("rank"))
        .orderBy(F.col("rank").desc(), "word")
        .limit(15)
    )


def _tr_round_sql(prev: str) -> str:
    return f"""
  SELECT dst AS w_node,
         ROUND(0.15 + 0.85 * CAST(SUM(CAST(ROUND(r * frac, 12)
                                           AS DECIMAL(28,12))) AS DOUBLE), 12) AS r
  FROM out_frac JOIN {prev} ON src = {prev}.w_node
  GROUP BY dst
"""


Q_TEXTRANK_SQL = f"""
WITH pairs AS ({_PAIRS_SQL}),
und AS (SELECT a, b FROM pairs UNION ALL SELECT b, a FROM pairs),
edges AS (SELECT a, b, COUNT(*) AS w FROM und GROUP BY a, b),
wdeg AS (SELECT a, SUM(w) AS wd FROM edges GROUP BY a),
out_frac AS (
  SELECT edges.a AS src, b AS dst,
         CAST(w AS DOUBLE) / CAST(wd AS DOUBLE) AS frac
  FROM edges JOIN wdeg ON edges.a = wdeg.a),
r0 AS (SELECT a AS w_node, 1.0 AS r FROM wdeg),
r1 AS ({_tr_round_sql("r0")}),
r2 AS ({_tr_round_sql("r1")}),
r3 AS ({_tr_round_sql("r2")})
SELECT w_node AS word, ROUND(r, 6) AS rank
FROM r3
ORDER BY rank DESC, word
LIMIT 15
"""

QUERIES["q_keyword_textrank"] = QuerySpec(
    q_keyword_textrank,
    Q_TEXTRANK_SQL,
    "TextRank keywords: 3 damped PageRank rounds over the adjacent-"
    "word graph — one keyed shuffle per round, pinned iterates",
)


# -------------------------------- char-trigram conditional entropy
# H(c3 | c1c2) = H(trigrams) − H(bigrams), per language, from pinned
# count entropies over the n-gram explode.


def q_char_trigram_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "lang", F.lower(F.col("text")).alias("t")
    ).where(F.length("t") >= 3)
    pos = docs.select(
        "lang",
        "t",
        F.explode(F.sequence(F.lit(1), F.length("t") - 2)).alias("i"),
    )
    grams = pos.select(
        "lang",
        F.substring(F.col("t"), F.col("i").cast("int"), 3).alias("tri"),
    ).withColumn("bi", F.substring(F.col("tri"), 1, 2))

    def _ent(df: DataFrame, col: str, out: str) -> DataFrame:
        counts = df.groupBy("lang", col).agg(F.count(F.lit(1)).alias("c"))
        tot = counts.groupBy("lang").agg(F.sum("c").alias("n"))
        p = F.col("c").cast("double") / F.col("n").cast("double")
        return (
            counts.join(F.broadcast(tot), "lang")
            .select(
                "lang", F.round(-p * F.log(p), 12).cast("decimal(28,12)").alias("t")
            )
            .groupBy("lang")
            .agg(F.sum("t").cast("double").alias(out))
        )

    htri = _ent(grams, "tri", "h_tri")
    hbi = _ent(grams, "bi", "h_bi")
    n = grams.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("n_trigrams"))
    return (
        n.join(htri, "lang")
        .join(hbi, "lang")
        .select(
            "lang",
            "n_trigrams",
            F.round("h_tri", 6).alias("h_tri"),
            F.round("h_bi", 6).alias("h_bi"),
            F.round(F.col("h_tri") - F.col("h_bi"), 6).alias("h_conditional"),
        )
        .orderBy("lang")
    )


Q_TRIGRAM_SQL = """
WITH grams AS (
  SELECT lang, substr(t, i, 3) AS tri, substr(t, i, 2) AS bi
  FROM (
    SELECT lang, lower(text) AS t,
           UNNEST(range(1, length(lower(text)) - 1)) AS i
    FROM documents WHERE length(lower(text)) >= 3)),
tric AS (SELECT lang, tri, COUNT(*) AS c FROM grams GROUP BY lang, tri),
bic AS (SELECT lang, bi, COUNT(*) AS c FROM grams GROUP BY lang, bi),
tot AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM grams GROUP BY lang),
htri AS (
  SELECT tric.lang,
         CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                             * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS h_tri
  FROM tric JOIN tot ON tric.lang = tot.lang GROUP BY tric.lang),
hbi AS (
  SELECT bic.lang,
         CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / CAST(n AS DOUBLE))
                             * LN(CAST(c AS DOUBLE) / CAST(n AS DOUBLE)), 12)
                       AS DECIMAL(28,12))) AS DOUBLE) AS h_bi
  FROM bic JOIN tot ON bic.lang = tot.lang GROUP BY bic.lang)
SELECT tot.lang, n AS n_trigrams,
       ROUND(h_tri, 6) AS h_tri,
       ROUND(h_bi, 6) AS h_bi,
       ROUND(h_tri - h_bi, 6) AS h_conditional
FROM tot JOIN htri ON tot.lang = htri.lang JOIN hbi ON tot.lang = hbi.lang
ORDER BY tot.lang
"""

QUERIES["q_char_trigram_entropy"] = QuerySpec(
    q_char_trigram_entropy,
    Q_TRIGRAM_SQL,
    "char-trigram conditional entropy per language — n-gram explode, "
    "pinned entropy sums",
)


# ------------------------------------------------- PMI collocations
# Adjacent word pairs with count >= 20; PMI = ln(N·c_ab/(c_a·c_b))
# over position totals; top 15 by PMI.


def q_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = _adjacent_pairs(spark, sf_dir)
    pc = pairs.groupBy("a", "b").agg(F.count(F.lit(1)).alias("cab"))
    n = pairs.agg(F.count(F.lit(1)).alias("n"))
    ua = pairs.groupBy("a").agg(F.count(F.lit(1)).alias("ca"))
    ub = pairs.groupBy("b").agg(F.count(F.lit(1)).alias("cb"))
    j = (
        pc.where(F.col("cab") >= 20)
        .join(F.broadcast(ua), "a")
        .join(F.broadcast(ub), "b")
        .crossJoin(F.broadcast(n))
    )
    pmi = F.log(
        F.col("n").cast("double")
        * F.col("cab").cast("double")
        / (F.col("ca").cast("double") * F.col("cb").cast("double"))
    )
    return (
        j.select(
            F.col("a").alias("word_a"),
            F.col("b").alias("word_b"),
            F.col("cab").cast("long").alias("n_pair"),
            F.round(pmi, 6).alias("pmi"),
        )
        .orderBy(F.col("pmi").desc(), "word_a", "word_b")
        .limit(15)
    )


Q_PMI_COLL_SQL = f"""
WITH pairs AS ({_PAIRS_SQL}),
pc AS (SELECT a, b, COUNT(*) AS cab FROM pairs GROUP BY a, b),
n AS (SELECT COUNT(*) AS n FROM pairs),
ua AS (SELECT a, COUNT(*) AS ca FROM pairs GROUP BY a),
ub AS (SELECT b, COUNT(*) AS cb FROM pairs GROUP BY b)
SELECT pc.a AS word_a, pc.b AS word_b,
       CAST(cab AS BIGINT) AS n_pair,
       ROUND(LN(CAST(n AS DOUBLE) * CAST(cab AS DOUBLE)
                / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE))), 6) AS pmi
FROM pc JOIN ua ON pc.a = ua.a JOIN ub ON pc.b = ub.b CROSS JOIN n
WHERE cab >= 20
ORDER BY pmi DESC, word_a, word_b
LIMIT 15
"""

QUERIES["q_pmi_collocations"] = QuerySpec(
    q_pmi_collocations,
    Q_PMI_COLL_SQL,
    "top adjacent-word PMI collocations with a count floor — bigram "
    "explode, broadcast unigram margins",
)
