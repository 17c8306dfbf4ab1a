"""Round-10 surface extensions, batch DC (SURVEY §2.3 N r10): the
filter-operations block — the meta-analysis of a curation stack. Three
pinned document filters (length window, stopword floor, digit-ratio
cap) audited as a SYSTEM: pairwise Cohen's kappa between filters (are
two filters redundant?), the filter Venn (all 8 pass/fail cells — who
removes what together), and unique-removal attribution (documents ONLY
this filter removes — its marginal value in the stack). The questions
a pretraining-curation owner asks before adding filter #7; next to
q_curation_funnel / q_corpus_curation / q_dedup_impact_report.

Filters (pinned): LEN = 200 <= n_chars <= 20000; STOP = stopword token
share >= 0.10 over a pinned 12-word list; DIGIT = digit character
share <= 0.20.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: filters are exact integer/ratio predicates on pure
expressions; every statistic is count algebra.
Scale: one documents scan computes all three flags; everything after
is 8-cell algebra.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_STOPWORDS = (
    "the,a,an,and,or,of,to,in,is,it,for,on"  # pinned 12-word list
)


def _flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "n_chars", F.lower("text").alias("t")
    )
    words = F.split(F.col("t"), " ")
    stops = F.array(*[F.lit(w) for w in _STOPWORDS.split(",")])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stops, w)))
    n_words = F.size(words)
    digit_chars = F.length(F.regexp_replace(F.col("t"), "[^0-9]", ""))
    return docs.select(
        "doc_id",
        (
            (F.col("n_chars") >= 200) & (F.col("n_chars") <= 20000)
        ).alias("f_len"),
        (n_stop / n_words >= 0.10).alias("f_stop"),
        (digit_chars / F.length("t") <= 0.20).alias("f_digit"),
    )


_STOP_SQL_LIST = ", ".join(f"'{w}'" for w in _STOPWORDS.split(","))
_FLAGS_SQL = f"""
  flags AS (
    SELECT doc_id,
           n_chars >= 200 AND n_chars <= 20000 AS f_len,
           CAST(len(list_filter(string_split(lower(text), ' '),
                w -> list_contains([{_STOP_SQL_LIST}], w))) AS DOUBLE)
             / len(string_split(lower(text), ' ')) >= 0.10 AS f_stop,
           CAST(length(regexp_replace(lower(text), '[^0-9]', '', 'g'))
                AS DOUBLE) / length(lower(text)) <= 0.20 AS f_digit
    FROM documents)
"""

_PAIRS = [("f_len", "f_stop"), ("f_len", "f_digit"), ("f_stop", "f_digit")]


def q_filter_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    fl = _flags(spark, sf_dir)
    arms = F.array(
        *[
            F.struct(
                F.lit(f"{a}~{b}").alias("pair"),
                F.col(a).cast("int").alias("x"),
                F.col(b).cast("int").alias("y"),
            )
            for a, b in _PAIRS
        ]
    )
    rows = fl.select(F.explode(arms).alias("r")).select(
        F.col("r.pair").alias("pair"), F.col("r.x").alias("x"), F.col("r.y").alias("y")
    )
    agg = rows.groupBy("pair").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("x") * F.col("y"))).cast("long").alias("n11"),
        F.sum(F.col("x") * (1 - F.col("y"))).cast("long").alias("n10"),
        F.sum((1 - F.col("x")) * F.col("y")).cast("long").alias("n01"),
        F.sum((1 - F.col("x")) * (1 - F.col("y"))).cast("long").alias("n00"),
    )
    nd = F.col("n").cast("double")
    po = (F.col("n11") + F.col("n00")) / nd
    px = (F.col("n11") + F.col("n10")) / nd
    py = (F.col("n11") + F.col("n01")) / nd
    pe = px * py + (1.0 - px) * (1.0 - py)
    return agg.select(
        "pair",
        "n",
        F.round(po, 6).alias("raw_agreement"),
        F.round((po - pe) / (1.0 - pe), 6).alias("kappa"),
    ).orderBy("pair")


_ARMS_SQL = " UNION ALL ".join(
    f"SELECT '{a}~{b}' AS pair, CAST({a} AS INT) AS x, CAST({b} AS INT) AS y"
    f" FROM flags"
    for a, b in _PAIRS
)
Q_KAPPA_SQL = f"""
WITH {_FLAGS_SQL},
rows_t AS ({_ARMS_SQL}),
agg AS (
  SELECT pair, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x * y) AS BIGINT) AS n11,
         CAST(SUM(x * (1 - y)) AS BIGINT) AS n10,
         CAST(SUM((1 - x) * y) AS BIGINT) AS n01,
         CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS n00
  FROM rows_t GROUP BY pair)
SELECT pair, n,
       ROUND((n11 + n00) / CAST(n AS DOUBLE), 6) AS raw_agreement,
       ROUND(((n11 + n00) / CAST(n AS DOUBLE)
              - (((n11 + n10) / CAST(n AS DOUBLE))
                 * ((n11 + n01) / CAST(n AS DOUBLE))
                 + (1.0 - (n11 + n10) / CAST(n AS DOUBLE))
                   * (1.0 - (n11 + n01) / CAST(n AS DOUBLE))))
             / (1.0 - (((n11 + n10) / CAST(n AS DOUBLE))
                       * ((n11 + n01) / CAST(n AS DOUBLE))
                       + (1.0 - (n11 + n10) / CAST(n AS DOUBLE))
                         * (1.0 - (n11 + n01) / CAST(n AS DOUBLE)))), 6)
           AS kappa
FROM agg ORDER BY pair
"""

QUERIES["q_filter_agreement_kappa"] = QuerySpec(
    q_filter_agreement_kappa,
    Q_KAPPA_SQL,
    "pairwise Cohen's kappa between the three curation filters — "
    "redundancy audit, count algebra",
)


def q_filter_venn(spark: SparkSession, sf_dir: str) -> DataFrame:
    fl = _flags(spark, sf_dir)
    tot = fl.count()
    return (
        fl.groupBy("f_len", "f_stop", "f_digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_docs"))
        .select(
            "f_len",
            "f_stop",
            "f_digit",
            "n_docs",
            F.round(F.col("n_docs") / F.lit(float(tot)), 6).alias("share"),
        )
        .orderBy("f_len", "f_stop", "f_digit")
    )


Q_VENN_SQL = f"""
WITH {_FLAGS_SQL},
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS t FROM flags)
SELECT f_len, f_stop, f_digit,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       ROUND(COUNT(*) / CAST(MIN(t) AS DOUBLE), 6) AS share
FROM flags CROSS JOIN tot
GROUP BY 1, 2, 3 ORDER BY f_len, f_stop, f_digit
"""

QUERIES["q_filter_venn"] = QuerySpec(
    q_filter_venn,
    Q_VENN_SQL,
    "filter Venn: all 8 pass/fail cells of the three-filter stack "
    "with shares — one scan",
)


def q_filter_marginal_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per filter: total fails, UNIQUE removals (docs only it fails),
    and the share of its removals that are redundant."""
    fl = _flags(spark, sf_dir)
    arms = F.array(
        *[
            F.struct(
                F.lit(name).alias("flt"),
                (~F.col(name)).cast("int").alias("fails"),
                (
                    (~F.col(name))
                    & F.col(o1)
                    & F.col(o2)
                )
                .cast("int")
                .alias("unique_fail"),
            )
            for name, o1, o2 in [
                ("f_len", "f_stop", "f_digit"),
                ("f_stop", "f_len", "f_digit"),
                ("f_digit", "f_len", "f_stop"),
            ]
        ]
    )
    rows = fl.select(F.explode(arms).alias("r")).select(
        F.col("r.flt").alias("filter"),
        F.col("r.fails").alias("fails"),
        F.col("r.unique_fail").alias("unique_fail"),
    )
    agg = rows.groupBy("filter").agg(
        F.sum("fails").cast("long").alias("total_removed"),
        F.sum("unique_fail").cast("long").alias("unique_removed"),
    )
    return agg.select(
        "filter",
        "total_removed",
        "unique_removed",
        F.round(
            1.0
            - F.col("unique_removed")
            / F.greatest(F.col("total_removed").cast("double"), F.lit(1.0)),
            6,
        ).alias("redundancy_share"),
    ).orderBy("filter")


_MARGS = " UNION ALL ".join(
    f"SELECT '{name}' AS filter,"
    f" CAST(NOT {name} AS INT) AS fails,"
    f" CAST(NOT {name} AND {o1} AND {o2} AS INT) AS unique_fail FROM flags"
    for name, o1, o2 in [
        ("f_len", "f_stop", "f_digit"),
        ("f_stop", "f_len", "f_digit"),
        ("f_digit", "f_len", "f_stop"),
    ]
)
Q_MARGINAL_SQL = f"""
WITH {_FLAGS_SQL},
rows_t AS ({_MARGS})
SELECT filter,
       CAST(SUM(fails) AS BIGINT) AS total_removed,
       CAST(SUM(unique_fail) AS BIGINT) AS unique_removed,
       ROUND(1.0 - SUM(unique_fail)
             / GREATEST(CAST(SUM(fails) AS DOUBLE), 1.0), 6)
           AS redundancy_share
FROM rows_t GROUP BY filter ORDER BY filter
"""

QUERIES["q_filter_marginal_value"] = QuerySpec(
    q_filter_marginal_value,
    Q_MARGINAL_SQL,
    "marginal value per curation filter: unique vs redundant removals "
    "— the keep-or-drop audit for a filter stack",
)
