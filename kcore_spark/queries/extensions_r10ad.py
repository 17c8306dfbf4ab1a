"""Round-10 surface extensions, batch AD (SURVEY §2.3 N r10): the
LLM-planning block — sampling-temperature diversity (effective
vocabulary size exp(H) of the unigram distribution under temperature
reshaping p proportional to c^(1/T) — how much a temperature knob
actually widens sampling) and the Chinchilla-style compute plan from
the corpus' own token count.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: vocabulary counts are integers; per-word mass terms are
rounded then decimal-summed per temperature; the plan is closed-form
integer arithmetic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_TEMPS = [0.7, 1.0, 1.3]


# ------------------- sampling-temperature effective vocabulary
# Unigram sampling at temperature T reshapes p_w to c_w^(1/T) / Z.
# Effective vocabulary = exp(-sum p ln p): T < 1 sharpens (smaller),
# T > 1 flattens (larger, bounded by |V|). Two passes per T over the
# VOCABULARY table (bounded): Z, then the entropy fold — all term
# sums decimal.


def q_sampling_temperature_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load_table(spark, sf_dir, "documents").select(
        F.explode(F.split(F.lower(F.col("text")), " ")).alias("w")
    ).where(F.col("w") != "")
    vocab = tok.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    outs = []
    for t in _TEMPS:
        powed = vocab.select(
            F.round(F.pow(F.col("c").cast("double"), 1.0 / t), 10)
            .cast("decimal(28,10)")
            .alias("m")
        )
        z = powed.agg(
            F.count(F.lit(1)).alias("v"), F.sum("m").alias("z")
        )
        ent = (
            powed.crossJoin(F.broadcast(z))
            .select(
                F.round(
                    -(F.col("m").cast("double") / F.col("z").cast("double"))
                    * F.log(
                        F.col("m").cast("double") / F.col("z").cast("double")
                    ),
                    12,
                )
                .cast("decimal(28,12)")
                .alias("h"),
                "v",
            )
            .agg(F.max("v").alias("v"), F.sum("h").alias("hh"))
        )
        outs.append(
            ent.select(
                F.lit(t).alias("temperature"),
                F.col("v").cast("long").alias("vocab_size"),
                F.round(F.col("hh").cast("double"), 6).alias("entropy_nats"),
                F.round(F.exp(F.col("hh").cast("double")), 4).alias(
                    "effective_vocab"
                ),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("temperature")


def _temp_sql() -> str:
    parts = []
    for t in _TEMPS:
        parts.append(f"""
SELECT {t} AS temperature,
       CAST(MAX(v) AS BIGINT) AS vocab_size,
       ROUND(CAST(SUM(h) AS DOUBLE), 6) AS entropy_nats,
       ROUND(EXP(CAST(SUM(h) AS DOUBLE)), 4) AS effective_vocab
FROM (
  SELECT v, CAST(ROUND(-(CAST(m AS DOUBLE) / CAST(z AS DOUBLE))
                       * LN(CAST(m AS DOUBLE) / CAST(z AS DOUBLE)), 12)
            AS DECIMAL(28,12)) AS h
  FROM (
    SELECT CAST(ROUND(POWER(CAST(c AS DOUBLE), {1.0 / t!r}), 10)
                AS DECIMAL(28,10)) AS m
    FROM vocab) p,
    (SELECT COUNT(*) AS v,
            SUM(CAST(ROUND(POWER(CAST(c AS DOUBLE), {1.0 / t!r}), 10)
                     AS DECIMAL(28,10))) AS z
     FROM vocab) zz)""")
    return f"""
WITH tok AS (
  SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents),
tok2 AS (SELECT w FROM tok WHERE w <> ''),
vocab AS (SELECT w, COUNT(*) AS c FROM tok2 GROUP BY w)
{' UNION ALL '.join(parts)}
ORDER BY temperature
"""


QUERIES["q_sampling_temperature_mass"] = QuerySpec(
    q_sampling_temperature_mass,
    _temp_sql(),
    "effective vocabulary exp(H) of the unigram distribution under "
    "temperature reshaping (0.7 / 1.0 / 1.3) — sampling diversity",
)


# -------------------------------- Chinchilla-style compute plan
# From the corpus' own token count D: compute-optimal parameter count
# N = D / 20 (the Chinchilla 20-tokens-per-parameter rule) and the
# training FLOPs 6 N D — the napkin every pretraining plan starts
# with. One rollup + closed-form integers.


def q_chinchilla_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    tok = load_table(spark, sf_dir, "documents").select(
        F.size(
            F.filter(F.split(F.lower(F.col("text")), " "), lambda w: w != "")
        ).alias("n_tok")
    )
    m = tok.agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tok").alias("tokens")
    )
    params = F.expr("tokens div 20")
    return m.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("tokens").cast("long").alias("train_tokens"),
        params.cast("long").alias("optimal_params"),
        F.round(
            6.0 * params.cast("double") * F.col("tokens").cast("double"), 0
        ).alias("train_flops"),
    )


Q_CHIN_SQL = """
WITH tok AS (
  SELECT len(list_filter(string_split(lower(text), ' '), w -> w <> ''))
           AS n_tok
  FROM documents),
m AS (SELECT COUNT(*) AS n_docs, SUM(n_tok) AS tokens FROM tok)
SELECT CAST(n_docs AS BIGINT) AS n_docs,
       CAST(tokens AS BIGINT) AS train_tokens,
       CAST(tokens // 20 AS BIGINT) AS optimal_params,
       ROUND(6.0 * CAST(tokens // 20 AS DOUBLE) * CAST(tokens AS DOUBLE), 0)
         AS train_flops
FROM m
"""

QUERIES["q_chinchilla_plan"] = QuerySpec(
    q_chinchilla_plan,
    Q_CHIN_SQL,
    "Chinchilla-style compute plan from the corpus token count "
    "(20 tokens/param, 6ND FLOPs) — the pretraining napkin",
)
