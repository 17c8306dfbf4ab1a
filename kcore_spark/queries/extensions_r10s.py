"""Round-10 surface extensions, batch S (SURVEY §2.3 N r10): the
marketing-science block — exact Shapley channel attribution over the
observed 3-channel coalition table (the cooperative-game allocation
marketers use when last-touch lies), and Beta-Binomial posterior
summaries of per-segment conversion (the Bayesian readout that
replaces fragile small-n point estimates).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: coalition/conversion counts are integers; Shapley
weights for 3 players are exact rationals applied in one closed-form
expression; posterior moments are closed-form doubles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_CHANNELS = ["view", "click", "signup"]


# ----------------------- exact Shapley channel attribution (3 players)
# Exposure set per user = which of view/click/signup they emitted;
# conversion = emitted purchase. v(S) = conversion rate among users
# whose exposure set is EXACTLY S (0 when unobserved). With 3 players
# the Shapley sum is 4 terms per channel with weights 1/3, 1/6, 1/6,
# 1/3 — fully unrolled closed form on the 8-row coalition table.
# One keyed pivot + an 8-row rollup; integer counts throughout.


def q_shapley_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        *[
            F.max((F.col("event_type") == c).cast("int")).alias(f"c{i}")
            for i, c in enumerate(_CHANNELS)
        ],
        F.max((F.col("event_type") == "purchase").cast("int")).alias("conv"),
    )
    mask = (
        F.col("c0") + F.col("c1") * 2 + F.col("c2") * 4
    ).alias("coalition")
    co = per_user.select(mask, "conv").groupBy("coalition").agg(
        F.count(F.lit(1)).alias("n"), F.sum("conv").alias("k")
    )
    # pivot the 8 coalition rates into one row: v0..v7 (0 if absent)
    piv = co.agg(
        *[
            F.coalesce(
                F.max(
                    F.when(
                        F.col("coalition") == m,
                        F.col("k").cast("double") / F.col("n"),
                    )
                ),
                F.lit(0.0),
            ).alias(f"v{m}")
            for m in range(8)
        ]
    )

    def _shap(bit: int):
        # phi_i = sum over S not containing i of w(|S|) * (v(S+i) - v(S))
        # weights for 3 players: |S|=0 -> 1/3, |S|=1 -> 1/6, |S|=2 -> 1/3
        terms = []
        for s in range(8):
            if s & (1 << bit):
                continue
            size = bin(s).count("1")
            w = {0: 1.0 / 3.0, 1: 1.0 / 6.0, 2: 1.0 / 3.0}[size]
            terms.append(F.lit(w) * (F.col(f"v{s | (1 << bit)}") - F.col(f"v{s}")))
        out = terms[0]
        for t in terms[1:]:
            out = out + t
        return out

    rows = []
    for i, c in enumerate(_CHANNELS):
        rows.append(
            piv.select(
                F.lit(c).alias("channel"),
                F.round(_shap(i), 8).alias("shapley_value"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("channel")


def _shap_sql() -> str:
    cases = []
    for i, c in enumerate(_CHANNELS):
        terms = []
        for s in range(8):
            if s & (1 << i):
                continue
            size = bin(s).count("1")
            w = {0: "1.0/3.0", 1: "1.0/6.0", 2: "1.0/3.0"}[size]
            terms.append(f"{w} * (v{s | (1 << i)} - v{s})")
        cases.append(f"SELECT '{c}' AS channel, ROUND({' + '.join(terms)}, 8) AS shapley_value FROM piv")
    vcols = ",\n         ".join(
        f"COALESCE(MAX(CASE WHEN coalition = {m} THEN CAST(k AS DOUBLE) / n END), 0.0) AS v{m}"
        for m in range(8)
    )
    return f"""
WITH per_user AS (
  SELECT user_id,
         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c0,
         MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c1,
         MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS c2,
         MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY user_id),
co AS (
  SELECT c0 + c1 * 2 + c2 * 4 AS coalition, COUNT(*) AS n, SUM(conv) AS k
  FROM per_user GROUP BY 1),
piv AS (
  SELECT {vcols}
  FROM co)
{' UNION ALL '.join(cases)}
ORDER BY channel
"""


QUERIES["q_shapley_attribution"] = QuerySpec(
    q_shapley_attribution,
    _shap_sql(),
    "exact 3-channel Shapley attribution over the observed coalition "
    "conversion table (closed-form unrolled weights)",
)


# ------------------- Beta-Binomial posterior conversion summaries
# Per market segment with a Beta(1,1) prior: posterior mean
# (k+1)/(n+2), mode k/n, variance ab/((a+b)^2(a+b+1)) — the
# shrinkage readout for small-n segment rates. Integer counts,
# closed-form doubles.


def q_beta_posterior(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    repeat = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("c_custkey"))
        .agg((F.count(F.lit(1)) >= 3).cast("int").alias("heavy"))
    )
    per = (
        cust.join(repeat, "c_custkey", "left")
        .na.fill({"heavy": 0})
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("heavy").alias("k"))
    )
    a = F.col("k") + 1
    b = F.col("n") - F.col("k") + 1
    mean = a.cast("double") / (F.col("n") + 2)
    var = (a.cast("double") * b) / (
        (F.col("n") + 2).cast("double") * (F.col("n") + 2) * (F.col("n") + 3)
    )
    return per.select(
        "c_mktsegment",
        F.col("n").cast("long").alias("n_customers"),
        F.col("k").cast("long").alias("n_heavy"),
        F.round(F.col("k") / F.col("n").cast("double"), 6).alias("mle_rate"),
        F.round(mean, 6).alias("posterior_mean"),
        F.round(F.sqrt(var), 8).alias("posterior_sd"),
    ).orderBy("c_mktsegment")


Q_BETA_SQL = """
WITH repeat AS (
  SELECT o_custkey AS c_custkey,
         CASE WHEN COUNT(*) >= 3 THEN 1 ELSE 0 END AS heavy
  FROM orders GROUP BY o_custkey),
per AS (
  SELECT c.c_mktsegment, COUNT(*) AS n,
         SUM(COALESCE(r.heavy, 0)) AS k
  FROM customer c LEFT JOIN repeat r USING (c_custkey)
  GROUP BY c.c_mktsegment)
SELECT c_mktsegment, CAST(n AS BIGINT) AS n_customers,
       CAST(k AS BIGINT) AS n_heavy,
       ROUND(k / CAST(n AS DOUBLE), 6) AS mle_rate,
       ROUND(CAST(k + 1 AS DOUBLE) / (n + 2), 6) AS posterior_mean,
       ROUND(SQRT((CAST(k + 1 AS DOUBLE) * (n - k + 1))
                  / (CAST(n + 2 AS DOUBLE) * (n + 2) * (n + 3))), 8)
         AS posterior_sd
FROM per
ORDER BY c_mktsegment
"""

QUERIES["q_beta_posterior"] = QuerySpec(
    q_beta_posterior,
    Q_BETA_SQL,
    "Beta(1,1)-Binomial posterior summaries of per-segment heavy-"
    "buyer rates (closed-form shrinkage) — the Bayesian readout",
)
