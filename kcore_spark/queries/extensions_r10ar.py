"""Round-10 surface extensions, batch AR (SURVEY §2.3 N r10): the
queueing-theory block — Erlang-C staffing (smallest agent count
meeting an 80/20 service level per event stream; the call-center /
ticket-queue sizing table), M/M/1 queue metrics per event type (ρ,
Lq, Wq, W at a shared capacity), and the utilization ladder (Wq as
capacity headroom shrinks — the hockey-stick every capacity review
plots). Completes the ops-planning family next to q_littles_law,
q_newsvendor_quantile and q_eoq.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: arrival rates are integer-count ratios over the
observed hour span; Erlang sums run over a LITERAL factorial grid
(0!..10! inlined — no lgamma needed); all engine doubles are
computed with token-identical expressions.
Scale: per-type counting plus k-row literal grids crossed broadcast;
nothing beyond one grouped count touches the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_FACTS = [1, 1, 2, 6, 24, 120, 720, 5040, 40320, 362880, 3628800]


def _rates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrivals per hour per event type over the observed span."""
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    span = ev.agg(
        (
            (F.unix_timestamp(F.date_trunc("second", F.max("ts")))
            - F.unix_timestamp(F.date_trunc("second", F.min("ts"))))
            / 3600.0
        ).alias("hours")
    )
    return (
        ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .crossJoin(F.broadcast(span))
        .select(
            "event_type",
            "n",
            F.round(F.col("n") / F.col("hours"), 9).alias("lam"),
        )
    )


_RATES_SQL = """
  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
         ROUND(COUNT(*) / hours, 9) AS lam
  FROM events CROSS JOIN (
    SELECT (epoch(date_trunc('second', MAX(CAST(ts AS TIMESTAMP))))
            - epoch(date_trunc('second', MIN(CAST(ts AS TIMESTAMP))))) / 3600.0
           AS hours
    FROM events) s
  GROUP BY event_type, hours
"""


# --------------------------------------------- Erlang-C staffing table
# AHT = 0.1 h; offered load a = λ·AHT. For each c in 1..10 with
# c > a: ErlangC = (a^c/c!) / (a^c/c! + (1−a/c)·Σ_{k<c} a^k/k!);
# SL = 1 − C·exp(−(c−a)·T/AHT) with T = 20 s. Recommend the smallest
# c with SL ≥ 0.8.


def q_erlang_c_staffing(spark: SparkSession, sf_dir: str) -> DataFrame:
    rates = _rates(spark, sf_dir)
    grid = F.array(
        *[
            F.struct(F.lit(c).alias("c"), F.lit(float(_FACTS[c])).alias("cfact"))
            for c in range(1, 11)
        ]
    )
    base = rates.select(
        "event_type", "lam", F.explode(grid).alias("g")
    ).select("event_type", "lam", F.col("g.c").alias("c"), F.col("g.cfact").alias("cfact"))
    a = F.col("lam") * 0.1
    # Σ_{k=0..c-1} a^k/k! via the literal factorial ladder
    ksum = None
    for k in range(0, 10):
        term = F.when(
            F.lit(k) < F.col("c"),
            F.pow(a, F.lit(float(k))) / F.lit(float(_FACTS[k])),
        ).otherwise(F.lit(0.0))
        ksum = term if ksum is None else ksum + term
    top = F.pow(a, F.col("c").cast("double")) / F.col("cfact")
    rho = a / F.col("c").cast("double")
    ec = top / (top + (1.0 - rho) * ksum)
    sl = 1.0 - ec * F.exp(-(F.col("c").cast("double") - a) * (20.0 / 360.0))
    scored = base.where(F.col("c").cast("double") > a).select(
        "event_type",
        "c",
        F.round(ec, 9).alias("p_wait"),
        F.round(sl, 9).alias("service_level"),
    )
    ok = scored.where(F.col("service_level") >= 0.8)
    best = ok.groupBy("event_type").agg(F.min("c").alias("c"))
    return (
        best.join(ok, ["event_type", "c"])
        .select(
            "event_type",
            F.col("c").cast("long").alias("agents"),
            F.round("p_wait", 6).alias("p_wait"),
            F.round("service_level", 6).alias("service_level"),
        )
        .orderBy("event_type")
    )


_KSUM_SQL = " + ".join(
    f"CASE WHEN {k} < c THEN POWER(lam * 0.1, {float(k)}) / {float(_FACTS[k])} ELSE 0.0 END"
    for k in range(0, 10)
)

Q_ERLANG_SQL = f"""
WITH rates AS ({_RATES_SQL}),
grid(c, cfact) AS (VALUES {", ".join(f"({c}, {float(_FACTS[c])})" for c in range(1, 11))}),
base AS (SELECT event_type, lam, c, cfact FROM rates CROSS JOIN grid),
scored AS (
  SELECT event_type, c,
         ROUND(POWER(lam * 0.1, CAST(c AS DOUBLE)) / cfact
               / (POWER(lam * 0.1, CAST(c AS DOUBLE)) / cfact
                  + (1.0 - (lam * 0.1) / CAST(c AS DOUBLE)) * ({_KSUM_SQL})), 9)
             AS p_wait,
         ROUND(1.0 - POWER(lam * 0.1, CAST(c AS DOUBLE)) / cfact
               / (POWER(lam * 0.1, CAST(c AS DOUBLE)) / cfact
                  + (1.0 - (lam * 0.1) / CAST(c AS DOUBLE)) * ({_KSUM_SQL}))
               * EXP(-(CAST(c AS DOUBLE) - lam * 0.1) * (20.0 / 360.0)), 9)
             AS service_level
  FROM base WHERE CAST(c AS DOUBLE) > lam * 0.1),
ok AS (SELECT * FROM scored WHERE service_level >= 0.8),
best AS (SELECT event_type, MIN(c) AS c FROM ok GROUP BY event_type)
SELECT event_type, CAST(c AS BIGINT) AS agents,
       ROUND(p_wait, 6) AS p_wait,
       ROUND(service_level, 6) AS service_level
FROM best JOIN ok USING (event_type, c)
ORDER BY event_type
"""

QUERIES["q_erlang_c_staffing"] = QuerySpec(
    q_erlang_c_staffing,
    Q_ERLANG_SQL,
    "Erlang-C 80/20 staffing per event stream — literal factorial "
    "ladder, k-row grid, smallest qualifying agent count",
)


# ------------------------------------------------------ M/M/1 metrics
# Shared capacity μ set so the busiest stream runs at ρ = 0.9.
# Per type: ρ, Lq = ρ²/(1−ρ), Wq = Lq/λ, W = Wq + 1/μ.


def q_mm1_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    rates = _rates(spark, sf_dir)
    mu = rates.agg((F.max("lam") / 0.9).alias("mu"))
    j = rates.crossJoin(F.broadcast(mu))
    rho = F.col("lam") / F.col("mu")
    lq = rho * rho / (1.0 - rho)
    wq = lq / F.col("lam")
    return j.select(
        "event_type",
        F.round("lam", 6).alias("arrivals_per_hour"),
        F.round(rho, 6).alias("rho"),
        F.round(lq, 6).alias("lq"),
        F.round(wq * 3600.0, 6).alias("wq_seconds"),
        F.round((wq + 1.0 / F.col("mu")) * 3600.0, 6).alias("w_seconds"),
    ).orderBy("event_type")


Q_MM1_SQL = f"""
WITH rates AS ({_RATES_SQL}),
mu AS (SELECT MAX(lam) / 0.9 AS mu FROM rates)
SELECT event_type,
       ROUND(lam, 6) AS arrivals_per_hour,
       ROUND(lam / mu, 6) AS rho,
       ROUND((lam / mu) * (lam / mu) / (1.0 - lam / mu), 6) AS lq,
       ROUND((lam / mu) * (lam / mu) / (1.0 - lam / mu) / lam * 3600.0, 6)
           AS wq_seconds,
       ROUND(((lam / mu) * (lam / mu) / (1.0 - lam / mu) / lam + 1.0 / mu)
             * 3600.0, 6) AS w_seconds
FROM rates CROSS JOIN mu
ORDER BY event_type
"""

QUERIES["q_mm1_metrics"] = QuerySpec(
    q_mm1_metrics,
    Q_MM1_SQL,
    "M/M/1 queue metrics per event type at shared 0.9-peak capacity — "
    "closed forms over the rate table",
)


# ------------------------------------------------- utilization ladder
# Busiest stream; Wq = λ/(μ(μ−λ)) across headroom multipliers
# m ∈ {1.05..2.0} (μ = m·λ): the hockey-stick table.


def q_utilization_ladder(spark: SparkSession, sf_dir: str) -> DataFrame:
    rates = _rates(spark, sf_dir)
    top = rates.orderBy(F.col("lam").desc(), F.col("event_type")).limit(1)
    ms = [1.05, 1.1, 1.2, 1.3, 1.5, 1.75, 2.0]
    grid = F.array(*[F.lit(m) for m in ms])
    j = top.select("event_type", "lam", F.explode(grid).alias("m"))
    mu = F.col("m") * F.col("lam")
    wq = F.col("lam") / (mu * (mu - F.col("lam")))
    return j.select(
        "event_type",
        F.round("m", 2).alias("headroom"),
        F.round(1.0 / F.col("m"), 6).alias("rho"),
        F.round(wq * 3600.0, 6).alias("wq_seconds"),
    ).orderBy("headroom")


Q_LADDER_SQL = f"""
WITH rates AS ({_RATES_SQL}),
top AS (SELECT event_type, lam FROM rates ORDER BY lam DESC, event_type LIMIT 1),
grid(m) AS (VALUES (1.05), (1.1), (1.2), (1.3), (1.5), (1.75), (2.0))
SELECT event_type,
       ROUND(m, 2) AS headroom,
       ROUND(1.0 / m, 6) AS rho,
       ROUND(lam / ((m * lam) * (m * lam - lam)) * 3600.0, 6) AS wq_seconds
FROM top CROSS JOIN grid
ORDER BY headroom
"""

QUERIES["q_utilization_ladder"] = QuerySpec(
    q_utilization_ladder,
    Q_LADDER_SQL,
    "M/M/1 wait vs capacity headroom for the busiest stream — 7-row "
    "literal grid",
)
