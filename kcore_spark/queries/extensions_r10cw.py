"""Round-10 surface extensions, batch CW (SURVEY §2.3 N r10): the
queueing block, third wave — Erlang B (the LOSS system: blocking
probability per trunk count, where q_erlang_c_staffing modeled queued
waiting), the M/M/c wait-time tail (P(W > T) = C(c,a) e^{-(c mu -
lambda) T} — the latency-SLO form of the Erlang C number), and the
Pollaczek-Khinchine mean wait (M/G/1: the service-time CV measured
from the fixture's ship delays enters squared — variance, not just
load, drives queues).

Arrivals: per-hour event rates (the q_erlang_c_staffing _rates shape);
AHT pinned at 0.1 h; the PK service distribution is the order->ship
delay in days from lineitem⋈orders.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: literal factorial ladders (the q_erlang_c precedent);
service moments are decimal sums; everything else is pinned algebra.
Scale: rates/moments are one-scan folds; ladders are k-row grids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec
from kcore_spark.queries.extensions_r10ar import _RATES_SQL, _rates

QUERIES: dict[str, QuerySpec] = {}

_FACTS = [1, 1, 2, 6, 24, 120, 720, 5040, 40320, 362880, 3628800]
_AHT = 0.1  # hours
_SLO_T = 0.05  # hours (3 minutes) for the wait-tail


def q_erlang_b_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking probability B(c, a) = (a^c/c!) / sum_{k<=c} a^k/k! for
    c = 1..10 trunks; smallest c with blocking <= 2% recommended."""
    rates = _rates(spark, sf_dir)
    grid = F.array(
        *[
            F.struct(F.lit(c).alias("c"), F.lit(float(_FACTS[c])).alias("cfact"))
            for c in range(1, 11)
        ]
    )
    base = rates.select("event_type", "lam", F.explode(grid).alias("g")).select(
        "event_type", "lam", F.col("g.c").alias("c"), F.col("g.cfact").alias("cfact")
    )
    a = F.col("lam") * _AHT
    ksum = None
    for k in range(0, 11):
        term = F.when(
            F.lit(k) <= F.col("c"),
            F.pow(a, F.lit(float(k))) / F.lit(float(_FACTS[k])),
        ).otherwise(F.lit(0.0))
        ksum = term if ksum is None else ksum + term
    top = F.pow(a, F.col("c").cast("double")) / F.col("cfact")
    b = top / ksum
    scored = base.select(
        "event_type", "c", F.round(b, 9).alias("p_block")
    )
    ok = scored.where(F.col("p_block") <= 0.02)
    best = ok.groupBy("event_type").agg(F.min("c").alias("c"))
    return (
        best.join(ok, ["event_type", "c"])
        .select(
            "event_type",
            F.col("c").cast("long").alias("trunks"),
            F.round("p_block", 6).alias("p_block"),
        )
        .orderBy("event_type")
    )


_BSUM_SQL = " + ".join(
    f"CASE WHEN {k} <= c THEN POWER(lam * {_AHT}, {float(k)})"
    f" / {float(_FACTS[k])} ELSE 0.0 END"
    for k in range(0, 11)
)
Q_ERLANG_B_SQL = f"""
WITH rates AS ({_RATES_SQL}),
grid(c, cfact) AS (VALUES {", ".join(f"({c}, {float(_FACTS[c])})" for c in range(1, 11))}),
scored AS (
  SELECT event_type, c,
         ROUND(POWER(lam * {_AHT}, CAST(c AS DOUBLE)) / cfact
               / ({_BSUM_SQL}), 9) AS p_block
  FROM rates CROSS JOIN grid),
ok AS (SELECT * FROM scored WHERE p_block <= 0.02),
best AS (SELECT event_type, MIN(c) AS c FROM ok GROUP BY event_type)
SELECT event_type, CAST(c AS BIGINT) AS trunks,
       ROUND(p_block, 6) AS p_block
FROM best JOIN ok USING (event_type, c)
ORDER BY event_type
"""

QUERIES["q_erlang_b_loss"] = QuerySpec(
    q_erlang_b_loss,
    Q_ERLANG_B_SQL,
    "Erlang B blocking ladder: smallest trunk count with <= 2% loss "
    "per event type — literal factorial grid",
)


def q_mmc_wait_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P(W > T) for the smallest stable c: ErlangC(c,a) *
    exp(-(c - a) * T / AHT)."""
    rates = _rates(spark, sf_dir)
    grid = F.array(
        *[
            F.struct(F.lit(c).alias("c"), F.lit(float(_FACTS[c])).alias("cfact"))
            for c in range(1, 11)
        ]
    )
    base = rates.select("event_type", "lam", F.explode(grid).alias("g")).select(
        "event_type", "lam", F.col("g.c").alias("c"), F.col("g.cfact").alias("cfact")
    )
    a = F.col("lam") * _AHT
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
    tail = ec * F.exp(-(F.col("c").cast("double") - a) * (_SLO_T / _AHT))
    stable = base.where(F.col("c").cast("double") > a)
    first_stable = stable.groupBy("event_type").agg(F.min("c").alias("c"))
    j = first_stable.join(
        stable.select(
            "event_type",
            "c",
            F.round(a, 9).alias("offered_load"),
            F.round(ec, 9).alias("p_wait"),
            F.round(tail, 9).alias("p_wait_gt_3min"),
        ),
        ["event_type", "c"],
    )
    return j.select(
        "event_type",
        F.col("c").cast("long").alias("servers"),
        F.round("offered_load", 6).alias("offered_load"),
        F.round("p_wait", 6).alias("p_wait"),
        F.round("p_wait_gt_3min", 6).alias("p_wait_gt_3min"),
    ).orderBy("event_type")


_CSUM_SQL = " + ".join(
    f"CASE WHEN {k} < c THEN POWER(lam * {_AHT}, {float(k)})"
    f" / {float(_FACTS[k])} ELSE 0.0 END"
    for k in range(0, 10)
)
_EC_SQL = (
    f"(POWER(lam * {_AHT}, CAST(c AS DOUBLE)) / cfact"
    f" / (POWER(lam * {_AHT}, CAST(c AS DOUBLE)) / cfact"
    f"    + (1.0 - (lam * {_AHT}) / CAST(c AS DOUBLE)) * ({_CSUM_SQL})))"
)
Q_MMC_TAIL_SQL = f"""
WITH rates AS ({_RATES_SQL}),
grid(c, cfact) AS (VALUES {", ".join(f"({c}, {float(_FACTS[c])})" for c in range(1, 11))}),
stable AS (
  SELECT event_type, c,
         ROUND(lam * {_AHT}, 9) AS offered_load,
         ROUND({_EC_SQL}, 9) AS p_wait,
         ROUND({_EC_SQL}
               * EXP(-(CAST(c AS DOUBLE) - lam * {_AHT})
                     * ({_SLO_T} / {_AHT})), 9) AS p_wait_gt_3min
  FROM rates CROSS JOIN grid
  WHERE CAST(c AS DOUBLE) > lam * {_AHT}),
first_stable AS (SELECT event_type, MIN(c) AS c FROM stable GROUP BY event_type)
SELECT event_type, CAST(c AS BIGINT) AS servers,
       ROUND(offered_load, 6) AS offered_load,
       ROUND(p_wait, 6) AS p_wait,
       ROUND(p_wait_gt_3min, 6) AS p_wait_gt_3min
FROM first_stable JOIN stable USING (event_type, c)
ORDER BY event_type
"""

QUERIES["q_mmc_wait_tail"] = QuerySpec(
    q_mmc_wait_tail,
    Q_MMC_TAIL_SQL,
    "M/M/c wait-tail P(W > 3 min) at the smallest stable server count "
    "— Erlang C times the exponential tail",
)


def q_pollaczek_khinchine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M/G/1 mean queue wait from MEASURED service moments: service =
    order->ship delay (days); lambda scaled so rho = 0.8 (pinned) —
    the PK formula Wq = lambda E[S^2] / (2 (1 - rho))."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.col("l_shipdate").alias("sd")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", F.col("o_orderdate").alias("od")
    )
    s = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(F.greatest(F.datediff("sd", "od"), F.lit(0)).cast("double").alias("s"))
    )
    mom = s.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("s", 1).cast("decimal(38,1)")).cast("double").alias("s1"),
        F.sum(F.round(F.col("s") * F.col("s"), 1).cast("decimal(38,1)"))
        .cast("double")
        .alias("s2"),
    )
    nd = F.col("n").cast("double")
    es = F.col("s1") / nd
    es2 = F.col("s2") / nd
    cv2 = (es2 - es * es) / (es * es)
    lam = 0.8 / es  # pinned rho = 0.8
    wq = lam * es2 / (2.0 * (1.0 - 0.8))
    return mom.select(
        "n",
        F.round(es, 4).alias("mean_service_days"),
        F.round(F.sqrt(es2 - es * es), 4).alias("sd_service_days"),
        F.round(cv2, 6).alias("service_cv2"),
        F.round(wq, 4).alias("pk_mean_wait_days"),
        # the M/M/1 wait at the same rho, for contrast
        F.round(0.8 * es / (1.0 - 0.8), 4).alias("mm1_wait_days"),
    )


Q_PK_SQL = """
WITH s AS (
  SELECT CAST(GREATEST(date_diff('day', o_orderdate, l_shipdate), 0)
              AS DOUBLE) AS s
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(s, 1) AS DECIMAL(38,1))) AS DOUBLE) AS s1,
         CAST(SUM(CAST(ROUND(s * s, 1) AS DECIMAL(38,1))) AS DOUBLE) AS s2
  FROM s)
SELECT n,
       ROUND(s1 / n, 4) AS mean_service_days,
       ROUND(SQRT(s2 / n - (s1 / n) * (s1 / n)), 4) AS sd_service_days,
       ROUND((s2 / n - (s1 / n) * (s1 / n)) / ((s1 / n) * (s1 / n)), 6)
           AS service_cv2,
       ROUND((0.8 / (s1 / n)) * (s2 / n) / (2.0 * (1.0 - 0.8)), 4)
           AS pk_mean_wait_days,
       ROUND(0.8 * (s1 / n) / (1.0 - 0.8), 4) AS mm1_wait_days
FROM mom
"""

QUERIES["q_pollaczek_khinchine"] = QuerySpec(
    q_pollaczek_khinchine,
    Q_PK_SQL,
    "Pollaczek-Khinchine M/G/1 wait from measured ship-delay moments "
    "at pinned rho=0.8, contrasted with M/M/1",
)
