"""Round-10 surface extensions, batch K (SURVEY §2.3 N r10): the
sequence/privacy-ops block — per-state transition entropy of the
event-type chain (how predictable is the next event), the
contribution-bounding audit (the clipping-cap planning pass every
differential-privacy aggregation runs first), and per-type
inter-arrival coefficient of variation (the Poisson-ness check on
arrival processes).

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: transition counts are integers; p*log p terms are
rounded to 12 dp then decimal-summed; inter-arrival moments are
integer-second sums; clipping masses are integer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}


# -------------------- transition entropy of the event-type chain
# Per current state: H(next | cur) = -sum_j p_j ln p_j over the
# observed next-event distribution (per-user time order, the
# q_event_transitions chain). Low entropy = deterministic flows,
# high = noise. Keyed lead window + integer transition counts;
# per-cell plogp rounded then decimal-summed.


def q_transition_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("nxt", F.lead("event_type").over(w))
        .where(F.col("nxt").isNotNull())
        .groupBy(F.col("event_type").alias("cur"), "nxt")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    tot = pairs.groupBy("cur").agg(F.sum("c").alias("t"))
    cell = pairs.join(F.broadcast(tot), "cur").select(
        "cur",
        "c",
        "t",
        F.round(
            -(F.col("c") / F.col("t")) * F.log(F.col("c") / F.col("t")), 12
        )
        .cast("decimal(28,12)")
        .alias("plogp"),
    )
    return (
        cell.groupBy("cur")
        .agg(
            F.max("t").cast("long").alias("n_transitions"),
            F.count(F.lit(1)).cast("long").alias("n_next_states"),
            F.round(F.sum("plogp").cast("double"), 6).alias("entropy_nats"),
        )
        .orderBy("cur")
    )


Q_TRANS_ENT_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS nxt
  FROM events),
pairs AS (
  SELECT event_type AS cur, nxt, COUNT(*) AS c
  FROM seq WHERE nxt IS NOT NULL GROUP BY event_type, nxt),
tot AS (SELECT cur, SUM(c) AS t FROM pairs GROUP BY cur),
cell AS (
  SELECT p.cur, p.c, o.t,
         CAST(ROUND(-(p.c * 1.0 / o.t) * LN(p.c * 1.0 / o.t), 12)
              AS DECIMAL(28,12)) AS plogp
  FROM pairs p JOIN tot o ON o.cur = p.cur)
SELECT cur, CAST(MAX(t) AS BIGINT) AS n_transitions,
       CAST(COUNT(*) AS BIGINT) AS n_next_states,
       ROUND(CAST(SUM(plogp) AS DOUBLE), 6) AS entropy_nats
FROM cell
GROUP BY cur
ORDER BY cur
"""

QUERIES["q_transition_entropy"] = QuerySpec(
    q_transition_entropy,
    Q_TRANS_ENT_SQL,
    "per-state transition entropy of the event-type chain (keyed "
    "lead + integer counts) — flow-predictability profile",
)


# ------------------------- contribution-bounding audit (DP prep)
# Before adding DP noise to a per-day count, each user's daily
# contribution is clipped to a cap C; this audit reports, for a cap
# grid, how much mass clipping discards and how many users it
# touches — the utility/sensitivity trade table. One keyed count +
# 3-row grid fan-out; integer end-to-end.

_CAP_GRID = [4, 8, 16]


def q_contribution_bounding(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events"))
    per = ev.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("c")
    )
    grid = per.sparkSession.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _CAP_GRID])).alias("cap")
    )
    j = F.broadcast(grid).crossJoin(per)
    return (
        j.groupBy("cap")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_user_days"),
            F.sum("c").cast("long").alias("raw_events"),
            F.sum(F.least(F.col("c"), F.col("cap"))).cast("long").alias(
                "kept_events"
            ),
            F.sum((F.col("c") > F.col("cap")).cast("int")).cast("long").alias(
                "n_clipped_user_days"
            ),
        )
        .withColumn(
            "kept_share",
            F.round(F.col("kept_events") / F.col("raw_events").cast("double"), 6),
        )
        .orderBy("cap")
    )


Q_BOUND_SQL = f"""
WITH per AS (
  SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS c
  FROM events GROUP BY user_id, CAST(ts AS DATE)),
grid AS (SELECT UNNEST({_CAP_GRID!r}) AS cap)
SELECT cap, CAST(COUNT(*) AS BIGINT) AS n_user_days,
       CAST(SUM(c) AS BIGINT) AS raw_events,
       CAST(SUM(LEAST(c, cap)) AS BIGINT) AS kept_events,
       CAST(SUM(CASE WHEN c > cap THEN 1 ELSE 0 END) AS BIGINT)
         AS n_clipped_user_days,
       ROUND(SUM(LEAST(c, cap)) / CAST(SUM(c) AS DOUBLE), 6) AS kept_share
FROM grid, per
GROUP BY cap
ORDER BY cap
"""

QUERIES["q_contribution_bounding"] = QuerySpec(
    q_contribution_bounding,
    Q_BOUND_SQL,
    "contribution-bounding audit over a cap grid (clipped mass, "
    "touched user-days) — the DP sensitivity/utility trade table",
)


# --------------------- inter-arrival CV per event type (Poisson-ness)
# Per type: per-user inter-arrival gaps (keyed lag, integer MICRO-
# seconds — whole seconds truncate differently across engines),
# then mean/CV — a Poisson process has CV = 1; CV >> 1 = bursty
# arrivals. Integer-microsecond moment sums, two doubles per row.


def q_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_type", "event_id", F.unix_micros("ts").alias("us")
    )
    w = Window.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    gaps = (
        ev.withColumn("prev", F.lag("us").over(w))
        .where(F.col("prev").isNotNull())
        .select("event_type", (F.col("us") - F.col("prev")).alias("g"))
    )
    per = gaps.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("s"),
        F.sum(F.col("g").cast("decimal(19,0)") * F.col("g"))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    var = (
        F.col("n").cast("double") * F.col("q").cast("double")
        - F.col("s").cast("double") * F.col("s").cast("double")
    ) / (F.col("n").cast("double") * (F.col("n") - 1))
    return per.select(
        "event_type",
        F.col("n").cast("long").alias("n_gaps"),
        F.round(mean / 3.6e9, 6).alias("mean_gap_hours"),
        F.round(F.sqrt(var) / mean, 6).alias("cv"),
    ).orderBy("event_type")


Q_IACV_SQL = """
WITH ev AS (
  SELECT user_id, event_type, event_id,
         epoch_us(CAST(ts AS TIMESTAMP)) AS us
  FROM events),
gaps AS (
  SELECT event_type,
         us - LAG(us) OVER (PARTITION BY user_id, event_type
                            ORDER BY us, event_id) AS g
  FROM ev),
per AS (
  SELECT event_type, COUNT(*) AS n, SUM(g) AS s,
         CAST(SUM(CAST(g AS HUGEINT) * g) AS DECIMAL(38,0)) AS q
  FROM gaps WHERE g IS NOT NULL GROUP BY event_type)
SELECT event_type, CAST(n AS BIGINT) AS n_gaps,
       ROUND(CAST(s AS DOUBLE) / n / 3.6e9, 6) AS mean_gap_hours,
       ROUND(SQRT((CAST(n AS DOUBLE) * CAST(q AS DOUBLE)
                   - CAST(s AS DOUBLE) * CAST(s AS DOUBLE))
                  / (CAST(n AS DOUBLE) * (n - 1)))
             / (CAST(s AS DOUBLE) / n), 6) AS cv
FROM per
ORDER BY event_type
"""

QUERIES["q_interarrival_cv"] = QuerySpec(
    q_interarrival_cv,
    Q_IACV_SQL,
    "inter-arrival coefficient of variation per event type (keyed "
    "lag, integer-second moments) — Poisson-ness of arrivals",
)
