"""Round-10 surface extensions, batch BY (SURVEY §2.3 N r10): the
marketing-science block, third wave — Markov-chain attribution
(removal effects: how much does conversion probability drop if a
channel disappears from the journey graph?), time-decay multi-touch
attribution (exponentially-decayed credit, the recency-weighted
sibling of q_multi_touch_attribution's linear split and
q_shapley_attribution's coalition split), and adstock elasticity
(geometric carry-over of media pressure, then a log-log regression of
conversions on the adstocked series — the media-mix-model primitive).

Journeys: per-user event streams split at each purchase; purchases
absorb into CONV, trailing touches into NULL. Channels are the four
non-purchase event types.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: transition counts are exact integers; P^64 is computed by
six unrolled matrix squarings over the (removal-tag, i, j) table — the
q_stationary_distribution shape — with results rounded to 6dp;
time-decay credits are per-purchase normalized then decimal-summed;
the adstock kernel is 8 explicit lag terms with literal theta powers.
Scale: journey windows are PARTITIONED by user; matrices are
(channels+3)^2-sized at any data scale; the adstock series is
calendar-bounded. The matmul joins are tiny-table hash joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table, normalize_event_ts
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_CHANNELS = ("click", "error", "signup", "view")
_THETA = 0.5  # adstock carry-over
_ADSTOCK_LAGS = 7
_HALF_LIFE_S = 600.0  # 10-minute time-decay half-life
_TOUCH_WINDOW_S = 1800  # purchases credit touches in the prior 30 min


def _transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Journey transition counts (i, j, n) with START/CONV/NULL states."""
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id",
        "event_id",
        F.unix_timestamp("ts").alias("t"),
        F.when(F.col("event_type") == "purchase", F.lit("CONV"))
        .otherwise(F.col("event_type"))
        .alias("state"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    wj = Window.partitionBy("user_id").orderBy("t", "event_id").rowsBetween(
        Window.unboundedPreceding, -1
    )
    seq = ev.withColumn(
        "jid",
        F.coalesce(F.sum((F.col("state") == "CONV").cast("long")).over(wj), F.lit(0)),
    )
    wg = Window.partitionBy("user_id", "jid").orderBy("t", "event_id")
    step = seq.withColumn("nxt", F.lead("state").over(wg)).withColumn(
        "pos", F.row_number().over(wg)
    )
    inner = step.where(F.col("nxt").isNotNull()).select(
        F.col("state").alias("i"), F.col("nxt").alias("j")
    )
    starts = step.where(F.col("pos") == 1).select(
        F.lit("START").alias("i"), F.col("state").alias("j")
    )
    tails = step.where(
        F.col("nxt").isNull() & (F.col("state") != "CONV")
    ).select(F.col("state").alias("i"), F.lit("NULL").alias("j"))
    return (
        inner.unionByName(starts)
        .unionByName(tails)
        .groupBy("i", "j")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )


_TRANS_SQL = """
  ev AS (
    SELECT user_id, event_id,
           epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS t,
           CASE WHEN event_type = 'purchase' THEN 'CONV'
                ELSE event_type END AS state
    FROM events),
  seq AS (
    SELECT user_id, event_id, t, state,
           COALESCE(SUM(CASE WHEN state = 'CONV' THEN 1 ELSE 0 END)
                    OVER (PARTITION BY user_id ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    0) AS jid
    FROM ev),
  step AS (
    SELECT state,
           LEAD(state) OVER (PARTITION BY user_id, jid
                             ORDER BY t, event_id) AS nxt,
           ROW_NUMBER() OVER (PARTITION BY user_id, jid
                              ORDER BY t, event_id) AS pos
    FROM seq),
  trans AS (
    SELECT i, j, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT state AS i, nxt AS j FROM step WHERE nxt IS NOT NULL
      UNION ALL
      SELECT 'START' AS i, state AS j FROM step WHERE pos = 1
      UNION ALL
      SELECT state AS i, 'NULL' AS j FROM step
      WHERE nxt IS NULL AND state <> 'CONV')
    GROUP BY i, j)
"""


def _mat_sq(m: DataFrame) -> DataFrame:
    a = m.select(F.col("rm"), F.col("i"), F.col("j").alias("k"), F.col("p"))
    b = m.select(
        F.col("rm").alias("rm2"), F.col("i").alias("k2"), F.col("j"),
        F.col("p").alias("p2"),
    )
    return (
        a.join(F.broadcast(b), (a.rm == b.rm2) & (a.k == b.k2))
        .groupBy("rm", "i", "j")
        .agg(F.sum(F.col("p") * F.col("p2")).alias("p"))
    )


def q_markov_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    trans = _transitions(spark, sf_dir)
    rm = spark.createDataFrame(
        [("NONE",)] + [(c,) for c in _CHANNELS], ["rm"]
    )
    # removal variant: drop rows FROM the removed channel, redirect
    # transitions INTO it to NULL (mass preserved, no renormalization)
    variant = (
        trans.crossJoin(F.broadcast(rm))
        .where(F.col("i") != F.col("rm"))
        .select(
            "rm",
            "i",
            F.when(F.col("j") == F.col("rm"), F.lit("NULL"))
            .otherwise(F.col("j"))
            .alias("j"),
            "n",
        )
        .groupBy("rm", "i", "j")
        .agg(F.sum("n").alias("n"))
    )
    rows = variant.groupBy("rm", "i").agg(F.sum("n").alias("row_n"))
    p_var = variant.join(rows, ["rm", "i"]).select(
        "rm", "i", "j", (F.col("n") / F.col("row_n")).alias("p")
    )
    # literal 10-row frame (a crossJoin of two parallelized frames is a
    # 32x32-partition CartesianRDD — 1024 no-op tasks of pure overhead)
    absorb = spark.createDataFrame(
        [
            (tag, s, s, 1.0)
            for tag in ("NONE",) + _CHANNELS
            for s in ("CONV", "NULL")
        ],
        ["rm", "i", "j", "p"],
    )
    # (channels+3)^2-sized matrices: single-partition checkpoints (via a
    # 1-way shuffle, preserving upstream parallelism) keep every
    # squaring a 1-task broadcast join instead of a 32-way shuffle
    p1 = p_var.unionByName(absorb).repartition(1).localCheckpoint()
    p2 = _mat_sq(p1).repartition(1).localCheckpoint()
    p4 = _mat_sq(p2).repartition(1).localCheckpoint()
    p8 = _mat_sq(p4).repartition(1).localCheckpoint()
    p16 = _mat_sq(p8).repartition(1).localCheckpoint()
    p32 = _mat_sq(p16).repartition(1).localCheckpoint()
    p64 = _mat_sq(p32)
    cvr = p64.where((F.col("i") == "START") & (F.col("j") == "CONV")).select(
        "rm", F.col("p").alias("p_conv")
    )
    base = cvr.where(F.col("rm") == "NONE").select(
        F.col("p_conv").alias("p_base")
    )
    eff = (
        cvr.where(F.col("rm") != "NONE")
        .crossJoin(F.broadcast(base))
        .select(
            F.col("rm").alias("channel"),
            F.round(1.0 - F.col("p_conv") / F.col("p_base"), 6).alias(
                "removal_effect"
            ),
        )
    )
    tot = eff.agg(F.sum(F.round("removal_effect", 6)).alias("s_eff"))
    return (
        eff.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            "removal_effect",
            F.round(F.col("removal_effect") / F.col("s_eff"), 6).alias("share"),
        )
        .orderBy("channel")
    )


_SQ = (
    "SELECT a.rm, a.i, b.j, SUM(a.p * b.p) AS p FROM {src} a "
    "JOIN {src} b ON a.rm = b.rm AND a.j = b.i GROUP BY a.rm, a.i, b.j"
)
Q_MARKOV_SQL = f"""
WITH {_TRANS_SQL},
rm AS (SELECT UNNEST(['NONE', 'click', 'error', 'signup', 'view']) AS rm),
variant AS (
  SELECT rm, i, CASE WHEN j = rm THEN 'NULL' ELSE j END AS j, SUM(n) AS n
  FROM trans CROSS JOIN rm WHERE i <> rm
  GROUP BY 1, 2, 3),
p_var AS (
  SELECT rm, i, j, n * 1.0 / SUM(n) OVER (PARTITION BY rm, i) AS p
  FROM variant),
absorb AS (
  SELECT rm, s AS i, s AS j, 1.0 AS p
  FROM rm CROSS JOIN (SELECT UNNEST(['CONV', 'NULL']) AS s)),
p1 AS (SELECT * FROM p_var UNION ALL SELECT * FROM absorb),
p2 AS ({_SQ.format(src="p1")}),
p4 AS ({_SQ.format(src="p2")}),
p8 AS ({_SQ.format(src="p4")}),
p16 AS ({_SQ.format(src="p8")}),
p32 AS ({_SQ.format(src="p16")}),
p64 AS ({_SQ.format(src="p32")}),
cvr AS (SELECT rm, p AS p_conv FROM p64 WHERE i = 'START' AND j = 'CONV'),
base AS (SELECT p_conv AS p_base FROM cvr WHERE rm = 'NONE'),
eff AS (
  SELECT rm AS channel,
         ROUND(1.0 - p_conv / p_base, 6) AS removal_effect
  FROM cvr CROSS JOIN base WHERE rm <> 'NONE'),
tot AS (SELECT SUM(ROUND(removal_effect, 6)) AS s_eff FROM eff)
SELECT channel, removal_effect,
       ROUND(removal_effect / s_eff, 6) AS share
FROM eff CROSS JOIN tot
ORDER BY channel
"""

QUERIES["q_markov_attribution"] = QuerySpec(
    q_markov_attribution,
    Q_MARKOV_SQL,
    "Markov removal-effect attribution: P(START->CONV) under channel "
    "knock-out via six matrix squarings over the tagged chain",
)


# --------------------------------------------- time-decay attribution
# Purchases split one unit of credit over prior-30-min touches with
# weight exp(-ln2 * age / half_life), normalized per purchase.


def q_time_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        "user_id", "event_id", F.unix_timestamp("ts").alias("t"), "event_type"
    )
    conv = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("event_id").alias("pid"),
        F.col("t").alias("pt"),
    )
    touch = ev.where(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_id").alias("tid"), F.col("t").alias("tt"),
        F.col("event_type").alias("channel"),
    )
    pairs = conv.join(
        touch,
        (F.col("pu") == F.col("user_id"))
        & (F.col("tt") < F.col("pt"))
        & (F.col("tt") >= F.col("pt") - _TOUCH_WINDOW_S),
    ).select(
        "pid",
        "channel",
        F.exp(-0.6931471805599453 * (F.col("pt") - F.col("tt")) / _HALF_LIFE_S)
        .alias("w"),
    )
    norm = pairs.groupBy("pid").agg(
        F.sum(F.round("w", 12).cast("decimal(38,12)")).cast("double").alias("s_w")
    )
    credit = pairs.join(norm, "pid").select(
        "channel",
        F.round(F.col("w") / F.col("s_w"), 12).cast("decimal(38,12)").alias("c"),
    )
    return (
        credit.groupBy("channel")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_touches"),
            F.round(F.sum("c").cast("double"), 6).alias("credit"),
        )
        .orderBy("channel")
    )


Q_TDECAY_SQL = f"""
WITH ev AS (
  SELECT user_id, event_id,
         epoch(date_trunc('second', CAST(ts AS TIMESTAMP))) AS t, event_type
  FROM events),
conv AS (
  SELECT user_id AS pu, event_id AS pid, t AS pt
  FROM ev WHERE event_type = 'purchase'),
touch AS (
  SELECT user_id, event_id AS tid, t AS tt, event_type AS channel
  FROM ev WHERE event_type <> 'purchase'),
pairs AS (
  SELECT pid, channel,
         EXP(-0.6931471805599453 * (pt - tt) / {_HALF_LIFE_S}) AS w
  FROM conv JOIN touch
    ON pu = user_id AND tt < pt AND tt >= pt - {_TOUCH_WINDOW_S}),
norm AS (
  SELECT pid,
         CAST(SUM(CAST(ROUND(w, 12) AS DECIMAL(38,12))) AS DOUBLE) AS s_w
  FROM pairs GROUP BY pid),
credit AS (
  SELECT channel,
         CAST(ROUND(w / s_w, 12) AS DECIMAL(38,12)) AS c
  FROM pairs JOIN norm ON pairs.pid = norm.pid)
SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
       ROUND(CAST(SUM(c) AS DOUBLE), 6) AS credit
FROM credit GROUP BY channel ORDER BY channel
"""

QUERIES["q_time_decay_attribution"] = QuerySpec(
    q_time_decay_attribution,
    Q_TDECAY_SQL,
    "time-decay multi-touch attribution (10-min half-life, 30-min "
    "lookback) — per-user interval join, per-purchase normalized credit",
)


# ------------------------------------------------- adstock elasticity
# adstock_t = sum_{l=0..7} theta^l views_{t-l} (8 explicit lag terms);
# elasticity = OLS slope of ln(1+purchases) on ln(1+adstock).


def q_adstock_elasticity(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = normalize_event_ts(load_table(spark, sf_dir, "events")).select(
        F.to_date("ts").alias("d"), "event_type"
    )
    daily = ev.groupBy("d").agg(
        F.sum((F.col("event_type") == "view").cast("long")).alias("views"),
        F.sum((F.col("event_type") == "purchase").cast("long")).alias("buys"),
    )
    w = Window.orderBy("d")
    ad = F.lit(0.0)
    for lag in range(_ADSTOCK_LAGS + 1):
        ad = ad + F.lit(_THETA**lag) * F.coalesce(
            F.lag("views", lag).over(w).cast("double"), F.lit(0.0)
        )
    series = daily.select(
        F.unix_timestamp(F.col("d").cast("timestamp")).alias("day_epoch"),
        F.log(1.0 + ad).alias("x"),
        F.log(1.0 + F.col("buys").cast("double")).alias("y"),
    )
    mom = series.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.round("x", 10).cast("decimal(38,10)")).cast("double").alias("sx"),
        F.sum(F.round("y", 10).cast("decimal(38,10)")).cast("double").alias("sy"),
        F.sum(F.round(F.col("x") * F.col("x"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxx"),
        F.sum(F.round(F.col("y") * F.col("y"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("syy"),
        F.sum(F.round(F.col("x") * F.col("y"), 10).cast("decimal(38,10)"))
        .cast("double")
        .alias("sxy"),
    )
    nd = F.col("n").cast("double")
    sxy_c = F.col("sxy") - F.col("sx") * F.col("sy") / nd
    sxx_c = F.col("sxx") - F.col("sx") * F.col("sx") / nd
    syy_c = F.col("syy") - F.col("sy") * F.col("sy") / nd
    return mom.select(
        "n",
        F.lit(_THETA).alias("theta"),
        F.round(sxy_c / sxx_c, 6).alias("elasticity"),
        F.round(sxy_c * sxy_c / (sxx_c * syy_c), 6).alias("r2"),
    )


Q_ADSTOCK_SQL = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d,
         SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS views,
         SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS buys
  FROM events GROUP BY 1),
series AS (
  SELECT LN(1.0 + ({" + ".join(
      f"{_THETA**lag} * COALESCE(CAST(LAG(views, {lag}) OVER (ORDER BY d) AS DOUBLE), 0.0)"
      for lag in range(_ADSTOCK_LAGS + 1)
  )})) AS x,
         LN(1.0 + CAST(buys AS DOUBLE)) AS y
  FROM daily),
mom AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(ROUND(x, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(ROUND(y, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sy,
         CAST(SUM(CAST(ROUND(x * x, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sxx,
         CAST(SUM(CAST(ROUND(y * y, 10) AS DECIMAL(38,10))) AS DOUBLE) AS syy,
         CAST(SUM(CAST(ROUND(x * y, 10) AS DECIMAL(38,10))) AS DOUBLE) AS sxy
  FROM series)
SELECT n, {_THETA} AS theta,
       ROUND((sxy - sx * sy / n) / (sxx - sx * sx / n), 6) AS elasticity,
       ROUND((sxy - sx * sy / n) * (sxy - sx * sy / n)
             / ((sxx - sx * sx / n) * (syy - sy * sy / n)), 6) AS r2
FROM mom
"""

QUERIES["q_adstock_elasticity"] = QuerySpec(
    q_adstock_elasticity,
    Q_ADSTOCK_SQL,
    "geometric adstock (theta=0.5, 8 lags) + log-log OLS elasticity of "
    "purchases on adstocked views — calendar-bounded series",
)
