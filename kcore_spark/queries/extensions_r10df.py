"""Round-10 surface extensions, batch DF (SURVEY §2.3 N r10): the
decision-analysis block — a 10-state x 10-action payoff matrix built
from the empirical daily-demand distribution (states = demand deciles,
actions = stocking at each decile's mean demand, payoff = 2*sold -
1*stocked, pinned), then: EVPI (what perfect demand foresight is
worth: E[max_a payoff] - max_a E[payoff]), minimax regret (Savage's
criterion vs the expected-value action — when do they disagree?), and
first-order stochastic dominance (does the EV-best action's payoff
distribution dominate the minimax-regret action's?). The decision
layer on top of q_newsvendor_quantile / q_eoq / q_safety_stock.

Provenance: declared surface of OUR engine; the reference implements
only ApiVersions (`/root/reference/pkg/kafka/kafka_api.go:106-125`).
Determinism: states come from the exact-NTILE decile fill over the
daily series (bounded); payoffs are exact integer-quantity algebra;
every argmax/argmin is rounded-then-tie-broken.
Scale: one orders⋈lineitem scan folds to the daily series; everything
after is 100-cell algebra.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from kcore_spark.catalog import load_table
from kcore_spark.queries import QuerySpec

QUERIES: dict[str, QuerySpec] = {}

_PRICE = 2.0
_COST = 1.0
_STATES = 10


def _payoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(action a, state s, prob, payoff) over the decile grid."""
    daily = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.to_date("l_shipdate").alias("d"))
        .agg(F.sum(F.round(F.col("l_quantity"), 0).cast("long")).alias("q"))
    )
    w = Window.orderBy(F.col("q"), F.col("d"))
    n = daily.count()
    qd, r = divmod(n, _STATES)
    ranked = daily.withColumn("rk", F.row_number().over(w))
    binned = ranked.withColumn(
        "s",
        (
            F.when(F.col("rk") <= r * (qd + 1), (F.col("rk") - 1) / (qd + 1))
            .otherwise(r + (F.col("rk") - r * (qd + 1) - 1) / qd)
            .cast("long")
            + 1
        ).cast("int"),
    )
    states = binned.groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.floor(
            F.sum(F.col("q").cast("decimal(38,0)")).cast("double")
            / F.count(F.lit(1))
        )
        .cast("long")
        .alias("d_s"),
    )
    tot = states.agg(F.sum("n_days").cast("long").alias("nt"))
    st = states.crossJoin(F.broadcast(tot)).select(
        "s",
        "d_s",
        (F.col("n_days") / F.col("nt").cast("double")).alias("prob"),
    )
    actions = st.select(F.col("s").alias("a"), F.col("d_s").alias("stock"))
    grid = actions.crossJoin(st)
    return grid.select(
        "a",
        "s",
        "prob",
        (
            _PRICE * F.least(F.col("stock"), F.col("d_s")).cast("double")
            - _COST * F.col("stock").cast("double")
        ).alias("pay"),
    )


_PAYOFF_SQL = f"""
  daily AS (
    SELECT CAST(l_shipdate AS DATE) AS d,
           CAST(SUM(CAST(ROUND(l_quantity, 0) AS BIGINT)) AS BIGINT) AS q
    FROM lineitem GROUP BY 1),
  binned AS (
    SELECT q, CAST(NTILE({_STATES}) OVER (ORDER BY q, d) AS INT) AS s
    FROM daily),
  states AS (
    SELECT s, CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(FLOOR(CAST(SUM(CAST(q AS DECIMAL(38,0))) AS DOUBLE)
                      / COUNT(*)) AS BIGINT) AS d_s
    FROM binned GROUP BY s),
  tot AS (SELECT CAST(SUM(n_days) AS BIGINT) AS nt FROM states),
  st AS (
    SELECT s, d_s, n_days / CAST(nt AS DOUBLE) AS prob
    FROM states CROSS JOIN tot),
  actions AS (SELECT s AS a, d_s AS stock FROM st),
  payoff AS (
    SELECT a, st.s AS s, prob,
           {_PRICE} * CAST(LEAST(stock, d_s) AS DOUBLE)
             - {_COST} * CAST(stock AS DOUBLE) AS pay
    FROM actions CROSS JOIN st)
"""


def q_evpi(spark: SparkSession, sf_dir: str) -> DataFrame:
    pay = _payoff(spark, sf_dir)
    ev = pay.groupBy("a").agg(
        F.round(
            F.sum(
                F.round(F.col("prob") * F.col("pay"), 8).cast("decimal(38,8)")
            ).cast("double"),
            6,
        ).alias("ev")
    )
    best_ev = ev.agg(
        F.max(F.struct(F.col("ev"), (-F.col("a")).alias("na")))["ev"].alias(
            "max_ev"
        )
    )
    per_state_best = pay.groupBy("s", "prob").agg(F.max("pay").alias("best_pay"))
    e_perfect = per_state_best.agg(
        F.round(
            F.sum(
                F.round(F.col("prob") * F.col("best_pay"), 8).cast(
                    "decimal(38,8)"
                )
            ).cast("double"),
            6,
        ).alias("ev_perfect")
    )
    return best_ev.crossJoin(F.broadcast(e_perfect)).select(
        F.round("max_ev", 4).alias("best_expected_payoff"),
        F.round("ev_perfect", 4).alias("expected_with_foresight"),
        F.round(F.col("ev_perfect") - F.col("max_ev"), 4).alias("evpi"),
    )


Q_EVPI_SQL = f"""
WITH {_PAYOFF_SQL},
ev AS (
  SELECT a, ROUND(CAST(SUM(CAST(ROUND(prob * pay, 8) AS DECIMAL(38,8)))
                  AS DOUBLE), 6) AS ev
  FROM payoff GROUP BY a),
best_ev AS (SELECT MAX(ev) AS max_ev FROM ev),
psb AS (SELECT s, prob, MAX(pay) AS best_pay FROM payoff GROUP BY 1, 2),
e_perfect AS (
  SELECT ROUND(CAST(SUM(CAST(ROUND(prob * best_pay, 8) AS DECIMAL(38,8)))
               AS DOUBLE), 6) AS ev_perfect
  FROM psb)
SELECT ROUND(max_ev, 4) AS best_expected_payoff,
       ROUND(ev_perfect, 4) AS expected_with_foresight,
       ROUND(ev_perfect - max_ev, 4) AS evpi
FROM best_ev CROSS JOIN e_perfect
"""

QUERIES["q_evpi"] = QuerySpec(
    q_evpi,
    Q_EVPI_SQL,
    "expected value of perfect information over the demand-decile "
    "payoff matrix — 100-cell folds",
)


def q_minimax_regret(spark: SparkSession, sf_dir: str) -> DataFrame:
    pay = _payoff(spark, sf_dir)
    col_best = pay.groupBy("s").agg(F.max("pay").alias("col_max"))
    reg = pay.join(col_best, "s").select(
        "a", (F.col("col_max") - F.col("pay")).alias("regret"), "prob", "pay"
    )
    per_a = reg.groupBy("a").agg(
        F.round(F.max("regret"), 6).alias("max_regret"),
        F.round(
            F.sum(
                F.round(F.col("prob") * F.col("pay"), 8).cast("decimal(38,8)")
            ).cast("double"),
            6,
        ).alias("ev"),
    )
    mm = per_a.agg(
        F.min(F.struct(F.col("max_regret"), F.col("a")))["a"].alias("a_minimax")
    )
    ev_best = per_a.agg(
        F.max(F.struct(F.col("ev"), (-F.col("a")).alias("na")))["na"].alias("neg")
    ).select((-F.col("neg")).cast("int").alias("a_ev"))
    return (
        per_a.crossJoin(F.broadcast(mm))
        .crossJoin(F.broadcast(ev_best))
        .select(
            "a",
            "ev",
            "max_regret",
            (F.col("a") == F.col("a_minimax")).alias("is_minimax_choice"),
            (F.col("a") == F.col("a_ev")).alias("is_ev_choice"),
        )
        .orderBy("a")
    )


Q_MMREGRET_SQL = f"""
WITH {_PAYOFF_SQL},
col_best AS (SELECT s, MAX(pay) AS col_max FROM payoff GROUP BY s),
reg AS (
  SELECT a, col_max - pay AS regret, prob, pay
  FROM payoff JOIN col_best ON payoff.s = col_best.s),
per_a AS (
  SELECT a, ROUND(MAX(regret), 6) AS max_regret,
         ROUND(CAST(SUM(CAST(ROUND(prob * pay, 8) AS DECIMAL(38,8)))
               AS DOUBLE), 6) AS ev
  FROM reg GROUP BY a),
mm AS (
  SELECT a AS a_minimax FROM per_a
  ORDER BY max_regret ASC, a ASC LIMIT 1),
evb AS (
  SELECT a AS a_ev FROM per_a ORDER BY ev DESC, a ASC LIMIT 1)
SELECT a, ev, max_regret,
       a = a_minimax AS is_minimax_choice,
       a = a_ev AS is_ev_choice
FROM per_a CROSS JOIN mm CROSS JOIN evb
ORDER BY a
"""

QUERIES["q_minimax_regret"] = QuerySpec(
    q_minimax_regret,
    Q_MMREGRET_SQL,
    "Savage minimax-regret vs expected-value action over the payoff "
    "matrix — per-action regret table with both choices flagged",
)


def q_stochastic_dominance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FOSD check between the EV-best and minimax-regret actions:
    compare their payoff CDFs over the state grid at every realized
    payoff threshold."""
    pay = _payoff(spark, sf_dir)
    per_a = pay.groupBy("a").agg(
        F.round(
            F.sum(
                F.round(F.col("prob") * F.col("pay"), 8).cast("decimal(38,8)")
            ).cast("double"),
            6,
        ).alias("ev")
    )
    col_best = pay.groupBy("s").agg(F.max("pay").alias("col_max"))
    regret = (
        pay.join(col_best, "s")
        .groupBy("a")
        .agg(F.round(F.max(F.col("col_max") - F.col("pay")), 6).alias("mr"))
    )
    a_ev = per_a.agg(
        F.max(F.struct(F.col("ev"), (-F.col("a")).alias("na")))["na"].alias("neg")
    ).select((-F.col("neg")).cast("int").alias("a_ev"))
    a_mm = regret.agg(
        F.min(F.struct(F.col("mr"), F.col("a")))["a"].alias("a_mm")
    )
    picks = a_ev.crossJoin(F.broadcast(a_mm))
    two = pay.crossJoin(F.broadcast(picks)).where(
        (F.col("a") == F.col("a_ev")) | (F.col("a") == F.col("a_mm"))
    )
    thresholds = two.select(F.round("pay", 6).alias("thr")).distinct()
    cdf = (
        two.crossJoin(F.broadcast(thresholds))
        .groupBy("thr", "a", "a_ev", "a_mm")
        .agg(
            F.round(
                F.sum(
                    F.when(
                        F.round(F.col("pay"), 6) <= F.col("thr"),
                        F.round(F.col("prob"), 8).cast("decimal(38,8)"),
                    ).otherwise(F.lit(0).cast("decimal(38,8)"))
                ).cast("double"),
                8,
            ).alias("cdf")
        )
    )
    ev_side = cdf.where(F.col("a") == F.col("a_ev")).select(
        "thr", F.col("cdf").alias("cdf_ev")
    )
    mm_side = cdf.where(F.col("a") == F.col("a_mm")).select(
        F.col("thr").alias("thr2"), F.col("cdf").alias("cdf_mm")
    )
    j = ev_side.join(mm_side, ev_side.thr == mm_side.thr2)
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_thresholds"),
        F.sum((F.col("cdf_ev") <= F.col("cdf_mm") + 1e-12).cast("long")).alias(
            "n_ev_dominates"
        ),
        (
            F.sum((F.col("cdf_ev") > F.col("cdf_mm") + 1e-12).cast("long")) == 0
        ).alias("ev_action_fosd_dominates"),
    )


Q_FOSD_SQL = f"""
WITH {_PAYOFF_SQL},
per_a AS (
  SELECT a, ROUND(CAST(SUM(CAST(ROUND(prob * pay, 8) AS DECIMAL(38,8)))
                  AS DOUBLE), 6) AS ev
  FROM payoff GROUP BY a),
col_best AS (SELECT s, MAX(pay) AS col_max FROM payoff GROUP BY s),
regret AS (
  SELECT a, ROUND(MAX(col_max - pay), 6) AS mr
  FROM payoff JOIN col_best ON payoff.s = col_best.s GROUP BY a),
a_ev AS (SELECT a AS a_ev FROM per_a ORDER BY ev DESC, a ASC LIMIT 1),
a_mm AS (SELECT a AS a_mm FROM regret ORDER BY mr ASC, a ASC LIMIT 1),
two AS (
  SELECT payoff.*, a_ev, a_mm
  FROM payoff CROSS JOIN a_ev CROSS JOIN a_mm
  WHERE a = a_ev OR a = a_mm),
thresholds AS (SELECT DISTINCT ROUND(pay, 6) AS thr FROM two),
cdf AS (
  SELECT thr, a, a_ev, a_mm,
         ROUND(CAST(SUM(CASE WHEN ROUND(pay, 6) <= thr
                        THEN CAST(ROUND(prob, 8) AS DECIMAL(38,8))
                        ELSE CAST(0 AS DECIMAL(38,8)) END) AS DOUBLE), 8)
             AS cdf
  FROM two CROSS JOIN thresholds
  GROUP BY 1, 2, 3, 4)
SELECT CAST(COUNT(*) AS BIGINT) AS n_thresholds,
       CAST(SUM(CASE WHEN e.cdf <= m.cdf + 1e-12 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_ev_dominates,
       SUM(CASE WHEN e.cdf > m.cdf + 1e-12 THEN 1 ELSE 0 END) = 0
           AS ev_action_fosd_dominates
FROM (SELECT thr, cdf FROM cdf WHERE a = a_ev) e
JOIN (SELECT thr, cdf FROM cdf WHERE a = a_mm) m ON e.thr = m.thr
"""

QUERIES["q_stochastic_dominance"] = QuerySpec(
    q_stochastic_dominance,
    Q_FOSD_SQL,
    "first-order stochastic dominance between the EV-best and minimax-"
    "regret actions — CDF compare on the bounded threshold grid",
)
