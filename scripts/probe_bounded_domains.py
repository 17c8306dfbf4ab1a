"""Bounded-domain adjudication probes (r11 VERDICT #7).

SCALE.md's re-check table says each ALLOWED_GLOBAL_WINDOW /
ALLOWED_NLJ entry is a claim about a DOMAIN, with a named signal for
when the bound breaks. This script measures the three classes most
likely to break at 100 TB and prints the curves SCALING.md records:

1. TIE TABLES — for every class-(a) global-window query, the
   cardinality of the windowed distinct-value table at sf0.01 vs
   sf0.1 (DuckDB, exact). Ratio ~1 = domain-bounded (precision /
   vocabulary); ratio ~10 = row-count-sized, i.e. the adjudication is
   FALSE and the query must move to _dist_cumsum. Also times the old
   single-partition-window mid-rank vs the _dist_cumsum rewrite on
   the worst offender (l_extendedprice).

2. CALENDAR-BOUNDED SERIES at decade horizons — the ACF plan shape
   (global window + 24 leads + per-lag sums) over synthetic hourly
   series of 10^3..10^6 rows. The adjudication holds while the series
   is CALENDAR-sized (a decade of hours = 87,648 rows); the probe
   measures where the single-partition window actually starts to
   cost, and the curve shows the slack between "fixture span" and
   "decade span".

3. VALUE-BOUNDED GRIDS — the KDE aggregate-expression form (k kernel
   sums as parallel aggregates over one scan) at k = 21 / 201 / 1001.
   Confirms cost is ~linear in k with NO row fan-out, and measures
   the k at which expression-count overhead (codegen/planning) makes
   the explode+broadcast-grid-join form the right plan instead.

Usage: python3 scripts/probe_bounded_domains.py [sf_dir]
Prints one JSON document; paste the measured rows into SCALING.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_SMALL = "/root/testdata/sf0.01"
SF_BIG = "/root/testdata/sf0.1"


# ------------------------------------------------------------- probe 1

TIE_DOMAINS = {
    # query -> (description, duckdb COUNT(DISTINCT ...) over the windowed table)
    "q_spearman_corr[y]": (
        "l_extendedprice",
        "SELECT COUNT(DISTINCT l_extendedprice) FROM '{d}/lineitem.parquet'",
    ),
    "q_spearman_corr[x]": (
        "l_quantity",
        "SELECT COUNT(DISTINCT l_quantity) FROM '{d}/lineitem.parquet'",
    ),
    "q_kruskal_wallis": (
        "o_totalprice",
        "SELECT COUNT(DISTINCT o_totalprice) FROM '{d}/orders.parquet'",
    ),
    "q_mann_whitney/q_ks_test": (
        "round(value*1e4) ticks",
        "SELECT COUNT(DISTINCT ROUND(value*10000,0)) FROM '{d}/events.parquet' "
        "WHERE event_type IN ('click','purchase')",
    ),
    "q_wasserstein_1d": (
        "round(value,6)",
        "SELECT COUNT(DISTINCT ROUND(value,6)) FROM '{d}/events.parquet' "
        "WHERE event_type IN ('click','purchase')",
    ),
    "q_wilcoxon_signed_rank": (
        "users with purchase+view (|diff| rows)",
        "SELECT COUNT(*) FROM (SELECT user_id FROM '{d}/events.parquet' "
        "GROUP BY user_id HAVING SUM(CASE WHEN event_type='purchase' THEN 1 ELSE 0 END)>0 "
        "AND SUM(CASE WHEN event_type='view' THEN 1 ELSE 0 END)>0)",
    ),
    "q_sample_quantile_error/q_mood_median_test": (
        "distinct price cents",
        "SELECT COUNT(DISTINCT CAST(ROUND(o_totalprice*100,0) AS BIGINT)) "
        "FROM '{d}/orders.parquet'",
    ),
    "q_conover_squared_ranks": (
        "distinct |cents − group mean| deviations",
        "SELECT COUNT(DISTINCT CAST(ROUND(ABS(cents - mu),0) AS BIGINT)) FROM ("
        "SELECT ROUND(o_totalprice*100,0) AS cents, "
        "AVG(ROUND(o_totalprice*100,0)) OVER (PARTITION BY o_orderpriority) AS mu "
        "FROM '{d}/orders.parquet')",
    ),
    "q_time_to_convert": (
        "distinct first-purchase deltas (seconds)",
        "SELECT COUNT(DISTINCT delta_s) FROM ("
        "SELECT e.user_id, MIN(epoch(e.ts) - v.view_sec) AS delta_s "
        "FROM '{d}/events.parquet' e JOIN (SELECT user_id, MIN(epoch(ts)) AS view_sec "
        "FROM '{d}/events.parquet' WHERE event_type='view' GROUP BY user_id) v "
        "USING (user_id) WHERE e.event_type='purchase' AND epoch(e.ts) >= v.view_sec "
        "GROUP BY e.user_id)",
    ),
    "q_pr_auc": (
        "distinct scores (all-distinct by construction = rows)",
        "SELECT COUNT(*) FROM '{d}/embeddings.parquet'",
    ),
    "q_kv_cache_budget": (
        "distinct document token counts",
        "SELECT COUNT(DISTINCT len(list_filter(string_split(lower(text),' '), "
        "x -> x != ''))) FROM '{d}/documents.parquet'",
    ),
    "q_kaplan_meier family": (
        "distinct customer lifetime days",
        "SELECT COUNT(DISTINCT dur) FROM (SELECT datediff('day', "
        "MIN(CAST(o_orderdate AS DATE)), MAX(CAST(o_orderdate AS DATE))) AS dur "
        "FROM '{d}/orders.parquet' GROUP BY o_custkey)",
    ),
}


def probe_tie_tables(spark, sf_dir):
    import duckdb

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out = {"domains": {}}
    for name, (desc, q) in TIE_DOMAINS.items():
        a = duckdb.sql(q.format(d=SF_SMALL)).fetchone()[0]
        b = duckdb.sql(q.format(d=SF_BIG)).fetchone()[0]
        ratio = round(b / max(a, 1), 1)
        out["domains"][name] = {
            "domain": desc,
            "sf0.01": a,
            "sf0.1": b,
            "ratio_per_10x": ratio,
            "verdict": "row-count-sized (rewrite on _dist_cumsum)"
            if ratio > 6
            else "domain-bounded (adjudication holds)",
        }

    # wall-time: old single-partition-window mid-rank vs the
    # _dist_cumsum rewrite, on the worst offender
    from kcore_spark.queries.extensions_r8 import _dist_cumsum

    li = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).select(
        F.col("l_extendedprice").alias("v")
    )
    by_val = li.groupBy("v").agg(F.count(F.lit(1)).alias("cnt"))

    t0 = time.monotonic()
    wlow = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    old = by_val.select(
        "v",
        (2 * F.coalesce(F.sum("cnt").over(wlow), F.lit(0)) + F.col("cnt") + 1).alias(
            "two_rank"
        ),
    )
    old_sum = old.agg(F.sum("two_rank")).collect()[0][0]
    t_old = time.monotonic() - t0

    t0 = time.monotonic()
    new = _dist_cumsum(by_val, [F.col("v")], "cnt", out_col="cum").select(
        "v", (2 * F.col("cum") - F.col("cnt") + 1).alias("two_rank")
    )
    new_sum = new.agg(F.sum("two_rank")).collect()[0][0]
    t_new = time.monotonic() - t0

    assert old_sum == new_sum, (old_sum, new_sum)
    out["midrank_rewrite"] = {
        "tie_rows": by_val.count(),
        "single_partition_window_s": round(t_old, 2),
        "dist_cumsum_s": round(t_new, 2),
        "identical_result": True,
    }
    return out


# ------------------------------------------------------------- probe 2


def probe_calendar_horizon(spark):
    """ACF plan shape (24 leads over a global hour window + per-lag
    sums) at series lengths from fixture-span to a century of hours."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    out = {}
    for label, n_hours in [
        ("fixture (~83 days)", 2_000),
        ("2.3 years", 20_000),
        ("decade", 87_648),
        ("century", 876_480),
    ]:
        hourly = spark.range(n_hours).select(
            F.col("id").alias("h"), (F.pmod(F.col("id") * 2654435761, F.lit(1000))).alias("x")
        )
        t0 = time.monotonic()
        w = Window.orderBy("h")
        s = hourly.select(
            "x", *[F.lead("x", k).over(w).alias(f"x{k}") for k in range(1, 25)]
        )
        agg = s.agg(
            F.count(F.lit(1)),
            *[F.sum(F.col("x") * F.col(f"x{k}")) for k in range(1, 25)],
        )
        agg.collect()
        out[label] = {"series_rows": n_hours, "wall_s": round(time.monotonic() - t0, 2)}
    return out


# ------------------------------------------------------------- probe 3


def probe_grid_k(spark, sf_dir):
    """KDE kernel sums as k parallel aggregate expressions (the
    q_kde_grid form): wall vs k, including planning/codegen."""
    from pyspark.sql import functions as F

    src = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        (F.col("o_totalprice") / 1000.0).alias("x")
    )
    stats = src.agg(
        F.min("x").alias("lo"), F.max("x").alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    lo, hi = float(stats["lo"]), float(stats["hi"])
    h = (hi - lo) / 50.0
    out = {}
    for k in (21, 201, 1001):
        t0 = time.monotonic()

        def ks(i):
            g = lo + i * (hi - lo) / (k - 1)
            u = (F.col("x") - g) / h
            return F.sum(F.exp(-u * u / 2.0)).alias(f"k{i}")

        src.agg(*[ks(i) for i in range(k)]).collect()
        out[f"k={k}"] = {"wall_s": round(time.monotonic() - t0, 2)}
    return out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else SF_BIG
    from kcore_spark.testing import shared_spark

    spark = shared_spark()
    result = {
        "sf_dir": sf_dir,
        "probe1_tie_tables": probe_tie_tables(spark, sf_dir),
        "probe2_calendar_horizon": probe_calendar_horizon(spark),
        "probe3_grid_k": probe_grid_k(spark, sf_dir),
    }
    print(json.dumps(result, indent=2))


if __name__ == "__main__":
    main()
