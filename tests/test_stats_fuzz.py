"""Cross-engine property fuzz for the r8 statistics block (VERDICT r8
"Next round" #6): the riskiest integer-exactness claims — Mann-Whitney
tie correction, KS integer ECDF, BH-FDR boundary, the weighted-median
cumulative walk, Kaplan-Meier censoring, Welch moments — are re-derived
on SEED-GENERATED data in BOTH engines, not just the one fixture the
driver pins. Each seed builds a synthetic sf_dir (fixture schemas
preserved via pyarrow; untouched tables symlinked from sf0.001) with
edge cases deliberately injected: massive ties on a tiny value grid,
negative values, exact 2*cumw == W boundary hits, dur=0 lifetimes,
all-censored tails. compare() then runs the REGISTERED query and its
REGISTERED oracle SQL verbatim — the same value-hash gate as the
driver, 12-decimal float canonicalization included."""

from __future__ import annotations

import os
import random
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from kcore_spark.queries import all_queries
from kcore_spark.testing import TABLES, compare, duckdb_connection

from .conftest import SF_DIR

SEEDS = [9001, 9002, 9003]

EVENT_QUERIES = ["q_mann_whitney", "q_ks_test", "q_wilcoxon_signed_rank"]
ORDER_QUERIES = [
    "q_welch_ttest",
    "q_kaplan_meier",
    # r9 additions riding the same integer tie machinery / life table
    "q_kruskal_wallis",
    "q_levene_test",
    "q_logrank_test",
    "q_jackknife_variance",
]
LINEITEM_QUERIES = ["q_weighted_median", "q_spearman_corr", "q_kendall_tau"]
NATION_QUERIES = ["q_bh_fdr"]
# lang-derived classifier family: the documents mutator scrambles the
# label distribution (down to 1-doc classes), exercising the lang-ring
# derivation, absent-in-train classes, and allowlist boundaries
DOC_QUERIES = ["q_classification_report", "q_naive_bayes", "q_curation_funnel"]


def _rewrite(src_dir: str, out_dir: str, table: str, mutate) -> None:
    t = pq.read_table(os.path.join(src_dir, f"{table}.parquet"))
    df = t.to_pandas()
    mutate(df)
    pq.write_table(
        pa.Table.from_pandas(df, schema=t.schema, preserve_index=False),
        os.path.join(out_dir, f"{table}.parquet"),
    )


def _synth_dir(seed: int) -> str:
    rng = random.Random(seed)
    d = tempfile.mkdtemp(prefix=f"kcore_fuzz_{seed}_")

    def mut_events(df):
        n = len(df)
        # tiny value grid -> massive rank/ECDF ties; negatives included
        grid = [-0.0003, 0.0, 0.0001, 0.0001, 0.0007, 1.25]
        df["value"] = [rng.choice(grid) for _ in range(n)]
        types = ["click"] * 3 + ["purchase"] * 2 + ["view"]
        et = [rng.choice(types) for _ in range(n)]
        # keep both test groups populated (degenerate n<2 is out of
        # scope for the statistic itself)
        et[0], et[1], et[2], et[3] = "click", "click", "purchase", "purchase"
        df["event_type"] = et

    def mut_orders(df):
        n = len(df)
        # two groups with >=2 distinct prices each (variance > 0), on
        # a cents-exact grid; priorities heavily skewed
        prices = [100.00, 100.01, 250.50, 99999.99]
        df["o_totalprice"] = [rng.choice(prices) for _ in range(n)]
        prios = ["1-URGENT", "1-URGENT", "5-LOW", "3-MEDIUM"]
        pr = [rng.choice(prios) for _ in range(n)]
        pr[0], pr[1], pr[2], pr[3] = "1-URGENT", "1-URGENT", "5-LOW", "5-LOW"
        df["o_orderpriority"] = pr
        # Kaplan-Meier: collapse custkeys to a small pool so order
        # counts straddle KM_EVENT_MIN_ORDERS (censoring mix), and
        # squeeze dates so dur=0 lifetimes (single-date customers) and
        # duplicate durations occur
        import pandas as pd

        pool = max(3, len(set(df["o_custkey"])) // 20)
        df["o_custkey"] = [int(k) % pool for k in df["o_custkey"]]
        base = df["o_orderdate"].min()
        df["o_orderdate"] = [
            base + pd.Timedelta(days=rng.choice([0, 0, 1, 2, 30])) for _ in range(n)
        ]

    def mut_lineitem(df):
        n = len(df)
        # few distinct cents values -> exact 2*cumw == W boundary hits
        # are likely; integer weights incl. heavy ones
        df["l_extendedprice"] = [rng.choice([10.00, 10.00, 20.00, 30.00]) for _ in range(n)]
        df["l_quantity"] = [float(rng.choice([1, 1, 2, 5, 10])) for _ in range(n)]

    def mut_nation(df):
        # fresh names -> a fresh md5-uniform p-value sweep each seed;
        # the BH step-up boundary (p == q*i/m after rounding) moves
        df["n_name"] = [f"NATION_{seed}_{i}_{rng.randint(0, 999)}" for i in range(len(df))]

    def mut_documents(df):
        n = len(df)
        pool = ["en", "de", "fr", "es", "zh", "xx"]  # incl. an allowlist outsider
        langs = [rng.choice(pool) for _ in range(n)]
        langs[0] = "qq"  # a guaranteed 1-doc class
        df["lang"] = langs

    _rewrite(SF_DIR, d, "documents", mut_documents)
    _rewrite(SF_DIR, d, "events", mut_events)
    _rewrite(SF_DIR, d, "orders", mut_orders)
    _rewrite(SF_DIR, d, "lineitem", mut_lineitem)
    _rewrite(SF_DIR, d, "nation", mut_nation)
    for t in TABLES:
        dst = os.path.join(d, f"{t}.parquet")
        if not os.path.exists(dst):
            os.symlink(os.path.join(SF_DIR, f"{t}.parquet"), dst)
    return d


_DIRS: dict[int, str] = {}


def _dir_for(seed: int) -> str:
    if seed not in _DIRS:
        _DIRS[seed] = _synth_dir(seed)
    return _DIRS[seed]


@pytest.mark.parametrize("seed", SEEDS)
@pytest.mark.parametrize(
    "name", EVENT_QUERIES + ORDER_QUERIES + LINEITEM_QUERIES + NATION_QUERIES + DOC_QUERIES
)
def test_stat_query_matches_oracle_on_fuzzed_frame(spark, seed, name):
    d = _dir_for(seed)
    spec = all_queries()[name]
    con = duckdb_connection(d)
    r = compare(name, spec.spark(spark, d), spec.oracle, con)
    assert r.ok, f"{name} seed={seed}: {r.diff_summary()}"
