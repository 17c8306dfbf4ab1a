"""Round-8 surface extensions, part G — AGGREGATOR.

The original 2555-line module is split into three themed files per
the r9 verdict's maintainability item (one theme per file, none over
~1100 lines): extensions_r8g_stats (statistical tests / association /
series stats), extensions_r8g_product (product analytics), and
extensions_r8g_dq (data quality + engine surface). This module
re-exports every public symbol and rebuilds QUERIES in the ORIGINAL
registration order, so the registry rotation and all existing imports
(tests import query callables from here) are unaffected.
"""

from __future__ import annotations

from kcore_spark.queries.extensions_r8g_dq import *  # noqa: F401,F403
from kcore_spark.queries.extensions_r8g_product import *  # noqa: F401,F403
from kcore_spark.queries.extensions_r8g_stats import *  # noqa: F401,F403

from kcore_spark.queries.extensions_r8g_dq import QUERIES as _DQ
from kcore_spark.queries.extensions_r8g_product import QUERIES as _PRODUCT
from kcore_spark.queries.extensions_r8g_stats import QUERIES as _STATS

# original registration order of the pre-split module — the registry
# merge (queries/__init__.all_queries) and the driver rotation window
# both key off insertion order, so it is pinned here
_ORDER = ['q_link_prediction_aa', 'q_mutual_info', 'q_mann_whitney', 'q_welch_ttest', 'q_bh_fdr', 'q_bitmap_distinct', 'q_acf_hourly', 'q_observe_metrics', 'q_sql_dialect_extras', 'q_ks_test', 'q_ohlc_daily', 'q_corpus_mixture', 'q_weighted_median', 'q_impute_missing', 'q_referential_integrity', 'q_smd_balance', 'q_time_to_convert', 'q_top_p_cut', 'q_burstiness', 'q_seasonality_strength', 'q_ols_slope', 'q_decay_engagement', 'q_dau_wau_stickiness', 'q_growth_accounting', 'q_slo_burn_rate', 'q_view_abandonment', 'q_spatial_grid_join', 'q_key_skew_report', 'q_round_number_bias', 'q_duplicate_payments', 'q_abc_classification', 'q_supplier_hhi']

_merged = {**_STATS, **_PRODUCT, **_DQ}
assert set(_merged) == set(_ORDER), set(_merged) ^ set(_ORDER)
QUERIES = {name: _merged[name] for name in _ORDER}
