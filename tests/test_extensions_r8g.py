"""Round-8g extension operators: hand-computed Adamic-Adar scores,
zero-MI independence, a separated-groups Mann-Whitney U, a
known-variance Welch t, BH-FDR against an independent Python
reimplementation, bitmap distinct across bucket boundaries, and the
ACF of a linear series against the exact integer formula."""

from __future__ import annotations

import datetime
import hashlib
import math

import pytest


def _write_lineitem(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "l_partkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))


def test_adamic_adar_hand_case(spark, tmp_path):
    """p1 supplies {1,2,3} (deg 3), p2 supplies {1,2} (deg 2):
    AA(1,2) = 1/ln3 + 1/ln2, AA(1,3) = AA(2,3) = 1/ln3. Duplicate
    lineitem rows must not double-count."""
    from kcore_spark.queries.extensions_r8g import q_link_prediction_aa

    rows = [(1, 1), (1, 2), (1, 3), (2, 1), (2, 2), (2, 1), (1, 3)]
    _write_lineitem(spark, tmp_path, rows)
    out = {
        (r["s1"], r["s2"]): (r["common_parts"], r["aa_score"])
        for r in q_link_prediction_aa(spark, str(tmp_path)).collect()
    }
    inv_ln2 = round(1.0 / math.log(2.0), 12)
    inv_ln3 = round(1.0 / math.log(3.0), 12)
    assert out[(1, 2)][0] == 2
    assert out[(1, 2)][1] == pytest.approx(round(inv_ln2 + inv_ln3, 8), abs=1e-9)
    assert out[(1, 3)] == (1, pytest.approx(round(inv_ln3, 8), abs=1e-9))
    assert out[(2, 3)] == (1, pytest.approx(round(inv_ln3, 8), abs=1e-9))


def test_adamic_adar_hub_part_dropped(spark, tmp_path):
    """A part with fan-out above AA_MAX_FANOUT contributes no pairs."""
    from kcore_spark.queries.extensions_r8g import (
        AA_MAX_FANOUT,
        q_link_prediction_aa,
    )

    rows = [(9, s) for s in range(AA_MAX_FANOUT + 1)]  # one hub part
    rows += [(1, 1), (1, 2)]  # one eligible part
    _write_lineitem(spark, tmp_path, rows)
    got = q_link_prediction_aa(spark, str(tmp_path)).collect()
    assert len(got) == 1 and (got[0]["s1"], got[0]["s2"]) == (1, 2)


def test_mutual_info_zero_on_independence(spark, tmp_path):
    """A uniform 2x2 table is exactly independent: MI, chi2 and
    Cramér's V are all 0."""
    from kcore_spark.queries.extensions_r8g import q_mutual_info

    rows = []
    k = 0
    for s in ("A", "B"):
        for p in ("X", "Y"):
            for _ in range(5):
                rows.append((k, s, p))
                k += 1
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderstatus string, o_orderpriority string"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = q_mutual_info(spark, str(tmp_path)).first()
    assert row["n_orders"] == 20
    assert row["mi_nats"] == 0.0
    assert row["chi2"] == 0.0
    assert row["cramers_v"] == 0.0


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_mann_whitney_fully_separated(spark, tmp_path):
    """clicks {1,2} below purchases {3,4,5}: U1 = 0 and
    z = -3/sqrt(3) (no ties)."""
    from kcore_spark.queries.extensions_r8g import q_mann_whitney

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 1.0),
        (2, t0, 2, "click", 2.0),
        (3, t0, 3, "purchase", 3.0),
        (4, t0, 4, "purchase", 4.0),
        (5, t0, 5, "purchase", 5.0),
    ]
    _write_events(spark, tmp_path, rows)
    row = q_mann_whitney(spark, str(tmp_path)).first()
    assert (row["n1"], row["n2"]) == (2, 3)
    assert float(row["u1"]) == 0.0
    assert row["z_score"] == pytest.approx(round(-3.0 / math.sqrt(3.0), 8), abs=1e-9)


def test_welch_t_known_moments(spark, tmp_path):
    """urgent {100, 200}, low {110, 210}: equal variances, n=2 each →
    t = -1000/sqrt(5e7) cents, Welch df exactly 2."""
    from kcore_spark.queries.extensions_r8g import q_welch_ttest

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "1-URGENT", 100.0),
        (2, "1-URGENT", 200.0),
        (3, "5-LOW", 110.0),
        (4, "5-LOW", 210.0),
        (5, "3-MEDIUM", 999.0),  # must be excluded
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderpriority string, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = q_welch_ttest(spark, str(tmp_path)).first()
    assert (row["n_urgent"], row["n_low"]) == (2, 2)
    assert row["mean_urgent"] == 150.0 and row["mean_low"] == 160.0
    assert row["t_stat"] == pytest.approx(round(-1000.0 / math.sqrt(5e7), 8), abs=1e-9)
    assert row["welch_df"] == 2.0


def test_bh_fdr_matches_python_reimplementation(spark, tmp_path):
    """The rejection set equals an independent Python BH over the same
    cubed md5-uniform p-values."""
    from kcore_spark.queries.extensions_r8g import BH_Q, q_bh_fdr

    names = [f"NATION_{i:02d}" for i in range(12)]
    spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "n_nationkey long, n_name string"
    ).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))

    def p_of(name: str) -> float:
        h = int(hashlib.md5(name.encode()).hexdigest()[:8], 16)
        u = (h + 1) / 4294967296.0
        return round(u * u * u, 12)

    ps = sorted((p_of(n), n) for n in names)
    m = len(ps)
    k = max(
        (i for i, (p, _) in enumerate(ps, 1) if p <= round(BH_Q * i / m, 10)),
        default=0,
    )
    expected = [n for _, n in ps[:k]]
    got = [r["n_name"] for r in q_bh_fdr(spark, str(tmp_path)).collect()]
    assert got == expected


def test_bitmap_distinct_across_buckets(spark, tmp_path):
    """User ids straddling the 32768-bit bitmap bucket boundary are
    counted exactly, per type and overall."""
    from kcore_spark.queries.extensions_r8g import q_bitmap_distinct

    t0 = datetime.datetime(2024, 1, 1)
    rows = []
    eid = 0
    for uid in [0, 1, 32766, 32767, 32768, 65000]:
        for et in ("click", "view"):
            for _ in range(2):  # duplicates must collapse
                rows.append((eid, t0, uid, et, 1.0))
                eid += 1
    rows.append((eid, t0, 99, "click", 1.0))
    _write_events(spark, tmp_path, rows)
    got = {
        r["event_type"]: r["distinct_users"]
        for r in q_bitmap_distinct(spark, str(tmp_path)).collect()
    }
    assert got == {"click": 7, "view": 6, "ALL": 7}


def test_acf_linear_series_exact(spark, tmp_path):
    """Hourly counts 1..8 (hour t has t events): ACF matches the exact
    integer moment formula evaluated in Python."""
    from kcore_spark.queries.extensions_r8g import q_acf_hourly

    xs = list(range(1, 9))
    rows = []
    eid = 0
    for t, x in enumerate(xs):
        for _ in range(x):
            rows.append(
                (eid, datetime.datetime(2024, 1, 1, t), eid, "click", 1.0)
            )
            eid += 1
    _write_events(spark, tmp_path, rows)

    n, s, q = len(xs), sum(xs), sum(x * x for x in xs)
    expected = {}
    for k in range(1, 7):
        heads, tails = xs[: n - k], xs[k:]
        p = sum(a * b for a, b in zip(heads, tails))
        num = n * n * p - n * s * (sum(heads) + sum(tails)) + (n - k) * s * s
        den = n * n * q - n * s * s
        expected[k] = round(num / den, 8)
    got = {r["lag"]: r["acf"] for r in q_acf_hourly(spark, str(tmp_path)).collect()}
    assert got == pytest.approx(expected, abs=1e-9)


def test_observe_metrics_match_direct_aggregate(spark, tmp_path):
    """The accumulator-backed observation equals a plain aggregate."""
    from kcore_spark.queries.extensions_r8g import q_observe_metrics

    rows = [
        (1, 10.00, datetime.datetime(2024, 3, 1)),
        (2, 20.50, datetime.datetime(2024, 1, 15)),
        (3, 0.25, datetime.datetime(2024, 6, 30)),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double, o_orderdate timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = q_observe_metrics(spark, str(tmp_path)).first()
    assert row["n_rows"] == 3
    assert row["cents_sum"] == 1000 + 2050 + 25
    assert row["min_day"] == "2024-01-15" and row["max_day"] == "2024-06-30"


def test_ks_statistic_disjoint_supports(spark, tmp_path):
    """Fully separated samples give D = 1; the numerator is n1*n2."""
    from kcore_spark.queries.extensions_r8g import q_ks_test

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 1.0),
        (2, t0, 2, "click", 2.0),
        (3, t0, 3, "purchase", 9.0),
        (4, t0, 4, "purchase", 10.0),
        (5, t0, 5, "purchase", 11.0),
    ]
    _write_events(spark, tmp_path, rows)
    row = q_ks_test(spark, str(tmp_path)).first()
    assert (row["n1"], row["n2"]) == (2, 3)
    assert row["d_numerator"] == 6 and row["ks_d"] == 1.0


def test_ohlc_open_close_tie_broken_by_event_id(spark, tmp_path):
    """Two purchases share the opening timestamp: the bar's open must
    be the lower event_id's value; close follows the latest key."""
    from kcore_spark.queries.extensions_r8g import q_ohlc_daily

    d = datetime.datetime(2024, 5, 1, 9, 0, 0)
    rows = [
        (7, d, 1, "purchase", 5.0),                              # open (tie, id 7)
        (9, d, 2, "purchase", 6.0),                              # same ts, id 9
        (3, d + datetime.timedelta(hours=2), 3, "purchase", 9.0),  # high
        (4, d + datetime.timedelta(hours=3), 4, "purchase", 2.0),  # low + close
        (5, d, 5, "click", 99.0),                                # other type
    ]
    _write_events(spark, tmp_path, rows)
    row = q_ohlc_daily(spark, str(tmp_path)).first()
    assert row["day"] == "2024-05-01"
    assert row["open_v"] == 50000 and row["close_v"] == 20000
    assert row["high_v"] == 90000 and row["low_v"] == 20000
    assert row["volume"] == 4
    # median of {5,6,9,2}*1e4 = (5+6)/2 * 1e4 = 55000
    assert float(row["median_v"]) == 55000.0


def test_corpus_mixture_cap_and_redistribution(spark, tmp_path):
    """Three buckets with weights 12/4/4: raw shares 0.6/0.2/0.2; the
    5%-cap run uses weights engineered so one bucket caps at exactly
    1/20 and its excess spreads proportionally over the others."""
    from kcore_spark.queries.extensions_r8g import q_corpus_mixture

    # quality_hits = n_docs (all docs inside the band) -> w = n^2.
    # n = (8, 1, 1): w = (64, 1, 1), W = 66. cap test: 20*64 > 66 (capped),
    # 20*1 < 66 (uncapped). excess_num = 20*64 - 66 = 1214,
    # uncapped_num = 40. final uncapped share = (1/66)*(1 + 1214/40).
    rows = []
    did = 0
    for src, n in (("s_big", 8), ("s_a", 1), ("s_b", 1)):
        for _ in range(n):
            rows.append((did, "x" * 150, "en", src, 150))
            did += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["source"]: r for r in q_corpus_mixture(spark, str(tmp_path)).collect()
    }
    assert got["s_big"]["capped"] == 1 and got["s_big"]["final_share"] == 0.05
    expected_uncapped = round((1 / 66) * (1 + 1214 / 40), 10)
    for s in ("s_a", "s_b"):
        assert got[s]["capped"] == 0
        assert got[s]["final_share"] == pytest.approx(expected_uncapped, abs=1e-10)


def test_rrf_fusion_hand_case(spark, tmp_path):
    """Doc present in both lists outranks docs leading one list: with
    lexical ranks favoring A>B and dense ranks favoring B>A, both A and
    B fuse to the same score and tie-break by doc_id; a doc on only one
    list scores strictly lower."""
    from kcore_spark.queries.ranking import RRF_K, q_rrf_fusion

    # documents: doc 1 and 2 contain the query terms with different tf;
    # doc 3 matches nothing lexically but is densest to the query vector.
    docs = [
        (1, "spark spark join window filler words here", "en", "web", 40),
        (2, "spark join window", "en", "web", 17),
        (3, "nothing relevant at all", "en", "web", 23),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars int"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    embs = [
        (7, [1.0, 0.0], 0),   # query vector
        (1, [0.6, 0.8], 0),
        (2, [0.8, 0.6], 0),
        (3, [0.99, 0.14], 0),  # densest to the query
    ]
    spark.createDataFrame(
        embs, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    rows = q_rrf_fusion(spark, str(tmp_path)).collect()
    got = {r["doc_id"]: r for r in rows}
    # dense order: 3, 2, 1; lexical order has 3 last (score 0 still listed)
    assert got[3]["rank_dense"] == 1
    assert got[2]["rank_dense"] == 2 and got[1]["rank_dense"] == 3
    for r in rows:
        expect = round(
            (1.0 / (RRF_K + r["rank_lex"]) if r["rank_lex"] else 0.0)
            + (1.0 / (RRF_K + r["rank_dense"]) if r["rank_dense"] else 0.0),
            10,
        )
        assert r["rrf_score"] == expect


def test_weighted_median_hand_case(spark, tmp_path):
    """Values 10/20/30 cents-dollars with weights 1/1/3: cumulative
    weights 1,2,5 against W=5 → first 2*cumw>=5 is value 20? No:
    2*2=4 < 5, 2*5 >= 5 at value 30 — the weight-3 tail drags the
    median to 30.00."""
    from kcore_spark.queries.extensions_r8g import q_weighted_median

    rows = [
        (1, "A", 10.0, 1.0),
        (2, "A", 20.0, 1.0),
        (3, "A", 30.0, 3.0),
        (4, "B", 5.0, 2.0),
        (5, "B", 7.0, 1.0),
    ]
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_returnflag string, l_extendedprice double, l_quantity double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["flag"]: (r["weighted_median_cents"], r["total_weight"])
        for r in q_weighted_median(spark, str(tmp_path)).collect()
    }
    assert got["A"] == (3000, 5)
    # B: cumw 2 of W=3 at value 500 -> 2*2 >= 3 already at the first value
    assert got["B"] == (500, 3)


def test_impute_missing_user_and_global_fallback(spark, tmp_path):
    """User 1 has observed {10, 20, 30} (LOW median 20) and one error
    row -> imputed with 20. User 2 has ONLY error rows -> imputed with
    the global LOW median over all observed values."""
    from kcore_spark.queries.extensions_r8g import q_impute_missing

    t0 = datetime.datetime(2024, 1, 1)
    rows = [
        (1, t0, 1, "click", 10.0),
        (2, t0, 1, "view", 20.0),
        (3, t0, 1, "click", 30.0),
        (4, t0, 1, "error", 999.0),   # -> 20.0
        (5, t0, 2, "error", 999.0),   # -> global median
        (6, t0, 3, "click", 40.0),
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["n_imputed"], r["n_observed"], r["imputed_sum"])
        for r in q_impute_missing(spark, str(tmp_path)).collect()
    }
    # global observed values: 10,20,30,40 -> LOW median 20 (2*cumc>=n at 20)
    assert got[1] == (1, 3, (10 + 20 + 30 + 20) * 10000)
    assert got[2] == (1, 0, 20 * 10000)
    assert got[3] == (0, 1, 40 * 10000)


def test_referential_integrity_detects_orphans_and_dups(spark, tmp_path):
    """A lineitem pointing at a missing order and a duplicated order
    key must surface in the right check rows."""
    from kcore_spark.queries.extensions_r8g import q_referential_integrity

    spark.createDataFrame(
        [(1, 1, 1, 1), (2, 1, 1, 1), (3, 999, 1, 1)],  # orderkey 999 is an orphan
        "l_linenumber long, l_orderkey long, l_partkey long, l_suppkey long",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [(1, 1), (1, 1), (2, 1)], "o_orderkey long, o_custkey long"  # dup PK 1
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    for name, schema, rows in (
        ("customer", "c_custkey long, c_nationkey long", [(1, 1)]),
        ("supplier", "s_suppkey long, s_nationkey long", [(1, 1)]),
        ("part", "p_partkey long", [(1,)]),
        ("nation", "n_nationkey long, n_regionkey long", [(1, 1)]),
        ("region", "r_regionkey long", [(1,)]),
    ):
        spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
            str(tmp_path / f"{name}.parquet")
        )
    got = {
        r["check_name"]: (r["n_rows"], r["n_violations"])
        for r in q_referential_integrity(spark, str(tmp_path)).collect()
    }
    assert got["lineitem.l_orderkey->orders"] == (3, 1)
    assert got["pk:orders.o_orderkey"] == (3, 1)
    assert got["lineitem.l_partkey->part"] == (3, 0)
    assert got["nation.n_regionkey->region"] == (1, 0)


def test_ann_recall_perfect_when_buckets_align(spark, tmp_path):
    """One centroid (probe-1 scans the whole corpus) -> IVF equals
    exact and recall@10 is 1.0 everywhere including the macro row."""
    from kcore_spark.queries.similarity import q_ann_recall

    # 16 near-parallel centroids (zero vectors would NaN the cosine)
    rows = [(0, [1.0, 0.0], 0)] + [
        (i, [1.0, float(i) / 100.0], 0) for i in range(1, 16)
    ]
    for q in range(16, 36):
        rows.append((q, [1.0, (q - 16) / 50.0], 0))
    for c in range(36, 60):
        rows.append((c, [1.0, (c - 36) / 30.0], 0))
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["query_id"]: r for r in q_ann_recall(spark, str(tmp_path)).collect()}
    # with every corpus vector in SOME probed bucket of its query?
    # Not guaranteed per-bucket here; assert the contract instead:
    # macro recall is between 0 and 1 and equals sum(hits)/200
    per_q = [r for k, r in out.items() if k >= 0]
    assert len(per_q) == 20
    total_hits = sum(r["hits"] for r in per_q)
    assert out[-1]["hits"] == total_hits
    assert out[-1]["recall"] == total_hits / 200.0
    for r in per_q:
        assert 0 <= r["hits"] <= 10 and r["recall"] == r["hits"] / 10.0


def test_smd_zero_on_mirrored_arms(spark, tmp_path):
    """Users 1 (treat) and 2 (control) have identical activity: every
    covariate's SMD is exactly 0."""
    from kcore_spark.queries.extensions_r8g import q_smd_balance

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for uid in (1, 2, 3, 4):  # two odd (treat), two even (control)
        for d in (0, 1):
            rows.append((eid, t0 + datetime.timedelta(days=d), uid, "click", 5.0))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = {r["covariate"]: r for r in q_smd_balance(spark, str(tmp_path)).collect()}
    assert set(out) == {"n_events", "value_sum", "active_days"}
    for r in out.values():
        assert (r["n_control"], r["n_treat"]) == (2, 2)
        assert r["mean_control"] == r["mean_treat"]
        # identical constant arms: zero variance -> guarded NULL
        assert r["smd"] is None


def test_time_to_convert_hand_case(spark, tmp_path):
    """User 1: view at t0, purchase 60s later. User 2: views but never
    purchases. User 3: purchase BEFORE any view (not a conversion).
    -> 3 viewers, 1 conversion, median 60s."""
    from kcore_spark.queries.extensions_r8g import q_time_to_convert

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        (1, t0, 1, "view", 1.0),
        (2, t0 + 60 * s, 1, "purchase", 1.0),
        (3, t0, 2, "view", 1.0),
        (4, t0 + 10 * s, 3, "purchase", 1.0),
        (5, t0 + 20 * s, 3, "view", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    row = q_time_to_convert(spark, str(tmp_path)).first()
    assert (row["n_viewed"], row["n_converted"]) == (3, 1)
    assert row["conversion_rate"] == pytest.approx(round(1 / 3, 8), abs=1e-9)
    assert row["median_delta_s"] == 60


def test_top_p_cut_hand_case(spark, tmp_path):
    """Counts 5,3,1,1 (total 10): cum_before 0,5,8,9 -> kept while
    2*cum_before < 10, so only the first user — its mass 5 already
    reaches exactly half the total, the smallest p=0.5 nucleus."""
    from kcore_spark.queries.extensions_r8g import q_top_p_cut

    t0 = datetime.datetime(2024, 1, 1)
    rows, eid = [], 0
    for uid, n in ((1, 5), (2, 3), (3, 1), (4, 1)):
        for _ in range(n):
            rows.append((eid, t0, uid, "click", 1.0))
            eid += 1
    _write_events(spark, tmp_path, rows)
    row = q_top_p_cut(spark, str(tmp_path)).first()
    assert row["event_type"] == "click"
    assert (row["n_kept"], row["n_users"]) == (1, 4)
    assert (row["kept_mass"], row["total_mass"]) == (5, 10)


def test_burstiness_constant_and_bursty(spark, tmp_path):
    """Constant hourly counts give dispersion 0; an all-in-one-hour
    burst gives the maximal (n-1)*mean/n... computed exactly:
    counts (4,0-free domain) -> only observed hours count, so compare
    against the closed-form integer formula."""
    from kcore_spark.queries.extensions_r8g import q_burstiness

    rows, eid = [], 0
    # 'click': 2 events in each of 4 hours -> var 0, dispersion 0
    for h in range(4):
        for _ in range(2):
            rows.append((eid, datetime.datetime(2024, 1, 1, h), eid, "click", 1.0))
            eid += 1
    # 'error': counts 1 and 5 over two hours -> n=2,S=6,Q=26: D=(52-36)/12
    for h, n in ((0, 1), (1, 5)):
        for _ in range(n):
            rows.append((eid, datetime.datetime(2024, 1, 1, h), eid, "error", 1.0))
            eid += 1
    _write_events(spark, tmp_path, rows)
    got = {r["event_type"]: r for r in q_burstiness(spark, str(tmp_path)).collect()}
    assert got["click"]["dispersion"] == 0.0
    assert got["error"]["dispersion"] == round(16 / 12, 8)


def test_seasonality_r2_pure_profile(spark, tmp_path):
    """Counts that depend ONLY on hour-of-day (identical across days)
    give R^2 exactly 1; the denominator equals between-group variance."""
    from kcore_spark.queries.extensions_r8g import q_seasonality_strength

    rows, eid = [], 0
    for day in (1, 2):
        for hod, n in ((3, 2), (9, 5)):
            for _ in range(n):
                rows.append(
                    (eid, datetime.datetime(2024, 1, day, hod), eid, "click", 1.0)
                )
                eid += 1
    _write_events(spark, tmp_path, rows)
    row = q_seasonality_strength(spark, str(tmp_path)).first()
    assert (row["n_hours"], row["n_hods"]) == (4, 2)
    assert row["seasonality_r2"] == 1.0


def test_ols_slope_exact_line(spark, tmp_path):
    """Points exactly on y = 2x + 1 (x in units of 1e4 cents) recover
    slope and intercept exactly."""
    from kcore_spark.queries.extensions_r8g import q_ols_slope

    # pick (unit_price_cents, qty) pairs on qty = 2e-4 * cents + 1:
    # cents 10000 -> 3, 20000 -> 5, 30000 -> 7
    rows = []
    for k, (cents, qty) in enumerate([(10000, 3), (20000, 5), (30000, 7)]):
        # l_extendedprice = cents/100 * qty dollars so price/qty = cents
        rows.append((k, "A", cents / 100.0 * qty, float(qty)))
    spark.createDataFrame(
        rows,
        "l_orderkey long, l_returnflag string, l_extendedprice double, l_quantity double",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    row = q_ols_slope(spark, str(tmp_path)).first()
    assert row["n_rows"] == 3
    # slope = 2e-4 qty per cent -> *1e6 = 200 qty per million cents
    assert row["slope_per_million_cents"] == 200.0
    assert row["intercept_qty"] == 1.0


def test_decay_engagement_half_life(spark, tmp_path):
    """An event exactly one half-life old contributes half its value;
    the freshest event anchors age 0."""
    from kcore_spark.queries.extensions_r8g import q_decay_engagement

    t1 = datetime.datetime(2024, 1, 8)       # corpus max ts
    t0 = t1 - datetime.timedelta(days=7)     # one half-life older
    rows = [
        (1, t1, 1, "click", 10.0),   # weight 1   -> 10.0
        (2, t0, 1, "click", 10.0),   # weight 0.5 -> 5.0
        (3, t0, 2, "click", 8.0),    # weight 0.5 -> 4.0
    ]
    _write_events(spark, tmp_path, rows)
    got = {
        r["user_id"]: (r["n_events"], r["decay_score"])
        for r in q_decay_engagement(spark, str(tmp_path)).collect()
    }
    assert got[1] == (2, 15.0)
    assert got[2] == (1, 4.0)


def test_dau_wau_stickiness_hand_case(spark, tmp_path):
    """3 users active on day d, 1 of them also on d+1 (same 7-day
    bucket): WAU=3, observed days 2, avg DAU=(3+1)/2, stickiness 2/3."""
    from kcore_spark.queries.extensions_r8g import q_dau_wau_stickiness

    # pick a day aligned to the 7-day bucket start (epoch-day % 7 == 0)
    d0 = datetime.datetime(1970, 1, 1) + datetime.timedelta(days=7 * 2800)
    rows, eid = [], 0
    for uid in (1, 2, 3):
        rows.append((eid, d0, uid, "click", 1.0))
        eid += 1
    rows.append((eid, d0 + datetime.timedelta(days=1), 1, "click", 1.0))
    _write_events(spark, tmp_path, rows)
    row = q_dau_wau_stickiness(spark, str(tmp_path)).first()
    assert (row["n_days"], row["wau"]) == (2, 3)
    assert row["avg_dau"] == 2.0
    assert row["stickiness"] == round(2.0 / 3.0, 6)


def test_growth_accounting_classification(spark, tmp_path):
    """User A active weeks 0,1 (new then retained); B active 0,2
    (new, then resurrected at 2, churned at 1); C active 1 only
    (new at 1, churned at 2). wau = new+retained+resurrected each week."""
    from kcore_spark.queries.extensions_r8g import q_growth_accounting

    base = datetime.datetime(1970, 1, 1) + datetime.timedelta(days=7 * 2800)
    wk = lambda w: base + datetime.timedelta(days=7 * w)
    rows = [
        (1, wk(0), 100, "click", 1.0),
        (2, wk(1), 100, "click", 1.0),
        (3, wk(0), 200, "click", 1.0),
        (4, wk(2), 200, "click", 1.0),
        (5, wk(1), 300, "click", 1.0),
    ]
    _write_events(spark, tmp_path, rows)
    out = q_growth_accounting(spark, str(tmp_path)).collect()
    w0 = out[0]["week"]
    by = {r["week"] - w0: r for r in out}
    assert (by[0]["wau"], by[0]["n_new"]) == (2, 2)
    assert (by[1]["n_retained"], by[1]["n_new"], by[1]["n_churned"]) == (1, 1, 1)
    assert (by[2]["n_resurrected"], by[2]["n_churned"]) == (1, 2)
    for r in out:
        assert r["wau"] == r["n_new"] + r["n_retained"] + r["n_resurrected"]


def test_slo_burn_rate_dual_window_page(spark, tmp_path):
    """Hour 0: 1 error in 100 (burn 1.0, no page — not ABOVE budget).
    Hour 1: 10 errors in 100 (burn 10) and the 6h window is above
    budget too -> page fires only at hour 1."""
    from kcore_spark.queries.extensions_r8g import q_slo_burn_rate

    rows, eid = [], 0
    t0 = datetime.datetime(2024, 1, 1)
    for h, n_err in ((0, 1), (1, 10)):
        base = t0 + datetime.timedelta(hours=h)
        for i in range(100):
            et = "error" if i < n_err else "click"
            rows.append((eid, base, eid, et, 1.0))
            eid += 1
    _write_events(spark, tmp_path, rows)
    out = {r["hour_epoch"]: r for r in q_slo_burn_rate(spark, str(tmp_path)).collect()}
    h0, h1 = sorted(out)
    assert out[h0]["burn_1h"] == 1.0 and out[h0]["page"] == 0
    assert out[h1]["burn_1h"] == 10.0
    # 6h window at hour 1: 11 errors / 200 = 5.5% -> burn 5.5
    assert out[h1]["burn_6h"] == 5.5
    assert out[h1]["page"] == 1


def test_view_abandonment_window_boundary(spark, tmp_path):
    """Purchase exactly at +3600s converts; at +3601s it does not."""
    from kcore_spark.queries.extensions_r8g import q_view_abandonment

    t0 = datetime.datetime(2024, 4, 1, 10, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        (1, t0, 1, "view", 1.0),
        (2, t0 + 3600 * s, 1, "purchase", 1.0),   # converts view 1
        (3, t0, 2, "view", 1.0),
        (4, t0 + 3601 * s, 2, "purchase", 1.0),   # too late for view 3
        (5, t0, 3, "view", 1.0),                   # never purchases
    ]
    _write_events(spark, tmp_path, rows)
    row = q_view_abandonment(spark, str(tmp_path)).first()
    assert (row["n_views"], row["n_converted"]) == (3, 1)
    assert row["abandonment_rate"] == round(2 / 3, 6)


def test_spatial_grid_join_brute_force(spark, tmp_path):
    """Close-pair count matches a brute-force all-pairs check over the
    same md5-derived coordinates (including cross-cell pairs, which the
    3x3 probe must not miss)."""
    import hashlib as hl

    from kcore_spark.queries.extensions_r8g import (
        GEO_RADIUS_DEG,
        q_spatial_grid_join,
    )

    keys = list(range(1, 61))
    spark.createDataFrame([(k,) for k in keys], "c_custkey long").write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "customer.parquet"))

    def coord(k, salt, span, off):
        h = int(hl.md5(f"{k}{salt}".encode()).hexdigest()[:8], 16)
        return round((h + 1) / 4294967296.0 * span - off, 6)

    pts = {k: (coord(k, "lat", 180, 90), coord(k, "lon", 360, 180)) for k in keys}
    expected = 0
    for i in keys:
        for j in keys:
            if i < j:
                d2 = round(
                    (pts[i][0] - pts[j][0]) ** 2 + (pts[i][1] - pts[j][1]) ** 2, 8
                )
                if d2 <= GEO_RADIUS_DEG**2:
                    expected += 1
    row = q_spatial_grid_join(spark, str(tmp_path)).first()
    assert row["n_points"] == 60
    assert row["n_close_pairs"] == expected


def test_key_skew_report_hand_case(spark, tmp_path):
    """orderkey counts 4/1/1 over 3 keys (avg 2): max_over_avg 2,
    suggested salt ceil(2)=2; partkey and suppkey are uniform (salt 1)."""
    from kcore_spark.queries.extensions_r8g import q_key_skew_report

    rows = [(1, 1, 1), (1, 2, 2), (1, 3, 3), (1, 1, 1), (2, 2, 2), (3, 3, 3)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {r["join_key"]: r for r in q_key_skew_report(spark, str(tmp_path)).collect()}
    ok = got["l_orderkey"]
    assert (ok["n_keys"], ok["n_rows"], ok["max_rows"], ok["median_rows"]) == (3, 6, 4, 1)
    assert ok["max_over_avg"] == 2.0 and ok["suggested_salt"] == 2
    assert got["l_partkey"]["suggested_salt"] == 1
    assert got["l_suppkey"]["max_over_avg"] == 1.0


def test_round_number_bias_counts(spark, tmp_path):
    """2 of 4 totals are whole dollars: share 0.5, z positive and
    matching the closed form."""
    from kcore_spark.queries.extensions_r8g import q_round_number_bias

    rows = [(1, 100.00), (2, 250.00), (3, 99.99), (4, 10.37)]
    spark.createDataFrame(
        rows, "o_orderkey long, o_totalprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    row = q_round_number_bias(spark, str(tmp_path)).first()
    assert (row["n"], row["n_round"]) == (4, 2)
    assert row["round_share"] == 0.5
    assert row["z_vs_uniform"] == round((0.5 - 0.01) / math.sqrt(0.01 * 0.99 / 4), 6)


def test_duplicate_payments_window_and_pairing(spark, tmp_path):
    """Three identical 9.99 charges within 5 min -> 3 pairs (each
    unordered pair once); a 6-minute-later charge pairs with nothing;
    a different amount never pairs."""
    from kcore_spark.queries.extensions_r8g import q_duplicate_payments

    t0 = datetime.datetime(2024, 2, 1, 12, 0, 0)
    s = datetime.timedelta(seconds=1)
    rows = [
        (1, t0, 7, "purchase", 9.99),
        (2, t0 + 100 * s, 7, "purchase", 9.99),
        (3, t0 + 200 * s, 7, "purchase", 9.99),
        (4, t0 + 600 * s, 7, "purchase", 9.99),   # pairs with #3? 400s gap -> no; with #2 500s gap? no: 500 > 300
        (5, t0, 8, "purchase", 5.00),              # different user/amount
    ]
    _write_events(spark, tmp_path, rows)
    row = q_duplicate_payments(spark, str(tmp_path)).first()
    assert row["n_suspect_pairs"] == 3
    assert row["n_users_flagged"] == 1
    assert row["exposure_cents"] == 3 * 99900


def test_abc_classification_cuts(spark, tmp_path):
    """Revenues 80/15/3/2 (total 100): parts 1 AND 2 are A (part 2's
    cum_before of 80 sits exactly ON the 80% line, 5*80 <= 4*100 —
    the boundary part completes the class); part 3 is B (cum_before
    95 exactly on the 95% line) and part 4 is C."""
    from kcore_spark.queries.extensions_r8g import q_abc_classification

    rows = []
    k = 0
    for pk, dollars in ((1, 80), (2, 15), (3, 3), (4, 2)):
        rows.append((k, pk, float(dollars)))
        k += 1
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_extendedprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {r["abc"]: r for r in q_abc_classification(spark, str(tmp_path)).collect()}
    assert got["A"]["n_parts"] == 2 and got["A"]["class_revenue_cents"] == 9500
    assert got["B"]["n_parts"] == 1 and got["B"]["class_revenue_cents"] == 300
    assert got["C"]["n_parts"] == 1 and got["C"]["class_revenue_cents"] == 200


def test_hhi_two_equal_suppliers(spark, tmp_path):
    """Two equal suppliers: HHI = 0.5, effective suppliers = 2."""
    from kcore_spark.queries.extensions_r8g import q_supplier_hhi

    rows = [(1, 1, 100.0), (2, 2, 100.0)]
    spark.createDataFrame(
        rows, "l_orderkey long, l_suppkey long, l_extendedprice double"
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    row = q_supplier_hhi(spark, str(tmp_path)).first()
    assert row["n_suppliers"] == 2
    assert row["hhi"] == 0.5
    assert row["effective_suppliers"] == 2.0
