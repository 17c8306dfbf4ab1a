#!/usr/bin/env python3
"""Benchmark: run the headline queries at $SPARK_GRAFT_SF_DIR.

Prints TWO JSON lines (contract pinned by tests/test_bench_output.py):
1. the FULL line — every timing (headline + extras + streaming side
   channels), also written to BENCH_DETAIL.json;
2. the COMPACT final line — headline total + the 24 HEADLINE timings
   only, <1,800 chars. The driver keeps a ~2,000-char stdout tail and
   json-parses the LAST line; the full line overflowed that capture for
   four rounds (BENCH_r07..r10 parsed:null), hence the split.
Both carry {"metric", "value", "unit", "queries", "sf"}.

Each headline query is executed twice and the MIN reported (load
robustness). One UNTIMED throwaway execution of the first headline
query precedes the timed loop (r12 VERDICT nit #5): q01 was absorbing
JVM/codegen/parquet-reader warmup that the trivial warm-up jobs below
don't reach, swinging 1.36->2.77s across otherwise-identical runs.
Timing covers full execution to a collect of the result.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from kcore_spark.caching import release_transients
from kcore_spark.queries import all_queries
from kcore_spark.session import get_spark

# Headline set: one per operator family, weighted to the heavy ops.
HEADLINE = [
    # batch relational
    "q01_pricing_summary",
    "q03_shipping_priority",
    "q05_local_supplier_volume",
    "q10_returned_items",
    "q_brand_volume",
    "q13_customer_distribution",
    "q_window_topk_orders",
    "q_window_running_totals",
    "q_rollup_returns",
    "q_percentiles",
    "q_datediff_fulfillment",
    "q_topk_orders",
    # event analytics
    "q_events_json_props",
    "q_events_tumbling_1h",
    "q_events_sessions",
    "q_asof_event_order",
    # LLM-pipeline ops
    "q_dedup_exact",
    # The production near-dup path (DF-filtered Jaccard with the hot-shingle
    # cutoff) headlines here; the exact all-pairs variant stays registered as
    # a correctness-only oracle pin (quadratic on a skewed shingle — not a
    # plan we'd ever run at 100 TB, so not a plan we benchmark).
    "q_near_dup_jaccard_df_filtered",
    "q_minhash_lsh_pairs",
    "q_simhash_fingerprints",
    "q_cosine_topk",
    "q_token_totals",
    "q_fingerprints",
    # streaming (availableNow replay incl. source discovery)
    "q_stream_tumbling_counts",
]

# Newer operators benched outside the headline total (kept separate so
# round-over-round totals stay comparable to the original 24-query set).
EXTRAS = [
    "q_bm25_topk",
    "q_pagerank_purchases",
    "q_embedding_quantize",
    "q_doc_chunks_overlap",
    "q_pack_sequences",
    "q_window_exclude_current",
    # round-5 curation/retrieval operators
    "q_tfidf_top_terms",
    "q_ngram_containment",
    "q_unigram_kl_drift",
    "q_two_stage_retrieval",
    "q_fuzzy_blocked_match",
    "q_window_time_range",
    "q_topic_time_travel",
    "q_pq_encode",
    "q_event_pattern_regex",
    "q_range_join_binned",
    "q_cohort_retention",
    # round-6: the iterative/multi-join heavyweights (VERDICT r5 #5)
    "q_ivf_pq_search",
    "q_semantic_clusters",
    "q_fuzzy_clusters",
    "q_stream_timeout_sessions",
    "q_stream_tws_sessions",
    # round-6 curation/profiling block
    "q_countmin_heavy_hitters",
    "q_pii_redact",
    "q_dataset_split",
    "q_dq_expectations",
    "q_zorder_rect_scan",
    "q_max_concurrent",
    # round-7 extensions (q_setsim_ppjoin excluded: 13s of exact-verify
    # CPU at sf0.1 — correctness-pinned at sf0.01, not a bench shape)
    "q_kcore_subgraph",
    "q_bloom_prefilter_join",
    "q_incremental_agg_maintenance",
    "q_bigram_lm_score",
    # round-8: the clustering/graph/eval block
    "q_kmeans_lloyd",
    "q_core_numbers",
    "q_label_propagation",
    "q_ngram_novelty",
    "q_auc_roc",
    # round-8c: survival/eval/tokenizer/curation block
    "q_kaplan_meier",
    "q_logreg_gd",
    "q_bpe_learn",
    "q_chunk_dedup",
    "q_random_projection",
    "q_benford_digits",
    "q_ndcg_eval",
    # round-8d: link-analysis/forecast/contrastive block
    "q_hits_ranking",
    "q_seasonal_mase",
    "q_degree_assortativity",
    "q_hard_negatives",
    "q_tokenizer_apply",
    "q_target_encoding",
    "q_lorenz_curve",
    # round-8f: experimentation/serving block (MMR excluded: 5 greedy
    # localCheckpoint rounds on a 10-row shortlist — latency is
    # driver-roundtrip-bound, not a data-plane shape worth benching)
    "q_bootstrap_ci",
    "q_diff_in_diff",
    "q_skyline_orders",
    # round-8g: statistics/graph-mining block (the tiny one-row tests —
    # Welch t, Mann-Whitney, BH-FDR — are correctness surface, not bench
    # shapes; AA and bitmap-distinct are the data-plane members)
    "q_link_prediction_aa",
    "q_bitmap_distinct",
    "q_acf_hourly",
    "q_corpus_mixture",
    "q_rrf_fusion",
    "q_binaryfile_source",
    "q_impute_missing",
    "q_referential_integrity",
    "q_ann_recall",
    "q_weighted_median",
    "q_decay_engagement",
    "q_top_p_cut",
    "q_ols_slope",
    # round-9: as-of enrichment / linkage scoring / sketch-merge /
    # Avro block (q_stream_tws_ttl_counts excluded: the proc-time
    # drain harness is poll-bound, not a data-plane shape)
    "q_scd2_asof_enrich",
    "q_jaro_winkler_linkage",
    "q_rolling_mau_sketch",
    "q_avro_source",
    "q_avro_payload_decode",
    # round-9 b-e: selection/prep/analytics block (q_udtf_ngrams and
    # q_sql_variables excluded: API-surface pins, not data-plane
    # shapes; q_sprt_stopping excluded: one keyed window, sub-second)
    "q_dsir_importance",
    "q_quantile_normalize",
    "q_theil_index",
    "q_t_closeness",
    "q_flesch_readability",
    "q_isotonic_calibration",
    "q_holt_forecast",
    "q_nelson_aalen",
    "q_hurst_exponent",
    "q_best_split_infogain",
    # round-9 g-l: the data-plane-shaped members (the pure stats pins
    # — Kruskal, Wilcoxon, Kendall, Levene, log-rank, jackknife — are
    # sub-second 1-row reductions, correctness surface not bench
    # shapes; collation/mergeSchema/_metadata are API pins)
    "q_naive_bayes",  # explode + vocab-keyed scoring join
    "q_item_item_cosine",  # capped co-purchase pair explode
    "q_silhouette",  # posexplode centroids + broadcast distance scan
    "q_spearman_corr",  # two distinct-value tie tables + joins back
    "q_stationary_distribution",  # five matrix-squaring joins
    "q_classical_decomposition",  # hourly rollup + 2x24 MA windows
    "q_gaussian_em",  # 4 unrolled E/M rounds (iterative ML shape)
    "q_bradley_terry",  # 3 unrolled gradient rounds over pair duels
    "q_repeated_ngram_scrub",  # explode + gram shuffle + bounded window
    "q_cogroup_asof",  # co-partitioned dual shuffle + per-key pandas
    # round-10 session 2: the data-plane-shaped members of the AF-BA
    # batches (queueing/SQL-pin/scalar-surface/1-row stats excluded:
    # k-row grids and API pins, not bench shapes)
    "q_davies_bouldin",  # posexplode centroids + broadcast scatter scan
    "q_capm_beta",  # 4-way join + partitioned lags + moment agg
    "q_anderson_darling",  # _dist_rank + pinned-CDF term scan
    "q_fleiss_kappa",  # 3x vote explode + two keyed groupBys
    "q_breusch_pagan",  # two scans with coefficient broadcast between
    "q_yules_k",  # token explode + count-of-counts
    "q_delta_method_ratio",  # customer rollup + decimal cross-moments
    "q_croston",  # per-part partitioned ranks + closed-form SES sums
    "q_xyz_classification",  # part-month rollup + CV classes
    "q_kde_grid",  # 21x fan-out collapsed map-side
    "q_corr_matrix",  # one wide decimal-moment aggregate
    "q_ams_f2",  # 16x sign fan-out collapsed map-side
    "q_two_nn_intrinsic_dim",  # label-blocked NN pair join
    "q_huber_m",  # 3 broadcast-iterate IRLS scans
    "q_median_ci",  # _dist_rank order-statistic pick
    "q_revenue_retention",  # customer-month rollup + partitioned lags
    "q_assoc_measures2",  # basket self-join on bounded brand space
]


def _bench_streaming_incremental(spark, sf_dir: str, timings: dict) -> None:
    """Per-trigger cost with a PERSISTENT checkpoint: run the tumbling
    aggregation once (cold, whole source), drop a small new batch into
    the source directory, run again — the second number is what one
    production trigger over new-data-only costs, versus the replay
    numbers above. Reported, excluded from the headline total."""
    import os
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from kcore_spark.catalog import normalize_event_ts
    from kcore_spark.streaming.ops import run_to_table_with_ckpt

    work = tempfile.mkdtemp(prefix="kcore_bench_inc_")
    src = os.path.join(work, "src")
    os.makedirs(src)
    os.symlink(
        os.path.join(sf_dir, "events.parquet"), os.path.join(src, "events.parquet")
    )
    static = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))

    def agg_stream():
        s = normalize_event_ts(
            spark.readStream.schema(static.schema).parquet(src)
        ).withWatermark("ts", "1 hour")
        return s.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
            F.count(F.lit(1)).alias("n")
        )

    ckpt = os.path.join(work, "ckpt")
    t0 = time.time()
    run_to_table_with_ckpt(agg_stream(), ckpt, "bench_inc", "complete").collect()
    timings["q_stream_tumbling_counts_persist_cold"] = round(time.time() - t0, 3)
    # a new ~1% batch arrives
    static.limit(max(static.count() // 100, 1)).write.mode("overwrite").parquet(
        os.path.join(work, "newbatch")
    )
    for f in os.listdir(os.path.join(work, "newbatch")):
        if f.endswith(".parquet"):
            shutil.copy(
                os.path.join(work, "newbatch", f), os.path.join(src, f"new_{f}")
            )
    t0 = time.time()
    run_to_table_with_ckpt(agg_stream(), ckpt, "bench_inc", "complete").collect()
    timings["q_stream_tumbling_counts_incremental"] = round(time.time() - t0, 3)
    shutil.rmtree(work, ignore_errors=True)


def _warm_tws(spark) -> None:
    """First-use initialization of the transformWithState machinery
    (RocksDB provider JNI load, Python state-server runner classes,
    and — measured r9 — the eventTime/timer infrastructure, which
    is NOT touched by a timeMode='none' run) is a one-time JVM cost
    of 10-20s; warm it on a 3-row EVENT-TIME stream with a watermark
    so the TWS extras measure the operators, not first-use setup —
    the same policy as the JVM/parquet warm-ups above. (r9: the old
    timeMode='none' warm-up left ~15s of timer-path init to land on
    whichever TWS extra ran first.)"""
    import datetime
    import tempfile

    from kcore_spark.streaming.ops import run_tws_to_table
    from kcore_spark.streaming.tws import make_session_processor, tws_usable

    if not tws_usable(spark):
        return
    d = tempfile.mkdtemp(prefix="kcore_bench_twswarm_")
    t0 = datetime.datetime(2024, 1, 1)
    spark.createDataFrame(
        [
            (1, t0),
            (1, t0 + datetime.timedelta(hours=2)),
            (2, t0),
        ],
        "user_id long, ts timestamp",
    ).write.mode("overwrite").parquet(d)
    s = (
        spark.readStream.schema("user_id long, ts timestamp")
        .parquet(d)
        .withWatermark("ts", "30 minutes")
    )
    out = s.groupBy("user_id").transformWithStateInPandas(
        make_session_processor()(),
        outputStructType="user_id long, start_ms long, end_ms long, n_events long",
        outputMode="append",
        timeMode="eventTime",
    )
    run_tws_to_table(out, "append", state_partitions=2)


def default_detail_path() -> str:
    """Default destination for the full-detail artifact.

    Round-stamped (r12 VERDICT "what's wrong" #4) AND cpu-stamped
    (r13 VERDICT "what's wrong" #5): the driver and judge run bench.py
    with no env set, and a fixed tracked filename meant every such run
    dirtied the committed BENCH_DETAIL.json; the r13 round-only stamp
    then let the driver's lower-core scaling rerun overwrite the same
    round's 32-core detail, muddling provenance. The default is now
    BENCH_DETAIL_r{N}_c{cpus}.json (N = current round from the
    driver's PROGRESS.jsonl, last line; cpus = the SPARK_GRAFT_CPUS
    contract value), which is gitignored — so a driver-shaped run
    leaves `git status` clean and each run's detail is attributable to
    its (round, cpus). The builder's closing gates refresh the
    committed BENCH_DETAIL.json explicitly via BENCH_DETAIL_PATH.
    Falls back to BENCH_DETAIL.json if PROGRESS.jsonl is
    absent/unparseable (e.g. a bare checkout).
    """
    import json as _json

    repo = os.path.dirname(os.path.abspath(__file__))
    try:
        with open(os.path.join(repo, "PROGRESS.jsonl"), "rb") as f:
            last = f.read().strip().splitlines()[-1]
        rnd = int(_json.loads(last)["round"])
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
        return os.path.join(repo, f"BENCH_DETAIL_r{rnd:02d}_c{cpus}.json")
    except Exception:
        return os.path.join(repo, "BENCH_DETAIL.json")


def build_output_lines(
    timings: dict,
    total: float,
    sf: float,
    load_start=(0.0, 0.0, 0.0),
    errors: dict | None = None,
    detail_name: str = "BENCH_DETAIL.json",
) -> tuple[str, str]:
    """(full, compact) JSON lines. The COMPACT one is printed LAST.

    Contract (pinned by tests/test_bench_output.py): the driver keeps a
    ~2,000-char stdout tail and json-parses the last line, so the final
    line must stay well under that even as the extras list grows — it
    carries the headline total + HEADLINE-only per-query timings (24
    fixed names); the full ~170-query dict goes to the `full` line
    (earlier stdout + BENCH_DETAIL.json)."""
    import json as _json
    import os as _os

    full = _json.dumps(
        {
            "metric": "headline_queries_total",
            "value": total,
            "unit": "sec",
            "queries": timings,
            "sf": sf,
            # headline = min of 2 runs per query (extras stay
            # single-run); loadavg lets a reviewer attribute any
            # outlier to machine load rather than a code change
            "runs_per_headline_query": 2,
            "loadavg_start": [round(x, 2) for x in load_start],
            "loadavg_end": [round(x, 2) for x in _os.getloadavg()],
            "errors": errors or {},
        }
    )
    compact_obj = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": {k: timings[k] for k in HEADLINE if k in timings},
        "sf": sf,
        "n_queries": len(timings),
        "detail": detail_name,
    }
    if errors:  # a partial total must be visibly partial
        compact_obj["n_errors"] = len(errors)
    compact = _json.dumps(compact_obj)
    return full, compact


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark("kcore_spark_bench")
    # Warm the JVM (classloading, codegen compiler, parquet reader and
    # decimal-aggregate codepaths) with trivial jobs so per-query
    # timings measure the queries, not first-use initialization.
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).selectExpr(
        "sum(cast(r_regionkey as decimal(15,2)))"
    ).collect()
    try:
        _warm_tws(spark)
    except Exception:
        pass  # a warm-up failure surfaces in the TWS extras' own timings
    qs = all_queries()
    # Untimed throwaway of the first headline query (r12 VERDICT nit
    # #5): the trivial warm-up jobs above don't reach the decimal-agg /
    # wide-lineitem codegen paths q01 exercises, so q01's first timed
    # pass was absorbing JVM warmup and swinging 2x across idle runs.
    # One full untimed execution kills that noise class; min-of-2 below
    # then measures the query, not first-use initialization.
    try:
        if HEADLINE and HEADLINE[0] in qs:
            qs[HEADLINE[0]].spark(spark, sf_dir).collect()
            release_transients()
    except Exception:
        pass  # a real failure will surface (timed + recorded) in the loop
    load_start = os.getloadavg()
    timings: dict[str, float] = {}
    # Load robustness (r6 VERDICT #5: a loaded machine produced a
    # phantom 26% "regression"): each headline query runs TWICE and the
    # MIN is reported — a transient load spike cannot inflate both
    # passes, so the headline total reproduces within ~10% of an idle
    # run. The loadavg fields below let any remaining outlier be
    # attributed to machine load instead of a code change.
    errors: dict[str, str] = {}
    for name in HEADLINE:
        if name not in qs:
            continue
        best = None
        try:
            for _ in range(2):
                t0 = time.time()
                df = qs[name].spark(spark, sf_dir)
                df.collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                # per-query persisted intermediates have served their
                # purpose once the collect returns; releasing them keeps
                # executor storage flat across the run (the session-scoped
                # shingle table is exempt — shared by the dedup family)
                release_transients()
        except Exception as e:  # one flaky query must not cost the round's
            # whole bench record (the driver parses the final line only
            # if the process reaches it) — record and continue
            errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
            release_transients()
            if best is None:
                continue
        timings[name] = round(best, 3)
    total = round(sum(timings.values()), 3)
    # Streaming cold numbers include one-off checkpoint creation +
    # source discovery; a same-JVM second run isolates the operator
    # cost (VERDICT r2 #9). Reported alongside, excluded from total so
    # round-over-round totals stay comparable.
    for name in ("q_stream_tumbling_counts",):
        if name in qs:
            try:
                t0 = time.time()
                qs[name].spark(spark, sf_dir).collect()
                timings[f"{name}_warm"] = round(time.time() - t0, 3)
            except Exception as e:
                errors[f"{name}_warm"] = f"{type(e).__name__}: {str(e)[:200]}"
    try:
        _bench_streaming_incremental(spark, sf_dir, timings)
    except Exception as e:
        errors["streaming_incremental"] = f"{type(e).__name__}: {str(e)[:200]}"
    # Round-4/5 operators: reported for visibility, excluded from the
    # headline total (same reason — the total must stay comparable to
    # earlier rounds' 24-query set).
    # The two streaming-session extras carry a large, order-dependent
    # share of streaming-infra setup (whichever runs first in a session
    # pays it — measured r9: first TWS run 25.6s, second 8.6s on an
    # idle box); min-of-2 makes their numbers attributable to the
    # operator, the same load-robustness policy as the headline loop.
    MIN_OF_2_EXTRAS = {"q_stream_timeout_sessions", "q_stream_tws_sessions"}
    for name in EXTRAS:
        if name in qs:
            runs = 2 if name in MIN_OF_2_EXTRAS else 1
            best = None
            try:
                for _ in range(runs):
                    t0 = time.time()
                    qs[name].spark(spark, sf_dir).collect()
                    dt = time.time() - t0
                    best = dt if best is None else min(best, dt)
            except Exception as e:  # same fault isolation as the headline loop
                errors[name] = f"{type(e).__name__}: {str(e)[:200]}"
                release_transients()
                if best is None:
                    continue
            timings[f"{name}_extra"] = round(best, 3)
            # same per-query release as the headline loop: without it,
            # ~40 extras accumulate persisted intermediates and the
            # LATE extras pay for all of them (measured: q_kmeans_lloyd
            # 29.4s polluted vs 2.3s isolated at sf0.1 — the same
            # in-session accumulation the scaling harness hit)
            release_transients()
    # The driver keeps only a ~2,000-char tail of stdout and parses the
    # LAST line — the full per-query dict (~170 timings, >20 KB) overflows
    # that capture and has made BENCH_r07..r10 record parsed:null. So:
    # full detail goes to a detail artifact (and an EARLY stdout line for
    # the transcript); the FINAL line is a compact summary — headline
    # total + headline-only per-query timings — sized to fit the tail.
    # BENCH_DETAIL_PATH overrides the destination (the builder's closing
    # gates point it at the committed BENCH_DETAIL.json); the DEFAULT is
    # the round-stamped gitignored name so a no-env driver/judge run
    # leaves git status clean (r12 VERDICT "what's wrong" #4).
    detail_path = os.environ.get("BENCH_DETAIL_PATH") or default_detail_path()
    full, compact = build_output_lines(
        timings, total, float(sf), load_start, errors,
        detail_name=os.path.basename(detail_path),
    )
    try:
        with open(detail_path, "w") as f:
            f.write(full + "\n")
    except OSError:
        pass  # read-only checkout: the early stdout line still carries it
    # stop Spark BEFORE printing: executor/StateStore shutdown WARNs
    # land on stdout in some JVM configs and must not trail the JSON
    # line (the driver parses the LAST stdout line — BENCH_r09.json
    # recorded parsed: null because a StateStore WARN printed after it)
    spark.stop()
    sys.stdout.flush()
    print(full)
    print(compact)
    sys.stdout.flush()


if __name__ == "__main__":
    main()
