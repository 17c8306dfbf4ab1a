#!/usr/bin/env python3
"""sf1 curves for the r12 prefix-sum rewrites (r12 VERDICT #6).

Round 12 moved the nine queries whose tie tables turned out to be
row/user-count-sized off single-partition global windows and onto the
distributed prefix-sum machinery (_dist_cumsum / _dist_rank_cumsum:
one range-repartition + a <=32-row per-partition offset broadcast).
SCALING.md measured the rewrites at sf0.01 -> sf0.1; this script adds
the sf1 (derived 10x) point to confirm the 32-way plans hold their
linear curves where the old single-partition sorts would have knee'd.

Appends (or replaces) a marker-delimited section at the end of
SCALING.md; the main bench_scaling.py sweep rewrites the file's head
and is re-run rarely, so the section is self-contained.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts")
)

from make_scale_data import ensure

from kcore_spark.caching import release_transients
from kcore_spark.queries import all_queries
from kcore_spark.session import get_spark

REWRITES = [
    "q_spearman_corr",
    "q_kruskal_wallis",
    "q_wilcoxon_signed_rank",
    "q_pr_auc",
    "q_auc_roc",
    "q_mood_median_test",
    "q_conover_squared_ranks",
    "q_time_to_convert",
    "q_sample_quantile_error",
]

MARK_BEGIN = "<!-- r13-rewrite-curves:begin -->"
MARK_END = "<!-- r13-rewrite-curves:end -->"


def main() -> None:
    sf1_dir = ensure(10)
    sfs = [
        ("0.01", "/root/testdata/sf0.01"),
        ("0.1", "/root/testdata/sf0.1"),
        ("1", sf1_dir),
    ]
    qs = all_queries()
    times: dict[str, dict[str, float]] = {}
    for label, d in sfs:
        # fresh session per tier, same isolation discipline as
        # bench_scaling.py (accumulated executor state lands on
        # whichever queries run last and fakes super-linearity)
        spark = get_spark("kcore_spark_scaling_rw")
        spark.range(1_000_000).selectExpr("sum(id)").collect()
        for name in REWRITES:
            t0 = time.time()
            qs[name].spark(spark, d).collect()
            times.setdefault(name, {})[label] = round(time.time() - t0, 2)
            release_transients()
            spark.catalog.clearCache()
        spark.stop()

    lines = [
        MARK_BEGIN,
        "",
        "## Round-13: sf1 curves for the r12 prefix-sum rewrites (VERDICT r12 #6)",
        "",
        "The nine queries moved onto _dist_cumsum/_dist_rank_cumsum in r12",
        "(their tie tables measured row/user-count-sized, so the old",
        "single-partition global windows were the scale hazard), re-measured",
        "with the sf1 point. `x 0.1->1` at ~10 or below = the 32-way",
        "distributed plan holds linear where a single-task sort would knee.",
        "",
        "| query | sf0.01 | sf0.1 | sf1 | x 0.1->1 | verdict |",
        "|---|---|---|---|---|---|",
    ]
    flagged = []
    for name in REWRITES:
        t001, t01, t1 = (times[name][k] for k in ("0.01", "0.1", "1"))
        ratio = t1 / t01 if t01 > 0 else float("inf")
        verdict = "linear" if ratio <= 12.0 else "SUPER-LINEAR"
        if verdict != "linear":
            flagged.append(name)
        lines.append(
            f"| {name} | {t001:.2f}s | {t01:.2f}s | {t1:.2f}s | {ratio:.1f}x | {verdict} |"
        )
    lines += [
        "",
        f"Super-linear rewrites: {', '.join(flagged) if flagged else 'none'}.",
        "",
        MARK_END,
    ]
    section = "\n".join(lines) + "\n"

    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md")
    with open(path) as f:
        doc = f.read()
    if MARK_BEGIN in doc:
        head = doc.split(MARK_BEGIN)[0]
        tail = doc.split(MARK_END)[-1]
        doc = head + section + tail.lstrip("\n")
    else:
        doc = doc.rstrip("\n") + "\n\n" + section
    with open(path, "w") as f:
        f.write(doc)
    print(section)
    if flagged:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
