#!/usr/bin/env python3
"""Scaling-curve bench (VERDICT r2 #4): run the headline queries at
sf0.01, sf0.1 and a derived 10× set ("sf1", scripts/make_scale_data.py)
and report per-query time ratios. With fixtures only spanning 100×,
the curve — not an absolute number — is the evidence that the plans
hold: a query whose 0.1→1 ratio is ≈10 (or less, where fixed overhead
dominates) scales linearly in data volume; anything super-linear is a
plan that would not survive 100 TB.

Writes SCALING.md and prints it.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "scripts"))

from make_scale_data import ensure

from kcore_spark.queries import all_queries
from kcore_spark.session import get_spark

from bench import EXTRAS, HEADLINE  # same sets as the driver bench

SFS = [
    ("0.01", "/root/testdata/sf0.01"),
    ("0.1", "/root/testdata/sf0.1"),
]


FOOTNOTES = """
q_fellegi_sunter is excluded from the derived-sf1 sweep for the same
reason as q_fuzzy_blocked_match (see skip_at_scale in
scripts/bench_scaling.py): its blocking key is nation (25 fixed
values), so the 10x derivation makes every block 10x and the TRUTH —
within-block pairs — grows 100x (measured once: 156s, ~77x wall). In
production the remedy is a higher-cardinality block key or the r6
sub-bucket salting (operators/text.py::blocked_fuzzy_pairs), both of
which change the pair set by design; the fixture's degenerate key is
what is quadratic, not the plan.

The round-8 sweep also caught (and we fixed) a real scale bug in
q_chi2_feature_select: (ad-bc)^2 overflowed int64 once cell counts
crossed ~2e9 — the statistic now moves to DOUBLE immediately after
the exact integer counts on both engines.

Round-8c rows worth a note: q_kaplan_meier's final fold is over the
DISTINCT-duration array (domain-bounded, not corpus-bounded), so its
curve flattens; q_bpe_learn's rounds run over the distinct-word
table, which the derived fixture grows 10x by construction (disjoint
per-copy vocabulary) — real corpora grow vocabulary sub-linearly
(Heaps' law), so the measured ratio is an upper bound."""


def main() -> None:
    sf1_dir = ensure(10)
    sfs = SFS + [("1 (derived 10x)", sf1_dir)]
    spark = get_spark("kcore_spark_scaling")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
    qs = all_queries()
    times: dict[str, dict[str, float]] = {}
    # Excluded from the derived-sf1 sweep: ops whose cost is quadratic
    # in a BLOCK whose size grows with the data because the fixture's
    # blocking key is degenerate (8 nouns). The operator is bounded by
    # key choice in production (see operators/text.py docstring); a
    # 10x fixture makes every block 10x → 100x pairs, which would read
    # as super-linear when it is the key, not the plan, that is wrong.
    skip_at_scale = {
        "q_fuzzy_blocked_match",
        # q_fuzzy_clusters left IN the sweep as of r9: the rewrite
        # verifies over the DISTINCT-NAME domain (constant 64 names in
        # the derived fixture — key-shifted copies keep p_name verbatim),
        # so the quadratic verify no longer grows with rows and the
        # query should now curve linear. The row-pair variant above
        # stays skipped (its candidate set is row-quadratic by design).
        # q_semantic_clusters un-skipped as of r10: the derived fixture
        # now PERTURBS cross-copy embedding vectors (deterministic
        # hash-seeded 50/50 blend, cross-copy cosine ~0.3 — see
        # make_scale_data.py), so embedding-family near-dup TRUTH is
        # linear in corpus size and the whole family gets real curves.
        # same degenerate-blocking-key argument: nation (25 fixed values)
        # blocks grow 10x under the derivation -> within-block pair TRUTH
        # grows 100x (measured 77x wall, SCALING.md round-8 note)
        "q_fellegi_sunter",
    }
    measured = HEADLINE + [n for n in EXTRAS if n in qs and n not in skip_at_scale]
    from kcore_spark.caching import release_transients

    for label, d in sfs:
        # fresh executor state per tier: a ~200-collect single session
        # accumulates cached blocks / catalog state / GC debt that
        # lands on whichever queries run LAST — the r8 sweep mis-read
        # three late-order linear queries as super-linear (18x wall
        # inflation, reproduced nowhere in a fresh session) until this
        # isolation; per-query release_transients drops each query's
        # own persisted intermediates the moment it finishes
        spark.stop()
        spark = get_spark("kcore_spark_scaling")
        spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warm
        # Sources that stage a one-time per-session fixture copy
        # (sources_q._stage caches per (sf_dir, fmt)) get one untimed
        # run so the curve measures the OPERATOR, not fixture staging:
        # q_binaryfile_source writes one tiny file per sampled doc, and
        # at the derived sf1 that staging read as a phantom 15.9x
        # super-linear flag (r9; operator itself re-measured 1.7s).
        for name in ("q_binaryfile_source", "q_avro_source"):
            if name in qs:
                qs[name].spark(spark, d).collect()
                release_transients()
        for name in measured:
            t0 = time.time()
            qs[name].spark(spark, d).collect()
            times.setdefault(name, {})[label] = round(time.time() - t0, 2)
            release_transients()
            spark.catalog.clearCache()
    lines = [
        "# Scaling curve — headline + extra operators at sf0.01 / sf0.1 / sf1 (derived 10x)",
        "",
        "sf1 is a deterministic 10x derivation of sf0.1 (key-shifted copies,",
        "per-copy disjoint document vocabulary, hash-perturbed embedding",
        "copies so near-dup truth stays linear — scripts/make_scale_data.py);",
        "correctness is still gated exclusively on the driver's fixtures.",
        "`x 0.1->1` is the wall-clock ratio for 10x the data: ~10 or below",
        "(fixed overhead amortizing) = linear; materially above 10 = super-",
        "linear, flagged.",
        "",
        "| query | sf0.01 | sf0.1 | sf1 | x 0.1->1 | verdict |",
        "|---|---|---|---|---|---|",
    ]
    flagged = []
    for name in measured:
        t001, t01 = times[name]["0.01"], times[name]["0.1"]
        t1 = times[name]["1 (derived 10x)"]
        ratio = t1 / t01 if t01 > 0 else float("inf")
        # linear in data with some amortized overhead; leave headroom
        # before calling a query super-linear (timer noise at seconds)
        verdict = "linear" if ratio <= 12.0 else "SUPER-LINEAR"
        if verdict != "linear":
            flagged.append(name)
        lines.append(
            f"| {name} | {t001:.2f}s | {t01:.2f}s | {t1:.2f}s | {ratio:.1f}x | {verdict} |"
        )
    totals = {
        lbl: round(sum(times[n][lbl] for n in measured), 1) for lbl, _ in sfs
    }
    lines += [
        "",
        f"Totals: sf0.01 {totals['0.01']}s · sf0.1 {totals['0.1']}s · "
        f"sf1 {totals['1 (derived 10x)']}s "
        f"(x{totals['1 (derived 10x)'] / totals['0.1']:.1f} for 10x data).",
        "",
        f"Super-linear queries: {', '.join(flagged) if flagged else 'none'}.",
        FOOTNOTES,
    ]
    out = "\n".join(lines) + "\n"
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "SCALING.md"), "w") as f:
        f.write(out)
    print(out)
    print(json.dumps({"totals": totals, "flagged": flagged}))
    spark.stop()


if __name__ == "__main__":
    main()
