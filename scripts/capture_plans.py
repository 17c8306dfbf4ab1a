#!/usr/bin/env python3
"""Capture .explain('formatted') for named queries into plans/<tag>/.

Usage: python scripts/capture_plans.py <tag> <suffix> <name...>
  tag     e.g. r13        -> plans/r13/
  suffix  before|after    -> <name>_<suffix>.txt

Plans are captured at the bench scale factor ($SPARK_GRAFT_SF_DIR,
default sf0.1) so PushedFilters/row-count hints match what the bench
runs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, "/root/repo")

from kcore_spark.queries import all_queries
from kcore_spark.testing import shared_spark


def main() -> int:
    tag, suffix = sys.argv[1], sys.argv[2]
    names = sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join("/root/repo/plans", tag)
    os.makedirs(out_dir, exist_ok=True)
    spark = shared_spark()
    qs = all_queries()
    for name in names:
        if name not in qs:
            print(f"SKIP {name}: not registered")
            continue
        try:
            df = qs[name].spark(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as e:
            print(f"ERR {name}: {type(e).__name__}: {str(e)[:200]}")
            continue
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(plan)
        n_exch = plan.count("Exchange")
        print(f"wrote {path}  [Exchange x{n_exch}]")
        from kcore_spark.caching import release_transients

        release_transients()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
