#!/usr/bin/env python3
"""Time a subset of registered queries in isolation (bench methodology:
same warm-up, min-of-N collect timing, release_transients between).

Usage: python scripts/time_queries.py [--runs N] [name...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from kcore_spark.caching import release_transients
from kcore_spark.queries import all_queries
from kcore_spark.session import get_spark


def main() -> int:
    args = sys.argv[1:]
    runs = 2
    if args and args[0] == "--runs":
        runs = int(args[1])
        args = args[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("kcore_time_queries")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "region.parquet")).selectExpr(
        "sum(cast(r_regionkey as decimal(15,2)))"
    ).collect()
    qs = all_queries()
    total = 0.0
    for name in args:
        if name not in qs:
            print(f"SKIP {name}")
            continue
        best = None
        for _ in range(runs):
            t0 = time.time()
            try:
                qs[name].spark(spark, sf_dir).collect()
            except Exception as e:
                print(f"ERR {name}: {type(e).__name__}: {str(e)[:200]}")
                best = None
                break
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
            release_transients()
        if best is not None:
            total += best
            print(f"{best:8.3f}  {name}")
        sys.stdout.flush()
    print(f"{total:8.3f}  TOTAL")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
