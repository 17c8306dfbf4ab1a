#!/usr/bin/env python3
"""Dev loop: run every registered query against its DuckDB oracle.

Usage: python scripts/check_oracle.py [sf_dir] [name_filter...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from kcore_spark.queries import all_queries
from kcore_spark.testing import compare, duckdb_connection, shared_spark, show_diff


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    filters = sys.argv[2:]
    spark = shared_spark()
    con = duckdb_connection(sf_dir)
    qs = all_queries()
    failed = []
    for name, spec in qs.items():
        if filters and not any(f in name for f in filters):
            continue
        t0 = time.time()
        try:
            df = spec.spark(spark, sf_dir)
            if spec.oracle is None:
                n = df.count()
                from kcore_spark.caching import release_transients

                release_transients()
                print(f"  rows-only {name}: {n} rows  [{time.time()-t0:.1f}s]")
                continue
            res = compare(name, df, spec.oracle, con)
            status = "OK " if res.ok else "FAIL"
            print(f"  {status} {name}: {res.rows_spark} rows  [{time.time()-t0:.1f}s]")
            if not res.ok:
                failed.append(name)
                print("    " + res.diff_summary())
                show_diff(spec.spark(spark, sf_dir), spec.oracle, con, n=3)
        except Exception as e:
            failed.append(name)
            print(f"  ERR {name}: {type(e).__name__}: {str(e)[:300]}")
    print(f"\n{len(failed)} failures: {failed}" if failed else "\nall OK")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
