#!/usr/bin/env python3
"""Per-batch breakdown of the two streaming-session bench extras
(VERDICT r10 #5: get both ≤8s under load by amortizing setup).

Attaches a StreamingQueryListener, runs each query N times, and prints
per-run wall time plus per-micro-batch durationMs split into the
engine's own phases (addBatch/getBatch/walCommit/stateStore commit),
so setup share vs operator share is attributable.

Usage: python scripts/bench_tws_breakdown.py [sf_dir] [n_runs]
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql.streaming import StreamingQueryListener

from kcore_spark.queries import all_queries
from kcore_spark.testing import shared_spark


class _Capture(StreamingQueryListener):
    def __init__(self):
        self.batches: list[dict] = []

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = json.loads(event.progress.json)
        self.batches.append(
            {
                "batchId": p.get("batchId"),
                "numInputRows": p.get("numInputRows"),
                "durationMs": p.get("durationMs", {}),
                "stateOperators": [
                    {
                        k: so.get(k)
                        for k in (
                            "operatorName",
                            "commitTimeMs",
                            "numRowsTotal",
                            "numStateStoreInstances",
                        )
                    }
                    for so in p.get("stateOperators", [])
                ],
            }
        )

    def onQueryIdle(self, event):
        pass

    def onQueryTerminated(self, event):
        pass


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = shared_spark()
    # same warm-ups as bench.py so run 1 is comparable to a bench run
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    import bench

    bench._warm_tws(spark)
    cap = _Capture()
    spark.streams.addListener(cap)
    qs = all_queries()
    import os

    for name in ("q_stream_timeout_sessions", "q_stream_tws_sessions"):
        for run in range(n_runs):
            cap.batches.clear()
            t0 = time.time()
            qs[name].spark(spark, sf_dir).collect()
            wall = time.time() - t0
            # progress events arrive on the py4j callback thread; give
            # the final batch's event time to land before reading/clearing
            time.sleep(1.0)
            print(f"\n=== {name} run {run}: {wall:.2f}s  loadavg={os.getloadavg()[0]:.1f}")
            for b in cap.batches:
                d = b["durationMs"]
                so = b["stateOperators"][0] if b["stateOperators"] else {}
                print(
                    f"  batch {b['batchId']}: rows={b['numInputRows']} "
                    f"triggerExec={d.get('triggerExecution')} addBatch={d.get('addBatch')} "
                    f"getBatch={d.get('getBatch')} latestOffset={d.get('latestOffset')} "
                    f"walCommit={d.get('walCommit')} commitOffsets={d.get('commitOffsets')} "
                    f"stateCommit={so.get('commitTimeMs')} stores={so.get('numStateStoreInstances')}"
                )
            batch_total = sum(
                b["durationMs"].get("triggerExecution", 0) for b in cap.batches
            )
            print(f"  sum(triggerExecution)={batch_total/1000:.2f}s  "
                  f"outside-batches={wall - batch_total/1000:.2f}s")
    spark.stop()


if __name__ == "__main__":
    main()
