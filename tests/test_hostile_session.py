"""Queries must be correct in a session the engine didn't configure —
the driver's verify harness builds its own SparkSession (unknown
timezone, no legacy-parquet confs). ensure_engine_confs() is the
guard; this test would catch its removal."""

from __future__ import annotations

from kcore_spark.queries import all_queries
from kcore_spark.testing import compare, duckdb_connection

from .conftest import SF_DIR


def test_events_queries_survive_foreign_session(spark):
    # newSession(): same JVM context, independent SQLConf — simulate a
    # harness session with a hostile timezone and no engine confs.
    s2 = spark.newSession()
    s2.conf.set("spark.sql.session.timeZone", "America/New_York")
    s2.conf.unset("spark.sql.legacy.parquet.nanosAsLong")

    qs = all_queries()
    con = duckdb_connection(SF_DIR)
    for name in ["q_events_tumbling_1h", "q_events_dedup_first", "q_date_funcs"]:
        spec = qs[name]
        r = compare(name, spec.spark(s2, SF_DIR), spec.oracle, con)
        assert r.ok, r.diff_summary()
