"""Regression test for the CORRECTNESS_r08 TWS failures: the driver
harness builds a bare SparkSession FIRST and only then imports this
repo. In that ordering the JVM captured its environment before
``kcore_spark.vendor.ensure_protobuf`` could export the protoshim dir
onto ``$PYTHONPATH``, so the separate "TWS driver worker" process the
JVM spawns for ``transformWithStateInPySpark`` cannot import
``google.protobuf`` and crashes the streaming query
(``TransformWithStateInPySpark driver worker exited unexpectedly``).

``tws_usable(spark)`` (kcore_spark/streaming/tws.py) is the fix: in
shim mode it requires the shim dir in the JVM's *captured*
``PYTHONPATH`` and otherwise routes the query to the
applyInPandasWithState fold — the identical state machine. This test
reproduces the exact driver shape in a subprocess (pytest's own
session imports the repo first, so it can never see the bug
in-process) and asserts the query now completes AND matches its
DuckDB oracle."""

from __future__ import annotations

import os
import subprocess
import sys
import textwrap

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = textwrap.dedent(
    """
    import os, sys

    # 1) bare SparkSession BEFORE any repo import — the driver's ordering
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )

    # 2) only now import the repo (this runs ensure_protobuf, too late
    #    for the already-launched JVM)
    sys.path.insert(0, os.environ["KCORE_REPO"])
    from kcore_spark.streaming.tws import HAVE_TWS, tws_usable
    from kcore_spark.queries.streaming import q_stream_tws_type_counts

    import google.protobuf as _pb
    from kcore_spark.vendor import _SHIM_DIR

    shim_mode = (_pb.__file__ or "").startswith(_SHIM_DIR)
    if shim_mode:
        # the gate must refuse the real bridge in this ordering
        assert not tws_usable(spark), "tws_usable must be False: JVM env lacks the shim"

    # 3) the query must run green regardless of which engine it picked
    sf = "/root/testdata/sf0.001"
    rows = sorted(
        (r.user_id, r.n_types, r.n_events, r.top_type)
        for r in q_stream_tws_type_counts(spark, sf).collect()
    )

    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM read_parquet('%s/events.parquet')" % sf
    )
    from kcore_spark.queries.streaming import Q_STREAM_TWS_TYPE_COUNTS_SQL

    exp = sorted(tuple(t) for t in con.execute(Q_STREAM_TWS_TYPE_COUNTS_SQL).fetchall())
    assert len(rows) == len(exp) and rows == exp, (rows[:3], exp[:3])
    print("DRIVER_ORDERING_OK", len(rows))
    spark.stop()
    """
)


def test_tws_query_survives_driver_session_ordering():
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the driver's env has no shim entry
    env["KCORE_REPO"] = REPO
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT],
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    assert "DRIVER_ORDERING_OK" in proc.stdout, proc.stdout[-2000:]
