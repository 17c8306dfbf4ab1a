"""Schema-drift pin for the events fixture's ts encoding.

The fixture generator has already shipped ``events.ts`` in two parquet
encodings (TIMESTAMP(NANOS) → read as long under ``nanosAsLong``, and
timestamp[us] → TIMESTAMP_NTZ); a third (timestamp[us] UTC-adjusted →
TIMESTAMP) is one generator flag away. Round 3's bench crash happened
because two code sites baked in the first encoding while the fixtures
moved to the second — this test makes the next fixture regeneration a
red pytest instead of a silent driver-bench abort.

Every events-consuming query must (a) analyze and (b) produce identical
event-time values against ALL THREE encodings, because the engine
funnels the type decision through ``catalog.normalize_event_ts``.
"""

from __future__ import annotations

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

from .conftest import SF_DIR

ENCODINGS = {
    "int64_ns": pa.timestamp("ns"),
    "us_ntz": pa.timestamp("us"),
    "us_utc": pa.timestamp("us", tz="UTC"),
}

OTHER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "documents",
    "embeddings",
)

# every registered query that reads the events table
BATCH_EVENTS_QUERIES = (
    "q_events_json_props",
    "q_events_props_map",
    "q_events_corrupt_json",
    "q_events_variant",
    "q_events_tumbling_1h",
    "q_events_sliding_10m",
    "q_events_sessions",
    "q_events_enriched",
    "q_events_dedup_first",
    # round-4 events consumers: funnel + resample must survive any
    # fixture ts encoding too
    "q_funnel_conversions",
    "q_resample_hourly_ffill",
)


@pytest.fixture(scope="module", params=sorted(ENCODINGS))
def drift_dir(request):
    """A full sf-dir whose events.parquet uses one target ts encoding;
    all other tables symlinked from the tiny fixture dir."""
    enc = request.param
    d = tempfile.mkdtemp(prefix=f"kcore_drift_{enc}_")
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    idx = t.schema.get_field_index("ts")
    ts = t.column("ts").cast(ENCODINGS[enc])
    t = t.set_column(idx, pa.field("ts", ENCODINGS[enc]), ts)
    pq.write_table(t, os.path.join(d, "events.parquet"))
    for name in OTHER_TABLES:
        os.symlink(os.path.join(SF_DIR, f"{name}.parquet"), os.path.join(d, f"{name}.parquet"))
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ts_checksum(df) -> tuple[int, int]:
    row = df.select(
        F.sum(F.unix_timestamp("ts")).alias("s"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    return int(row["s"]), int(row["n"])


def test_normalized_type_and_values_identical(spark, drift_dir):
    """load_table yields session-TZ TIMESTAMP with identical epoch values
    for every encoding (the normalize_event_ts contract)."""
    from kcore_spark.catalog import load_table

    ref = load_table(spark, SF_DIR, "events")
    df = load_table(spark, drift_dir, "events")
    assert isinstance(df.schema["ts"].dataType, TimestampType)
    assert _ts_checksum(df) == _ts_checksum(ref)


def test_batch_events_queries_analyze(spark, drift_dir):
    """Every batch events query must pass analysis against the encoding
    (schema access forces analysis; no execution needed)."""
    from kcore_spark.queries import all_queries

    qs = all_queries()
    for name in BATCH_EVENTS_QUERIES:
        df = qs[name].spark(spark, drift_dir)
        assert len(df.schema.fields) > 0, name


def test_sessionize_executes(spark, drift_dir):
    from kcore_spark.catalog import load_table
    from kcore_spark.operators.relational import sessionize

    ev = load_table(spark, drift_dir, "events")
    out = sessionize(ev, "user_id", "ts", 1800, "event_id")
    assert out.where(F.col("session_id") >= 1).count() == ev.count()


def test_streaming_pipeline_analyzes_and_runs(spark, drift_dir):
    """The streaming source must analyze with a watermark + window agg
    for every encoding, and one full availableNow replay must agree
    with the batch count."""
    from kcore_spark.catalog import load_table
    from kcore_spark.streaming.ops import events_stream, run_to_table

    s = events_stream(spark, drift_dir).withWatermark("ts", "1 hour")
    agg = s.groupBy(F.window("ts", "1 hour"), "event_type").agg(F.count(F.lit(1)).alias("n"))
    assert len(agg.schema.fields) == 3  # analysis succeeded

    total = run_to_table(agg, "complete").select(F.sum("n").alias("t")).collect()[0]["t"]
    assert total == load_table(spark, drift_dir, "events").count()
