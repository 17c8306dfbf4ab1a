"""transformWithState SessionProcessor — engine-contract unit tests.

The container lacks the protobuf wheel the tWS Python<->JVM bridge
needs (kcore_spark/streaming/tws.py docstring), so the processor is
driven here against a pure-Python fake of the engine's contract:
keyed named-state variables, one implicit key at a time, event-time
timers that fire when the WATERMARK passes them, multi-batch replay.
The assertions pin the processor to the batch-global fold — i.e. the
same invariant the sf0.01 oracle pins for the GroupState engine.
"""

from __future__ import annotations

import pandas as pd
import pytest

from kcore_spark.streaming.tws import (
    SESSION_GAP_MS,
    fold_sessions,
    make_session_processor,
)

GAP = SESSION_GAP_MS
MIN = 60 * 1000


class FakeValueState:
    def __init__(self, engine, name):
        self.engine, self.name = engine, name

    def _slot(self):
        return (self.name, self.engine.current_key)

    def exists(self):
        return self._slot() in self.engine.values

    def get(self):
        return self.engine.values.get(self._slot())

    def update(self, v):
        self.engine.values[self._slot()] = tuple(v)

    def clear(self):
        self.engine.values.pop(self._slot(), None)


class FakeHandle:
    def __init__(self, engine):
        self.engine = engine

    def getValueState(self, name, schema, ttlDurationMs=None):
        return FakeValueState(self.engine, name)

    def registerTimer(self, ts):
        self.engine.timers.setdefault(self.engine.current_key, set()).add(ts)

    def deleteTimer(self, ts):
        self.engine.timers.get(self.engine.current_key, set()).discard(ts)

    def listTimers(self):
        return iter(sorted(self.engine.timers.get(self.engine.current_key, set())))


class _TimerValues:
    def __init__(self, wm):
        self.wm = wm

    def getCurrentWatermarkInMs(self):
        return self.wm

    def getCurrentProcessingTimeInMs(self):
        return -1


class _ExpiredTimerInfo:
    def __init__(self, ts):
        self.ts = ts

    def getExpiryTimeInMs(self):
        return self.ts


class FakeTwsEngine:
    """Replays micro-batches through a StatefulProcessor the way the
    transformWithState operator does: per-key handleInputRows, then —
    once the watermark advances past a registered timer — per-key
    handleExpiredTimer. Watermark = max event time seen so far minus
    the delay, evaluated AFTER each batch (Spark updates the watermark
    at batch boundaries)."""

    def __init__(self, processor_cls, delay_ms):
        self.values: dict = {}
        self.timers: dict = {}
        self.current_key = None
        self.delay_ms = delay_ms
        self.watermark = -1
        self.proc = processor_cls()
        self.proc.init(FakeHandle(self))
        self.out: list[tuple] = []

    def _collect(self, it):
        for pdf in it or []:
            self.out.extend(map(tuple, pdf.itertuples(index=False)))

    def process_batch(self, pdf: pd.DataFrame):
        tv = _TimerValues(self.watermark)
        for uid, g in pdf.groupby("user_id"):
            self.current_key = (int(uid),)
            self._collect(self.proc.handleInputRows(self.current_key, iter([g]), tv))
        # watermark advances after the batch, then due timers fire
        self.watermark = max(self.watermark, int(pdf["ts"].astype("int64").max() // 1_000_000 - self.delay_ms))
        tv = _TimerValues(self.watermark)
        for key in list(self.timers):
            due = [t for t in self.timers.get(key, set()) if t <= self.watermark]
            for t in sorted(due):
                self.timers[key].discard(t)
                self.current_key = key
                self._collect(self.proc.handleExpiredTimer(key, tv, _ExpiredTimerInfo(t)))


def _pdf(rows):
    return pd.DataFrame(
        {
            "user_id": [r[0] for r in rows],
            "ts": pd.to_datetime([r[1] for r in rows], unit="ms", utc=True).tz_localize(None),
        }
    )


def _global_fold(events_ms_by_key):
    sessions = []
    for uid, ts in events_ms_by_key.items():
        closed, cur = fold_sessions(sorted(ts), None, GAP)
        sessions.extend((uid, c[0], c[1], c[2]) for c in closed)
        if cur is not None:
            sessions.append((uid, cur[0], cur[1], cur[2]))
    return sorted(sessions)


def test_fold_sessions_gap_boundary():
    # exactly GAP apart stays one session; GAP+1 splits
    closed, cur = fold_sessions([0, GAP], None, GAP)
    assert closed == [] and cur == [0, GAP, 2]
    closed, cur = fold_sessions([0, GAP + 1], None, GAP)
    assert closed == [(0, 0, 1)] and cur == [GAP + 1, GAP + 1, 1]


def test_fold_sessions_carries_open_session():
    closed, cur = fold_sessions([5 * MIN], [0, 0, 3], GAP)
    assert closed == [] and cur == [0, 5 * MIN, 4]


def test_session_processor_multi_batch_replay():
    T0 = 1_700_000_000_000
    ev = {
        1: [T0, T0 + 5 * MIN, T0 + 90 * MIN, T0 + 95 * MIN, T0 + 300 * MIN],
        2: [T0 + 2 * MIN, T0 + 200 * MIN, T0 + 201 * MIN],
    }
    engine = FakeTwsEngine(make_session_processor(GAP), delay_ms=30 * MIN)
    # three chronological batches (cut at 60m and 250m)
    batches = []
    for lo, hi in ((0, 60), (60, 250), (250, 10**6)):
        rows = [
            (u, t)
            for u, ts in ev.items()
            for t in ts
            if T0 + lo * MIN <= t < T0 + hi * MIN
        ]
        batches.append(_pdf(sorted(rows, key=lambda r: r[1])))
    for b in batches:
        engine.process_batch(b)
    emitted = sorted(engine.out)
    # everything closed by the final watermark must be emitted...
    expect_closed = [
        s
        for s in _global_fold(ev)
        if s[2] + GAP <= engine.watermark
    ]
    assert emitted == expect_closed
    # ...and the still-open tails are in state, not lost
    open_sessions = sorted(
        (k[0], *v) for (name, k), v in engine.values.items() if name == "sess"
    )
    expect_open = [s for s in _global_fold(ev) if s[2] + GAP > engine.watermark]
    assert open_sessions == expect_open


def test_session_processor_single_live_timer_per_key():
    T0 = 1_700_000_000_000
    engine = FakeTwsEngine(make_session_processor(GAP), delay_ms=30 * MIN)
    for i in range(4):
        engine.process_batch(_pdf([(7, T0 + i * 5 * MIN)]))
    assert len(engine.timers.get((7,), set())) == 1
    (t,) = engine.timers[(7,)]
    assert t == T0 + 15 * MIN + GAP


def test_session_processor_ignores_stale_timer():
    # a spurious expiry below the session deadline must not close it
    T0 = 1_700_000_000_000
    engine = FakeTwsEngine(make_session_processor(GAP), delay_ms=30 * MIN)
    engine.process_batch(_pdf([(3, T0)]))
    engine.current_key = (3,)
    out = list(
        engine.proc.handleExpiredTimer(
            (3,), _TimerValues(T0), _ExpiredTimerInfo(T0 + GAP - 1)
        )
    )
    assert out == []
    assert ("sess", (3,)) in engine.values


def test_have_tws_matches_protobuf_presence():
    from kcore_spark.streaming.tws import have_tws

    try:
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        assert have_tws()
    except Exception:
        assert not have_tws()


# ------------------------------------------------ list/map state

class FakeListState:
    def __init__(self, engine, name):
        self.engine, self.name = engine, name

    def _slot(self):
        return (self.name, self.engine.current_key)

    def exists(self):
        return self._slot() in self.engine.values

    def get(self):
        return iter(self.engine.values.get(self._slot(), []))

    def put(self, rows):
        self.engine.values[self._slot()] = [tuple(r) for r in rows]

    def appendValue(self, v):
        self.engine.values.setdefault(self._slot(), []).append(tuple(v))

    def appendList(self, rows):
        self.engine.values.setdefault(self._slot(), []).extend(map(tuple, rows))

    def clear(self):
        self.engine.values.pop(self._slot(), None)


class FakeMapState:
    def __init__(self, engine, name):
        self.engine, self.name = engine, name

    def _map(self):
        return self.engine.values.setdefault((self.name, self.engine.current_key), {})

    def exists(self):
        return bool(self.engine.values.get((self.name, self.engine.current_key)))

    def containsKey(self, k):
        return tuple(k) in self._map()

    def getValue(self, k):
        return self._map()[tuple(k)]

    def updateValue(self, k, v):
        self._map()[tuple(k)] = tuple(v)

    def keys(self):
        return iter(list(self._map().keys()))

    def values(self):
        return iter(list(self._map().values()))

    def iterator(self):
        return iter(list(self._map().items()))

    def removeKey(self, k):
        self._map().pop(tuple(k), None)

    def clear(self):
        self.engine.values.pop((self.name, self.engine.current_key), None)


# widen the fake handle with the other named-state variables
FakeHandle.getListState = lambda self, name, schema, ttlDurationMs=None: FakeListState(
    self.engine, name
)
FakeHandle.getMapState = (
    lambda self, name, key_schema, value_schema, ttlDurationMs=None: FakeMapState(
        self.engine, name
    )
)


def test_topk_processor_bounded_list_state():
    from kcore_spark.streaming.tws import make_topk_processor

    engine = FakeTwsEngine(make_topk_processor(3), delay_ms=0)
    batches = [
        pd.DataFrame({"user_id": [1, 1, 1], "value": [5.0, 1.0, 9.0]}),
        pd.DataFrame({"user_id": [1, 1], "value": [7.0, 2.0]}),
        pd.DataFrame({"user_id": [1], "value": [8.5]}),
    ]
    for b in batches:
        b["ts"] = pd.to_datetime([0] * len(b), unit="ms")
        engine.process_batch(b)
    # last emission is the running top-3 across all batches, rank-ordered
    last = sorted(engine.out[-3:], key=lambda t: t[1])
    assert [(r, v) for (_u, r, v) in last] == [(1, 9.0), (2, 8.5), (3, 7.0)]
    # state is bounded at k rows regardless of stream length
    assert len(engine.values[("top", (1,))]) == 3


def test_distinct_counter_map_state_accumulates():
    from kcore_spark.streaming.tws import make_distinct_counter_processor

    engine = FakeTwsEngine(make_distinct_counter_processor(), delay_ms=0)
    b1 = pd.DataFrame({"user_id": [2, 2, 2], "event_type": ["a", "b", "a"]})
    b2 = pd.DataFrame({"user_id": [2, 2], "event_type": ["a", "c"]})
    for b in (b1, b2):
        b["ts"] = pd.to_datetime([0] * len(b), unit="ms")
        engine.process_batch(b)
    final = {et: n for (_u, et, n) in engine.out[-3:]}
    assert final == {"a": 3, "b": 1, "c": 1}
    # map entries are individually addressable (removeKey semantics)
    engine.current_key = (2,)
    ms = FakeMapState(engine, "counts")
    ms.removeKey(("a",))
    assert not ms.containsKey(("a",)) and ms.containsKey(("b",))


def test_session_processor_initial_state_warm_start():
    """handleInitialState seeds open sessions from a prior run's
    snapshot: new events continue the seeded session when inside the
    gap, and the seeded eviction timer closes it when the watermark
    passes — the checkpoint-migration contract of transformWithState's
    initialState parameter."""
    T0 = 1_700_000_000_000
    engine = FakeTwsEngine(make_session_processor(GAP), delay_ms=0)
    # seed user 5 with an open session ending at T0
    engine.current_key = (5,)
    engine.proc.handleInitialState(
        (5,), {"start_ms": T0 - 10 * MIN, "last_ms": T0, "n_events": 4}, _TimerValues(-1)
    )
    assert engine.values[("sess", (5,))] == (T0 - 10 * MIN, T0, 4)
    assert engine.timers[(5,)] == {T0 + GAP}
    # an event 5 minutes later CONTINUES the seeded session
    engine.process_batch(_pdf([(5, T0 + 5 * MIN)]))
    assert engine.values[("sess", (5,))] == (T0 - 10 * MIN, T0 + 5 * MIN, 5)
    # an event far beyond the gap first lets the watermark close it
    engine.process_batch(_pdf([(5, T0 + 500 * MIN)]))
    closed = [t for t in engine.out if t[0] == 5]
    assert closed == [(5, T0 - 10 * MIN, T0 + 5 * MIN, 5)]


# --------------------------------------------------------------------
# REAL-ENGINE e2e: the vendored protobuf runtime
# (kcore_spark/vendor/protoshim) makes the actual
# transformWithStateInPandas JVM bridge runnable — these tests drive
# the same processors through Spark's state server with the RocksDB
# provider, covering all three named-state kinds (ValueState+timers,
# ListState, MapState) end-to-end.

import contextlib
import os
import tempfile
import time


@contextlib.contextmanager
def _rocksdb_provider(spark):
    key = "spark.sql.streaming.stateStore.providerClass"
    prev = spark.conf.get(
        key,
        "org.apache.spark.sql.execution.streaming.state.HDFSBackedStateStoreProvider",
    )
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        yield
    finally:
        spark.conf.set(key, prev)


def _write_chunks(spark, chunks):
    """Write each chunk (list of (user_id, ts_ms, event_type, value))
    as one parquet file with ascending mtimes; return (dir, schema)."""
    import pyspark.sql.functions as F

    d = tempfile.mkdtemp(prefix="kcore_tws_e2e_")
    for i, rows in enumerate(chunks):
        df = spark.createDataFrame(
            [(u, t, et, v) for (u, t, et, v) in rows],
            "user_id long, ts_ms long, event_type string, value double",
        ).select(
            "user_id",
            (F.col("ts_ms") / 1000.0).cast("timestamp").alias("ts"),
            "event_type",
            "value",
        )
        sub = os.path.join(d, f"part_{i:03d}")
        df.coalesce(1).write.mode("overwrite").parquet(sub)
        files = [
            os.path.join(sub, f) for f in os.listdir(sub) if f.endswith(".parquet")
        ]
        out = os.path.join(d, f"chunk_{i:03d}.parquet")
        os.rename(files[0], out)
        os.utime(out, (time.time() + i, time.time() + i))
        import shutil

        shutil.rmtree(sub)
    schema = "user_id long, ts timestamp, event_type string, value double"
    return d, schema


def _stream(spark, d, schema):
    return (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(d)
    )


@pytest.mark.slow
def test_real_engine_session_processor_value_state_and_timers(spark):
    from kcore_spark.streaming.ops import run_to_table
    from kcore_spark.streaming.tws import HAVE_TWS

    if not HAVE_TWS:
        pytest.skip("protobuf bridge unavailable")
    T0 = 1_700_000_000_000
    # user 1: two events 10min apart (one session), then 2h later two
    # more (second session). user 2: one event. A final far-future
    # sentinel (user 99) pushes the watermark so eviction timers fire.
    chunks = [
        [(1, T0, "a", 0.0), (1, T0 + 10 * MIN, "a", 0.0), (2, T0 + 1 * MIN, "a", 0.0)],
        [(1, T0 + 130 * MIN, "a", 0.0), (1, T0 + 132 * MIN, "a", 0.0)],
        [(99, T0 + 1000 * MIN, "a", 0.0)],
    ]
    d, schema = _write_chunks(spark, chunks)
    from kcore_spark.streaming.tws import make_session_processor

    s = _stream(spark, d, schema).withWatermark("ts", "30 minutes")
    with _rocksdb_provider(spark):
        out = s.groupBy("user_id").transformWithStateInPandas(
            make_session_processor(GAP)(),
            outputStructType="user_id long, start_ms long, end_ms long, n_events long",
            outputMode="append",
            timeMode="eventTime",
        )
        res = run_to_table(out, "append", state_partitions=4)
    got = {
        (r.user_id, r.start_ms, r.end_ms, r.n_events)
        for r in res.collect()
        if r.user_id != 99
    }
    assert got == {
        (1, T0, T0 + 10 * MIN, 2),
        (1, T0 + 130 * MIN, T0 + 132 * MIN, 2),
        (2, T0 + 1 * MIN, T0 + 1 * MIN, 1),
    }


@pytest.mark.slow
def test_real_engine_topk_list_state(spark):
    from kcore_spark.streaming.ops import run_to_table
    from kcore_spark.streaming.tws import HAVE_TWS, make_topk_processor

    if not HAVE_TWS:
        pytest.skip("protobuf bridge unavailable")
    T0 = 1_700_000_000_000
    chunks = [
        [(1, T0, "a", 5.0), (1, T0, "a", 1.0), (1, T0, "a", 9.0), (1, T0, "a", 7.0)]
    ]
    d, schema = _write_chunks(spark, chunks)
    s = _stream(spark, d, schema).withWatermark("ts", "10 minutes")
    with _rocksdb_provider(spark):
        out = s.groupBy("user_id").transformWithStateInPandas(
            make_topk_processor(3)(),
            outputStructType="user_id long, rank int, value double",
            outputMode="append",
            timeMode="eventTime",
        )
        res = run_to_table(out, "append", state_partitions=4)
    got = sorted((r.rank, r.value) for r in res.collect())
    assert got == [(1, 9.0), (2, 7.0), (3, 5.0)]


@pytest.mark.slow
def test_real_engine_distinct_counter_map_state(spark):
    from kcore_spark.streaming.ops import run_to_table
    from kcore_spark.streaming.tws import (
        HAVE_TWS,
        make_distinct_counter_processor,
    )

    if not HAVE_TWS:
        pytest.skip("protobuf bridge unavailable")
    T0 = 1_700_000_000_000
    # two batches: MapState must carry counts across the trigger gap
    chunks = [
        [(2, T0, "a", 0.0), (2, T0, "b", 0.0), (2, T0, "a", 0.0)],
        [(2, T0 + MIN, "a", 0.0), (2, T0 + MIN, "c", 0.0)],
    ]
    d, schema = _write_chunks(spark, chunks)
    s = _stream(spark, d, schema).withWatermark("ts", "10 minutes")
    with _rocksdb_provider(spark):
        out = s.groupBy("user_id").transformWithStateInPandas(
            make_distinct_counter_processor()(),
            outputStructType="user_id long, event_type string, n long",
            outputMode="append",
            timeMode="eventTime",
        )
        res = run_to_table(out, "append", state_partitions=4)
    rows = {(r.event_type, r.n) for r in res.collect()}
    # cumulative counts after batch 2 must be present (state carried)
    assert {("a", 3), ("c", 1)} <= rows
    # batch-1 snapshot too
    assert {("a", 2), ("b", 1)} <= rows
