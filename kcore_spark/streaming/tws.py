"""transformWithState sessionization — the Spark 4.x forward API for
custom keyed streaming state (SPARK-49070 "transformWithState").

An object-oriented ``StatefulProcessor`` with NAMED state variables
(ValueState/ListState/MapState) and first-class event-time TIMERS
replaces applyInPandasWithState's single state tuple +
``setTimeoutTimestamp``. The reference only declares the surface
(kcore README.md:25 "stateful consumers"); this is the idiomatic
Spark realization. Scale properties that make it the 100 TB path:

- state lives in column-family-backed named variables and the API
  requires the RocksDB state-store provider, so state volume is
  bounded by executor DISK, not heap;
- timers are per-key and multi-shot; we keep exactly one live timer
  per key (delete+register) so an expiry is authoritative;
- ``handleExpiredTimer`` fires when the WATERMARK passes the timer —
  session eviction is event-time-driven, identical semantics to the
  GroupState EventTimeTimeout form in queries/streaming.py.

ENVIRONMENT GATE: the PySpark side of transformWithState speaks
protobuf to the JVM state server
(``pyspark/sql/streaming/proto/StateMessage_pb2``). When the real
protobuf wheel is absent, ``kcore_spark.vendor.ensure_protobuf``
activates a vendored pure-Python wire-format runtime
(kcore_spark/vendor/protoshim, pinned by tests/test_protoshim.py), so
``HAVE_TWS`` is True in bare containers too and the REAL engine runs:
tests/test_tws.py drives all three named-state kinds
(ValueState+timers / ListState / MapState) end-to-end through Spark's
state server with the RocksDB provider, alongside the pure-Python
engine-fake contract tests (watermark advance, timer fire,
multi-batch replay). If neither runtime imports, the query entry
falls back to the identical fold on the applyInPandasWithState
engine.
"""

from __future__ import annotations

SESSION_GAP_MS = 30 * 60 * 1000


def have_tws() -> bool:
    """True when the transformWithState Python<->JVM bridge can run
    (protobuf generated stubs importable). ``ensure_protobuf`` first
    activates the vendored pure-Python runtime
    (kcore_spark/vendor/protoshim) when no real protobuf wheel is
    installed, so this is True in bare containers too."""
    try:  # pragma: no cover - env probe
        from kcore_spark.vendor import ensure_protobuf

        ensure_protobuf()
        import pyspark.sql.streaming.proto.StateMessage_pb2  # noqa: F401

        return True
    except Exception:
        return False


HAVE_TWS = have_tws()


def tws_usable(spark) -> bool:
    """Per-SESSION gate for the real transformWithState bridge.

    ``HAVE_TWS`` only proves protobuf imports in THIS process. The
    bridge also needs it importable in the separate "TWS driver
    worker" process the JVM spawns — and that worker inherits the
    JVM's environment, captured at JVM launch. When protobuf resolves
    from the vendored shim (kcore_spark/vendor/protoshim), the shim
    is reachable via ``$PYTHONPATH``; if the JVM was launched BEFORE
    ``ensure_protobuf()`` exported it (the correctness driver's
    ordering: bare SparkSession first, repo import second), the
    worker dies at import and the streaming query crashes with
    ``TransformWithStateInPySpark driver worker exited unexpectedly``
    (all three CORRECTNESS_r08 FAILs). So: real wheel → True; shim
    mode → True only if the JVM's *captured* PYTHONPATH already
    contains the shim dir; else the caller must use the
    applyInPandasWithState fold (identical state machine)."""
    if not HAVE_TWS:
        return False
    try:
        import google.protobuf

        from kcore_spark.vendor import _SHIM_DIR

        mod_file = getattr(google.protobuf, "__file__", "") or ""
        shim_mode = mod_file.startswith(_SHIM_DIR)
        if not shim_mode:
            return True  # real wheel: workers resolve it from site-packages
        jvm_pp = spark.sparkContext._jvm.java.lang.System.getenv("PYTHONPATH")
        return jvm_pp is not None and _SHIM_DIR in str(jvm_pp)
    except Exception:  # pragma: no cover - conservative: fall back
        return False


def fold_sessions(ts_sorted: list[int], cur: list[int] | None, gap_ms: int = SESSION_GAP_MS):
    """Fold a SORTED list of epoch-ms event times into gap-separated
    sessions. ``cur`` is the open session carried across micro-batches
    as ``[start_ms, last_ms, n_events]`` (or None). Returns
    ``(closed, cur)`` where closed is a list of finished
    ``(start_ms, last_ms, n)`` tuples. Shared by the GroupState and
    StatefulProcessor engines so both are the same state machine."""
    closed: list[tuple[int, int, int]] = []
    for t in ts_sorted:
        if cur is None:
            cur = [t, t, 0]
        elif t - cur[1] > gap_ms:
            closed.append(tuple(cur))
            cur = [t, t, 0]
        cur[1] = max(cur[1], t)
        cur[2] += 1
    return closed, cur


def make_topk_processor(k: int = 3):
    """StatefulProcessor exercising the LIST-state variable: per key,
    maintain the running top-k ``value``s seen (ListState holds the
    current top-k tuples, rewritten per batch) and emit the updated
    top-k after every batch — the streaming leaderboard shape.

    ListState semantics under test: ``get()`` iterates tuples,
    ``put()`` replaces the whole list, ``appendValue`` adds one —
    bounded state (≤ k rows per key) regardless of stream length."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TopKProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.top = handle.getListState("top", "v double")

        def handleInputRows(self, key, rows, timerValues):
            cur = [t[0] for t in self.top.get()] if self.top.exists() else []
            for pdf in rows:
                cur.extend(float(v) for v in pdf["value"].tolist())
            cur = sorted(cur, reverse=True)[:k]
            self.top.put([(v,) for v in cur])
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(cur),
                    "rank": list(range(1, len(cur) + 1)),
                    "value": cur,
                }
            )

        def close(self) -> None:
            pass

    return TopKProcessor


def make_distinct_counter_processor(ttl_events: int = 0):
    """StatefulProcessor exercising the MAP-state variable: per key,
    count occurrences per event_type in a MapState (one map entry per
    type — the engine stores entries individually, so a wide map never
    rewrites whole-state like a ValueState would) and emit the updated
    per-type counts each batch."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class DistinctCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.counts = handle.getMapState("counts", "et string", "n long")

        def handleInputRows(self, key, rows, timerValues):
            seen: dict[str, int] = {}
            for pdf in rows:
                for et in pdf["event_type"].tolist():
                    seen[et] = seen.get(et, 0) + 1
            for et, n in seen.items():
                prev = (
                    self.counts.getValue((et,))[0]
                    if self.counts.containsKey((et,))
                    else 0
                )
                self.counts.updateValue((et,), (prev + n,))
            ets = sorted(k2[0] for k2 in self.counts.keys())
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(ets),
                    "event_type": ets,
                    "n": [self.counts.getValue((et,))[0] for et in ets],
                }
            )

        def close(self) -> None:
            pass

    return DistinctCounter


def make_ttl_counter_processor(ttl_ms: int = 3_600_000):
    """StatefulProcessor exercising STATE TTL (Spark 4's
    ``getValueState(..., ttlDurationMs=...)``): cumulative per-key event
    count in a TTL'd ValueState, emitted each batch. TTL is
    processing-time-based in the engine, so for a deterministic oracle
    the TTL is set far beyond the replay's wall clock — the state must
    NEVER expire, making the final count equal the batch GROUP BY; the
    pin is that the TTL-enabled state plumbing (per-value TTL tracking
    column families in RocksDB) round-trips values correctly. TTL
    eviction semantics themselves are wall-clock-dependent and belong
    to the engine, not an oracle-checkable query."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class TTLCounter(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self.n = handle.getValueState("n", "n long", ttlDurationMs=ttl_ms)

        def handleInputRows(self, key, rows, timerValues):
            total = int(self.n.get()[0]) if self.n.exists() else 0
            for pdf in rows:
                total += len(pdf)
            self.n.update((total,))
            yield pd.DataFrame({"user_id": [key[0]], "n": [total]})

        def close(self) -> None:
            pass

    return TTLCounter


def make_session_processor(gap_ms: int = SESSION_GAP_MS):
    """Build the StatefulProcessor class for gap sessionization.

    Defined via factory (not at module top level) so importing this
    module never touches the pyspark streaming-state modules unless a
    processor is actually requested — keeps batch-only sessions light.
    """
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class SessionProcessor(StatefulProcessor):
        """Gap-based sessionizer on the transformWithState contract.

        State: one ValueState ``sess = (start_ms, last_ms, n)`` per
        key — the open session. Timer: exactly one per key at
        ``last_ms + gap``; when the watermark passes it the session is
        emitted and cleared. In-batch gaps close sessions inline;
        cross-batch continuation and final eviction ride the engine.
        """

        def init(self, handle: StatefulProcessorHandle) -> None:
            self.handle = handle
            self.sess = handle.getValueState("sess", "start long, last long, n long")

        def _emit(self, uid, closed):
            return pd.DataFrame(
                {
                    "user_id": [uid] * len(closed),
                    "start_ms": [c[0] for c in closed],
                    "end_ms": [c[1] for c in closed],
                    "n_events": [c[2] for c in closed],
                }
            )

        def handleInputRows(self, key, rows, timerValues):
            cur = list(self.sess.get()) if self.sess.exists() else None
            ts_all: list[int] = []
            for pdf in rows:
                ts_all.extend((pdf["ts"].astype("int64") // 1_000_000).tolist())
            ts_all.sort()
            closed, cur = fold_sessions(ts_all, cur, gap_ms)
            if cur is not None:
                self.sess.update(tuple(cur))
                # exactly one live timer per key: replace, never accumulate
                for old in list(self.handle.listTimers()):
                    self.handle.deleteTimer(old)
                self.handle.registerTimer(cur[1] + gap_ms)
            if closed:
                yield self._emit(key[0], closed)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
            # Single-timer discipline makes every expiry authoritative,
            # but stay defensive: only close when the watermark really
            # passed the open session's deadline.
            if self.sess.exists():
                start, last, n = self.sess.get()
                if expiredTimerInfo.getExpiryTimeInMs() >= last + gap_ms:
                    self.sess.clear()
                    yield self._emit(key[0], [(start, last, n)])

        def handleInitialState(self, key, initialState, timerValues) -> None:
            # transformWithState's warm-start path (initialState= on the
            # operator): seed the open session from a prior run's state
            # snapshot — e.g. the sessions table of a checkpoint being
            # migrated — and arm its eviction timer exactly as if the
            # events had flowed through this query. One row per key:
            # (start_ms, last_ms, n_events).
            # initialState arrives as a 1-row pandas object (DataFrame
            # from the engine, Series from the engine fake): take the
            # scalar per column explicitly — int(Series) is deprecated
            row = initialState
            def _scalar(v):
                return int(v.iloc[0]) if hasattr(v, "iloc") else int(v)
            start = _scalar(row["start_ms"]) if "start_ms" in row else _scalar(row[0])
            last = _scalar(row["last_ms"]) if "last_ms" in row else _scalar(row[1])
            n = _scalar(row["n_events"]) if "n_events" in row else _scalar(row[2])
            self.sess.update((start, last, n))
            for old in list(self.handle.listTimers()):
                self.handle.deleteTimer(old)
            self.handle.registerTimer(last + gap_ms)

        def close(self) -> None:
            pass

    return SessionProcessor
