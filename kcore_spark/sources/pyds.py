"""``kcore_topic`` — a Spark 4 Python DataSource over the topic log.

Lets any Spark session read a topic by NAME through the standard
source API, without knowing the on-disk layout:

    spark.dataSource.register(TopicLogDataSource)
    df = (spark.read.format("kcore_topic")
          .option("root", "/path/to/logs").option("topic", "clicks")
          .option("start_offset", "100").load())

Why a Python DataSource at all, when the engine's own fetch path is a
plain pruned parquet scan (sources/topic_log.py — still the hot path):
the reader contract is the public integration surface. A foreign Spark
deployment (no kcore_spark on the driver classpath beyond this module)
gets topic reads with the SAME planning guarantees the native path has:

- one InputPartition per (topic-partition × segment-file) → Spark
  schedules segment reads in parallel and the partition count scales
  with the log, exactly like Kafka source splits;
- manifest-first planning: segment files outside the requested offset
  range are pruned at plan time from footer stats recorded in
  ``_manifest.json`` (falling back to a directory listing for
  pre-manifest logs);
- executors stream pyarrow RecordBatches (Arrow page transfer), with
  row-group pruning on the offset column inside each file.

The same source also STREAMS (``spark.readStream.format("kcore_topic")``):
micro-batch offsets are the topic's own per-partition watermarks — the
Kafka-source model — and ``readBetweenOffsets`` replays any committed
range deterministically from the immutable segments, so checkpoint
recovery is exact (tested: incremental availableNow runs pick up only
new records, no replay duplicates).

The source also WRITES (``df.write.format("kcore_topic")``), but
two-phase: offset assignment is a log-wide transaction (dense
per-partition offsets + watermark advance) that a blind per-task
writer cannot do safely, so executors only STAGE rows (parquet files
in a scratch dir, no offsets), and the driver-side ``commit`` runs
the one safe sequencer — ``TopicLog.produce`` over the staged files —
then clears the staging dir. A failed job aborts by deleting staged
files; nothing becomes visible until the produce's atomic watermark
flip, so the sink is exactly-once by construction. Input contract:
``key binary, value binary, timestamp timestamp, part int, seq
bigint`` (part = target partition, seq = within-partition order key).

Provenance: realizes the reference's declared topic read surface
(`/root/reference/README.md:48` Consumer API roadmap row) as a Spark
source; the reference has no implementation to mirror.
"""

from __future__ import annotations

import datetime as _dt
import glob
import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

RECORD_DDL = (
    "key binary, value binary, partition int, offset bigint, "
    "timestamp timestamp_ntz, timestampType int, headers map<string,binary>"
)

_UNBOUNDED = 2**62


class SegmentSplit(InputPartition):
    """One schedulable unit: a single segment file of one partition."""

    def __init__(self, partition: int, path: str, start: int, end: int):
        self.partition = partition
        self.path = path
        self.start = start
        self.end = end


class TopicLogReader(DataSourceReader):
    def __init__(self, options: dict):
        self.root = options["root"]
        self.topic = options["topic"]
        self.start = int(options.get("start_offset", 0))
        self.end = int(options.get("end_offset", _UNBOUNDED))

    # ---------------------------------------------- driver-side planning

    def partitions(self):
        tdir = os.path.join(self.root, self.topic)
        with open(os.path.join(tdir, "_meta.json")) as f:
            n_parts = json.load(f)["num_partitions"]
        man: dict[str, list[dict]] = {}
        mpath = os.path.join(tdir, "_manifest.json")
        if os.path.exists(mpath):
            try:
                with open(mpath) as f:
                    man = json.load(f)
            except (json.JSONDecodeError, OSError):
                # unreadable manifest (torn write from a foreign tool):
                # treat as absent — plan from the directory listing;
                # stricter than the native path's heal-and-refresh, but
                # this reader may lack write access to heal
                man = {}
        splits: list[SegmentSplit] = []
        data_dir = os.path.join(tdir, "data")
        for p in range(n_parts):
            entries = man.get(f"partition={p}")
            if entries is not None:
                files = [
                    os.path.join(data_dir, e["file"])
                    for e in sorted(entries, key=lambda e: (e["min"], e["file"]))
                    if e["max"] >= self.start and e["min"] < self.end
                ]
            else:  # pre-manifest log: fall back to a directory listing
                files = sorted(
                    glob.glob(os.path.join(data_dir, f"partition={p}", "*.parquet"))
                )
            splits.extend(SegmentSplit(p, f, self.start, self.end) for f in files)
        # empty topic: Spark requires >= 1 partition; emit a no-op split
        return splits or [SegmentSplit(0, "", self.start, self.end)]

    # ---------------------------------------------- executor-side read

    def read(self, split: SegmentSplit):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        if not split.path:
            return  # empty-topic no-op split
        if not os.path.exists(split.path):
            # A maintenance swap (compact/optimize/erase) replaced this
            # segment between planning and reading. Offsets are
            # immutable, so a retry that replans from the fresh
            # manifest returns exactly the same rows — FAIL the read
            # (the documented transient object-store class) instead of
            # the old silent skip, which dropped this segment's rows
            # from the result with no error (r12 review find; the
            # native fetch path got the same treatment).
            raise FileNotFoundError(
                f"segment {split.path} vanished during read (live "
                f"compaction swap) — retry the query/trigger to replan "
                f"from the refreshed manifest"
            )
        f = pq.ParquetFile(split.path)
        cols = {f.metadata.schema.column(i).name: i for i in range(f.metadata.num_columns)}
        oi = cols["offset"]
        # row-group pruning on the offset stats inside the segment
        groups = []
        for rg in range(f.metadata.num_row_groups):
            st = f.metadata.row_group(rg).column(oi).statistics
            if st is None or not st.has_min_max or (st.max >= split.start and st.min < split.end):
                groups.append(rg)
        for rg in groups:
            t = f.read_row_group(rg)
            mask = pc.and_(
                pc.greater_equal(t["offset"], split.start),
                pc.less(t["offset"], split.end),
            )
            t = t.filter(mask)
            if t.num_rows == 0:
                continue
            # partition comes from the directory layout, not the file
            t = t.append_column(
                "partition", pa.array([split.partition] * t.num_rows, pa.int32())
            )
            order = [
                "key", "value", "partition", "offset", "timestamp", "timestampType", "headers",
            ]
            yield from t.select(order).to_batches()


# ---------------------------------------------------- streaming reader


class TopicLogStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch source over the topic log: offsets are the topic's
    own per-partition watermarks (``{"0": next_offset, ...}``) — the
    exact Kafka-source model (startingOffsets → latest per trigger).
    ``readBetweenOffsets`` replays any committed range
    deterministically from the immutable segments, which is what makes
    checkpoint recovery exact.

    Operational note (ADVICE r13 #4): a maintenance swap
    (compact/optimize/erase_keys) that lands MID-TRIGGER makes the
    executor-side read fail transiently (``TopicLogReader.read`` raises
    FileNotFoundError rather than silently dropping the swapped
    segment's rows). Spark's task retries re-execute the same planned
    split path, so all retries of that trigger fail and the query
    stops; the checkpoint is intact — restarting the query replans
    from the refreshed manifest and replays the exact same offsets.
    Schedule maintenance between triggers (or pair restarts with
    maintenance windows); a planner-level replan-on-retry needs a
    DataSource API hook Spark does not expose to Python sources yet."""

    def __init__(self, options: dict):
        self.root = options["root"]
        self.topic = options["topic"]
        self._tdir = os.path.join(self.root, self.topic)
        # maxOffsetsPerTrigger analog (the Kafka source's backpressure
        # knob): cap the TOTAL offsets a micro-batch may advance,
        # spread across partitions proportionally to their backlog —
        # a restarted stream over a deep log then catches up in
        # bounded, evenly-paced batches instead of one giant batch
        # that overwhelms the sink.
        # Caveat (r7, pinned by test_backpressure_bounded_dlq_split_
        # exactly_once): with Trigger.AvailableNow the engine latches
        # the FIRST latestOffset as the run's final target, and the
        # Python DataSource API exposes no prepareForTriggerAvailableNow
        # hook to latch the true log end the way the JVM Kafka source
        # does — so a capped availableNow run stops after ONE bounded
        # batch (the checkpoint resumes where it left off; nothing is
        # lost). Use the cap with paced triggers; leave it unset for
        # drain-everything availableNow runs.
        cap = options.get("max_offsets_per_trigger")
        self.max_offsets_per_trigger = int(cap) if cap is not None else None

    def _watermarks(self) -> dict[str, int]:
        # "__"-prefixed keys are control entries (sink commits,
        # snapshot history), not partition offsets — same convention
        # as TopicLog._watermarks
        with open(os.path.join(self._tdir, "_watermarks.json")) as f:
            return {
                str(k): int(v)
                for k, v in json.load(f).items()
                if not str(k).startswith("__")
            }

    def initialOffset(self) -> dict:
        return {p: 0 for p in self._watermarks()}

    def read(self, start: dict):
        end = self._watermarks()
        # partitions created after the stream started begin at 0
        merged_start = {p: int(start.get(p, 0)) for p in end}
        cap = self.max_offsets_per_trigger
        if cap is not None:
            backlog = {
                p: end[p] - merged_start[p]
                for p in end
                if end[p] > merged_start[p]
            }
            total = sum(backlog.values())
            if total > cap:
                # proportional allocation, ≥1 offset per lagging
                # partition so no partition starves; remainder goes to
                # the deepest backlogs (deterministic order)
                alloc = {p: max(1, (b * cap) // total) for p, b in backlog.items()}
                spare = cap - sum(alloc.values())
                for p, _b in sorted(
                    backlog.items(), key=lambda kv: (-kv[1], kv[0])
                ):
                    if spare <= 0:
                        break
                    take = min(spare, backlog[p] - alloc[p])
                    if take > 0:
                        alloc[p] += take
                        spare -= take
                end = dict(merged_start)
                for p, a in alloc.items():
                    end[p] = min(merged_start[p] + a, self._watermarks()[p])
        # materialized list, not a generator: the runtime caches this
        # batch for replay (copy.copy per plan) and a generator is not
        # copyable; a micro-batch is bounded by definition
        return list(self.readBetweenOffsets(merged_start, end)), end

    def readBetweenOffsets(self, start: dict, end: dict):
        for p, hi in end.items():
            lo = int(start.get(p, 0))
            if hi <= lo:
                continue
            split_reader = TopicLogReader(
                {
                    "root": self.root,
                    "topic": self.topic,
                    "start_offset": str(lo),
                    "end_offset": str(hi),
                }
            )
            for split in split_reader.partitions():
                if split.path and split.partition == int(p):
                    for batch in split_reader.read(split) or ():
                        for row in batch.to_pylist():
                            # segments store UTC-adjusted µs timestamps;
                            # the tuple path must hand the NTZ schema a
                            # naive datetime (UTC wall clock)
                            ts = row["timestamp"]
                            if ts is not None and ts.tzinfo is not None:
                                ts = ts.astimezone(_dt.timezone.utc).replace(tzinfo=None)
                            row["timestamp"] = ts
                            yield tuple(row.values())

    def commit(self, end: dict) -> None:
        pass  # offsets live in the stream checkpoint; the log is immutable


# ---------------------------------------------------- batch writer

WRITE_DDL = "key binary, value binary, timestamp timestamp, part int, seq bigint"


class StagedFiles(WriterCommitMessage):
    """One entry per (this task, target partition): (partition,
    path, n_rows, min_seq)."""

    def __init__(self, entries: list[tuple[int, str, int, int]]):
        self.entries = entries


class TopicLogWriter(DataSourceWriter):
    """Two-phase topic write (``df.write.format("kcore_topic")``).

    Executor half (``write``): split this task's rows by target
    partition, sort each slice by ``seq``, stage one parquet file per
    (task, partition) in the staging dir — NO offsets yet; staged
    files are invisible to every reader.

    Driver half (``commit``): the single sequencer. Per partition,
    staged files are ordered by (min_seq, path) and offsets assigned
    densely from the current watermark; segments land in the native
    layout with manifest entries, and the watermark flip (atomic
    os.replace, snapshot-history preserving — the same commit point
    TopicLog.produce uses) publishes everything at once. Runs in the
    data-source Python runner WITHOUT a Spark session, so sequencing
    is pure pyarrow — per-file metadata + streamed rewrites, never a
    row-by-row driver loop.

    Ordering contract: exact ``seq`` order within each staged file;
    across files of one partition, file order by min_seq. For exact
    global per-partition seq order, pre-shuffle the input with
    ``df.repartition("part")`` so each partition stages exactly one
    file. Nothing becomes visible unless commit completes — abort
    deletes the staging dir — so the sink is exactly-once.
    """

    def __init__(self, options: dict, input_schema):
        self.root = options["root"]
        self.topic = options["topic"]
        self.cols = [f.name for f in input_schema.fields]
        required = {"key", "value", "timestamp", "part", "seq"}
        missing = required - set(self.cols)
        if missing:
            raise ValueError(
                f"kcore_topic writer input must carry {sorted(required)}; "
                f"missing {sorted(missing)}"
            )
        self.tdir = os.path.join(self.root, self.topic)
        # Per-JOB staging subdir: the writer object (and this id) is
        # pickled to every task of this job, so all its stages land in
        # one dir — but a second concurrent write job (or a streaming
        # sink beside a batch write) stages elsewhere, and commit/abort
        # below remove only THIS job's dir, never another job's
        # in-flight files.
        import uuid as _uuid

        self.job_id = _uuid.uuid4().hex
        self.staging = os.path.join(self.tdir, "_staging", self.job_id)

    # ------------------------------------------------ executor side

    def write(self, iterator) -> StagedFiles:
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq
        from pyspark import TaskContext

        idx = {c: i for i, c in enumerate(self.cols)}
        by_part: dict[int, list[tuple]] = {}
        for r in iterator:
            t = tuple(r)
            by_part.setdefault(int(t[idx["part"]]), []).append(t)
        if not by_part:
            return StagedFiles([])
        tc = TaskContext.get()
        task = tc.taskAttemptId() if tc is not None else 0
        os.makedirs(self.staging, exist_ok=True)
        entries = []
        for p, rows in by_part.items():
            rows.sort(key=lambda t: t[idx["seq"]])
            table = pa.table(
                {
                    "key": pa.array([t[idx["key"]] for t in rows], pa.binary()),
                    "value": pa.array([t[idx["value"]] for t in rows], pa.binary()),
                    "timestamp": pa.array(
                        [t[idx["timestamp"]] for t in rows], pa.timestamp("us")
                    ),
                    "seq": pa.array([t[idx["seq"]] for t in rows], pa.int64()),
                }
            )
            path = os.path.join(
                self.staging, f"stage-{task}-p{p}-{_uuid.uuid4().hex}.parquet"
            )
            pq.write_table(table, path)
            entries.append((p, path, len(rows), int(rows[0][idx["seq"]])))
        return StagedFiles(entries)

    # ------------------------------------------------ driver side

    def commit(self, messages) -> None:
        import shutil
        import uuid as _uuid

        import pyarrow as pa
        import pyarrow.parquet as pq

        entries = [e for m in messages if m is not None for e in m.entries]
        if not entries:
            return
        with open(os.path.join(self.tdir, "_meta.json")) as f:
            n_parts = json.load(f)["num_partitions"]
        bad = sorted({p for p, *_ in entries if not 0 <= p < n_parts})
        if bad:
            raise ValueError(
                f"topic {self.topic!r} declares {n_parts} partitions; "
                f"staged rows target partition(s) {bad}"
            )
        from kcore_spark.sources.topic_log import (
            flip_lock,
            partition_commit_locks,
            reclaim_uncommitted_files,
        )

        # Cross-process commit locks for exactly the partitions this job
        # staged (known precisely at commit time): the read-watermark ->
        # assign-offsets -> segment-write sequence below must not
        # interleave with a concurrent TopicLog.produce or another
        # writer job ON THE SAME PARTITIONS (both would assign offsets
        # from one base), but jobs on disjoint partitions of this topic
        # commit in parallel — Kafka's per-partition write concurrency.
        by_part: dict[int, list[tuple]] = {}
        for e in entries:
            by_part.setdefault(e[0], []).append(e)
        with partition_commit_locks(self.tdir, by_part.keys()):
            # Reclaim a crashed predecessor's above-watermark segments on
            # OUR partitions BEFORE assigning offsets from the watermark
            # — exactly what TopicLog.produce does. Without it, a commit
            # that crashed between the segment writes and the flip,
            # retried by the user, re-lands the same offset range next
            # to the crashed attempt's files and the retry's flip
            # publishes BOTH (duplicate offsets; fuzz-found r11).
            reclaim_uncommitted_files(self.tdir, set(by_part.keys()))
            wm_path = os.path.join(self.tdir, "_watermarks.json")
            try:
                with open(wm_path) as f:
                    raw = json.load(f)
            except FileNotFoundError:
                raw = {}
            wm = {k: int(v) for k, v in raw.items() if not str(k).startswith("__")}
            data_dir = os.path.join(self.tdir, "data")
            new_wm: dict[str, int] = {}
            new_man_entries: dict[str, list[dict]] = {}
            for p, ents in sorted(by_part.items()):
                # our partitions' bases are stable while we hold their
                # locks; other partitions' values are never used
                base = int(wm.get(str(p), 0))
                pdir = os.path.join(data_dir, f"partition={p}")
                os.makedirs(pdir, exist_ok=True)
                for _, path, n, _min_seq in sorted(ents, key=lambda e: (e[3], e[1])):
                    t = pq.read_table(path)
                    offs = pa.array(range(base, base + n), pa.int64())
                    out = pa.table(
                        {
                            "key": t["key"],
                            "value": t["value"],
                            "offset": offs,
                            "timestamp": t["timestamp"],
                            "timestampType": pa.array([0] * n, pa.int32()),
                            "headers": pa.nulls(
                                n, pa.map_(pa.string(), pa.binary())
                            ),
                        }
                    )
                    rel = f"partition={p}/part-w-{_uuid.uuid4().hex}.parquet"
                    seg = os.path.join(data_dir, rel)
                    # stage-then-atomic-rename: a commit that dies mid
                    # pq.write_table must never leave a truncated
                    # .parquet in data/ — readers scan the directory,
                    # and the retry's reclaim pass would otherwise trip
                    # on the unreadable footer (ADVICE r11). The
                    # dot-prefixed .tmp name is invisible to Spark's
                    # directory scan and reclaimed as debris by
                    # reclaim_uncommitted_files if we crash before the
                    # os.replace.
                    tmp_seg = os.path.join(
                        os.path.dirname(seg), f".{os.path.basename(seg)}.tmp"
                    )
                    pq.write_table(out, tmp_seg)
                    os.replace(tmp_seg, seg)
                    ts = t["timestamp"]
                    entry = {
                        "file": rel,
                        "min": base,
                        "max": base + n - 1,
                        "bytes": os.path.getsize(seg),
                    }
                    if n and ts.null_count < n:
                        import pyarrow.compute as pc

                        # naive → UTC, matching TopicLog._epoch_ms: the ts
                        # index must mean the same instant to every reader
                        # regardless of the committing host's timezone
                        from kcore_spark.sources.topic_log import _epoch_ms

                        lo = pc.min(ts).as_py()
                        hi = pc.max(ts).as_py()
                        if lo is not None:
                            entry["ts_min"] = _epoch_ms(lo)
                            entry["ts_max"] = _epoch_ms(hi)
                    new_man_entries.setdefault(f"partition={p}", []).append(entry)
                    base += n
                new_wm[str(p)] = base
            # Control-file flips under the SHORT flip lock: the manifest
            # and watermark files are shared across partitions, so the
            # read-merge-replace must not interleave with a concurrent
            # disjoint-partition commit (its flip would be lost).
            # Manifest first, watermarks last: the watermark flip is the
            # commit point (readers never trust offsets past the
            # watermark). Both files are RE-read inside the lock — the
            # copies above predate any concurrent flips.
            man_path = os.path.join(self.tdir, "_manifest.json")
            with flip_lock(self.tdir):
                try:
                    with open(man_path) as f:
                        man = json.load(f)
                except (FileNotFoundError, json.JSONDecodeError):
                    man = {}
                for pdir, es in new_man_entries.items():
                    man.setdefault(pdir, []).extend(es)
                tmp = man_path + f".tmp.{_uuid.uuid4().hex}"
                with open(tmp, "w") as f:
                    json.dump(man, f)
                os.replace(tmp, man_path)
                try:
                    with open(wm_path) as f:
                        raw = json.load(f)
                except FileNotFoundError:
                    raw = {}
                payload = {k: v for k, v in raw.items() if str(k).startswith("__")}
                merged_wm = {
                    k: int(v) for k, v in raw.items() if not str(k).startswith("__")
                }
                for k, v in new_wm.items():
                    merged_wm[k] = max(v, merged_wm.get(k, 0))
                payload.update(merged_wm)
                history = payload.get("__history", [])
                next_v = (history[-1]["v"] + 1) if history else 1
                payload["__history"] = (
                    history + [{"v": next_v, "wm": dict(merged_wm)}]
                )[-64:]
                tmp = wm_path + f".tmp.{_uuid.uuid4().hex}"
                with open(tmp, "w") as f:
                    json.dump(payload, f)
                os.replace(tmp, wm_path)
        shutil.rmtree(self.staging, ignore_errors=True)

    def abort(self, messages) -> None:
        import shutil

        shutil.rmtree(self.staging, ignore_errors=True)


class TopicLogDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "kcore_topic"

    def schema(self) -> str:
        return RECORD_DDL

    def reader(self, schema) -> TopicLogReader:
        return TopicLogReader(dict(self.options))

    def simpleStreamReader(self, schema) -> TopicLogStreamReader:
        return TopicLogStreamReader(dict(self.options))

    def writer(self, schema, overwrite: bool) -> TopicLogWriter:
        if overwrite:
            raise ValueError(
                "kcore_topic is an append-only log; overwrite is not supported "
                "(use TopicLog retention/truncation to remove data)"
            )
        return TopicLogWriter(dict(self.options), schema)
