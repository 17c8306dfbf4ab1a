"""Topic-management wire APIs: CreateTopics (19), DeleteTopics (20),
ListOffsets (2, v0-v5), DeleteRecords (21), DescribeConfigs (32),
AlterConfigs (33).

Completes the reference's declared "Topic Management" roadmap row
(`/root/reference/README.md:50`) at the wire level; the engine-side
DDL lives in sources/topic_log.py. CreateTopics/DeleteTopics/
ListOffsets/DeleteRecords carry their full public version ranges
(flexible encodings at each API's cutover version);
IncrementalAlterConfigs (44, KIP-339) is the modern per-entry config
mutation path; DescribeConfigs/AlterConfigs remain v0.
"""

from __future__ import annotations

from kcore_spark.protocol import wire
from kcore_spark.protocol.broker import WireLog

ERR_TOPIC_ALREADY_EXISTS = 36
ERR_INVALID_PARTITIONS = 37
ERR_UNKNOWN_TOPIC_OR_PARTITION = wire.ERR_UNKNOWN_TOPIC_OR_PARTITION

EARLIEST_TIMESTAMP = -2
LATEST_TIMESTAMP = -1
MAX_TIMESTAMP = -3  # KIP-734 (v7+)
EARLIEST_LOCAL_TIMESTAMP = -4  # KIP-405 tiered storage (v8+)
LATEST_TIERED_TIMESTAMP = -5  # KIP-1005 (v9+)


# --------------------------------------------------- CreateTopics v0-v7


def handle_create_topics(log: WireLog, payload: bytes) -> bytes:
    """CreateTopics v0-v7 (flexible from v5, per the upstream schema).

    Version deltas: v1 adds request validate_only + response
    error_message; v2 prepends response throttle_time_ms; v5 switches
    to compact encodings and adds the created topic's effective
    num_partitions / replication_factor / configs to the response;
    v7 adds the topic's uuid (KIP-516)."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 5
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    requested = []
    for _ in range(max(rd_len(), 0)):
        name = rd_str()
        num_partitions = r.int32()
        r.int16()  # replication_factor (single node: ignored)
        for _ in range(max(rd_len(), 0)):  # manual assignments
            r.int32()
            for _ in range(max(rd_len(), 0)):
                r.int32()
            if flex:
                r.tagged_fields()
        configs: dict[str, str] = {}
        for _ in range(max(rd_len(), 0)):  # configs
            ck = rd_str()
            cv = rd_str()
            if flex:
                r.tagged_fields()
            if ck is not None and cv is not None:
                configs[ck] = cv
        if flex:
            r.tagged_fields()
        requested.append((name, num_partitions, configs))
    r.int32()  # timeout_ms
    validate_only = r.bool_() if v >= 1 else False
    results = []
    for name, num_partitions, configs in requested:
        if name in log.topics:
            results.append((name, ERR_TOPIC_ALREADY_EXISTS, num_partitions, configs))
        elif num_partitions < 1:
            results.append((name, ERR_INVALID_PARTITIONS, num_partitions, configs))
        else:
            if not validate_only:
                log.create_topic(name, num_partitions, configs)
            results.append((name, wire.ERR_NONE, num_partitions, configs))
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    if v >= 2:
        w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(results)) if flex else w.int32(len(results))
    for name, err, num_partitions, configs in results:
        w.compact_string(name) if flex else w.nullable_string(name)
        if v >= 7:
            w.uuid(wire.topic_uuid(name or ""))
        w.int16(err)
        if v >= 1:
            w.compact_string(None) if flex else w.nullable_string(None)  # error_message
        if v >= 5:
            # effective topic shape (v5+): single-node broker → RF 1
            w.int32(num_partitions if err == wire.ERR_NONE else -1)
            w.int16(1 if err == wire.ERR_NONE else -1)
            w.compact_array_len(len(configs))
            for ck in sorted(configs):
                w.compact_string(ck)
                w.compact_string(configs[ck])
                w.bool_(False)  # read_only
                w.int8(1)  # config_source: DYNAMIC_TOPIC_CONFIG
                w.bool_(False)  # is_sensitive
                w.empty_tagged_fields()
            w.empty_tagged_fields()
        elif flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


# --------------------------------------------------- DeleteTopics v0-v6


def handle_delete_topics(log: WireLog, payload: bytes) -> bytes:
    """DeleteTopics v0-v6 (flexible from v4).

    Version deltas: v1 prepends response throttle_time_ms; v5 adds a
    per-topic error_message; v6 switches the request to (name,
    topic_id) structs — topics may be addressed by uuid alone
    (KIP-516) — and echoes both back."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 4
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    # (name | None, requested_or_derived_uuid | None)
    entries: list[tuple[str | None, bytes | None]] = []
    if v >= 6:
        by_id = {wire.topic_uuid(t): t for t in log.topics}
        for _ in range(max(rd_len(), 0)):
            name = rd_str()
            tid = r.uuid()
            r.tagged_fields()
            entries.append((name if name is not None else by_id.get(tid), tid))
    else:
        entries = [(rd_str(), None) for _ in range(max(rd_len(), 0))]
    r.int32()  # timeout_ms
    results = []
    for name, tid in entries:
        if name is None:
            # uuid-only addressing that resolved to nothing: the
            # uuid-specific error code, echoing the REQUESTED id so the
            # client can correlate the entry (error 3 with a fabricated
            # id would be uncorrelatable and mis-classified)
            results.append((None, tid, wire.ERR_UNKNOWN_TOPIC_ID))
        elif name not in log.topics:
            results.append((name, tid, ERR_UNKNOWN_TOPIC_OR_PARTITION))
        else:
            n = log.topics.pop(name)
            for p in range(n):
                log._parts.pop((name, p), None)
            results.append((name, tid, wire.ERR_NONE))
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    if v >= 1:
        w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(results)) if flex else w.int32(len(results))
    for name, tid, err in results:
        w.compact_string(name) if flex else w.nullable_string(name)
        if v >= 6:
            w.uuid(tid if tid is not None else wire.topic_uuid(name or ""))
        w.int16(err)
        if v >= 5:
            w.compact_string(None)  # error_message
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


# ------------------------------------------------------ ListOffsets v1


def handle_list_offsets(log: WireLog, payload: bytes) -> bytes:
    """ListOffsets v0-v9 (flexible from v6).

    timestamp -2 → earliest (the log start offset), -1 → log-end
    offset, -3 (v7+, KIP-734) → the offset holding the MAXIMUM record
    timestamp, -4 (v8+, KIP-405) → the earliest offset still in LOCAL
    storage, -5 (v9+, KIP-1005) → the highest offset present in the
    remote tier (offset -1 when nothing is tiered), >= 0 → the first
    offset whose record timestamp is >= the target (the response
    echoes the matched record's timestamp, or -1/-1 when no record
    qualifies). A negative sentinel sent below its version floor gets
    a per-partition UNSUPPORTED_VERSION error, matching the broker-side
    gate in Kafka's KafkaApis. Version deltas per the public spec: v0
    requests carry max_num_offsets and get an offset ARRAY back; v1
    switches to the single (timestamp, offset) shape; v2 adds request
    isolation_level + response throttle_time; v4 adds request
    current_leader_epoch + response leader_epoch; v6 is the flexible
    encoding; v8/v9 change only which sentinels are accepted."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 6
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    r.int32()  # replica_id
    if v >= 2:
        r.int8()  # isolation_level (no transactions: read_uncommitted)
    results = []
    for _ in range(max(rd_len(), 0)):
        name = rd_str()
        parts = []
        for _ in range(max(rd_len(), 0)):
            partition = r.int32()
            if v >= 4:
                r.int32()  # current_leader_epoch
            ts = r.int64()
            max_n = r.int32() if v == 0 else 1
            if flex:
                r.tagged_fields()
            if not log.has(name, partition):
                parts.append((partition, ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, [], max_n))
                continue
            hw = log.high_watermark(name, partition)
            floor = {MAX_TIMESTAMP: 7, EARLIEST_LOCAL_TIMESTAMP: 8, LATEST_TIERED_TIMESTAMP: 9}
            if ts in floor and v < floor[ts]:
                parts.append((partition, wire.ERR_UNSUPPORTED_VERSION, -1, [], max_n))
                continue
            if ts == EARLIEST_TIMESTAMP:
                parts.append(
                    (partition, wire.ERR_NONE, -1, [log.log_start(name, partition)], max_n)
                )
            elif ts == LATEST_TIMESTAMP:
                parts.append((partition, wire.ERR_NONE, -1, [hw], max_n))
            elif ts == EARLIEST_LOCAL_TIMESTAMP:
                parts.append(
                    (partition, wire.ERR_NONE, -1, [log.local_log_start(name, partition)], max_n)
                )
            elif ts == LATEST_TIERED_TIMESTAMP:
                tiered = log.latest_tiered(name, partition)
                parts.append(
                    (partition, wire.ERR_NONE, -1, [tiered] if tiered >= 0 else [], max_n)
                )
            elif ts == MAX_TIMESTAMP:
                # KIP-734: the offset of the record with the highest
                # timestamp. On ties Kafka keeps the FIRST record that
                # achieves the max (UnifiedLog tracks maxTimestampSoFar
                # and only updates on a strictly greater value), so the
                # comparison must be strict.
                best = None
                for rec in log.read(name, partition, log.log_start(name, partition), hw):
                    if best is None or rec.timestamp_ms > best.timestamp_ms:
                        best = rec
                if best is None:
                    parts.append((partition, wire.ERR_NONE, -1, [], max_n))
                else:
                    parts.append(
                        (partition, wire.ERR_NONE, best.timestamp_ms, [best.offset], max_n)
                    )
            else:
                hit = next(
                    (rec for rec in log.read(name, partition, 0, hw) if rec.timestamp_ms >= ts),
                    None,
                )
                if hit is None:
                    parts.append((partition, wire.ERR_NONE, -1, [], max_n))
                else:
                    parts.append(
                        (partition, wire.ERR_NONE, hit.timestamp_ms, [hit.offset], max_n)
                    )
        if flex:
            r.tagged_fields()
        results.append((name, parts))
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    if v >= 2:
        w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(results)) if flex else w.int32(len(results))
    for name, parts in results:
        w.compact_string(name) if flex else w.nullable_string(name)
        w.compact_array_len(len(parts)) if flex else w.int32(len(parts))
        for partition, err, ts, offsets, max_n in parts:
            w.int32(partition).int16(err)
            if v == 0:
                # v0: array of offsets, newest-first, up to max_num_offsets
                out = offsets[:max_n]
                w.int32(len(out))
                for o in out:
                    w.int64(o)
            else:
                w.int64(ts)
                w.int64(offsets[0] if offsets else -1)
                if v >= 4:
                    w.int32(0)  # leader_epoch
                if flex:
                    w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


# ------------------------------------------------------ DeleteRecords v0-v1

ERR_OFFSET_OUT_OF_RANGE = wire.ERR_OFFSET_OUT_OF_RANGE


def handle_delete_records(log: WireLog, payload: bytes) -> bytes:
    """DeleteRecords (API key 21, v0-v2): advance each partition's log
    start offset; offset -1 means "up to the high watermark". The
    response reports the new low watermark per partition. v0/v1 are
    identical rigid layouts; v2 is the flexible (compact/tagged)
    re-encoding of the same fields."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 2
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    results = []
    for _ in range(max(rd_len(), 0)):
        name = rd_str()
        parts = []
        for _ in range(max(rd_len(), 0)):
            partition = r.int32()
            before = r.int64()
            if flex:
                r.tagged_fields()
            if not log.has(name, partition):
                parts.append((partition, -1, ERR_UNKNOWN_TOPIC_OR_PARTITION))
                continue
            try:
                low = log.delete_records(name, partition, before)
            except ValueError:
                parts.append((partition, -1, ERR_OFFSET_OUT_OF_RANGE))
                continue
            parts.append((partition, low, wire.ERR_NONE))
        if flex:
            r.tagged_fields()
        results.append((name, parts))
    r.int32()  # timeout_ms (after topics in the request layout)
    if flex:
        r.tagged_fields()
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(results)) if flex else w.int32(len(results))
    for name, parts in results:
        w.compact_string(name) if flex else w.nullable_string(name)
        w.compact_array_len(len(parts)) if flex else w.int32(len(parts))
        for partition, low_watermark, err in parts:
            w.int32(partition).int64(low_watermark).int16(err)
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()  # response body
    return w.bytes()


# ------------------------------------------- Describe/AlterConfigs v0

RESOURCE_TOPIC = 2
ERR_INVALID_REQUEST = 42


def handle_describe_configs(log: WireLog, payload: bytes) -> bytes:
    """DescribeConfigs (API key 32, v0-v4; flexible from v4) for TOPIC
    resources: the topic's stored configs, optionally filtered by
    requested names. Version deltas: v1 adds include_synonyms and
    replaces the per-config is_default bool with config_source(int8)
    + a synonyms list (empty here — single-tier config store); v3 adds
    include_documentation and per-config type/documentation."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 4
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    resources = []
    for _ in range(max(rd_len(), 0)):
        rtype = r.int8()
        rname = rd_str()
        n = rd_len()
        names = None if n < 0 else [rd_str() for _ in range(n)]
        if flex:
            r.tagged_fields()
        resources.append((rtype, rname, names))
    if v >= 1:
        r.bool_()  # include_synonyms (synonyms are always empty here)
    if v >= 3:
        r.bool_()  # include_documentation (none stored)
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(resources)) if flex else w.int32(len(resources))
    wr_str = w.compact_string if flex else w.nullable_string

    def wr_config(k: str, val: str) -> None:
        wr_str(k)
        wr_str(val)
        w.bool_(False)  # read_only
        if v >= 1:
            w.int8(1)  # config_source: DYNAMIC_TOPIC_CONFIG
        else:
            w.bool_(False)  # is_default
        w.bool_(False)  # is_sensitive
        if v >= 1:
            w.compact_array_len(0) if flex else w.int32(0)  # synonyms
        if v >= 3:
            w.int8(0)  # config_type: UNKNOWN (types not modeled)
            wr_str(None)  # documentation
        if flex:
            w.empty_tagged_fields()

    for rtype, rname, names in resources:
        if rtype != RESOURCE_TOPIC or rname not in log.topics:
            err = ERR_UNKNOWN_TOPIC_OR_PARTITION if rtype == RESOURCE_TOPIC else ERR_INVALID_REQUEST
            w.int16(err)
            wr_str("unknown resource")
            w.int8(rtype)
            wr_str(rname)
            w.compact_array_len(0) if flex else w.int32(0)
            if flex:
                w.empty_tagged_fields()
            continue
        cfg = log.topic_configs.get(rname, {})
        if names is not None:
            cfg = {k: val for k, val in cfg.items() if k in names}
        w.int16(wire.ERR_NONE)
        wr_str(None)
        w.int8(rtype)
        wr_str(rname)
        w.compact_array_len(len(cfg)) if flex else w.int32(len(cfg))
        for k in sorted(cfg):
            wr_config(k, cfg[k])
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


def handle_alter_configs(log: WireLog, payload: bytes) -> bytes:
    """AlterConfigs (API key 33, v0-v2; schema-identical through v1,
    flexible at v2) for TOPIC resources: replace the resource's config
    set (the whole-set contract — incremental alters are API 44).
    validate_only skips the mutation."""
    import struct as _struct

    ver = _struct.unpack(">h", payload[2:4])[0]
    flex = ver >= 2
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    resources = []
    for _ in range(max(rd_len(), 0)):
        rtype = r.int8()
        rname = rd_str()
        entries = {}
        for _ in range(max(rd_len(), 0)):
            k = rd_str()
            v = rd_str()
            if flex:
                r.tagged_fields()
            entries[k] = v
        if flex:
            r.tagged_fields()
        resources.append((rtype, rname, entries))
    validate_only = r.bool_()
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(resources)) if flex else w.int32(len(resources))
    for rtype, rname, entries in resources:
        if rtype != RESOURCE_TOPIC or rname not in log.topics:
            err = ERR_UNKNOWN_TOPIC_OR_PARTITION if rtype == RESOURCE_TOPIC else ERR_INVALID_REQUEST
            w.int16(err)
            w.compact_string("unknown resource") if flex else w.nullable_string(
                "unknown resource"
            )
        else:
            if not validate_only:
                log.topic_configs[rname] = {
                    k: v for k, v in entries.items() if v is not None
                }
            w.int16(wire.ERR_NONE)
            w.compact_string(None) if flex else w.nullable_string(None)
        w.int8(rtype)
        w.compact_string(rname) if flex else w.nullable_string(rname)
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


# ------------------------------------------------------ DescribeCluster v0


ERR_MISMATCHED_ENDPOINT_TYPE = 114  # KIP-919


def handle_describe_cluster(payload: bytes, host: str, port: int) -> bytes:
    """DescribeCluster (key 60, v0-v1 — flexible-only API): the modern
    admin-client bootstrap call (cluster id, controller, broker list)
    without Metadata's topic payload. Single-node constants mirror the
    Metadata response (node 0, cluster 'kcore-spark'). v1 (KIP-919)
    adds endpoint_type: this is a broker, so a request addressed to
    the controller endpoint (type 2) gets MISMATCHED_ENDPOINT_TYPE —
    the contract that lets admin clients distinguish broker vs
    controller listeners."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    BROKER_ENDPOINT = 1
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=True)
    requested_endpoint = BROKER_ENDPOINT
    if r.pos < len(r.buf):
        r.bool_()  # include_cluster_authorized_operations
    if v >= 1 and r.pos < len(r.buf):
        requested_endpoint = r.int8()
    mismatched = v >= 1 and requested_endpoint != BROKER_ENDPOINT
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.empty_tagged_fields()  # response header v1
    w.int32(0)  # throttle_time_ms
    if mismatched:
        w.int16(ERR_MISMATCHED_ENDPOINT_TYPE)
        w.compact_string(
            f"this is a broker endpoint; requested type {requested_endpoint}"
        )
    else:
        w.int16(wire.ERR_NONE)
        w.compact_string(None)  # error_message
    if v >= 1:
        w.int8(BROKER_ENDPOINT)  # endpoint_type
    w.compact_string("kcore-spark")  # cluster_id
    w.int32(0)  # controller_id
    if mismatched:
        w.compact_array_len(0)  # brokers withheld on endpoint mismatch
    else:
        w.compact_array_len(1)  # brokers
        w.int32(0)  # broker_id
        w.compact_string(host)
        w.int32(port)
        w.compact_string(None)  # rack
        w.empty_tagged_fields()
    w.int32(-2147483648)  # authorized ops omitted (INT32_MIN)
    w.empty_tagged_fields()
    return w.bytes()


# ----------------------------------- IncrementalAlterConfigs v0-v1 (k44)

OP_SET, OP_DELETE, OP_APPEND, OP_SUBTRACT = 0, 1, 2, 3
ERR_INVALID_CONFIG = 40


def handle_incremental_alter_configs(log: WireLog, payload: bytes) -> bytes:
    """IncrementalAlterConfigs (API key 44, v0-v1, flexible from v1) —
    the modern per-entry config mutation API (KIP-339; classic
    AlterConfigs replaces the whole set and modern admin clients stop
    using it). Operations: SET(0), DELETE(1), APPEND(2), SUBTRACT(3);
    append/subtract treat the stored value as a comma-separated list,
    matching the broker's LIST-type config semantics. A resource whose
    ANY entry fails validates atomically: no partial application."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 1
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    resources = []
    for _ in range(max(rd_len(), 0)):
        rtype = r.int8()
        rname = rd_str()
        entries = []
        for _ in range(max(rd_len(), 0)):
            k = rd_str()
            op = r.int8()
            val = rd_str()
            if flex:
                r.tagged_fields()
            entries.append((k, op, val))
        if flex:
            r.tagged_fields()
        resources.append((rtype, rname, entries))
    validate_only = r.bool_()
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()  # response header v1
    w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(resources)) if flex else w.int32(len(resources))
    for rtype, rname, entries in resources:
        err, msg = wire.ERR_NONE, None
        if rtype != RESOURCE_TOPIC:
            err, msg = ERR_INVALID_REQUEST, "only TOPIC resources supported"
        elif rname not in log.topics:
            err, msg = ERR_UNKNOWN_TOPIC_OR_PARTITION, "unknown topic"
        else:
            cfg = dict(log.topic_configs.get(rname, {}))
            for k, op, val in entries:
                if op == OP_SET:
                    if val is None:
                        err, msg = ERR_INVALID_CONFIG, f"SET {k!r} needs a value"
                        break
                    cfg[k] = val
                elif op == OP_DELETE:
                    cfg.pop(k, None)
                elif op in (OP_APPEND, OP_SUBTRACT):
                    if val is None:
                        err, msg = ERR_INVALID_CONFIG, f"op on {k!r} needs a value"
                        break
                    have = [x for x in (cfg.get(k) or "").split(",") if x]
                    if op == OP_APPEND:
                        have.extend(x for x in val.split(",") if x and x not in have)
                    else:
                        drop = set(val.split(","))
                        have = [x for x in have if x not in drop]
                    if have:
                        cfg[k] = ",".join(have)
                    else:
                        cfg.pop(k, None)
                else:
                    err, msg = ERR_INVALID_CONFIG, f"unknown op {op}"
                    break
            if err == wire.ERR_NONE and not validate_only:
                log.topic_configs[rname] = cfg
        w.int16(err)
        w.compact_string(msg) if flex else w.nullable_string(msg)
        w.int8(rtype)
        w.compact_string(rname) if flex else w.nullable_string(rname)
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


# ------------------------------------------------ CreatePartitions v0-v3


def handle_create_partitions(log: WireLog, payload: bytes) -> bytes:
    """CreatePartitions (API key 37, v0-v3; flexible from v2): grow a
    topic's partition count. Shrinking (count ≤ current) answers
    INVALID_PARTITIONS with a message; unknown topics answer
    UNKNOWN_TOPIC_OR_PARTITION — per-topic errors, like CreateTopics.
    validate_only performs the checks without mutating."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 2
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    requested: list[tuple[str, int]] = []
    for _ in range(max(rd_len(), 0)):
        name = rd_str() or ""
        count = r.int32()
        n_assign = rd_len()  # nullable array of manual assignments
        for _ in range(max(n_assign, 0)):
            for _ in range(max(rd_len(), 0)):  # broker_ids
                r.int32()
            if flex:
                r.tagged_fields()
        if flex:
            r.tagged_fields()
        requested.append((name, count))
    r.int32()  # timeout_ms
    validate_only = r.bool_()
    results = []
    for name, count in requested:
        if name not in log.topics:
            results.append((name, ERR_UNKNOWN_TOPIC_OR_PARTITION, f"unknown topic {name!r}"))
        elif count <= log.topics[name]:
            results.append(
                (
                    name,
                    ERR_INVALID_PARTITIONS,
                    f"topic {name!r} has {log.topics[name]} partitions; "
                    f"cannot reduce to {count}",
                )
            )
        else:
            if not validate_only:
                log.create_partitions(name, count)
            results.append((name, wire.ERR_NONE, None))
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()
    w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(results)) if flex else w.int32(len(results))
    for name, err, msg in results:
        w.compact_string(name) if flex else w.nullable_string(name)
        w.int16(err)
        w.compact_string(msg) if flex else w.nullable_string(msg)
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


# ------------------------------------------------ DescribeLogDirs v0-v2


def handle_describe_log_dirs(log: WireLog, payload: bytes) -> bytes:
    """DescribeLogDirs (API key 35, v0-v2; flexible from v2): report
    per-partition on-log sizes under the single logical log dir. A
    null topics array means every topic (the admin-tool default);
    offset_lag is 0 (nothing in-flight on a single node) and
    is_future_key false (no reassignment)."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 2
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    n_topics = rd_len()
    wanted: dict[str, list[int]] | None
    if n_topics < 0:
        wanted = None  # null = all topics, all partitions
    else:
        wanted = {}
        for _ in range(n_topics):
            name = rd_str() or ""
            parts = [r.int32() for _ in range(max(rd_len(), 0))]
            if flex:
                r.tagged_fields()
            wanted[name] = parts
    if wanted is None:
        wanted = {
            t: list(range(n)) for t, n in sorted(log.topics.items())
        }
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()
    w.int32(0)  # throttle_time_ms
    w.compact_array_len(1) if flex else w.int32(1)  # one log dir
    w.int16(wire.ERR_NONE)
    w.compact_string("/data/kcore-logs") if flex else w.nullable_string("/data/kcore-logs")
    w.compact_array_len(len(wanted)) if flex else w.int32(len(wanted))
    for name in sorted(wanted):
        w.compact_string(name) if flex else w.nullable_string(name)
        parts = wanted[name]
        w.compact_array_len(len(parts)) if flex else w.int32(len(parts))
        for p in parts:
            w.int32(p)
            w.int64(log.partition_size_bytes(name, p))
            w.int64(0)  # offset_lag
            w.bool_(False)  # is_future_key
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()  # log dir struct
    if flex:
        w.empty_tagged_fields()  # response tail
    return w.bytes()


# ----------------------------------- DescribeTopicPartitions v0 (k75)


def handle_describe_topic_partitions(log: WireLog, payload: bytes) -> bytes:
    """DescribeTopicPartitions (API key 75, v0): the KIP-848-era
    paginated topic describe that modern admin clients use instead of
    a full Metadata fetch. An empty topics array means "all topics";
    `response_partition_limit` + the (topic, partition) cursor page
    through the flattened (topic, partition) sequence in topic-name
    order, and the response carries `next_cursor` when truncated —
    single-node values for leader/replicas/isr ([0]), empty ELR
    (KIP-966 fields present, no eligible-leader tracking here)."""
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=True)
    names: list[str] = []
    for _ in range(max(r.compact_array_len(), 0)):
        names.append(r.compact_string() or "")
        r.tagged_fields()
    limit = r.int32()
    cursor: tuple[str, int] | None = None
    if r.buf[r.pos : r.pos + 1] != b"\xff":  # nullable struct marker
        r.int8()  # present marker (0x01)
        cursor = (r.compact_string() or "", r.int32())
        r.tagged_fields()
    else:
        r.int8()
    r.tagged_fields()

    describe_all = not names
    catalog = sorted(log.topics) if describe_all else sorted(set(names))
    # flatten to (topic, partition) pairs at/after the cursor
    out: dict[str, list[int]] = {}
    next_cursor: tuple[str, int] | None = None
    budget = limit if limit > 0 else 2000
    for name in catalog:
        if not log.has(name, 0):
            if not describe_all:
                out.setdefault(name, [])  # reported as unknown below
            continue
        nparts = log.topics[name]
        start = 0
        if cursor is not None:
            if name < cursor[0]:
                continue
            start = cursor[1] if name == cursor[0] else 0
        for p in range(start, nparts):
            if budget == 0:
                next_cursor = (name, p)
                break
            out.setdefault(name, []).append(p)
            budget -= 1
        if next_cursor:
            break

    w = wire.Writer()
    w.int32(h.correlation_id)
    w.empty_tagged_fields()  # response header v1
    w.int32(0)  # throttle_time_ms
    w.compact_array_len(len(out))
    for name in sorted(out):
        parts = out[name]
        known = log.has(name, 0)
        w.int16(wire.ERR_NONE if known else ERR_UNKNOWN_TOPIC_OR_PARTITION)
        w.compact_string(name)
        w.uuid(wire.topic_uuid(name) if known else b"\x00" * 16)
        w.bool_(False)  # is_internal
        w.compact_array_len(len(parts))
        for p in parts:
            w.int16(wire.ERR_NONE)
            w.int32(p)  # partition_index
            w.int32(0)  # leader_id
            w.int32(0)  # leader_epoch
            w.compact_array_len(1).int32(0)  # replica_nodes
            w.compact_array_len(1).int32(0)  # isr_nodes
            w.compact_array_len(0)  # eligible_leader_replicas
            w.compact_array_len(0)  # last_known_elr
            w.compact_array_len(0)  # offline_replicas
            w.empty_tagged_fields()
        w.int32(-2147483648)  # topic_authorized_operations: unset
        w.empty_tagged_fields()
    if next_cursor is None:
        w.int8(-1)  # null next_cursor
    else:
        w.int8(1)
        w.compact_string(next_cursor[0])
        w.int32(next_cursor[1])
        w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


ERR_FENCED_LEADER_EPOCH = 74  # KIP-320
ERR_UNKNOWN_LEADER_EPOCH = 75  # KIP-320


def handle_offset_for_leader_epoch(log: WireLog, payload: bytes) -> bytes:
    """OffsetForLeaderEpoch (key 23, v0-v4; flexible from v4) — the
    KIP-101/KIP-320 truncation-detection API a follower or resuming
    consumer uses to find where an epoch's log ends. This broker is a
    single-node, single-generation leader, so the epoch history is
    exactly {epoch 0 from offset 0}: a lookup for epoch 0 answers
    (leader_epoch 0, end_offset = high watermark); a lookup for any
    LATER epoch the leader never led answers UNKNOWN_LEADER_EPOCH, and
    a v2+ current_leader_epoch fence above 0 likewise (the caller's
    metadata is from the future). Version deltas per the public spec:
    v1 adds response leader_epoch, v2 adds request
    current_leader_epoch + response throttle_time, v3 adds request
    replica_id, v4 is the flexible cutover."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 4
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    if v >= 3:
        r.int32()  # replica_id (-2 = debug consumer, -1 = consumer)
    topics = []
    for _ in range(max(rd_len(), 0)):
        name = rd_str()
        parts = []
        for _ in range(max(rd_len(), 0)):
            partition = r.int32()
            current_epoch = r.int32() if v >= 2 else -1
            leader_epoch = r.int32()
            if flex:
                r.tagged_fields()
            if not log.has(name, partition):
                parts.append((partition, ERR_UNKNOWN_TOPIC_OR_PARTITION, -1, -1))
            elif current_epoch > 0 or leader_epoch > 0:
                parts.append((partition, ERR_UNKNOWN_LEADER_EPOCH, -1, -1))
            elif current_epoch == 0 or current_epoch == -1:
                parts.append(
                    (partition, wire.ERR_NONE, 0, log.high_watermark(name, partition))
                )
            else:
                parts.append((partition, ERR_FENCED_LEADER_EPOCH, -1, -1))
        if flex:
            r.tagged_fields()
        topics.append((name, parts))
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()
    if v >= 2:
        w.int32(0)  # throttle_time_ms
    wr_str = w.compact_string if flex else w.nullable_string
    if flex:
        w.compact_array_len(len(topics))
    else:
        w.int32(len(topics))
    for name, parts in topics:
        wr_str(name)
        if flex:
            w.compact_array_len(len(parts))
        else:
            w.int32(len(parts))
        for partition, err, epoch, end in parts:
            w.int16(err)
            w.int32(partition)
            if v >= 1:
                w.int32(epoch)
            w.int64(end)
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


ERR_ELECTION_NOT_NEEDED = 84
ERR_NO_REASSIGNMENT_IN_PROGRESS = 85
ERR_INVALID_REPLICA_ASSIGNMENT = 39
ERR_INVALID_UPDATE_VERSION = 95


def handle_elect_leaders(log: WireLog, payload: bytes) -> bytes:
    """ElectLeaders (key 43, v0-v2; flexible from v2). On a single-
    replica broker every partition's only replica IS the leader, so a
    preferred (type 0) or unclean (type 1) election for an existing
    partition answers ELECTION_NOT_NEEDED — the same answer a real
    broker gives when the preferred leader already leads; unknown
    partitions answer UNKNOWN_TOPIC_OR_PARTITION. A null topic list
    means "all partitions eligible for election", which here is none
    (nothing to move), so the response carries no per-partition rows —
    matching the broker's only-report-attempted-elections contract."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    flex = v >= 2
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=flex)
    rd_str = r.compact_string if flex else r.nullable_string
    rd_len = r.compact_array_len if flex else r.int32
    if v >= 1:
        r.int8()  # election_type
    n_topics = rd_len()
    results = []
    if n_topics >= 0:
        for _ in range(n_topics):
            name = rd_str()
            parts = []
            for _ in range(max(rd_len(), 0)):
                pid = r.int32()
                if log.has(name, pid):
                    parts.append((pid, ERR_ELECTION_NOT_NEEDED,
                                  "preferred leader already elected (single replica)"))
                else:
                    parts.append((pid, ERR_UNKNOWN_TOPIC_OR_PARTITION, None))
            if flex:
                r.tagged_fields()
            results.append((name, parts))
    r.int32()  # timeout_ms
    w = wire.Writer()
    w.int32(h.correlation_id)
    if flex:
        w.empty_tagged_fields()
    w.int32(0)  # throttle_time_ms
    if v >= 1:
        w.int16(wire.ERR_NONE)  # top-level error
    wr_str = w.compact_string if flex else w.nullable_string
    (w.compact_array_len if flex else w.int32)(len(results))
    for name, parts in results:
        wr_str(name)
        (w.compact_array_len if flex else w.int32)(len(parts))
        for pid, err, msg in parts:
            w.int32(pid)
            w.int16(err)
            wr_str(msg)
            if flex:
                w.empty_tagged_fields()
        if flex:
            w.empty_tagged_fields()
    if flex:
        w.empty_tagged_fields()
    return w.bytes()


def handle_alter_partition_reassignments(log: WireLog, payload: bytes) -> bytes:
    """AlterPartitionReassignments (key 45, v0; born flexible,
    KIP-455). Single-node semantics: the only legal replica set is
    [0] (a no-op reassignment → NONE); any other target is
    INVALID_REPLICA_ASSIGNMENT; a null replica list is a cancellation,
    and with no reassignment ever in progress that answers
    NO_REASSIGNMENT_IN_PROGRESS; unknown partitions answer
    UNKNOWN_TOPIC_OR_PARTITION."""
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=True)
    r.int32()  # timeout_ms
    topics = []
    for _ in range(max(r.compact_array_len(), 0)):
        name = r.compact_string()
        parts = []
        for _ in range(max(r.compact_array_len(), 0)):
            pid = r.int32()
            n_rep = r.compact_array_len()
            replicas = None
            if n_rep >= 0:
                replicas = [r.int32() for _ in range(n_rep)]
            r.tagged_fields()
            if not log.has(name, pid):
                parts.append((pid, ERR_UNKNOWN_TOPIC_OR_PARTITION, None))
            elif replicas is None:
                parts.append((pid, ERR_NO_REASSIGNMENT_IN_PROGRESS,
                              "no reassignment in progress to cancel"))
            elif replicas == [0]:
                parts.append((pid, wire.ERR_NONE, None))
            else:
                parts.append((pid, ERR_INVALID_REPLICA_ASSIGNMENT,
                              "single-node cluster: only replica set [0] exists"))
        r.tagged_fields()
        topics.append((name, parts))
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.empty_tagged_fields()
    w.int32(0)  # throttle_time_ms
    w.int16(wire.ERR_NONE)
    w.compact_string(None)  # error_message
    w.compact_array_len(len(topics))
    for name, parts in topics:
        w.compact_string(name)
        w.compact_array_len(len(parts))
        for pid, err, msg in parts:
            w.int32(pid)
            w.int16(err)
            w.compact_string(msg)
            w.empty_tagged_fields()
        w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def handle_list_partition_reassignments(log: WireLog, payload: bytes) -> bytes:
    """ListPartitionReassignments (key 46, v0; born flexible). The
    broker reports only ACTIVE reassignments; none ever exist here, so
    every response carries an empty topic list — for both the null
    (all) request and named partitions (omitted when not moving),
    exactly the steady-state answer of a healthy cluster."""
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=True)
    r.int32()  # timeout_ms
    n = r.compact_array_len()
    if n >= 0:
        for _ in range(n):
            r.compact_string()
            for _ in range(max(r.compact_array_len(), 0)):
                r.int32()
            r.tagged_fields()
    w = wire.Writer()
    w.int32(h.correlation_id)
    w.empty_tagged_fields()
    w.int32(0)  # throttle_time_ms
    w.int16(wire.ERR_NONE)
    w.compact_string(None)  # error_message
    w.compact_array_len(0)  # no active reassignments
    w.empty_tagged_fields()
    return w.bytes()


# Broker feature levels (KIP-584): the features UpdateFeatures may
# move, with their supported ranges. metadata.version mirrors a
# KRaft broker's primary feature lever.
SUPPORTED_FEATURES: dict[str, tuple[int, int]] = {"metadata.version": (1, 20)}
_UPGRADE_TYPE_SAFE_DOWNGRADE = 2
_UPGRADE_TYPE_UNSAFE_DOWNGRADE = 3


def handle_update_features(
    feature_levels: dict[str, int], payload: bytes
) -> bytes:
    """UpdateFeatures (key 57, v0-v1; born flexible, KIP-584).
    Finalized feature levels live in ``feature_levels`` (mutated on
    success). Per-feature validation mirrors the public broker rules:
    unknown features and out-of-range levels answer
    INVALID_UPDATE_VERSION; a downgrade requires the downgrade flag
    (v0 allow_downgrade / v1 upgrade_type >= 2); v1 validate_only
    checks without mutating. One failed update fails the whole batch
    (Kafka applies feature updates atomically)."""
    import struct as _struct

    v = _struct.unpack(">h", payload[2:4])[0]
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=True)
    r.int32()  # timeout_ms
    updates = []
    for _ in range(max(r.compact_array_len(), 0)):
        feature = r.compact_string()
        level = r.int16()
        if v == 0:
            allow_downgrade = r.bool_()
        else:
            allow_downgrade = r.int8() >= _UPGRADE_TYPE_SAFE_DOWNGRADE
        r.tagged_fields()
        updates.append((feature, level, allow_downgrade))
    validate_only = r.bool_() if v >= 1 else False
    r.tagged_fields()

    results = []
    for feature, level, allow_downgrade in updates:
        rng = SUPPORTED_FEATURES.get(feature)
        cur = feature_levels.get(feature, rng[0] if rng else 0)
        if rng is None:
            results.append((feature, ERR_INVALID_UPDATE_VERSION,
                            f"unknown feature '{feature}'"))
        elif not rng[0] <= level <= rng[1]:
            results.append((feature, ERR_INVALID_UPDATE_VERSION,
                            f"level {level} outside supported range {rng}"))
        elif level < cur and not allow_downgrade:
            results.append((feature, ERR_INVALID_UPDATE_VERSION,
                            f"downgrade from {cur} to {level} needs the downgrade flag"))
        else:
            results.append((feature, wire.ERR_NONE, None))
    batch_ok = all(err == wire.ERR_NONE for _, err, _ in results)
    if batch_ok and not validate_only:
        for feature, level, _ in updates:
            feature_levels[feature] = level

    w = wire.Writer()
    w.int32(h.correlation_id)
    w.empty_tagged_fields()
    w.int32(0)  # throttle_time_ms
    w.int16(wire.ERR_NONE if batch_ok else ERR_INVALID_UPDATE_VERSION)
    w.compact_string(None if batch_ok else "one or more feature updates failed")
    w.compact_array_len(len(results))
    for feature, err, msg in results:
        w.compact_string(feature)
        w.int16(err)
        w.compact_string(msg)
        w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def handle_describe_quorum(log: WireLog, payload: bytes, now_ms=None) -> bytes:
    """DescribeQuorum (key 55, v0-v1; born flexible, KIP-595/KIP-642).
    The KRaft metadata-quorum observability call `kafka-metadata-quorum
    describe` issues. This single-binary process IS its own metadata
    authority, so the answer is the degenerate-but-honest quorum: the
    requested __cluster_metadata partition reports leader 0 at epoch 0
    with one voter (replica 0, caught up with itself) and no
    observers; any other topic answers UNKNOWN_TOPIC_OR_PARTITION.
    v1 adds per-replica lastFetch/lastCaughtUp timestamps — the
    leader's own fetch state, i.e. "now"."""
    import struct as _struct
    import time as _time

    v = _struct.unpack(">h", payload[2:4])[0]
    now = int(_time.time() * 1000) if now_ms is None else now_ms
    r = wire.Reader(payload)
    h = wire.decode_request_header(r, flexible=True)
    topics = []
    for _ in range(max(r.compact_array_len(), 0)):
        name = r.compact_string()
        parts = [r.int32() for _ in range(max(r.compact_array_len(), 0))]
        r.tagged_fields()
        topics.append((name, parts))
    r.tagged_fields()

    w = wire.Writer()
    w.int32(h.correlation_id)
    w.empty_tagged_fields()
    w.int16(wire.ERR_NONE)  # top-level error
    w.compact_array_len(len(topics))
    for name, parts in topics:
        w.compact_string(name)
        w.compact_array_len(len(parts))
        for p in parts:
            known = name == "__cluster_metadata" and p == 0
            w.int32(p)
            w.int16(wire.ERR_NONE if known else ERR_UNKNOWN_TOPIC_OR_PARTITION)
            w.int32(0 if known else -1)  # leader_id
            w.int32(0)  # leader_epoch
            w.int64(0)  # high_watermark (empty metadata log)
            if known:
                w.compact_array_len(1)  # current_voters
                w.int32(0)  # replica_id
                w.int64(0)  # log_end_offset
                if v >= 1:
                    w.int64(now)  # last_fetch_timestamp
                    w.int64(now)  # last_caught_up_timestamp
                w.empty_tagged_fields()
            else:
                w.compact_array_len(0)
            w.compact_array_len(0)  # observers
            w.empty_tagged_fields()
        w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()
