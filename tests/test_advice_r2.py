"""Round-2 ADVICE fixes: Metadata id-only lookups, snappy
declared-length bound, stale-manifest fetch fallback, commit_seq
seeding from disk."""

from __future__ import annotations

import glob
import json
import os
import struct
import tempfile
import time
import uuid as uuid_mod

import pytest
from pyspark.sql import functions as F

from kcore_spark.protocol import wire
from kcore_spark.protocol.records import decompress_block
from kcore_spark.protocol.server import KafkaFrontend
from kcore_spark.sources.topic_log import TopicLog


# ------------------------------------------------ Metadata id-only


@pytest.fixture()
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("alpha", 2)
    return f


def _metadata_id_only_payload(version: int, topic_id: bytes) -> bytes:
    """v10+ request asking for a topic by uuid with a NULL name."""
    w = wire.Writer()
    w.int16(wire.METADATA_KEY).int16(version).int32(91)
    w.nullable_string("pytest")
    w.empty_tagged_fields()
    w.compact_array_len(1)
    w.uuid(topic_id)
    w.compact_string(None)  # id-only: name is null
    w.empty_tagged_fields()
    w.bool_(False)  # allow_auto_topic_creation
    if version <= 10:
        w.bool_(False)  # include_cluster_authorized_operations
    w.bool_(False)  # include_topic_authorized_operations
    w.empty_tagged_fields()
    return w.bytes()


@pytest.mark.parametrize("version", [10, 11, 12])
def test_metadata_id_only_lookup_echoes_id(fe, version):
    req_id = uuid_mod.uuid4().bytes
    resp = fe.handle_request(_metadata_id_only_payload(version, req_id))
    corr, _, topics = wire.decode_metadata_response(resp, version)
    assert corr == 91
    [(err, name, tid, parts)] = topics
    assert err == wire.ERR_UNKNOWN_TOPIC_ID
    assert tid == req_id  # requested id echoed, not a name-derived one
    # name is non-nullable until v12: empty string there, null after
    assert name is None if version >= 12 else name == ""
    assert parts == []


def test_metadata_unknown_by_name_reports_zero_uuid(fe):
    # by-name misses keep UNKNOWN_TOPIC_OR_PARTITION and have no id
    w = wire.Writer()
    w.int16(wire.METADATA_KEY).int16(10).int32(92)
    w.nullable_string("pytest")
    w.empty_tagged_fields()
    w.compact_array_len(1)
    w.uuid(b"\x00" * 16)
    w.compact_string("nope")
    w.empty_tagged_fields()
    w.bool_(False)
    w.bool_(False)
    w.bool_(False)
    w.empty_tagged_fields()
    resp = fe.handle_request(w.bytes())
    _, _, topics = wire.decode_metadata_response(resp, 10)
    [(err, name, tid, _)] = topics
    assert err == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION
    assert name == "nope" and tid == b"\x00" * 16


# ------------------------------------------------ snappy length bound


def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def test_snappy_raw_block_declared_length_bounded():
    # 20-byte block claiming 8 TiB uncompressed: must be rejected
    # before any allocation is attempted
    bomb = _varint(8 << 40) + b"\x00" * 14
    with pytest.raises(ValueError, match="snappy"):
        decompress_block("snappy", bomb)


def test_snappy_xerial_block_declared_length_bounded():
    block = _varint(1 << 35) + b"\x00" * 10
    framed = b"\x82SNAPPY\x00" + struct.pack(">ii", 1, 1) + struct.pack(">i", len(block)) + block
    with pytest.raises(ValueError, match="snappy"):
        decompress_block("snappy", framed)


def test_snappy_oversized_varint_rejected():
    with pytest.raises(ValueError, match="varint"):
        decompress_block("snappy", b"\xff" * 10 + b"\x01")


# ------------------------------------------------ stale manifest


def _records(spark, n, start=0):
    return spark.range(start, start + n).select(
        F.encode((F.col("id") % 5).cast("string"), "utf-8").alias("key"),
        F.encode(F.col("id").cast("string"), "utf-8").alias("value"),
        F.col("id").alias("seq"),
    )


def test_fetch_survives_manifest_listing_missing_file(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_stale_") as d:
        log = TopicLog(spark, d)
        log.create_topic("t", 1)
        log.produce("t", _records(spark, 20), order_by=["seq"])
        log.produce("t", _records(spark, 20, start=20), order_by=["seq"])
        # simulate the compaction race: a segment the manifest still
        # lists disappears out from under a reader
        files = sorted(glob.glob(os.path.join(d, "t", "data", "partition=0", "*.parquet")))
        assert len(files) >= 2
        os.remove(files[0])
        got = log.fetch("t", 0, 0, 100)  # must re-plan, not fail
        rows = got.collect()
        assert 0 < len(rows) < 40  # remaining segment's records only
        # and the healed manifest no longer references the missing file
        with open(os.path.join(d, "t", "_manifest.json")) as f:
            man = json.load(f)
        listed = {e["file"] for es in man.values() for e in es}
        assert os.path.basename(files[0]) not in {os.path.basename(x) for x in listed}


def test_compact_refreshes_manifest_before_deleting_segments(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_cmp_") as d:
        log = TopicLog(spark, d)
        log.create_topic("t", 1)
        log.produce("t", _records(spark, 30), order_by=["seq"])
        log.produce("t", _records(spark, 30, start=30), order_by=["seq"])
        log.compact("t")
        # post-compaction invariant: every manifest entry exists on disk
        with open(os.path.join(d, "t", "_manifest.json")) as f:
            man = json.load(f)
        data_dir = os.path.join(d, "t", "data")
        for entries in man.values():
            for e in entries:
                assert os.path.exists(os.path.join(data_dir, e["file"]))


# ------------------------------------------------ commit_seq seeding


def test_commit_seq_seeded_from_disk_across_restart(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_seq_") as d:
        # a previous process committed with a clock far in OUR future
        # (i.e. our wall clock stepped backwards across the restart)
        future = time.time_ns() + 10**15
        offsets = os.path.join(d, "__consumer_offsets")
        os.makedirs(offsets)
        with open(os.path.join(offsets, "commit-planted.json"), "w") as f:
            json.dump(
                {
                    "group_id": "g",
                    "topic": "t",
                    "partition": 0,
                    "committed_offset": 5,
                    "commit_seq": future,
                },
                f,
            )
        log = TopicLog(spark, d)  # fresh instance = restart
        log.create_topic("t", 1)
        log.commit_offset("g", "t", 0, 9)
        # the new commit must win last-writer-wins despite the clock step
        got = {r["partition"]: r["committed_offset"] for r in log.fetch_offsets("g").collect()}
        assert got == {0: 9}
        seqs = []
        for fn in os.listdir(offsets):
            with open(os.path.join(offsets, fn)) as f:
                seqs.append(json.load(f)["commit_seq"])
        assert max(seqs) > future  # seeded past the planted commit


def test_metadata_id_only_lookup_resolves_known_topic(fe):
    """Topic ids are md5-deterministic, so an id-only v10+ lookup for a
    topic that EXISTS resolves to the full topic row (name + partition
    count), not an UNKNOWN_TOPIC_ID echo."""
    known_id = wire.topic_uuid("alpha")
    resp = fe.handle_request(_metadata_id_only_payload(10, known_id))
    corr, _, topics = wire.decode_metadata_response(resp, 10)
    [(err, name, tid, parts)] = topics
    assert err == wire.ERR_NONE
    assert name == "alpha" and tid == known_id
    assert len(parts) == 2  # the topic's real partition list
