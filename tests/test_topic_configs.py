"""Topic configs: CreateTopics configs stored, DescribeConfigs /
AlterConfigs wire round-trips, and config-driven retention on the
parquet topic log (the broker's periodic cleaner, driven by
retention.ms / retention.bytes exactly as in Kafka)."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from kcore_spark.protocol import wire
from kcore_spark.protocol.server import KafkaFrontend
from kcore_spark.sources.topic_log import TopicLog


def _create_with_configs(fe, name, configs, corr=93):
    w = wire.Writer()
    w.int16(wire.CREATE_TOPICS_KEY).int16(0).int32(corr)
    w.nullable_string("pytest")
    w.int32(1)
    w.nullable_string(name)
    w.int32(1)
    w.int16(1)
    w.int32(0)  # assignments
    w.int32(len(configs))
    for k, v in configs.items():
        w.nullable_string(k)
        w.nullable_string(v)
    w.int32(30000)
    return fe.handle_request(w.bytes())


def _describe(fe, name, names=None, corr=94):
    w = wire.Writer()
    w.int16(wire.DESCRIBE_CONFIGS_KEY).int16(0).int32(corr)
    w.nullable_string("pytest")
    w.int32(1)
    w.int8(2)  # TOPIC
    w.nullable_string(name)
    if names is None:
        w.int32(-1)
    else:
        w.int32(len(names))
        for n in names:
            w.nullable_string(n)
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == corr
    r.int32()  # throttle
    assert r.int32() == 1
    err = r.int16()
    r.nullable_string()  # error_message
    r.int8()
    r.nullable_string()
    cfg = {}
    for _ in range(r.int32()):
        k = r.nullable_string()
        v = r.nullable_string()
        r.bool_(), r.bool_(), r.bool_()
        cfg[k] = v
    return err, cfg


def test_configs_lifecycle_over_the_wire():
    fe = KafkaFrontend()
    _create_with_configs(fe, "cfg", {"retention.ms": "86400000", "cleanup.policy": "delete"})
    err, cfg = _describe(fe, "cfg")
    assert err == wire.ERR_NONE
    assert cfg == {"retention.ms": "86400000", "cleanup.policy": "delete"}
    # filtered describe
    err, cfg = _describe(fe, "cfg", names=["retention.ms"])
    assert cfg == {"retention.ms": "86400000"}
    # alter replaces the config set (v0 contract)
    w = wire.Writer()
    w.int16(wire.ALTER_CONFIGS_KEY).int16(0).int32(95)
    w.nullable_string("pytest")
    w.int32(1)
    w.int8(2)
    w.nullable_string("cfg")
    w.int32(1)
    w.nullable_string("retention.bytes")
    w.nullable_string("1024")
    w.bool_(False)  # validate_only
    r = wire.Reader(fe.handle_request(w.bytes()))
    assert r.int32() == 95
    r.int32()
    assert r.int32() == 1 and r.int16() == wire.ERR_NONE
    _, cfg = _describe(fe, "cfg")
    assert cfg == {"retention.bytes": "1024"}
    # unknown topic
    err, _ = _describe(fe, "ghost")
    assert err == wire.ERR_UNKNOWN_TOPIC_OR_PARTITION


def _ts_records(spark, n, start_seq, base_ms):
    return spark.range(n).select(
        F.encode((F.col("id") % 5).cast("string"), "utf-8").alias("key"),
        F.encode((F.col("id") + start_seq).cast("string"), "utf-8").alias("value"),
        F.timestamp_millis(F.lit(base_ms) + F.col("id") * 10).alias("timestamp"),
        (F.col("id") + start_seq).alias("seq"),
    )


def test_config_driven_retention(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_cfg_") as d:
        log = TopicLog(spark, d)
        log.create_topic("t", 1, configs={"retention.ms": "3600000"})
        assert log.topic_config("t") == {"retention.ms": "3600000"}
        log.produce("t", _ts_records(spark, 10, 0, 1_000_000), order_by=["seq"])
        log.produce("t", _ts_records(spark, 10, 10, 9_000_000), order_by=["seq"])
        # cleaner pass at now=9.5M: the 1M-ms segment is beyond 1h
        starts = log.apply_retention_from_config("t", now_ms=9_500_000)
        assert starts == {0: 10}
        assert log.scan("t").agg(F.min("offset")).collect()[0][0] == 10
        # alter to size-based, tiny budget: everything but the active
        # segment goes
        log.alter_topic_config("t", {"retention.ms": None, "retention.bytes": "0"})
        assert log.topic_config("t") == {"retention.bytes": "0"}
        starts = log.apply_retention_from_config("t", now_ms=9_500_000)
        assert starts == {0: 10}  # only the tail segment remains anyway
        # a topic with no retention configs is a no-op
        log.create_topic("keep", 1)
        log.produce("keep", _ts_records(spark, 5, 0, 1_000), order_by=["seq"])
        assert log.apply_retention_from_config("keep") == {}
        assert log.scan("keep").count() == 5


def test_cleanup_policy_routes_compact_and_delete(spark):
    with tempfile.TemporaryDirectory(prefix="kcore_clean_") as d:
        log = TopicLog(spark, d)
        # compacted topic: duplicate keys collapse, offsets preserved
        log.create_topic("c", 1, configs={"cleanup.policy": "compact"})
        log.produce("c", _ts_records(spark, 10, 0, 1_000_000), order_by=["seq"])
        log.produce("c", _ts_records(spark, 10, 10, 2_000_000), order_by=["seq"])
        out = log.run_cleanup("c")
        assert out["policy"] == "compact"
        # 5 distinct keys → 5 latest survive (all values keyed id%5)
        assert out["retained"] == 5
        assert log.scan("c").count() == 5
        # delete-policy topic: retention applies, no compaction
        log.create_topic("t", 1, configs={"cleanup.policy": "delete", "retention.ms": "3600000"})
        log.produce("t", _ts_records(spark, 10, 0, 1_000_000), order_by=["seq"])
        log.produce("t", _ts_records(spark, 10, 10, 9_000_000), order_by=["seq"])
        out = log.run_cleanup("t", now_ms=9_500_000)
        assert out["policy"] == "delete" and out["log_starts"] == {0: 10}
        # run_cleanup_all covers every topic in one pass
        all_out = log.run_cleanup_all(now_ms=9_500_000)
        assert set(all_out) == {"c", "t"}
