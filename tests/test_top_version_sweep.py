"""Top-version behavioral sweep (VERDICT r7 #8): every API key the
broker advertises gets at least one spec-derived request frame at its
MAXIMUM advertised version, sent through the real dispatch path.

Two guarantees, both driven by ``wire.SUPPORTED_APIS`` itself so they
cannot drift from the advertisement:

1. ``test_registry_pins_every_ceiling`` — the sweep's builder table
   covers exactly the advertised keys, each pinned to the advertised
   max version. Lifting a ceiling in SUPPORTED_APIS without adding a
   top-version frame here fails THIS test, by name, before any wire
   bytes move.
2. ``test_top_version_roundtrip`` — each frame dispatches to a real
   handler: the response is non-None (the body decoded), echoes the
   correlation id, and is not byte-equal to the broker's
   unsupported-version fallback (an ApiVersions-shaped error 35,
   server.py's final return) — i.e. the (key, max_version) route
   genuinely exists and parses the modern body shape.

The reference serves exactly one API (ApiVersions k18,
pkg/kafka/kafka_api.go:106-125); this sweep pins the 59-key surface
this repo declares on top of it.
"""

from __future__ import annotations

import struct

import pytest

from kcore_spark.protocol import wire
from kcore_spark.protocol.records import Record, encode_record_batch
from kcore_spark.protocol.server import KafkaFrontend

CORR = 7777


def _hdr(key: int, version: int, flex: bool) -> wire.Writer:
    w = wire.Writer()
    w.int16(key).int16(version).int32(CORR)
    w.nullable_string("sweep")
    if flex:
        w.empty_tagged_fields()
    return w


def _batch() -> bytes:
    return encode_record_batch([Record(key=b"k", value=b"v", timestamp_ms=1000)])


# --------------------------------------------------------------- builders
# One function per advertised API key. Each returns the full request
# payload (header + body) at the version named in REGISTRY — the
# broker's advertised ceiling for that key.


def _produce_v11() -> bytes:
    w = _hdr(wire.PRODUCE_KEY, 11, flex=True)
    w.compact_string(None)  # transactional_id
    w.int16(1).int32(1000)  # acks, timeout_ms
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0)
    w.compact_bytes(_batch())
    w.empty_tagged_fields()  # partition
    w.empty_tagged_fields()  # topic
    w.empty_tagged_fields()  # body
    return w.bytes()


def _fetch_v13() -> bytes:
    w = _hdr(wire.FETCH_KEY, 13, flex=True)
    w.int32(-1)  # replica_id
    w.int32(0).int32(0).int32(1 << 20)  # max_wait, min_bytes, max_bytes
    w.int8(0)  # isolation_level
    w.int32(0).int32(-1)  # session_id, session_epoch
    w.compact_array_len(1)
    w.uuid(wire.topic_uuid("swp"))  # v13: id-addressed (KIP-516)
    w.compact_array_len(1)
    w.int32(0).int32(-1)  # partition, current_leader_epoch
    w.int64(0).int64(-1).int32(1 << 20)  # offset, log_start, max_bytes
    w.empty_tagged_fields()  # partition
    w.empty_tagged_fields()  # topic
    w.compact_array_len(0)  # forgotten_topics_data
    w.compact_string("")  # rack_id
    w.empty_tagged_fields()
    return w.bytes()


def _list_offsets_v9() -> bytes:
    w = _hdr(wire.LIST_OFFSETS_KEY, 9, flex=True)
    w.int32(-1).int8(0)  # replica_id, isolation_level
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0).int32(-1)  # partition, current_leader_epoch
    w.int64(-5)  # KIP-1005 LATEST_TIERED — the v9-only sentinel
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _metadata_v12() -> bytes:
    w = _hdr(wire.METADATA_KEY, 12, flex=True)
    w.unsigned_varint(0)  # null topics = all
    w.bool_(False)  # allow_auto_topic_creation
    w.bool_(False)  # include_topic_authorized_operations
    w.empty_tagged_fields()
    return w.bytes()


def _offset_commit_v8() -> bytes:
    w = _hdr(wire.OFFSET_COMMIT_KEY, 8, flex=True)
    w.compact_string("swg").int32(-1)  # group, generation
    w.compact_string("")  # member_id
    w.compact_string(None)  # group_instance_id (v7+)
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0).int64(5).int32(-1)  # partition, offset, leader_epoch (v6+)
    w.compact_string(None)  # metadata
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _offset_fetch_v9() -> bytes:
    w = _hdr(wire.OFFSET_FETCH_KEY, 9, flex=True)
    w.compact_array_len(1)  # groups (v8+ batched, KIP-709)
    w.compact_string("swg")
    w.compact_string(None).int32(-1)  # member_id, member_epoch (v9, KIP-848)
    w.unsigned_varint(0)  # null topics = everything committed
    w.empty_tagged_fields()  # group
    w.bool_(False)  # require_stable (v7+, KIP-447)
    w.empty_tagged_fields()
    return w.bytes()


def _find_coordinator_v4() -> bytes:
    w = _hdr(wire.FIND_COORDINATOR_KEY, 4, flex=True)
    w.int8(0)  # key_type: group
    w.compact_array_len(1)  # coordinator_keys (v4 batched, KIP-699)
    w.compact_string("swg")
    w.empty_tagged_fields()
    return w.bytes()


def _join_group_v9() -> bytes:
    w = _hdr(wire.JOIN_GROUP_KEY, 9, flex=True)
    w.compact_string("swg")
    w.int32(10000).int32(30000)  # session_timeout, rebalance_timeout
    w.compact_string("")  # member_id (empty → KIP-394 two-step)
    w.compact_string(None)  # group_instance_id
    w.compact_string("consumer")
    w.compact_array_len(1)
    w.compact_string("range").compact_bytes(b"")
    w.empty_tagged_fields()
    w.compact_string(None)  # reason (v8+, KIP-800)
    w.empty_tagged_fields()
    return w.bytes()


def _heartbeat_v4() -> bytes:
    w = _hdr(wire.HEARTBEAT_KEY, 4, flex=True)
    w.compact_string("swg").int32(0).compact_string("m")
    w.compact_string(None)  # group_instance_id (v3+)
    w.empty_tagged_fields()
    return w.bytes()


def _leave_group_v5() -> bytes:
    w = _hdr(wire.LEAVE_GROUP_KEY, 5, flex=True)
    w.compact_string("swg")
    w.compact_array_len(1)  # members (v3+, KIP-345)
    w.compact_string("m").compact_string(None)
    w.compact_string(None)  # reason (v5, KIP-800)
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _sync_group_v5() -> bytes:
    w = _hdr(wire.SYNC_GROUP_KEY, 5, flex=True)
    w.compact_string("swg").int32(0).compact_string("m")
    w.compact_string(None)  # group_instance_id (v3+)
    w.compact_string(None).compact_string(None)  # protocol type/name (v5, KIP-430)
    w.compact_array_len(0)  # assignments
    w.empty_tagged_fields()
    return w.bytes()


def _create_topics_v7() -> bytes:
    w = _hdr(wire.CREATE_TOPICS_KEY, 7, flex=True)
    w.compact_array_len(1)
    w.compact_string("sw-created")
    w.int32(2).int16(1)  # num_partitions, replication_factor
    w.compact_array_len(0)  # assignments
    w.compact_array_len(0)  # configs
    w.empty_tagged_fields()
    w.int32(5000)  # timeout_ms
    w.bool_(False)  # validate_only (v1+)
    w.empty_tagged_fields()
    return w.bytes()


def _delete_topics_v6() -> bytes:
    w = _hdr(wire.DELETE_TOPICS_KEY, 6, flex=True)
    w.compact_array_len(1)  # v6: (name, topic_id) structs (KIP-516)
    w.compact_string("sw-created")
    w.uuid(b"\x00" * 16)
    w.empty_tagged_fields()
    w.int32(5000)
    w.empty_tagged_fields()
    return w.bytes()


def _delete_records_v2() -> bytes:
    w = _hdr(wire.DELETE_RECORDS_KEY, 2, flex=True)
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0).int64(0)  # partition, before-offset
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.int32(5000)
    w.empty_tagged_fields()
    return w.bytes()


def _describe_groups_v5() -> bytes:
    w = _hdr(wire.DESCRIBE_GROUPS_KEY, 5, flex=True)
    w.compact_array_len(1)
    w.compact_string("swg")
    w.bool_(False)  # include_authorized_operations (v3+)
    w.empty_tagged_fields()
    return w.bytes()


def _list_groups_v5() -> bytes:
    w = _hdr(wire.LIST_GROUPS_KEY, 5, flex=True)
    w.compact_array_len(0)  # states_filter (v4+, KIP-518)
    w.compact_array_len(0)  # types_filter (v5, KIP-848)
    w.empty_tagged_fields()
    return w.bytes()


def _delete_groups_v2() -> bytes:
    w = _hdr(wire.DELETE_GROUPS_KEY, 2, flex=True)
    w.compact_array_len(1)
    w.compact_string("sw-nogroup")
    w.empty_tagged_fields()
    return w.bytes()


def _init_producer_id_v4() -> bytes:
    w = _hdr(wire.INIT_PRODUCER_ID_KEY, 4, flex=True)
    w.compact_string(None)  # transactional_id
    w.int32(60000)  # transaction_timeout_ms
    w.int64(-1).int16(-1)  # current pid/epoch (v3+, KIP-360)
    w.empty_tagged_fields()
    return w.bytes()


def _add_partitions_to_txn_v5() -> bytes:
    w = _hdr(wire.ADD_PARTITIONS_TO_TXN_KEY, 5, flex=True)
    w.compact_array_len(1)  # v4+ batched transactions (KIP-890)
    w.compact_string("sw-tid").int64(0).int16(0)
    w.bool_(True)  # verify_only
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0)
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _add_offsets_to_txn_v3() -> bytes:
    w = _hdr(wire.ADD_OFFSETS_TO_TXN_KEY, 3, flex=True)
    w.compact_string("sw-tid").int64(0).int16(0)
    w.compact_string("swg")
    w.empty_tagged_fields()
    return w.bytes()


def _txn_offset_commit_v3() -> bytes:
    w = _hdr(wire.TXN_OFFSET_COMMIT_KEY, 3, flex=True)
    w.compact_string("sw-tid").compact_string("swg")
    w.int64(0).int16(0)  # pid, epoch
    w.int32(-1)  # generation_id (v3+)
    w.compact_string("").compact_string(None)  # member/instance (v3+)
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0).int64(3).int32(-1)  # partition, offset, leader_epoch (v2+)
    w.compact_string(None)  # metadata
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _end_txn_v5() -> bytes:
    w = _hdr(wire.END_TXN_KEY, 5, flex=True)
    w.compact_string("sw-tid").int64(0).int16(0)
    w.bool_(False)  # committed=False: abort (no open txn → error body, fine)
    w.empty_tagged_fields()
    return w.bytes()


def _describe_configs_v4() -> bytes:
    w = _hdr(wire.DESCRIBE_CONFIGS_KEY, 4, flex=True)
    w.compact_array_len(1)
    w.int8(2)  # TOPIC
    w.compact_string("swp")
    w.unsigned_varint(0)  # null config names = all
    w.empty_tagged_fields()
    w.bool_(True)  # include_synonyms (v1+)
    w.bool_(False)  # include_documentation (v3+)
    w.empty_tagged_fields()
    return w.bytes()


def _alter_configs_v2() -> bytes:
    w = _hdr(wire.ALTER_CONFIGS_KEY, 2, flex=True)
    w.compact_array_len(1)
    w.int8(2).compact_string("swp")
    w.compact_array_len(1)
    w.compact_string("retention.ms").compact_string("3600000")
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.bool_(True)  # validate_only
    w.empty_tagged_fields()
    return w.bytes()


def _sasl_handshake_v1() -> bytes:
    w = _hdr(wire.SASL_HANDSHAKE_KEY, 1, flex=False)
    w.nullable_string("PLAIN")
    return w.bytes()


def _sasl_authenticate_v1() -> bytes:
    w = _hdr(wire.SASL_AUTHENTICATE_KEY, 1, flex=False)
    w.nullable_bytes(b"\x00user\x00pass")
    return w.bytes()


def _offset_delete_v0() -> bytes:
    w = _hdr(wire.OFFSET_DELETE_KEY, 0, flex=False)
    w.nullable_string("swg")
    w.int32(1)
    w.nullable_string("swp")
    w.int32(1).int32(0)
    return w.bytes()


def _acl_filter(w: wire.Writer) -> wire.Writer:
    w.int8(1)  # resource_type ANY
    w.nullable_string(None)
    w.int8(1)  # pattern_type ANY (v1)
    w.nullable_string(None).nullable_string(None)  # principal, host
    w.int8(1).int8(1)  # operation ANY, permission ANY
    return w


def _describe_acls_v1() -> bytes:
    return _acl_filter(_hdr(wire.DESCRIBE_ACLS_KEY, 1, flex=False)).bytes()


def _create_acls_v1() -> bytes:
    w = _hdr(wire.CREATE_ACLS_KEY, 1, flex=False)
    w.int32(1)
    w.int8(2)  # TOPIC
    w.nullable_string("swp")
    w.int8(3)  # LITERAL (v1)
    w.nullable_string("User:sweep").nullable_string("*")
    w.int8(3).int8(3)  # READ, ALLOW
    return w.bytes()


def _delete_acls_v1() -> bytes:
    w = _hdr(wire.DELETE_ACLS_KEY, 1, flex=False)
    w.int32(1)
    return _acl_filter(w).bytes()


def _create_partitions_v3() -> bytes:
    w = _hdr(wire.CREATE_PARTITIONS_KEY, 3, flex=True)
    w.compact_array_len(1)
    w.compact_string("swp").int32(4)
    w.unsigned_varint(0)  # null assignments
    w.empty_tagged_fields()
    w.int32(5000)
    w.bool_(True)  # validate_only: no mutation from the sweep
    w.empty_tagged_fields()
    return w.bytes()


def _describe_log_dirs_v2() -> bytes:
    w = _hdr(wire.DESCRIBE_LOG_DIRS_KEY, 2, flex=True)
    w.unsigned_varint(0)  # null topics = all
    w.empty_tagged_fields()
    return w.bytes()


def _telemetry_v0() -> bytes:
    w = _hdr(wire.GET_TELEMETRY_SUBSCRIPTIONS_KEY, 0, flex=True)
    w.uuid(b"\x00" * 16)  # client_instance_id: request a fresh one
    w.empty_tagged_fields()
    return w.bytes()


def _push_telemetry_v0() -> bytes:
    w = _hdr(wire.PUSH_TELEMETRY_KEY, 0, flex=True)
    w.uuid(b"\x11" * 16)  # client_instance_id
    w.int32(0)  # subscription_id (the broker's empty subscription)
    w.bool_(True)  # terminating
    w.int8(0)  # compression_type: none
    w.compact_bytes(b"")  # metrics
    w.empty_tagged_fields()
    return w.bytes()


def _list_client_metrics_resources_v0() -> bytes:
    w = _hdr(wire.LIST_CLIENT_METRICS_RESOURCES_KEY, 0, flex=True)
    w.empty_tagged_fields()
    return w.bytes()


def _describe_topic_partitions_v0() -> bytes:
    w = _hdr(wire.DESCRIBE_TOPIC_PARTITIONS_KEY, 0, flex=True)
    w.compact_array_len(1)
    w.compact_string("swp")
    w.empty_tagged_fields()  # topic
    w.int32(100)  # response_partition_limit
    w.int8(-1)  # null cursor
    w.empty_tagged_fields()
    return w.bytes()


def _incremental_alter_configs_v1() -> bytes:
    w = _hdr(wire.INCREMENTAL_ALTER_CONFIGS_KEY, 1, flex=True)
    w.compact_array_len(1)
    w.int8(2).compact_string("swp")
    w.compact_array_len(1)
    w.compact_string("retention.ms").int8(0).compact_string("3600000")  # SET
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.bool_(True)  # validate_only
    w.empty_tagged_fields()
    return w.bytes()


def _describe_cluster_v1() -> bytes:
    w = _hdr(wire.DESCRIBE_CLUSTER_KEY, 1, flex=True)
    w.bool_(False)  # include_cluster_authorized_operations
    w.int8(1)  # endpoint_type: broker (KIP-919)
    w.empty_tagged_fields()
    return w.bytes()


def _describe_producers_v0() -> bytes:
    w = _hdr(wire.DESCRIBE_PRODUCERS_KEY, 0, flex=True)
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0)
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _describe_transactions_v0() -> bytes:
    w = _hdr(wire.DESCRIBE_TRANSACTIONS_KEY, 0, flex=True)
    w.compact_array_len(1)
    w.compact_string("sw-nope")
    w.empty_tagged_fields()
    return w.bytes()


def _list_transactions_v0() -> bytes:
    w = _hdr(wire.LIST_TRANSACTIONS_KEY, 0, flex=True)
    w.compact_array_len(0)  # state_filters
    w.compact_array_len(0)  # producer_id_filters
    w.empty_tagged_fields()
    return w.bytes()


def _describe_client_quotas_v0() -> bytes:
    w = _hdr(wire.DESCRIBE_CLIENT_QUOTAS_KEY, 0, flex=False)
    w.int32(0)  # components: none = all configured entities
    w.bool_(False)  # strict
    return w.bytes()


def _alter_client_quotas_v0() -> bytes:
    w = _hdr(wire.ALTER_CLIENT_QUOTAS_KEY, 0, flex=False)
    w.int32(1)
    w.int32(1)
    w.nullable_string("client-id").nullable_string("sw-client")
    w.int32(1)
    w.nullable_string("producer_byte_rate").float64(1e6).bool_(False)
    w.bool_(True)  # validate_only
    return w.bytes()


def _describe_user_scram_v0() -> bytes:
    w = _hdr(wire.DESCRIBE_USER_SCRAM_CREDENTIALS_KEY, 0, flex=True)
    w.unsigned_varint(0)  # null users = all
    w.empty_tagged_fields()
    return w.bytes()


def _alter_user_scram_v0() -> bytes:
    w = _hdr(wire.ALTER_USER_SCRAM_CREDENTIALS_KEY, 0, flex=True)
    w.compact_array_len(0)  # deletions
    w.compact_array_len(0)  # upsertions
    w.empty_tagged_fields()
    return w.bytes()


def _consumer_group_heartbeat_v1() -> bytes:
    w = _hdr(wire.CONSUMER_GROUP_HEARTBEAT_KEY, 1, flex=True)
    w.compact_string("sw848").compact_string("")
    w.int32(0)  # member_epoch: join
    w.compact_string(None).compact_string(None)  # instance, rack
    w.int32(30000)  # rebalance_timeout_ms
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_string(None)  # subscribed_topic_regex (v1, Kafka 4.0)
    w.compact_string(None)  # server_assignor
    w.unsigned_varint(0)  # null owned partitions
    w.empty_tagged_fields()
    return w.bytes()


def _consumer_group_describe_v1() -> bytes:
    w = _hdr(wire.CONSUMER_GROUP_DESCRIBE_KEY, 1, flex=True)
    w.compact_array_len(1)
    w.compact_string("sw848")
    w.bool_(False)
    w.empty_tagged_fields()
    return w.bytes()


def _api_versions_v3() -> bytes:
    w = _hdr(wire.API_VERSIONS_KEY, 3, flex=True)
    w.compact_string("sweep").compact_string("1.0")
    w.empty_tagged_fields()
    return w.bytes()


def _offset_for_leader_epoch_v4() -> bytes:
    w = _hdr(wire.OFFSET_FOR_LEADER_EPOCH_KEY, 4, flex=True)
    w.int32(-1)  # replica_id: consumer
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0)  # partition
    w.int32(0)  # current_leader_epoch
    w.int32(0)  # leader_epoch
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _create_delegation_token_v3() -> bytes:
    w = _hdr(wire.CREATE_DELEGATION_TOKEN_KEY, 3, flex=True)
    w.compact_string(None).compact_string(None)  # owner: self
    w.compact_array_len(1)
    w.compact_string("User").compact_string("renewer")
    w.empty_tagged_fields()
    w.int64(-1)  # max_lifetime_ms: broker default
    w.empty_tagged_fields()
    return w.bytes()


def _renew_delegation_token_v2() -> bytes:
    w = _hdr(wire.RENEW_DELEGATION_TOKEN_KEY, 2, flex=True)
    w.compact_bytes(b"\x00" * 64)
    w.int64(3600_000)
    w.empty_tagged_fields()
    return w.bytes()


def _expire_delegation_token_v2() -> bytes:
    w = _hdr(wire.EXPIRE_DELEGATION_TOKEN_KEY, 2, flex=True)
    w.compact_bytes(b"\x00" * 64)
    w.int64(-1)
    w.empty_tagged_fields()
    return w.bytes()


def _elect_leaders_v2() -> bytes:
    w = _hdr(wire.ELECT_LEADERS_KEY, 2, flex=True)
    w.int8(0)  # election_type: preferred
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0)
    w.empty_tagged_fields()
    w.int32(5000)  # timeout_ms
    w.empty_tagged_fields()
    return w.bytes()


def _alter_partition_reassignments_v0() -> bytes:
    w = _hdr(wire.ALTER_PARTITION_REASSIGNMENTS_KEY, 0, flex=True)
    w.int32(5000)  # timeout_ms
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0)
    w.compact_array_len(1)
    w.int32(0)  # target replicas [0]: the single-node no-op
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _list_partition_reassignments_v0() -> bytes:
    w = _hdr(wire.LIST_PARTITION_REASSIGNMENTS_KEY, 0, flex=True)
    w.int32(5000)  # timeout_ms
    w.compact_array_len(-1)  # null topics: all active reassignments
    w.empty_tagged_fields()
    return w.bytes()


def _write_txn_markers_v1() -> bytes:
    w = _hdr(wire.WRITE_TXN_MARKERS_KEY, 1, flex=True)
    w.compact_array_len(1)
    w.int64(99).int16(0)  # producer_id, producer_epoch
    w.bool_(False)  # abort
    w.compact_array_len(1)
    w.compact_string("swp")
    w.compact_array_len(1)
    w.int32(0)
    w.empty_tagged_fields()
    w.int32(0)  # coordinator_epoch
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _describe_quorum_v1() -> bytes:
    w = _hdr(wire.DESCRIBE_QUORUM_KEY, 1, flex=True)
    w.compact_array_len(1)
    w.compact_string("__cluster_metadata")
    w.compact_array_len(1)
    w.int32(0)
    w.empty_tagged_fields()
    w.empty_tagged_fields()
    return w.bytes()


def _update_features_v1() -> bytes:
    w = _hdr(wire.UPDATE_FEATURES_KEY, 1, flex=True)
    w.int32(5000)  # timeout_ms
    w.compact_array_len(1)
    w.compact_string("metadata.version")
    w.int16(5)
    w.int8(1)  # upgrade_type: upgrade
    w.empty_tagged_fields()
    w.bool_(True)  # validate_only
    w.empty_tagged_fields()
    return w.bytes()


def _describe_delegation_token_v3() -> bytes:
    w = _hdr(wire.DESCRIBE_DELEGATION_TOKEN_KEY, 3, flex=True)
    w.compact_array_len(-1)  # null owners: all tokens
    w.empty_tagged_fields()
    return w.bytes()


# key → (pinned top version, builder). test_registry_pins_every_ceiling
# cross-checks the pins against SUPPORTED_APIS in both directions.
REGISTRY: dict[int, tuple[int, object]] = {
    wire.PRODUCE_KEY: (11, _produce_v11),
    wire.FETCH_KEY: (13, _fetch_v13),
    wire.LIST_OFFSETS_KEY: (9, _list_offsets_v9),
    wire.METADATA_KEY: (12, _metadata_v12),
    wire.OFFSET_COMMIT_KEY: (8, _offset_commit_v8),
    wire.OFFSET_FETCH_KEY: (9, _offset_fetch_v9),
    wire.FIND_COORDINATOR_KEY: (4, _find_coordinator_v4),
    wire.JOIN_GROUP_KEY: (9, _join_group_v9),
    wire.HEARTBEAT_KEY: (4, _heartbeat_v4),
    wire.LEAVE_GROUP_KEY: (5, _leave_group_v5),
    wire.SYNC_GROUP_KEY: (5, _sync_group_v5),
    wire.CREATE_TOPICS_KEY: (7, _create_topics_v7),
    wire.DELETE_TOPICS_KEY: (6, _delete_topics_v6),
    wire.DELETE_RECORDS_KEY: (2, _delete_records_v2),
    wire.DESCRIBE_GROUPS_KEY: (5, _describe_groups_v5),
    wire.LIST_GROUPS_KEY: (5, _list_groups_v5),
    wire.DELETE_GROUPS_KEY: (2, _delete_groups_v2),
    wire.INIT_PRODUCER_ID_KEY: (4, _init_producer_id_v4),
    wire.ADD_PARTITIONS_TO_TXN_KEY: (5, _add_partitions_to_txn_v5),
    wire.ADD_OFFSETS_TO_TXN_KEY: (3, _add_offsets_to_txn_v3),
    wire.TXN_OFFSET_COMMIT_KEY: (3, _txn_offset_commit_v3),
    wire.END_TXN_KEY: (5, _end_txn_v5),
    wire.DESCRIBE_CONFIGS_KEY: (4, _describe_configs_v4),
    wire.ALTER_CONFIGS_KEY: (2, _alter_configs_v2),
    wire.SASL_HANDSHAKE_KEY: (1, _sasl_handshake_v1),
    wire.SASL_AUTHENTICATE_KEY: (1, _sasl_authenticate_v1),
    wire.OFFSET_DELETE_KEY: (0, _offset_delete_v0),
    wire.DESCRIBE_ACLS_KEY: (1, _describe_acls_v1),
    wire.CREATE_ACLS_KEY: (1, _create_acls_v1),
    wire.DELETE_ACLS_KEY: (1, _delete_acls_v1),
    wire.CREATE_PARTITIONS_KEY: (3, _create_partitions_v3),
    wire.DESCRIBE_LOG_DIRS_KEY: (2, _describe_log_dirs_v2),
    wire.GET_TELEMETRY_SUBSCRIPTIONS_KEY: (0, _telemetry_v0),
    wire.PUSH_TELEMETRY_KEY: (0, _push_telemetry_v0),
    wire.LIST_CLIENT_METRICS_RESOURCES_KEY: (0, _list_client_metrics_resources_v0),
    wire.DESCRIBE_TOPIC_PARTITIONS_KEY: (0, _describe_topic_partitions_v0),
    wire.INCREMENTAL_ALTER_CONFIGS_KEY: (1, _incremental_alter_configs_v1),
    wire.DESCRIBE_CLUSTER_KEY: (1, _describe_cluster_v1),
    wire.DESCRIBE_PRODUCERS_KEY: (0, _describe_producers_v0),
    wire.DESCRIBE_TRANSACTIONS_KEY: (0, _describe_transactions_v0),
    wire.LIST_TRANSACTIONS_KEY: (0, _list_transactions_v0),
    wire.DESCRIBE_CLIENT_QUOTAS_KEY: (0, _describe_client_quotas_v0),
    wire.ALTER_CLIENT_QUOTAS_KEY: (0, _alter_client_quotas_v0),
    wire.DESCRIBE_USER_SCRAM_CREDENTIALS_KEY: (0, _describe_user_scram_v0),
    wire.ALTER_USER_SCRAM_CREDENTIALS_KEY: (0, _alter_user_scram_v0),
    wire.CONSUMER_GROUP_HEARTBEAT_KEY: (1, _consumer_group_heartbeat_v1),
    wire.CONSUMER_GROUP_DESCRIBE_KEY: (1, _consumer_group_describe_v1),
    wire.API_VERSIONS_KEY: (3, _api_versions_v3),
    wire.OFFSET_FOR_LEADER_EPOCH_KEY: (4, _offset_for_leader_epoch_v4),
    wire.CREATE_DELEGATION_TOKEN_KEY: (3, _create_delegation_token_v3),
    wire.RENEW_DELEGATION_TOKEN_KEY: (2, _renew_delegation_token_v2),
    wire.EXPIRE_DELEGATION_TOKEN_KEY: (2, _expire_delegation_token_v2),
    wire.DESCRIBE_DELEGATION_TOKEN_KEY: (3, _describe_delegation_token_v3),
    wire.ELECT_LEADERS_KEY: (2, _elect_leaders_v2),
    wire.ALTER_PARTITION_REASSIGNMENTS_KEY: (0, _alter_partition_reassignments_v0),
    wire.LIST_PARTITION_REASSIGNMENTS_KEY: (0, _list_partition_reassignments_v0),
    wire.UPDATE_FEATURES_KEY: (1, _update_features_v1),
    wire.WRITE_TXN_MARKERS_KEY: (1, _write_txn_markers_v1),
    wire.DESCRIBE_QUORUM_KEY: (1, _describe_quorum_v1),
}


def test_registry_pins_every_ceiling():
    advertised = {k: hi for k, _lo, hi in wire.SUPPORTED_APIS}
    pinned = {k: v for k, (v, _b) in REGISTRY.items()}
    assert set(pinned) == set(advertised), (
        f"sweep registry out of sync with SUPPORTED_APIS: "
        f"missing={sorted(set(advertised) - set(pinned))} "
        f"extra={sorted(set(pinned) - set(advertised))}"
    )
    stale = {k: (pinned[k], advertised[k]) for k in advertised if pinned[k] != advertised[k]}
    assert not stale, (
        "advertised ceiling changed without a top-version sweep frame "
        f"(key: (pinned, advertised)): {stale}"
    )


@pytest.fixture(scope="module")
def fe():
    f = KafkaFrontend()
    f.wire_log.create_topic("swp", 2)
    return f


_NAMES = {k: b.__name__.strip("_") for k, (_v, b) in REGISTRY.items()}


@pytest.mark.parametrize(
    "key", sorted(REGISTRY), ids=lambda k: f"k{k}-{_NAMES[k]}"
)
def test_top_version_roundtrip(fe, key):
    version, builder = REGISTRY[key]
    payload = builder()
    assert struct.unpack(">h", payload[0:2])[0] == key
    assert struct.unpack(">h", payload[2:4])[0] == version
    resp = fe.handle_request(payload)
    assert resp is not None, f"k{key} v{version}: body failed to decode (None)"
    assert struct.unpack(">i", resp[0:4])[0] == CORR, "correlation id not echoed"
    if key != wire.API_VERSIONS_KEY:
        fallback = wire.encode_api_versions_response(
            CORR, 0, error_code=wire.ERR_UNSUPPORTED_VERSION
        )
        assert resp != fallback, (
            f"k{key} v{version} fell through dispatch to the "
            "unsupported-version fallback — the advertised ceiling has no route"
        )


def _fresh_fe() -> KafkaFrontend:
    # not the module fixture: the sweep's CreateAcls frame flips the
    # shared frontend into ACL-enforcing mode (itself a real behavior),
    # which would mask the data-plane assertions below
    f = KafkaFrontend()
    f.wire_log.create_topic("swp", 2)
    return f


def test_produce_v11_appends():
    """The sweep's produce frame is not just routed — a full v11
    response decode shows the batch landed at a real offset."""
    from kcore_spark.protocol.broker import decode_produce_response

    fe = _fresh_fe()
    before = fe.wire_log.high_watermark("swp", 0)
    resp = fe.handle_request(_produce_v11())
    _corr, results, _throttle = decode_produce_response(resp, api_version=11)
    [(name, parts)] = results
    assert name == "swp"
    (idx, err, base_offset) = parts[0][:3]
    assert (idx, err, base_offset) == (0, wire.ERR_NONE, before)


def test_fetch_v13_reads_by_topic_id():
    """v13 id-addressed fetch returns the produced record under the
    uuid-resolved topic, decoded end-to-end."""
    from kcore_spark.protocol.broker import decode_fetch_response
    from kcore_spark.protocol.records import decode_record_batch

    fe = _fresh_fe()
    fe.handle_request(_produce_v11())
    resp = fe.handle_request(_fetch_v13())
    _corr, results = decode_fetch_response(resp, api_version=13)
    [(_name, parts)] = results
    entry = parts[0]
    err, batch = entry[1], entry[-1]
    assert err == wire.ERR_NONE
    _base, records, _pos = decode_record_batch(batch)
    assert records and records[0].value == b"v"
