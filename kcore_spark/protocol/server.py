"""asyncio Kafka-protocol front-end.

Mirrors the reference's server shape (SURVEY §2.1 R1-R8, §3.2-3.3)
with the bugs fixed and the model idiomatic to asyncio:

- accept loop → one task per connection
  (reference: goroutine per conn, `pkg/server/server.go:78`)
- strict one-request-in-flight per connection, request→response order
  preserved (reference: `pkg/kafka/kafka_connectian_handler.go:63-108`)
- framing via readexactly — fixes the reference's short-read bug
  (`kafka_connectian_handler.go:69-94` uses bare conn.Read; SURVEY §3.4)
- unknown API key → graceful UNSUPPORTED_VERSION-style response
  instead of the reference's connection kill (`kafka_api.go:95-96`)

The data plane (Produce/Fetch bodies) binds to sources/topic_log.py;
Metadata is served from the TopicLog catalog. Spark never sees wire
bytes (SURVEY §1.2: frames stay outside Spark).
"""

from __future__ import annotations

import asyncio
import logging
import struct

from kcore_spark.protocol import wire

log = logging.getLogger("kcore_spark.protocol")

MAX_FRAME = 64 * 1024 * 1024


class KafkaFrontend:
    def __init__(
        self,
        host: str = "127.0.0.1",
        port: int = 9092,
        topic_log=None,
        wire_log=None,
        credentials: dict[str, str] | None = None,
        max_connections: int = 256,
        cleaner_interval_ms: int | None = None,
        acl_store=None,
        scram_credentials: dict | None = None,
        ssl_context=None,
        session_lifetime_ms: int = 0,
        delegation_token_secret: bytes | None = None,
    ):
        from kcore_spark.protocol.broker import WireLog

        self.host = host
        self.port = port
        from kcore_spark.protocol.groups import GroupStore

        self.topic_log = topic_log
        self.wire_log = wire_log if wire_log is not None else WireLog()
        from kcore_spark.protocol.coordinator import Coordinator

        from kcore_spark.protocol.consumer_group import ConsumerGroupCoordinator

        self.group_store = GroupStore()
        # Optional ACL authorizer (protocol/acl.py): when set, Produce
        # and Fetch are gated per topic by the connection's SASL
        # principal (ANONYMOUS when unauthenticated), and the ACL CRUD
        # APIs (29/30/31) operate on this store.
        self.acl_store = acl_store
        self.coordinator = Coordinator(topic_partitions=self._catalog_partitions)
        # KIP-848 next-gen groups live beside the classic coordinator —
        # real brokers likewise run both protocols during migration
        self.consumer_groups = ConsumerGroupCoordinator(
            topic_partitions=self._catalog_partitions
        )
        # credentials != None turns SASL/PLAIN enforcement on: every
        # connection must complete a handshake+authenticate before any
        # API other than ApiVersions/SaslHandshake/SaslAuthenticate.
        # scram_credentials ({(user, mechanism) -> ScramCredential},
        # protocol/scram.py) adds SCRAM-SHA-256/512 to the offered
        # mechanisms and enables the k50/k51 credential admin APIs;
        # either store alone is enough to turn enforcement on.
        self.credentials = credentials
        self.scram_credentials = scram_credentials
        # KIP-714 push accounting: instance uuid -> (pushes, bytes);
        # capped (client-supplied ids must not grow memory unboundedly)
        self._telemetry_pushes: dict[bytes, tuple[int, int]] = {}
        # TLS (the encryption half of the reference's roadmap row):
        # an ssl.SSLContext here makes the listener TLS-only —
        # asyncio wraps every accepted connection before the first
        # frame, so SASL tokens (and PLAIN passwords in particular)
        # never cross the wire unencrypted. Combine both for
        # SASL_SSL, the deployment posture real clusters run.
        self.ssl_context = ssl_context
        # Client quotas (KIP-124 semantics, protocol/quotas.py): byte-
        # rate limits per user/client-id surfaced as throttle_time_ms
        # in Produce/Fetch responses; configured over the wire with
        # AlterClientQuotas (49) / DescribeClientQuotas (48).
        from kcore_spark.protocol.quotas import QuotaManager

        self.quota_manager = QuotaManager()
        # KIP-48 delegation tokens (protocol/tokens.py): enabled only
        # when a master secret is configured (delegation.token.secret.
        # key in real brokers) — without one, keys 38-41 answer
        # DELEGATION_TOKEN_AUTH_DISABLED, real single-node behavior.
        from kcore_spark.protocol.tokens import DelegationTokenStore

        self.token_store = DelegationTokenStore(delegation_token_secret)
        # KIP-584 finalized feature levels, mutated by UpdateFeatures
        # (k57); starts at each supported feature's floor
        from kcore_spark.protocol.admin import SUPPORTED_FEATURES

        self.feature_levels: dict[str, int] = {
            f: lo for f, (lo, _hi) in SUPPORTED_FEATURES.items()
        }
        # KIP-368: nonzero advertises a session lifetime on successful
        # authenticate and turns on re-authentication — an expired
        # session is treated as unauthenticated (connection closed on
        # its next data request) unless the client re-runs the SASL
        # flow on the same connection first.
        self.session_lifetime_ms = session_lifetime_ms
        # Connection cap (the reference leaves this as a TODO,
        # `/root/reference/pkg/server/server.go:77`): the accept loop
        # still accepts the TCP connection, but the N+1th connection's
        # request loop parks on the semaphore until a slot frees —
        # back-pressure instead of unbounded per-connection state.
        # Produce back-pressure needs nothing extra on top: the event
        # loop is single-threaded and handlers are synchronous, so at
        # most ONE request body is being processed at any instant, and
        # per-connection reads pull one ≤MAX_FRAME frame at a time
        # (asyncio transport flow control bounds what the kernel
        # buffers beyond that).
        self.max_connections = max_connections
        self._conn_sem: asyncio.Semaphore | None = None
        self._server: asyncio.AbstractServer | None = None
        # Background log cleaner (Kafka's log.retention.check.interval.ms
        # analog): when set and a persistent topic_log is attached, a
        # periodic task runs retention + compaction per each topic's
        # cleanup.policy. None keeps cleanup on-demand (the default —
        # tests and embedded users drive run_cleanup themselves).
        self.cleaner_interval_ms = cleaner_interval_ms
        self._cleaner_task: asyncio.Task | None = None
        self.cleaner_passes = 0  # observability: completed passes

    def _catalog_partitions(self) -> dict[str, int]:
        out = dict(self.wire_log.topics)
        if self.topic_log is not None:
            for t in self.topic_log.list_topics():
                out.setdefault(t, self.topic_log.topic_meta(t).num_partitions)
        return out

    # ------------------------------------------------------ lifecycle

    async def start(self) -> None:
        self._conn_sem = asyncio.Semaphore(self.max_connections)
        self._server = await asyncio.start_server(
            self._handle_conn, self.host, self.port, ssl=self.ssl_context
        )
        # pick up the OS-assigned port when started with port=0 (tests)
        self.port = self._server.sockets[0].getsockname()[1]
        if self.cleaner_interval_ms is not None and self.topic_log is not None:
            self._cleaner_task = asyncio.create_task(self._cleaner_loop())

    async def _cleaner_loop(self) -> None:
        """Periodic cleaner: one sequential pass over every topic per
        interval. The pass itself can rewrite parquet segments (a
        blocking Spark job), so it runs in the default executor —
        the event loop keeps serving requests, and the sequential
        await guarantees passes never overlap."""
        loop = asyncio.get_running_loop()
        while True:
            await asyncio.sleep(self.cleaner_interval_ms / 1000)
            try:
                await loop.run_in_executor(None, self.topic_log.run_cleanup_all)
                self.cleaner_passes += 1
            except Exception:  # pragma: no cover - a broken topic must
                # not kill the cleaner; next pass retries
                log.exception("cleaner pass failed")

    async def stop(self) -> None:
        if self._cleaner_task is not None:
            self._cleaner_task.cancel()
            try:
                await self._cleaner_task
            except asyncio.CancelledError:
                pass
            self._cleaner_task = None
        if self._server:
            self._server.close()
            await self._server.wait_closed()

    # ------------------------------------------------------ connection loop

    async def _handle_conn(
        self, reader: asyncio.StreamReader, writer: asyncio.StreamWriter
    ) -> None:
        from kcore_spark.protocol.auth import SaslState, handle_raw_token

        peer = writer.get_extra_info("peername")
        sasl = SaslState()
        sem = self._conn_sem
        acquired = False
        if sem is not None:
            await sem.acquire()  # over-cap connections queue here
            acquired = True
        try:
            while True:
                try:
                    size_buf = await reader.readexactly(4)
                except asyncio.IncompleteReadError:
                    return  # clean EOF
                (size,) = struct.unpack(">I", size_buf)
                if size > MAX_FRAME:
                    log.warning("oversized frame %d from %s", size, peer)
                    return
                payload = await reader.readexactly(size)
                if sasl.expect_raw_token:
                    # legacy handshake-v0 flow: this frame is the bare
                    # SASL token, not a Kafka request
                    resp = handle_raw_token(sasl, self.credentials or {}, payload)
                else:
                    resp = self.handle_request(payload, sasl=sasl)
                if resp is None:
                    return  # unrecoverable: close like the reference
                writer.write(struct.pack(">I", len(resp)) + resp)
                await writer.drain()
                if sasl.failed:
                    return  # auth error delivered; close like real brokers
        except (ConnectionResetError, asyncio.IncompleteReadError):
            return
        finally:
            if acquired:
                sem.release()
            writer.close()

    # ------------------------------------------------------ dispatch

    def handle_request(self, payload: bytes, sasl=None) -> bytes | None:
        """Decode → dispatch → encode (sync; the data plane calls into
        Spark jobs which are blocking anyway — run in a thread pool
        when the front-end is wired to a live engine).

        An undecodable request body (truncated frame, garbage counts)
        returns None — the connection handler closes that connection,
        which is real Kafka's behavior for frames it cannot parse. No
        malformed payload may raise out of dispatch (fuzz-tested across
        every advertised api/version).

        ``sasl``: per-connection SaslState (the connection loop passes
        it). With credentials configured and no/unauthenticated state,
        only ApiVersions and the SASL APIs are served — anything else
        closes the connection, real brokers' behavior for
        unauthenticated data requests."""
        if len(payload) < 8:
            return None
        try:
            return self._dispatch(payload, sasl)
        except (EOFError, ValueError, IndexError, KeyError, struct.error, MemoryError, OSError):
            return None

    def _dispatch(self, payload: bytes, sasl=None) -> bytes | None:
        from kcore_spark.protocol import auth

        api_key = struct.unpack(">h", payload[0:2])[0]
        api_version = struct.unpack(">h", payload[2:4])[0]
        correlation_id = struct.unpack(">i", payload[4:8])[0]
        if api_key == wire.API_VERSIONS_KEY:
            return self._handle_api_versions(payload, api_version, correlation_id)
        if api_key == auth.SASL_HANDSHAKE_KEY and api_version <= 1:
            mechs = auth.MECHANISMS
            if self.scram_credentials is not None:
                mechs = mechs + auth.SCRAM_MECHANISMS
            return auth.handle_sasl_handshake(
                sasl if sasl is not None else auth.SaslState(),
                payload,
                mechanisms=mechs,
                allow_reauth=self.session_lifetime_ms > 0,
            )
        if api_key == auth.SASL_AUTHENTICATE_KEY and api_version <= 1:
            return auth.handle_sasl_authenticate(
                sasl if sasl is not None else auth.SaslState(),
                self.credentials or {},
                payload,
                scram_credentials=self.scram_credentials,
                session_lifetime_ms=self.session_lifetime_ms,
            )
        if self.credentials is not None or self.scram_credentials is not None:
            if sasl is None or not sasl.authenticated:
                log.warning("unauthenticated api_key=%d from connection; closing", api_key)
                return None
            if self.session_lifetime_ms > 0 and sasl.authenticated_at_ms is not None:
                import time as _time

                if _time.time() * 1000 - sasl.authenticated_at_ms > self.session_lifetime_ms:
                    # KIP-368: expired session without re-auth → the
                    # broker kills the connection on its next request
                    log.warning("expired SASL session api_key=%d; closing", api_key)
                    return None
        if api_key == 50 and api_version == 0:
            from kcore_spark.protocol.scram import handle_describe_user_scram

            return handle_describe_user_scram(
                self.scram_credentials or {},
                payload,
                authorized=self._cluster_authorized(sasl, "DESCRIBE"),
            )
        if api_key == 51 and api_version == 0:
            from kcore_spark.protocol.scram import handle_alter_user_scram

            # never lazily create the store: a data-plane request must
            # not flip SASL enforcement on an open listener (ADVICE r7)
            return handle_alter_user_scram(
                self.scram_credentials,
                payload,
                authorized=self._cluster_authorized(sasl, "ALTER"),
            )
        if api_key == wire.METADATA_KEY and api_version <= 12:
            return self._handle_metadata(payload, api_version, correlation_id)
        if api_key == wire.PRODUCE_KEY and 3 <= api_version <= 11:
            from kcore_spark.protocol.broker import handle_produce

            return handle_produce(
                self.wire_log,
                payload,
                authorize=self._authorizer(sasl),
                throttle_ms=self._quota_throttle("producer_byte_rate", payload, sasl),
            )
        if api_key == wire.FETCH_KEY and 4 <= api_version <= 13:
            from kcore_spark.protocol.broker import handle_fetch

            resp = handle_fetch(
                self.wire_log,
                payload,
                authorize=self._authorizer(sasl),
                throttle_ms=self._quota_throttle(
                    "consumer_byte_rate", payload, sasl, nbytes=0
                ),
            )
            # fetched bytes count toward the NEXT request's penalty
            self._quota_throttle("consumer_byte_rate", payload, sasl, nbytes=len(resp))
            return resp
        if api_key == 49 and api_version == 0:
            from kcore_spark.protocol.quotas import handle_alter_client_quotas

            return handle_alter_client_quotas(
                self.quota_manager,
                payload,
                authorized=self._cluster_authorized(sasl, "ALTER"),
            )
        if api_key == 48 and api_version == 0:
            from kcore_spark.protocol.quotas import handle_describe_client_quotas

            return handle_describe_client_quotas(
                self.quota_manager,
                payload,
                authorized=self._cluster_authorized(sasl, "DESCRIBE"),
            )
        if api_key == wire.OFFSET_COMMIT_KEY and 2 <= api_version <= 8:
            from kcore_spark.protocol.groups import handle_offset_commit

            return handle_offset_commit(
                self.group_store, payload, coordinator=self.coordinator
            )
        if api_key == wire.OFFSET_FETCH_KEY and 1 <= api_version <= 9:
            from kcore_spark.protocol.groups import handle_offset_fetch

            return handle_offset_fetch(self.group_store, payload)
        if api_key == wire.FIND_COORDINATOR_KEY and api_version <= 4:
            from kcore_spark.protocol.groups import handle_find_coordinator

            return handle_find_coordinator(payload, self.host, self.port)
        if api_key == wire.JOIN_GROUP_KEY and api_version <= 9:
            return self.coordinator.handle_join_group(payload)
        if api_key == wire.SYNC_GROUP_KEY and api_version <= 5:
            return self.coordinator.handle_sync_group(payload)
        if api_key == wire.HEARTBEAT_KEY and api_version <= 4:
            return self.coordinator.handle_heartbeat(payload)
        if api_key == wire.LEAVE_GROUP_KEY and api_version <= 5:
            return self.coordinator.handle_leave_group(payload)
        if api_key == wire.CONSUMER_GROUP_HEARTBEAT_KEY and api_version <= 1:
            return self.consumer_groups.handle_heartbeat(payload)
        if api_key == wire.CONSUMER_GROUP_DESCRIBE_KEY and api_version <= 1:
            return self.consumer_groups.handle_describe(payload)
        if api_key == wire.LIST_GROUPS_KEY and api_version <= 5:
            return self.coordinator.handle_list_groups(
                payload, extra_groups=self.consumer_groups.group_summaries()
            )
        if api_key == wire.DESCRIBE_GROUPS_KEY and api_version <= 5:
            return self.coordinator.handle_describe_groups(payload)
        if api_key == wire.DELETE_GROUPS_KEY and api_version <= 2:
            return self.coordinator.handle_delete_groups(payload)
        if api_key == wire.CREATE_TOPICS_KEY and api_version <= 7:
            from kcore_spark.protocol.admin import handle_create_topics

            return handle_create_topics(self.wire_log, payload)
        if api_key == wire.DELETE_TOPICS_KEY and api_version <= 6:
            from kcore_spark.protocol.admin import handle_delete_topics

            return handle_delete_topics(self.wire_log, payload)
        if api_key == wire.LIST_OFFSETS_KEY and api_version <= 9:
            from kcore_spark.protocol.admin import handle_list_offsets

            return handle_list_offsets(self.wire_log, payload)
        if api_key == wire.DELETE_RECORDS_KEY and api_version <= 2:
            from kcore_spark.protocol.admin import handle_delete_records

            return handle_delete_records(self.wire_log, payload)
        if api_key == wire.INIT_PRODUCER_ID_KEY and api_version <= 4:
            from kcore_spark.protocol.broker import handle_init_producer_id

            return handle_init_producer_id(self.wire_log, payload)
        if api_key == wire.ADD_PARTITIONS_TO_TXN_KEY and api_version <= 5:
            from kcore_spark.protocol.broker import handle_add_partitions_to_txn

            return handle_add_partitions_to_txn(self.wire_log, payload)
        if api_key == wire.ADD_OFFSETS_TO_TXN_KEY and api_version <= 3:
            from kcore_spark.protocol.broker import handle_add_offsets_to_txn

            return handle_add_offsets_to_txn(self.wire_log, payload)
        if api_key == wire.TXN_OFFSET_COMMIT_KEY and api_version <= 3:
            from kcore_spark.protocol.broker import handle_txn_offset_commit

            return handle_txn_offset_commit(self.wire_log, payload)
        if api_key == wire.END_TXN_KEY and api_version <= 5:
            from kcore_spark.protocol.broker import handle_end_txn

            return handle_end_txn(self.wire_log, payload, group_store=self.group_store)
        if api_key == wire.DESCRIBE_CONFIGS_KEY and api_version <= 4:
            from kcore_spark.protocol.admin import handle_describe_configs

            return handle_describe_configs(self.wire_log, payload)
        if api_key == wire.ALTER_CONFIGS_KEY and api_version <= 2:
            from kcore_spark.protocol.admin import handle_alter_configs

            return handle_alter_configs(self.wire_log, payload)
        if api_key == wire.INCREMENTAL_ALTER_CONFIGS_KEY and api_version <= 1:
            from kcore_spark.protocol.admin import handle_incremental_alter_configs

            return handle_incremental_alter_configs(self.wire_log, payload)
        if api_key == wire.OFFSET_DELETE_KEY and api_version == 0:
            from kcore_spark.protocol.groups import handle_offset_delete

            return handle_offset_delete(self.group_store, payload)
        if api_key == wire.DESCRIBE_CLUSTER_KEY and api_version <= 1:
            from kcore_spark.protocol.admin import handle_describe_cluster

            return handle_describe_cluster(payload, self.host, self.port)
        if api_key == wire.DESCRIBE_PRODUCERS_KEY and api_version == 0:
            from kcore_spark.protocol.broker import handle_describe_producers

            return handle_describe_producers(self.wire_log, payload)
        if api_key == wire.LIST_TRANSACTIONS_KEY and api_version == 0:
            from kcore_spark.protocol.broker import handle_list_transactions

            return handle_list_transactions(self.wire_log, payload)
        if api_key == wire.DESCRIBE_TRANSACTIONS_KEY and api_version == 0:
            from kcore_spark.protocol.broker import handle_describe_transactions

            return handle_describe_transactions(self.wire_log, payload)
        if api_key == wire.CREATE_PARTITIONS_KEY and api_version <= 3:
            from kcore_spark.protocol.admin import handle_create_partitions

            return handle_create_partitions(self.wire_log, payload)
        if api_key == wire.DESCRIBE_LOG_DIRS_KEY and api_version <= 2:
            from kcore_spark.protocol.admin import handle_describe_log_dirs

            return handle_describe_log_dirs(self.wire_log, payload)
        if api_key == wire.GET_TELEMETRY_SUBSCRIPTIONS_KEY and api_version == 0:
            return self._handle_telemetry_subscriptions(payload)
        if api_key == wire.PUSH_TELEMETRY_KEY and api_version == 0:
            return self._handle_push_telemetry(payload)
        if api_key == wire.LIST_CLIENT_METRICS_RESOURCES_KEY and api_version == 0:
            return self._handle_list_client_metrics_resources(payload)
        if api_key == wire.DESCRIBE_TOPIC_PARTITIONS_KEY and api_version == 0:
            from kcore_spark.protocol.admin import handle_describe_topic_partitions

            return handle_describe_topic_partitions(self.wire_log, payload)
        if api_key == wire.OFFSET_FOR_LEADER_EPOCH_KEY and api_version <= 4:
            from kcore_spark.protocol.admin import handle_offset_for_leader_epoch

            return handle_offset_for_leader_epoch(self.wire_log, payload)
        if api_key == wire.ELECT_LEADERS_KEY and api_version <= 2:
            from kcore_spark.protocol.admin import handle_elect_leaders

            return handle_elect_leaders(self.wire_log, payload)
        if api_key == wire.ALTER_PARTITION_REASSIGNMENTS_KEY and api_version == 0:
            from kcore_spark.protocol.admin import handle_alter_partition_reassignments

            return handle_alter_partition_reassignments(self.wire_log, payload)
        if api_key == wire.LIST_PARTITION_REASSIGNMENTS_KEY and api_version == 0:
            from kcore_spark.protocol.admin import handle_list_partition_reassignments

            return handle_list_partition_reassignments(self.wire_log, payload)
        if api_key == wire.UPDATE_FEATURES_KEY and api_version <= 1:
            from kcore_spark.protocol.admin import handle_update_features

            return handle_update_features(self.feature_levels, payload)
        if api_key == wire.WRITE_TXN_MARKERS_KEY and api_version <= 1:
            from kcore_spark.protocol.broker import handle_write_txn_markers

            return handle_write_txn_markers(
                self.wire_log, payload, group_store=self.group_store
            )
        if api_key == wire.DESCRIBE_QUORUM_KEY and api_version <= 1:
            from kcore_spark.protocol.admin import handle_describe_quorum

            return handle_describe_quorum(self.wire_log, payload)
        if api_key == wire.CREATE_DELEGATION_TOKEN_KEY and api_version <= 3:
            from kcore_spark.protocol import tokens

            authorize = self._authorizer(sasl)
            return tokens.handle_create(
                self.token_store,
                payload,
                principal=self._principal(sasl),
                # KIP-373: minting a token for ANOTHER principal needs
                # CREATE_TOKENS on that User resource (when ACLs are on)
                authorize_other=(
                    (lambda owner: authorize("CREATE_TOKENS", "USER", owner[1]))
                    if authorize is not None
                    else None
                ),
            )
        if api_key == wire.RENEW_DELEGATION_TOKEN_KEY and api_version <= 2:
            from kcore_spark.protocol import tokens

            return tokens.handle_renew(
                self.token_store, payload, principal=self._principal(sasl)
            )
        if api_key == wire.EXPIRE_DELEGATION_TOKEN_KEY and api_version <= 2:
            from kcore_spark.protocol import tokens

            return tokens.handle_expire(
                self.token_store, payload, principal=self._principal(sasl)
            )
        if api_key == wire.DESCRIBE_DELEGATION_TOKEN_KEY and api_version <= 3:
            from kcore_spark.protocol import tokens

            authorize = self._authorizer(sasl)
            return tokens.handle_describe(
                self.token_store,
                payload,
                principal=self._principal(sasl),
                # KIP-373: seeing ANOTHER principal's token (hmac = the
                # credential) needs DESCRIBE_TOKENS on that User
                # resource when ACLs are on; own/requested/renewable
                # tokens are always visible
                authorize_describe=(
                    (lambda owner: authorize("DESCRIBE_TOKENS", "USER", owner[1]))
                    if authorize is not None
                    else None
                ),
            )
        if api_key == wire.DESCRIBE_ACLS_KEY and api_version <= 1:
            from kcore_spark.protocol import acl

            return acl.handle_describe_acls(self._acls(), payload)
        if api_key == wire.CREATE_ACLS_KEY and api_version <= 1:
            from kcore_spark.protocol import acl

            return acl.handle_create_acls(self._acls(), payload)
        if api_key == wire.DELETE_ACLS_KEY and api_version <= 1:
            from kcore_spark.protocol import acl

            return acl.handle_delete_acls(self._acls(), payload)
        # Kafka answers an unsupported API with an ApiVersions-shaped
        # error so clients can renegotiate; the reference kills the
        # connection here (kafka_api.go:95-96) — deliberate deviation.
        log.warning("unsupported api_key=%d version=%d", api_key, api_version)
        return wire.encode_api_versions_response(
            correlation_id, 0, error_code=wire.ERR_UNSUPPORTED_VERSION
        )

    def _handle_api_versions(
        self, payload: bytes, api_version: int, correlation_id: int
    ) -> bytes:
        if not 0 <= api_version <= 3:
            # per KIP-511: error 35 with a v0 body listing what we support
            return wire.encode_api_versions_response(
                correlation_id, 0, error_code=wire.ERR_UNSUPPORTED_VERSION
            )
        req = wire.decode_api_versions_request(payload)
        log.debug(
            "ApiVersions from %s/%s", req.client_software_name, req.client_software_version
        )
        return wire.encode_api_versions_response(req.header.correlation_id, api_version)

    def _acls(self):
        from kcore_spark.protocol.acl import AclStore

        if self.acl_store is None:
            self.acl_store = AclStore()
        return self.acl_store

    def _principal(self, sasl) -> str:
        return (
            f"User:{sasl.authorization_id}"
            if sasl is not None and sasl.authenticated and sasl.authorization_id
            else "User:ANONYMOUS"
        )

    def _authorizer(self, sasl):
        """Per-connection authorize callback for the data path, or
        None when no ACL store is configured (authorization off — the
        default, like a broker without an authorizer.class.name)."""
        if self.acl_store is None:
            return None
        principal = self._principal(sasl)
        store = self.acl_store
        return lambda op, rtype, rname: store.authorize(principal, op, rtype, rname)

    def _cluster_authorized(self, sasl, operation: str) -> bool:
        """Cluster-resource gate for the admin control plane (keys
        48-51): ALTER on Cluster to mutate quotas/SCRAM credentials,
        DESCRIBE to read them — the same resource a real broker checks.
        Without an ACL store, authorization is off (matching the data
        path's stance)."""
        if self.acl_store is None:
            return True
        return self.acl_store.authorize(
            self._principal(sasl), operation, "CLUSTER", "kafka-cluster"
        )

    def _quota_throttle(self, key: str, payload: bytes, sasl, nbytes: int | None = None) -> int:
        """Record traffic against the connection's quota entities and
        return the throttle_time_ms for this response. Produce records
        the REQUEST size up front (the batch dominates); Fetch calls
        with nbytes=0 to surface the standing penalty, then records the
        response size afterwards (Kafka likewise throttles the request
        FOLLOWING an overage — the response size isn't known sooner)."""
        import time as _time

        # header layout: key i16, version i16, corr i32, then client_id
        # as a CLASSIC nullable string at every header version (the
        # flexible header only appends tagged fields after it)
        try:
            client_id = wire.Reader(payload[8:]).nullable_string()
        except Exception:
            client_id = None
        user = sasl.authorization_id if sasl is not None else None
        return self.quota_manager.record_and_throttle(
            key,
            len(payload) if nbytes is None else nbytes,
            int(_time.time() * 1000),
            user=user,
            client_id=client_id,
        )

    def _handle_telemetry_subscriptions(self, payload: bytes) -> bytes:
        """GetTelemetrySubscriptions (API key 71, v0, KIP-714): modern
        clients (librdkafka 2.x, Java 3.7+) send this right after
        ApiVersions. This broker collects no client metrics, so it
        answers a valid empty subscription — client_instance_id echoed
        (or assigned when the client sends the all-zero uuid), zero
        requested metrics, a long push interval — which tells the
        client to stand down cleanly instead of erroring per connect."""
        import uuid as _uuid

        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=True)
        cid = r.uuid()
        r.tagged_fields()
        if cid == b"\x00" * 16:
            cid = _uuid.uuid4().bytes  # broker-assigned instance id
        w = wire.Writer()
        w.int32(h.correlation_id)
        w.empty_tagged_fields()  # response header v1
        w.int32(0)  # throttle_time_ms
        w.int16(wire.ERR_NONE)
        w.uuid(cid)
        w.int32(0)  # subscription_id
        w.compact_array_len(0)  # accepted_compression_types
        w.int32(300_000)  # push_interval_ms
        w.int32(1024 * 1024)  # telemetry_max_bytes
        w.bool_(True)  # delta_temporality
        w.compact_array_len(0)  # requested_metrics: none subscribed
        w.empty_tagged_fields()
        return w.bytes()

    def _handle_push_telemetry(self, payload: bytes) -> bytes:
        """PushTelemetry (API key 72, v0, KIP-714): accept pushes made
        against the subscription id this broker hands out (0, the empty
        subscription — only a `terminating` push is expected under it);
        any other id gets UNKNOWN_SUBSCRIPTION_ID (117) so the client
        re-fetches its subscriptions. Payload bytes are counted, not
        parsed — this broker subscribes to no metrics. The per-instance
        counter is capped the same way the quota windows are (ADVICE
        r7: client-supplied ids must not grow memory unboundedly)."""
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=True)
        cid = r.uuid()
        subscription_id = r.int32()
        r.bool_()  # terminating
        r.int8()  # compression_type
        metrics = r.compact_bytes() or b""
        r.tagged_fields()
        err = wire.ERR_NONE
        if subscription_id != 0:
            err = 117  # UNKNOWN_SUBSCRIPTION_ID
        elif len(self._telemetry_pushes) < 1024 or cid in self._telemetry_pushes:
            n, total = self._telemetry_pushes.get(cid, (0, 0))
            self._telemetry_pushes[cid] = (n + 1, total + len(metrics))
        w = wire.Writer()
        w.int32(h.correlation_id)
        w.empty_tagged_fields()
        w.int32(0)  # throttle_time_ms
        w.int16(err)
        w.empty_tagged_fields()
        return w.bytes()

    def _handle_list_client_metrics_resources(self, payload: bytes) -> bytes:
        """ListClientMetricsResources (API key 74, v0, KIP-714): the
        admin read-side listing CLIENT_METRICS config resources. None
        are configurable on this broker (GetTelemetrySubscriptions
        serves the canonical empty subscription), so the list is
        empty — the shape admin clients need to not error."""
        r = wire.Reader(payload)
        h = wire.decode_request_header(r, flexible=True)
        r.tagged_fields()
        w = wire.Writer()
        w.int32(h.correlation_id)
        w.empty_tagged_fields()
        w.int32(0)  # throttle_time_ms
        w.int16(wire.ERR_NONE)
        w.compact_array_len(0)  # client_metrics_resources
        w.empty_tagged_fields()
        return w.bytes()

    def _handle_metadata(self, payload: bytes, api_version: int, correlation_id: int) -> bytes:
        req = wire.decode_metadata_request(payload)
        catalog: dict[str, int] = dict(sorted(self.wire_log.topics.items()))
        if self.topic_log is not None:
            for t in self.topic_log.list_topics():
                catalog.setdefault(t, self.topic_log.topic_meta(t).num_partitions)
        if req.topics is None:
            topics = list(catalog.items())
            errors: list[tuple] = []
        else:
            ids = req.topic_ids or [None] * len(req.topics)
            # topic ids are deterministic (md5 of the name), so an
            # id-only lookup resolves by scanning the catalog — the id
            # "index" is a pure function of the name set
            by_id = {wire.topic_uuid(t): t for t in catalog}
            topics, errors = [], []
            for t, tid in zip(req.topics, ids):
                if not t and tid is not None:
                    t = by_id.get(tid, "")
                    if not t:
                        # unknown id: echo it so the client can correlate
                        errors.append(("", wire.ERR_UNKNOWN_TOPIC_ID, tid))
                        continue
                if t in catalog and t:
                    topics.append((t, catalog[t]))
                else:
                    errors.append((t, wire.ERR_UNKNOWN_TOPIC_OR_PARTITION))
        return wire.encode_metadata_response(
            correlation_id, api_version, self.host, self.port, topics, topic_errors=errors
        )


async def serve_forever(host: str = "127.0.0.1", port: int = 9092) -> None:
    """Run until SIGINT/SIGTERM, then stop the listener gracefully —
    the reference's main-loop shape (flag parsing, signal-cancelled
    context, listener close: `cmd/kcore/main.go:43-82`,
    `pkg/server/server.go:85-98`)."""
    import os
    import signal

    fe = KafkaFrontend(host, port)
    # standalone bootstrap topics: KCORE_TOPICS="name:partitions,..."
    for spec in filter(None, os.environ.get("KCORE_TOPICS", "").split(",")):
        name, _, n = spec.partition(":")
        fe.wire_log.create_topic(name.strip(), int(n or 1))
    await fe.start()
    log.info("kcore_spark front-end listening on %s:%d", fe.host, fe.port)
    stop = asyncio.Event()
    loop = asyncio.get_running_loop()
    for sig in (signal.SIGINT, signal.SIGTERM):
        loop.add_signal_handler(sig, stop.set)
    await stop.wait()
    log.info("shutting down")
    await fe.stop()


def main() -> None:
    import argparse

    # same flag surface as the reference binary (cmd/kcore/main.go:37-41)
    ap = argparse.ArgumentParser(description="kcore_spark Kafka-protocol front-end")
    ap.add_argument("-address", "--address", default="127.0.0.1")
    ap.add_argument("-port", "--port", type=int, default=9092)
    ap.add_argument("-verbose", "--verbose", action="store_true")
    args = ap.parse_args()
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format='{"time":"%(asctime)s","level":"%(levelname)s","msg":"%(message)s"}',
    )
    asyncio.run(serve_forever(args.address, args.port))


if __name__ == "__main__":
    main()
