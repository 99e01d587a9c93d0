"""Server API surface — the reference's socket.io endpoints (A23,
leaf-server/src/http/connection.rs:35-624) as an in-process, transport-
agnostic handler.

The reference speaks DRISL-encoded messages over socket.io with ATProto JWT
auth; this container has neither a socket.io stack nor ATProto network
access, so the transport is pluggable: ``LeafServer.handle(endpoint,
args_drisl)`` takes and returns DRISL bytes with the same
``Result<T, String>`` ack shape ({"Ok": …} | {"Err": …}, codec.ts:8-160),
and any websocket/HTTP front end can wrap it 1:1. Auth parity:

- unauthenticated connections may query/subscribe but not write
  (connection.rs:218-231);
- ``user_override`` only for trusted connections (unsafe_auth_token,
  connection.rs:240-252).
"""

from __future__ import annotations

from dataclasses import dataclass

from . import drisl
from .catalog import StreamCatalog
from .module import BasicModuleDef
from .types import LeafQuery, SqlValue


@dataclass
class Connection:
    """Per-connection auth context (≈ connection state in http.rs:141-242)."""

    user: str | None = None  # authenticated DID, None = anonymous
    trusted: bool = False  # unsafe_auth_token connections


class LeafServer:
    ENDPOINTS = (
        "module/upload",
        "module/exists",
        "stream/create",
        "stream/info",
        "stream/update_module",
        "stream/event_batch",
        "stream/state_event_batch",
        "stream/clear_state",
        "stream/subscribe_events",
        "stream/poll_subscription",
        "stream/unsubscribe",
        "stream/query",
        "stream/set_handle",
        "admin/list_streams",
    )

    # reference caps the raw upload payload before decoding it
    # (connection.rs:55-57)
    MODULE_MAX_BYTES = 10 * 1024 * 1024

    def __init__(self, catalog: StreamCatalog):
        self.catalog = catalog

    # -- transport shim ------------------------------------------------------

    def handle(self, conn: Connection, endpoint: str, args_drisl: bytes) -> bytes:
        """One request → DRISL-encoded Result ack."""
        try:
            if endpoint == "module/upload" and len(args_drisl) > self.MODULE_MAX_BYTES:
                raise ValueError("Module larger than 10MB maximum size.")
            args = drisl.decode(args_drisl) if args_drisl else {}
            out = self.dispatch(conn, endpoint, args)
            return drisl.encode({"Ok": out})
        except Exception as ex:
            return drisl.encode({"Err": f"{type(ex).__name__}: {ex}"})

    # -- dispatch ------------------------------------------------------------

    def _effective_user(self, conn: Connection, args: dict) -> str | None:
        override = args.get("userOverride")
        if override is not None:
            if not conn.trusted:
                raise PermissionError("user_override requires a trusted connection")
            return override
        return conn.user

    def _require_auth(self, conn: Connection) -> str:
        if conn.user is None and not conn.trusted:
            raise PermissionError("authentication required")
        return conn.user or "did:plc:trusted"

    def dispatch(self, conn: Connection, endpoint: str, args: dict):
        if endpoint == "module/upload":
            # "Only authenticated users can upload module" (connection.rs:50-54)
            self._require_auth(conn)
            blob = drisl.encode(args["module"])
            if len(blob) > self.MODULE_MAX_BYTES:
                # enforced here too so direct dispatch() callers (no
                # transport framing) hit the same cap
                raise ValueError("Module larger than 10MB maximum size.")
            module = BasicModuleDef.from_codec(args["module"])
            return {"cid": self.catalog.modules.upload(module)}
        if endpoint == "module/exists":
            return {"exists": bool(self.catalog.modules.exists(args["cid"]))}
        if endpoint == "stream/create":
            self._require_auth(conn)
            s = self.catalog.create_stream(args["streamDid"], args["moduleCid"])
            return {"streamDid": s.stream_did}
        if endpoint == "stream/info":
            info = self.catalog.stream_info(args["streamDid"])
            return {
                "streamDid": info.stream_did,
                "latestEvent": info.latest_event,
                "moduleCid": info.module_cid,
                "handle": info.handle,
            }
        if endpoint == "stream/update_module":
            self._require_auth(conn)
            self.catalog.update_module(args["streamDid"], args["moduleCid"])
            return {}
        if endpoint == "stream/event_batch":
            user = self._effective_user(conn, args) or self._require_auth(conn)
            from .types import IncomingEvent

            stream = self.catalog.open(args["streamDid"])
            latest = stream.add_events(
                [IncomingEvent(user, bytes(p)) for p in args["payloads"]]
            )
            return {"latestEvent": latest}
        if endpoint == "stream/state_event_batch":
            user = self._effective_user(conn, args) or self._require_auth(conn)
            from .types import IncomingEvent

            stream = self.catalog.open(args["streamDid"])
            stream.add_state_events(
                [IncomingEvent(user, bytes(p)) for p in args["payloads"]]
            )
            return {}
        if endpoint == "stream/clear_state":
            self._require_auth(conn)
            self.catalog.open(args["streamDid"]).clear_state()
            return {}
        if endpoint == "stream/query":
            stream = self.catalog.open(args["streamDid"])
            q = self._decode_query(args["query"])
            rows = stream.query(self._effective_user(conn, args), q)
            return {"rows": stream.rows_to_wire(rows)}
        if endpoint == "stream/subscribe_events":
            worker = self.catalog.worker(args["streamDid"])
            sub = worker.subscribe_events(
                self._effective_user(conn, args), self._decode_query(args["query"])
            )
            return {"subscriptionId": sub.sub_id}
        if endpoint == "stream/poll_subscription":
            # HTTP long-poll equivalent of the reference's socket.io push
            # (connection.rs:430-480): drain queued subscription responses,
            # blocking up to timeoutSec for the first one.
            import queue as _queue

            stream = self.catalog.open(args["streamDid"])
            worker = self.catalog.worker(args["streamDid"])
            sub = worker.subs.get(args["subscriptionId"])
            if sub is None:
                raise KeyError(f"unknown subscription {args['subscriptionId']}")
            responses = []
            timeout = float(args.get("timeoutSec") or 0)
            try:
                responses.append(
                    sub.channel.get(timeout=timeout)
                    if timeout > 0
                    else sub.channel.get_nowait()
                )
                while True:
                    responses.append(sub.channel.get_nowait())
            except _queue.Empty:
                pass
            return {
                "responses": [
                    {
                        "rows": stream.rows_to_wire(r.rows),
                        "hasMore": r.has_more,
                        "error": r.error,
                    }
                    for r in responses
                ]
            }
        if endpoint == "stream/unsubscribe":
            self.catalog.worker(args["streamDid"]).unsubscribe(args["subscriptionId"])
            return {}
        if endpoint == "stream/set_handle":
            self._require_auth(conn)
            self.catalog.set_handle(args["streamDid"], args.get("handle"))
            return {}
        if endpoint == "admin/list_streams":
            if not conn.trusted:
                raise PermissionError("admin endpoints require a trusted connection")
            return {
                "streams": [
                    {
                        "streamDid": i.stream_did,
                        "latestEvent": i.latest_event,
                        "moduleCid": i.module_cid,
                        "handle": i.handle,
                    }
                    for i in self.catalog.list_streams()
                ]
            }
        raise ValueError(f"unknown endpoint {endpoint!r}")

    @staticmethod
    def _decode_query(q: dict) -> LeafQuery:
        params = {
            k: SqlValue.from_wire(v) if isinstance(v, dict) and "$type" in v else SqlValue.of(v)
            for k, v in (q.get("params") or {}).items()
        }
        return LeafQuery(
            name=q["name"],
            params=params,
            start=q.get("start"),
            limit=q.get("limit", 1000),
        )
