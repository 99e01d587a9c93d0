"""socket.io wire transport for the Leaf server API — the reference's actual
protocol stack (leaf-server/src/http.rs:29-140, connection.rs:35-624):

    websocket (RFC 6455)
      └─ engine.io v4 (open/ping/pong/message packets)
           └─ socket.io v5 packets, msgpack-encoded
                (ParserConfig::msgpack(), http.rs:33 — every packet is one
                 msgpack map {type, nsp, data, id?} in a binary frame)
                  └─ DRISL request/ack payloads (unchanged from LeafServer)

Connection lifecycle mirrors socket_io_connection (http.rs:80-140):

- the CONNECT packet's auth payload carries ``{token}`` (get_token,
  http.rs:142-151); an invalid token emits an ``error`` event and
  disconnects — never an anonymous downgrade; a missing token connects
  anonymously (may query/subscribe, not write);
- on success the server emits ``authenticated {did}`` (http.rs:114-121);
- each endpoint is a socket.io EVENT named exactly like the reference's
  (``stream/query``…) whose single argument is the DRISL-encoded args map,
  acked with the DRISL ``{"Ok": …}|{"Err": …}`` bytes (connection.rs
  ``response()``);
- live subscriptions push ``stream/subscription_response`` EVENTs whose
  payload is the DRISL notification ``{subscriptionId, response}``
  (StreamSubscribeNotification, connection.rs:434-447), with the
  exponential-backoff retry shape of connection.rs:448-474 on send
  failures.

Engine.io details: both v4 transports are served on one port — websocket
(Upgrade requests → frame loop; server is the pinger, pongs consumed,
client pings answered) and HTTP long-polling (GET handshake → sid session,
POST delivers ``\\x1e``-separated packets with ``b``+base64 binary
encoding, GET drains the outbound queue, holding up to ``POLL_WAIT`` then
answering with a ping). Polling sessions advertise ``upgrades:
["websocket"]`` and support the full upgrade dance: a websocket opened
with the session's sid answers ``2probe`` with ``3probe``; on the ``5``
upgrade packet the socket.io state (auth, connectedness, live
subscriptions) carries over, queued polling packets flush onto the
websocket, and the retired poll GET is unblocked with a ``6`` noop.
"""

from __future__ import annotations

import base64
import json
import queue
import socket
import threading
import time
import uuid
from urllib.parse import parse_qs, urlparse

from . import drisl, msgpack_codec, websocket as ws
from .http import AuthError, verify_atproto_jwt
from .server import Connection, LeafServer

# socket.io packet types (v5)
CONNECT, DISCONNECT, EVENT, ACK, CONNECT_ERROR = 0, 1, 2, 3, 4

PING_INTERVAL = 25.0
PING_TIMEOUT = 20.0
MAX_PAYLOAD = 1_000_000


class _Conn:
    """One accepted frame socket: send lock + subscription push threads."""

    def __init__(self, fs: ws.FrameSocket):
        self.fs = fs
        self.send_lock = threading.Lock()
        self.connected = False
        self.auth: Connection = Connection()
        self.stop = threading.Event()
        self.sub_ids: list[tuple[str, str]] = []  # live (stream_did, sub_id)

    def send_packet(self, pkt: dict) -> None:
        with self.send_lock:
            self.fs.write_frame(ws.OP_BINARY, msgpack_codec.pack(pkt))

    def send_text(self, payload: str) -> None:
        with self.send_lock:
            self.fs.write_frame(ws.OP_TEXT, payload.encode())


class _PollConn:
    """An engine.io HTTP-polling session: outbound packets queue until the
    next GET drains them. Same send interface as _Conn so the socket.io
    packet layer (_on_packet/_emit/_push_loop) is transport-blind."""

    def __init__(self):
        self.outbox: "queue.Queue[tuple[str, object]]" = queue.Queue()
        self.connected = False
        self.auth: Connection = Connection()
        self.stop = threading.Event()
        self.last_seen = time.time()
        self.sub_ids: list[tuple[str, str]] = []  # live (stream_did, sub_id)
        self.push_threads: list[threading.Thread] = []  # joined on upgrade

    def send_packet(self, pkt: dict) -> None:
        self.outbox.put(("bin", msgpack_codec.pack(pkt)))

    def send_text(self, payload: str) -> None:
        self.outbox.put(("txt", payload))


class LeafSocketIOServer:
    """Threaded socket.io front end for a LeafServer. ``port=0`` auto-assigns."""

    def __init__(
        self,
        server: LeafServer,
        host: str = "127.0.0.1",
        port: int = 0,
        tokens: dict[str, Connection] | None = None,
        did_keys: dict[str, bytes] | None = None,
        audience: str | None = None,
        server_did: str = "did:web:localhost",
    ):
        self.server = server
        self.server_did = server_did
        self.tokens = tokens or {}
        self.did_keys = did_keys
        self.audience = audience
        self._listener = socket.create_server((host, port))
        self.host, self.port = self._listener.getsockname()[:2]
        self._stop = threading.Event()
        self._threads: list[threading.Thread] = []
        self._sessions: dict[str, _PollConn] = {}

    def start(self) -> "LeafSocketIOServer":
        t = threading.Thread(target=self._accept_loop, daemon=True)
        t.start()
        self._threads.append(t)
        return self

    def close(self) -> None:
        self._stop.set()
        try:
            self._listener.close()
        except OSError:
            pass

    # -- connection handling -------------------------------------------------

    def _accept_loop(self) -> None:
        while not self._stop.is_set():
            try:
                sock, _ = self._listener.accept()
            except OSError:
                return
            t = threading.Thread(target=self._serve_conn, args=(sock,), daemon=True)
            t.start()
            # polling opens one TCP connection per request, so an unpruned
            # list grows one dead Thread per poll forever
            self._threads = [x for x in self._threads if x.is_alive()]
            self._threads.append(t)

    def _serve_conn(self, sock: socket.socket) -> None:
        """Route one accepted socket: websocket Upgrade → frame loop;
        plain HTTP → one engine.io polling request (connection-per-request,
        which engine.io clients handle fine)."""
        try:
            head, leftover = ws._read_http_head(sock)
            method, target, headers = ws.parse_http_head(head)
            if "websocket" in headers.get("upgrade", "").lower():
                fs = ws.accept_upgrade(sock, headers, leftover)
                self._serve_ws(sock, fs, target)
                return
            n = int(headers.get("content-length") or 0)
            while len(leftover) < n:
                chunk = sock.recv(65536)
                if not chunk:
                    raise ConnectionError("peer closed mid-body")
                leftover += chunk
            self._handle_poll_http(sock, method, target, leftover[:n])
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            try:
                sock.close()
            except OSError:
                pass

    def _serve_ws(self, sock: socket.socket, fs: ws.FrameSocket, target: str) -> None:
        conn = _Conn(fs)
        try:
            parsed = urlparse(target)
            q = parse_qs(parsed.query)
            if parsed.path.rstrip("/") != "/socket.io" or q.get(
                "transport", [""]
            )[0] != "websocket":
                return
            up_sid = q.get("sid", [None])[0]
            if up_sid is not None:
                # engine.io transport upgrade: a live polling session moves
                # onto this websocket. Probe dance first (2probe → 3probe),
                # the socket.io state carries over on the "5" upgrade packet.
                pc = self._sessions.get(up_sid)
                if pc is None:
                    with conn.send_lock:
                        fs.write_frame(ws.OP_CLOSE)
                    return
                sid = up_sid
                conn.auth, conn.connected = pc.auth, pc.connected
                upgraded = False
            else:
                pc, upgraded = None, True
                sid = uuid.uuid4().hex
                conn.send_text("0" + json.dumps(self._open_info(sid)))
            pinger = threading.Thread(
                target=self._ping_loop, args=(conn,), daemon=True
            )
            pinger.start()
            while not self._stop.is_set() and not conn.stop.is_set():
                opcode, payload = fs.read_frame()
                if opcode == ws.OP_CLOSE:
                    with conn.send_lock:
                        fs.write_frame(ws.OP_CLOSE)
                    return
                if opcode == ws.OP_PING:
                    with conn.send_lock:
                        fs.write_frame(ws.OP_PONG, payload)
                    continue
                if opcode == ws.OP_TEXT:
                    if payload == b"2probe":  # upgrade probe
                        conn.send_text("3probe")
                    elif payload[:1] == b"2":  # engine.io ping (v3 client)
                        conn.send_text("3" + payload[1:].decode())
                    elif payload[:1] == b"5" and pc is not None and not upgraded:
                        # upgrade packet: polling retires. Order matters —
                        # a push loop blocked in channel.get() may still
                        # consume a notification DURING the upgrade, and it
                        # emits into pc.outbox; stopping and JOINING those
                        # loops BEFORE the flush guarantees everything they
                        # produced is in the outbox when we drain it (the
                        # old flush-first order silently dropped any push
                        # that raced the handover).
                        upgraded = True
                        conn.auth, conn.connected = pc.auth, pc.connected
                        pc.stop.set()
                        for pt in pc.push_threads:
                            pt.join(timeout=1.0)

                        def _drain() -> bool:
                            saw_noop = False
                            while True:
                                try:
                                    kind, data = pc.outbox.get_nowait()
                                except queue.Empty:
                                    return saw_noop
                                if kind == "txt" and str(data) == "6":
                                    saw_noop = True  # keep for the GET side
                                elif kind == "txt":
                                    conn.send_text(str(data))
                                else:
                                    with conn.send_lock:
                                        fs.write_frame(
                                            ws.OP_BINARY, bytes(data)
                                        )

                        _drain()
                        pc.outbox.put(("txt", "6"))  # noop unblocks the GET
                        self._sessions.pop(sid, None)
                        # a push thread still encoding past the 1 s join
                        # enqueues (force=True) AFTER the drain above and
                        # the packet would die with the popped session —
                        # keep joining + re-draining onto the websocket
                        # until every retiring thread is dead, then sweep
                        # once more (re-posting the noop whenever a drain
                        # swallows it, so a blocked polling GET still
                        # wakes). The wait is DEADLINE-bounded: a push
                        # thread wedged in a long engine query must not
                        # hang the upgrade (and the whole connection)
                        # forever — past the deadline we fall through to
                        # the final drain+noop sweep and the straggler's
                        # packet degrades to the old dropped-packet
                        # behavior instead of blocking the transport.
                        drain_deadline = time.monotonic() + 5.0
                        while any(
                            pt.is_alive() for pt in pc.push_threads
                        ) and time.monotonic() < drain_deadline:
                            for pt in pc.push_threads:
                                pt.join(timeout=1.0)
                            if _drain():
                                pc.outbox.put(("txt", "6"))
                        if _drain():
                            pc.outbox.put(("txt", "6"))
                        # live subscriptions follow the session, not the
                        # transport: restart their push loops on this conn
                        for s_did, s_id in pc.sub_ids:
                            conn.sub_ids.append((s_did, s_id))
                            threading.Thread(
                                target=self._push_loop,
                                args=(conn, s_did, s_id),
                                daemon=True,
                            ).start()
                    continue  # pongs/noop
                if opcode != ws.OP_BINARY:
                    continue
                pkt = msgpack_codec.unpack(payload)
                self._on_packet(conn, pkt, sid)
        finally:
            conn.stop.set()

    @staticmethod
    def _open_info(sid: str, upgrades: tuple[str, ...] = ()) -> dict:
        return {
            "sid": sid,
            "upgrades": list(upgrades),
            "pingInterval": int(PING_INTERVAL * 1000),
            "pingTimeout": int(PING_TIMEOUT * 1000),
            "maxPayload": MAX_PAYLOAD,
        }

    # -- engine.io HTTP polling ----------------------------------------------

    POLL_WAIT = 20.0  # long-poll hold before answering with a ping
    SESSION_TTL = 120.0

    def _handle_poll_http(
        self, sock: socket.socket, method: str, target: str, body: bytes
    ) -> None:
        parsed = urlparse(target)
        q = parse_qs(parsed.query)
        if parsed.path == "/.well-known/did.json":
            # identity doc (http.rs:245-261)
            doc = {
                "@context": ["https://www.w3.org/ns/did/v1"],
                "id": self.server_did,
                "service": [
                    {
                        "id": "#leaf_server",
                        "type": "LeafServer",
                        "serviceEndpoint": f"http://{self.host}:{self.port}/",
                    }
                ],
            }
            self._http_reply(sock, 200, json.dumps(doc).encode())
            return
        if parsed.path == "/xrpc/space.roomy.token.v0":
            self._http_reply(sock, 200, b"token")  # http.rs:72-75
            return
        if parsed.path == "/":
            self._http_reply(sock, 200, b"Leaf Server API")  # http.rs:66-69
            return
        if parsed.path.rstrip("/") != "/socket.io":
            self._http_reply(sock, 404, b"not found")
            return
        if q.get("transport", [""])[0] != "polling":
            self._http_reply(sock, 400, b"unsupported transport")
            return
        sid = q.get("sid", [None])[0]
        self._prune_sessions()

        if method == "GET" and sid is None:
            new_sid = uuid.uuid4().hex
            self._sessions[new_sid] = _PollConn()
            self._http_reply(
                sock,
                200,
                (
                    "0" + json.dumps(self._open_info(new_sid, ("websocket",)))
                ).encode(),
            )
            return

        pc = self._sessions.get(sid or "")
        if pc is None:
            self._http_reply(sock, 400, b"unknown sid")
            return
        pc.last_seen = time.time()

        if method == "POST":
            for raw in body.split(b"\x1e"):
                if not raw:
                    continue
                if raw[:1] == b"b":
                    pkt = msgpack_codec.unpack(base64.b64decode(raw[1:]))
                    self._on_packet(pc, pkt, sid)
                elif raw[:1] == b"1":  # engine.io close
                    pc.stop.set()
                # "3" pongs / "4" text messages: msgpack parser sends none
            self._http_reply(sock, 200, b"ok")
            return

        # GET with sid: long-poll drain. Queued packets (e.g. the error
        # event preceding a disconnect) flush BEFORE the close packet.
        items: list[tuple[str, object]] = []
        if pc.stop.is_set():
            while True:
                try:
                    items.append(pc.outbox.get_nowait())
                except queue.Empty:
                    break
            if not items:
                self._http_reply(sock, 200, b"1")  # engine.io close packet
                self._sessions.pop(sid, None)
                return
        else:
            try:
                items.append(pc.outbox.get(timeout=self.POLL_WAIT))
            except queue.Empty:
                pass
        while True:
            try:
                items.append(pc.outbox.get_nowait())
            except queue.Empty:
                break
        if not items:
            payload = b"2"  # server ping keeps the session alive
        else:
            parts = []
            for kind, data in items:
                if kind == "txt":
                    parts.append(str(data).encode())
                else:
                    parts.append(b"b" + base64.b64encode(bytes(data)))
            payload = b"\x1e".join(parts)
        self._http_reply(sock, 200, payload)

    def _prune_sessions(self) -> None:
        now = time.time()
        for k in [
            k
            for k, v in list(self._sessions.items())
            if now - v.last_seen > self.SESSION_TTL
        ]:
            self._sessions.pop(k, None)

    @staticmethod
    def _http_reply(sock: socket.socket, status: int, body: bytes) -> None:
        phrase = {200: "OK", 400: "Bad Request", 404: "Not Found"}.get(status, "OK")
        head = (
            f"HTTP/1.1 {status} {phrase}\r\n"
            "Content-Type: text/plain; charset=UTF-8\r\n"
            f"Content-Length: {len(body)}\r\n"
            "Connection: close\r\n\r\n"
        )
        sock.sendall(head.encode("latin-1") + body)

    def _ping_loop(self, conn: _Conn) -> None:
        while not conn.stop.is_set() and not self._stop.is_set():
            if conn.stop.wait(PING_INTERVAL):
                return
            try:
                conn.send_text("2")
            except OSError:
                return

    # -- socket.io packets ---------------------------------------------------

    def _emit(self, conn: _Conn, event: str, *args, force: bool = False) -> None:
        """EVENT emit with the reference's backpressure retry shape
        (connection.rs:448-474): exponential delay from 10 ms to 1 s on a
        transient send failure, abort once the peer is gone.

        ``force=True`` emits even after conn.stop is set — a retiring
        polling session's push loop uses it for a notification it has
        ALREADY consumed from the subscription channel: dropping it there
        would lose the message (the channel won't replay it), while the
        upgrade handler flushes the outbox after joining the loop, so the
        enqueued packet still reaches the peer on the new transport."""
        delay, max_delay = 0.01, 1.0
        while force or not conn.stop.is_set():
            try:
                conn.send_packet({"type": EVENT, "nsp": "/", "data": [event, *args]})
                return
            except BlockingIOError:
                time.sleep(delay)
                delay = min(delay * 2, max_delay)
            except OSError:
                conn.stop.set()
                return

    def _on_packet(self, conn: _Conn, pkt: dict, sid: str) -> None:
        ptype = pkt.get("type")
        if ptype == CONNECT:
            data = pkt.get("data") or {}
            token = data.get("token") if isinstance(data, dict) else None
            try:
                conn.auth = self._authenticate(token)
            except AuthError as ex:
                # http.rs:90-101: emit the error, then disconnect
                self._emit(conn, "error", f"Error validating auth token: {ex}")
                conn.send_packet({"type": DISCONNECT, "nsp": "/"})
                conn.stop.set()
                return
            conn.connected = True
            conn.send_packet(
                {"type": CONNECT, "nsp": "/", "data": {"sid": uuid.uuid4().hex}}
            )
            self._emit(conn, "authenticated", {"did": conn.auth.user})
            return
        if ptype == DISCONNECT:
            conn.stop.set()
            return
        if ptype != EVENT or not conn.connected:
            return
        data = pkt.get("data") or []
        if not data:
            return
        name, args = data[0], (data[1] if len(data) > 1 else b"")
        # consult the SERVED object's surface: a LeafServer exposes exactly
        # the reference's 13+1 endpoints; a ShardRouter adds the sharded-mode
        # admin/move_stream extension
        if name not in self.server.ENDPOINTS:
            ack_body = drisl.encode({"Err": f"ValueError: unknown endpoint {name!r}"})
        else:
            ack_body = self.server.handle(
                conn.auth, name, bytes(args) if args else b""
            )
        if pkt.get("id") is not None:
            conn.send_packet(
                {"type": ACK, "nsp": "/", "id": pkt["id"], "data": [ack_body]}
            )
        if name == "stream/subscribe_events":
            ack = drisl.decode(ack_body)
            if "Ok" in ack:
                stream_did = drisl.decode(bytes(args))["streamDid"]
                conn.sub_ids.append((stream_did, ack["Ok"]["subscriptionId"]))
                t = threading.Thread(
                    target=self._push_loop,
                    args=(conn, stream_did, ack["Ok"]["subscriptionId"]),
                    daemon=True,
                )
                t.start()
                if hasattr(conn, "push_threads"):
                    conn.push_threads.append(t)

    def _authenticate(self, token: str | None) -> Connection:
        if not token:
            return Connection()  # anonymous
        conn = self.tokens.get(token)
        if conn is not None:
            return conn
        if self.did_keys is not None and token.count(".") == 2:
            did = verify_atproto_jwt(token, self.did_keys, audience=self.audience)
            return Connection(user=did)
        raise AuthError("unknown token")

    # -- live subscription push ---------------------------------------------

    def _push_loop(self, conn: _Conn, stream_did: str, sub_id: str) -> None:
        """Drain the subscription channel, emitting each response as a
        ``stream/subscription_response`` EVENT whose payload is the DRISL
        StreamSubscribeNotification (connection.rs:434-447)."""
        worker = self.server.catalog.worker(stream_did)
        stream = self.server.catalog.open(stream_did)
        sub = worker.subs.get(sub_id)
        if sub is None:
            return
        while not conn.stop.is_set():
            try:
                r = sub.channel.get(timeout=0.25)
            except queue.Empty:
                if sub_id not in worker.subs:
                    return  # unsubscribed
                continue
            payload = drisl.encode(
                {
                    "subscriptionId": sub_id,
                    "response": {
                        "Ok": {
                            "rows": stream.rows_to_wire(r.rows),
                            "hasMore": r.has_more,
                        }
                    }
                    if r.error is None
                    else {"Err": r.error},
                }
            )
            # force: this notification is already consumed from the channel;
            # if the session is retiring (transport upgrade), the packet
            # must land in the outbox for the post-join flush, not vanish
            self._emit(conn, "stream/subscription_response", payload, force=True)


# ---------------------------------------------------------------------------
# client
# ---------------------------------------------------------------------------


class LeafSocketIOClient:
    """Test/client counterpart: websocket + engine.io + msgpack socket.io,
    mirroring clients/typescript/src/index.ts (socket.io-client +
    socket.io-msgpack-parser)."""

    def __init__(self, host: str, port: int, token: str | None = None, timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.fs = ws.client_handshake(
            self.sock, f"{host}:{port}", "/socket.io/?EIO=4&transport=websocket"
        )
        # handshake done: switch to blocking reads — the reader thread must
        # survive idle stretches (server ops can outlast any socket timeout);
        # close() unblocks it
        self.sock.settimeout(None)
        self._acks: dict[int, queue.Queue] = {}
        self._next_id = 0
        self.events: queue.Queue = queue.Queue()
        self._send_lock = threading.Lock()
        self._closed = threading.Event()

        # engine.io open
        opcode, payload = self.fs.read_frame()
        if opcode != ws.OP_TEXT or payload[:1] != b"0":
            raise ConnectionError(f"expected engine.io open, got {payload[:20]!r}")
        self.engine_info = json.loads(payload[1:])

        # socket.io connect (auth payload carries the token, http.rs:142-151)
        data = {"token": token} if token else {}
        self._send({"type": CONNECT, "nsp": "/", "data": data})
        self._reader = threading.Thread(target=self._read_loop, daemon=True)
        self._reader.start()
        # wait for CONNECT ack or error event
        evt = self._connect_result = self._wait_connected(timeout)

    def _wait_connected(self, timeout: float):
        deadline = time.time() + timeout
        while time.time() < deadline:
            try:
                kind, payload = self.events.get(timeout=0.1)
            except queue.Empty:
                continue
            if kind == "__connected__":
                return payload
            if kind == "error":
                raise AuthError(str(payload))
            if kind == "__disconnect__":
                raise ConnectionError("server disconnected during connect")
            # keep non-handshake events for the caller
            self.events.put((kind, payload))
        raise TimeoutError("socket.io connect timed out")

    def _send(self, pkt: dict) -> None:
        with self._send_lock:
            self.fs.write_frame(ws.OP_BINARY, msgpack_codec.pack(pkt), mask=True)

    def _read_loop(self) -> None:
        try:
            while not self._closed.is_set():
                opcode, payload = self.fs.read_frame()
                if opcode == ws.OP_CLOSE:
                    break
                if opcode == ws.OP_TEXT:
                    if payload[:1] == b"2":  # engine.io ping → pong
                        with self._send_lock:
                            self.fs.write_frame(
                                ws.OP_TEXT, b"3" + payload[1:], mask=True
                            )
                    continue
                if opcode != ws.OP_BINARY:
                    continue
                pkt = msgpack_codec.unpack(payload)
                ptype = pkt.get("type")
                if ptype == CONNECT:
                    self.events.put(("__connected__", pkt.get("data")))
                elif ptype == DISCONNECT:
                    self.events.put(("__disconnect__", None))
                elif ptype == ACK:
                    q = self._acks.pop(pkt.get("id"), None)
                    if q is not None:
                        q.put(pkt.get("data") or [])
                elif ptype == EVENT:
                    data = pkt.get("data") or []
                    if data:
                        self.events.put((data[0], data[1] if len(data) > 1 else None))
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            self._closed.set()

    def call(self, endpoint: str, args: dict, timeout: float = 120.0) -> dict:
        """EVENT + ack round trip; returns the decoded DRISL Result map."""
        self._next_id += 1
        pkt_id = self._next_id
        q: queue.Queue = queue.Queue()
        self._acks[pkt_id] = q
        self._send(
            {
                "type": EVENT,
                "nsp": "/",
                "id": pkt_id,
                "data": [endpoint, drisl.encode(args)],
            }
        )
        data = q.get(timeout=timeout)
        return drisl.decode(bytes(data[0]))

    def next_event(self, timeout: float = 10.0) -> tuple[str, object]:
        """(event_name, payload); subscription payloads are decoded DRISL."""
        kind, payload = self.events.get(timeout=timeout)
        if kind == "stream/subscription_response" and payload is not None:
            return kind, drisl.decode(bytes(payload))
        return kind, payload

    def close(self) -> None:
        self._closed.set()
        try:
            self._send({"type": DISCONNECT, "nsp": "/"})
        except OSError:
            pass
        try:
            self.sock.close()
        except OSError:
            pass


class LeafSocketIOPollingClient:
    """Polling-transport counterpart of LeafSocketIOClient: HTTP GET/POST
    engine.io sessions with ``\\x1e``-separated packets, the bootstrap stock
    socket.io clients use when websockets are unavailable."""

    def __init__(self, host: str, port: int, token: str | None = None, timeout: float = 10.0):
        import http.client

        self.host, self.port = host, port
        self._timeout = timeout
        self._acks: dict[int, queue.Queue] = {}
        self._next_id = 0
        self.events: queue.Queue = queue.Queue()
        self._closed = threading.Event()

        body = self._request("GET", "/socket.io/?EIO=4&transport=polling")
        if body[:1] != b"0":
            raise ConnectionError(f"expected engine.io open, got {body[:20]!r}")
        self.engine_info = json.loads(body[1:])
        self.sid = self.engine_info["sid"]

        data = {"token": token} if token else {}
        self._post_packet({"type": CONNECT, "nsp": "/", "data": data})
        self._reader = threading.Thread(target=self._poll_loop, daemon=True)
        self._reader.start()
        self._connect_result = LeafSocketIOClient._wait_connected(self, timeout)

    # -- transport -----------------------------------------------------------

    def _request(self, method: str, path: str, body: bytes = b"") -> bytes:
        import http.client

        conn = http.client.HTTPConnection(self.host, self.port, timeout=max(
            self._timeout, LeafSocketIOServer.POLL_WAIT + 10
        ))
        try:
            conn.request(
                method, path, body,
                {"Content-Type": "text/plain; charset=UTF-8"} if body else {},
            )
            resp = conn.getresponse()
            out = resp.read()
            if resp.status != 200:
                raise ConnectionError(f"engine.io polling {resp.status}: {out[:80]!r}")
            return out
        finally:
            conn.close()

    def _post_packet(self, pkt: dict) -> None:
        payload = b"b" + base64.b64encode(msgpack_codec.pack(pkt))
        self._request(
            "POST", f"/socket.io/?EIO=4&transport=polling&sid={self.sid}", payload
        )

    def _poll_loop(self) -> None:
        try:
            while not self._closed.is_set():
                body = self._request(
                    "GET", f"/socket.io/?EIO=4&transport=polling&sid={self.sid}"
                )
                for raw in body.split(b"\x1e"):
                    if not raw or raw[:1] in (b"2", b"3"):  # ping/pong
                        continue
                    if raw[:1] == b"1":  # engine.io close
                        self.events.put(("__disconnect__", None))
                        return
                    if raw[:1] != b"b":
                        continue
                    pkt = msgpack_codec.unpack(base64.b64decode(raw[1:]))
                    self._dispatch(pkt)
        except (ConnectionError, OSError, ValueError):
            pass
        finally:
            self._closed.set()

    def _dispatch(self, pkt: dict) -> None:
        ptype = pkt.get("type")
        if ptype == CONNECT:
            self.events.put(("__connected__", pkt.get("data")))
        elif ptype == DISCONNECT:
            self.events.put(("__disconnect__", None))
        elif ptype == ACK:
            q = self._acks.pop(pkt.get("id"), None)
            if q is not None:
                q.put(pkt.get("data") or [])
        elif ptype == EVENT:
            data = pkt.get("data") or []
            if data:
                self.events.put((data[0], data[1] if len(data) > 1 else None))

    # -- API (same surface as the websocket client) --------------------------

    def call(self, endpoint: str, args: dict, timeout: float = 120.0) -> dict:
        self._next_id += 1
        pkt_id = self._next_id
        q: queue.Queue = queue.Queue()
        self._acks[pkt_id] = q
        self._post_packet(
            {"type": EVENT, "nsp": "/", "id": pkt_id,
             "data": [endpoint, drisl.encode(args)]}
        )
        data = q.get(timeout=timeout)
        return drisl.decode(bytes(data[0]))

    next_event = LeafSocketIOClient.next_event

    def close(self) -> None:
        self._closed.set()
        try:
            self._post_packet({"type": DISCONNECT, "nsp": "/"})
        except (ConnectionError, OSError):
            pass
