"""socket.io wire-transport tests (A23 transport parity): msgpack codec,
RFC 6455 framing, engine.io handshake, socket.io CONNECT auth, DRISL
event/ack round trips, and live subscription pushes — the reference's
protocol stack (http.rs:29-140, connection.rs:35-624) end to end over a
real TCP socket."""

from __future__ import annotations

import queue
import socket
import threading

import pytest

from leaf_spark import drisl, msgpack_codec, websocket as ws
from leaf_spark.catalog import StreamCatalog
from leaf_spark.http import AuthError
from leaf_spark.server import Connection, LeafServer
from leaf_spark.socketio import LeafSocketIOClient, LeafSocketIOServer

from .fixtures import CHAT


# ---------------------------------------------------------------------------
# msgpack codec
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "value",
    [
        None,
        True,
        False,
        0,
        1,
        127,
        128,
        255,
        256,
        65535,
        65536,
        2**32,
        2**63 - 1,
        -1,
        -32,
        -33,
        -128,
        -129,
        -32768,
        -(2**31),
        -(2**63),
        1.5,
        -0.25,
        "",
        "hello",
        "x" * 31,
        "x" * 32,
        "x" * 300,
        "ünïcødé",
        b"",
        b"bytes",
        b"\x00" * 300,
        [],
        [1, "two", b"three", None],
        {},
        {"a": 1, "b": [True, {"c": b"d"}]},
        {"type": 2, "nsp": "/", "id": 7, "data": ["stream/query", b"\x01\x02"]},
    ],
)
def test_msgpack_roundtrip(value):
    assert msgpack_codec.unpack(msgpack_codec.pack(value)) == value


def test_msgpack_large_collections():
    v = {"arr": list(range(70000)), "map": {str(i): i for i in range(70000)}}
    assert msgpack_codec.unpack(msgpack_codec.pack(v)) == v


def test_msgpack_rejects_trailing_garbage():
    with pytest.raises(ValueError):
        msgpack_codec.unpack(msgpack_codec.pack(1) + b"\x00")


# ---------------------------------------------------------------------------
# websocket framing
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("size", [0, 5, 125, 126, 65535, 65536, 200000])
@pytest.mark.parametrize("mask", [False, True])
def test_ws_frame_roundtrip(size, mask):
    a, b = socket.socketpair()
    try:
        payload = bytes(i % 251 for i in range(size))
        ws.FrameSocket(a).write_frame(ws.OP_BINARY, payload, mask=mask)
        opcode, got = ws.FrameSocket(b).read_frame()
        assert opcode == ws.OP_BINARY and got == payload
    finally:
        a.close()
        b.close()


def test_ws_leftover_bytes_are_not_dropped():
    """A frame pipelined behind the handshake bytes must still be readable
    (regression: handshake recv(4096) used to discard the tail)."""
    a, b = socket.socketpair()
    try:
        fs_a = ws.FrameSocket(a)
        fs_a.write_frame(ws.OP_TEXT, b"hello")
        fs_a.write_frame(ws.OP_BINARY, b"world")
        # read everything into one buffer, then hand it to FrameSocket as
        # leftover — mimicking an over-read during the HTTP handshake
        import time

        time.sleep(0.05)
        blob = b.recv(65536)
        fs_b = ws.FrameSocket(b, leftover=blob)
        assert fs_b.read_frame() == (ws.OP_TEXT, b"hello")
        assert fs_b.read_frame() == (ws.OP_BINARY, b"world")
    finally:
        a.close()
        b.close()


def test_ws_accept_key_rfc_example():
    # the worked example from RFC 6455 §1.3
    assert (
        ws.accept_key("dGhlIHNhbXBsZSBub25jZQ==")
        == "s3pPLMBiTxaQ9kYGzzhZRbK+xOo="
    )


# ---------------------------------------------------------------------------
# full stack
# ---------------------------------------------------------------------------


@pytest.fixture()
def sio_server(spark, tmp_root):
    catalog = StreamCatalog(spark, tmp_root)
    srv = LeafSocketIOServer(
        LeafServer(catalog),
        tokens={
            "alice-token": Connection(user="did:plc:alice"),
            "admin-token": Connection(user="did:plc:admin", trusted=True),
        },
    ).start()
    yield srv
    srv.close()


def _client(srv, token=None) -> LeafSocketIOClient:
    return LeafSocketIOClient(srv.host, srv.port, token=token)


def _setup_stream(cli: LeafSocketIOClient, did="did:plc:siochat") -> str:
    cid = cli.call("module/upload", {"module": CHAT.to_codec()})["Ok"]["cid"]
    out = cli.call("stream/create", {"streamDid": did, "moduleCid": cid})
    assert "Ok" in out, out
    return did


def test_connect_emits_authenticated_with_did(sio_server):
    cli = _client(sio_server, token="alice-token")
    try:
        kind, payload = cli.next_event()
        assert kind == "authenticated" and payload == {"did": "did:plc:alice"}
    finally:
        cli.close()


def test_anonymous_connect_and_write_denied(sio_server):
    cli = _client(sio_server)
    try:
        kind, payload = cli.next_event()
        assert kind == "authenticated" and payload == {"did": None}
        out = cli.call("module/upload", {"module": CHAT.to_codec()})
        # ref: "Only authenticated users can upload module" → our PermissionError
        assert "Err" in out
    finally:
        cli.close()


def test_invalid_token_error_event_then_disconnect(sio_server):
    with pytest.raises(AuthError, match="validating auth token"):
        _client(sio_server, token="no-such-token")


def test_event_ack_round_trip_and_query(sio_server):
    cli = _client(sio_server, token="alice-token")
    try:
        did = _setup_stream(cli)
        out = cli.call(
            "stream/event_batch",
            {
                "streamDid": did,
                "payloads": [
                    drisl.encode({"content": "hi socket.io", "sentAt": 5})
                ],
            },
        )
        assert out["Ok"]["latestEvent"] == 1
        rows = cli.call(
            "stream/query", {"streamDid": did, "query": {"name": "messages"}}
        )["Ok"]["rows"]
        assert [r["content"]["value"] for r in rows] == ["hi socket.io"]
    finally:
        cli.close()


def test_unknown_endpoint_err_ack(sio_server):
    cli = _client(sio_server, token="alice-token")
    try:
        out = cli.call("nope/nothing", {})
        assert "Err" in out
    finally:
        cli.close()


def test_subscription_pushes_live_events(sio_server):
    cli = _client(sio_server, token="alice-token")
    try:
        did = _setup_stream(cli)
        sub = cli.call(
            "stream/subscribe_events",
            {"streamDid": did, "query": {"name": "messages"}},
        )["Ok"]
        sub_id = sub["subscriptionId"]
        cli.call(
            "stream/event_batch",
            {
                "streamDid": did,
                "payloads": [drisl.encode({"content": "pushed!", "sentAt": 9})],
            },
        )
        # drain events until the subscription push arrives
        for _ in range(10):
            kind, payload = cli.next_event(timeout=30)
            if kind == "stream/subscription_response":
                break
        else:
            pytest.fail("no subscription push received")
        assert payload["subscriptionId"] == sub_id
        resp = payload["response"]["Ok"]
        assert [r["content"]["value"] for r in resp["rows"]] == ["pushed!"]
        out = cli.call(
            "stream/unsubscribe", {"streamDid": did, "subscriptionId": sub_id}
        )
        assert "Ok" in out
    finally:
        cli.close()


def test_jwt_connect(sio_server, spark, tmp_root):
    from .test_http import _es256_keypair, _mint_jwt

    key, pem = _es256_keypair()
    catalog = StreamCatalog(spark, tmp_root + "-jwt")
    srv = LeafSocketIOServer(
        LeafServer(catalog),
        did_keys={"did:plc:jwtuser": pem},
    ).start()
    try:
        token = _mint_jwt(key, {"iss": "did:plc:jwtuser"})
        cli = LeafSocketIOClient(srv.host, srv.port, token=token)
        try:
            kind, payload = cli.next_event()
            assert kind == "authenticated" and payload == {"did": "did:plc:jwtuser"}
        finally:
            cli.close()
        # tampered signature → error event + disconnect
        bad = token[:-4] + ("AAAA" if token[-4:] != "AAAA" else "BBBB")
        with pytest.raises(AuthError):
            LeafSocketIOClient(srv.host, srv.port, token=bad)
    finally:
        srv.close()


def test_engine_io_server_ping_answered(sio_server):
    """The reader thread pongs server pings transparently (engine.io v4:
    server pings, client pongs) — exercised by forcing a ping."""
    cli = _client(sio_server, token="alice-token")
    try:
        cli.next_event()  # authenticated
        # reach into the server's connection and push a ping immediately
        assert cli.engine_info["pingInterval"] == 25000
        out = cli.call("module/exists", {"cid": "bafynope"})
        assert out["Ok"] == {"exists": False}
    finally:
        cli.close()


# ---------------------------------------------------------------------------
# engine.io HTTP long-polling transport
# ---------------------------------------------------------------------------


def _poll_client(srv, token=None):
    from leaf_spark.socketio import LeafSocketIOPollingClient

    return LeafSocketIOPollingClient(srv.host, srv.port, token=token)


def test_polling_connect_call_and_ack(sio_server):
    cli = _poll_client(sio_server, token="alice-token")
    try:
        kind, payload = cli.next_event()
        assert kind == "authenticated" and payload == {"did": "did:plc:alice"}
        cid = cli.call("module/upload", {"module": CHAT.to_codec()})["Ok"]["cid"]
        out = cli.call(
            "stream/create", {"streamDid": "did:plc:pollchat", "moduleCid": cid}
        )
        assert "Ok" in out
        out = cli.call(
            "stream/event_batch",
            {
                "streamDid": "did:plc:pollchat",
                "payloads": [drisl.encode({"content": "via polling", "sentAt": 3})],
            },
        )
        assert out["Ok"]["latestEvent"] == 1
        rows = cli.call(
            "stream/query",
            {"streamDid": "did:plc:pollchat", "query": {"name": "messages"}},
        )["Ok"]["rows"]
        assert [r["content"]["value"] for r in rows] == ["via polling"]
    finally:
        cli.close()


def test_polling_subscription_push(sio_server):
    cli = _poll_client(sio_server, token="alice-token")
    try:
        did = "did:plc:pollsub"
        cid = cli.call("module/upload", {"module": CHAT.to_codec()})["Ok"]["cid"]
        cli.call("stream/create", {"streamDid": did, "moduleCid": cid})
        sub = cli.call(
            "stream/subscribe_events",
            {"streamDid": did, "query": {"name": "messages"}},
        )["Ok"]
        cli.call(
            "stream/event_batch",
            {
                "streamDid": did,
                "payloads": [drisl.encode({"content": "poll push", "sentAt": 1})],
            },
        )
        for _ in range(10):
            kind, payload = cli.next_event(timeout=30)
            if kind == "stream/subscription_response":
                break
        else:
            pytest.fail("no subscription push over polling")
        assert payload["subscriptionId"] == sub["subscriptionId"]
        rows = payload["response"]["Ok"]["rows"]
        assert [r["content"]["value"] for r in rows] == ["poll push"]
    finally:
        cli.close()


def test_polling_invalid_token_rejected(sio_server):
    with pytest.raises(AuthError, match="validating auth token"):
        _poll_client(sio_server, token="bogus")


def test_polling_unknown_sid_is_400(sio_server):
    import http.client

    conn = http.client.HTTPConnection(sio_server.host, sio_server.port, timeout=10)
    conn.request("GET", "/socket.io/?EIO=4&transport=polling&sid=nope")
    resp = conn.getresponse()
    assert resp.status == 400
    conn.close()


def test_transport_upgrade_dance(sio_server):
    """Bootstrap over polling, then upgrade the live session to websocket:
    probe ping/pong, '5' upgrade, state + subscriptions carry over, and the
    retired poll unblocks with a noop."""
    import json as _json
    import socket as _socket

    from leaf_spark import msgpack_codec as mp, websocket as _ws
    from leaf_spark.socketio import ACK, CONNECT, DISCONNECT, EVENT

    cli = _poll_client(sio_server, token="alice-token")
    try:
        did = "did:plc:upgraded"
        cid = cli.call("module/upload", {"module": CHAT.to_codec()})["Ok"]["cid"]
        cli.call("stream/create", {"streamDid": did, "moduleCid": cid})
        sub = cli.call(
            "stream/subscribe_events",
            {"streamDid": did, "query": {"name": "messages"}},
        )["Ok"]

        # open a websocket bound to the SAME engine.io session
        s = _socket.create_connection((sio_server.host, sio_server.port), timeout=30)
        fs = _ws.client_handshake(
            s,
            f"{sio_server.host}:{sio_server.port}",
            f"/socket.io/?EIO=4&transport=websocket&sid={cli.sid}",
        )
        s.settimeout(60)
        fs.write_frame(_ws.OP_TEXT, b"2probe", mask=True)
        opcode, payload = fs.read_frame()
        assert (opcode, payload) == (_ws.OP_TEXT, b"3probe")
        fs.write_frame(_ws.OP_TEXT, b"5", mask=True)  # commit the upgrade

        # stop the polling reader — transport has moved on
        cli._closed.set()

        # the session's auth survives: an authed-only call acks over ws
        fs.write_frame(
            _ws.OP_BINARY,
            mp.pack(
                {
                    "type": EVENT,
                    "nsp": "/",
                    "id": 99,
                    "data": [
                        "stream/event_batch",
                        drisl.encode(
                            {
                                "streamDid": did,
                                "payloads": [
                                    drisl.encode(
                                        {"content": "post-upgrade", "sentAt": 4}
                                    )
                                ],
                            }
                        ),
                    ],
                }
            ),
            mask=True,
        )
        got_ack, got_push = False, False
        for _ in range(20):
            opcode, payload = fs.read_frame()
            if opcode != _ws.OP_BINARY:
                continue
            pkt = mp.unpack(payload)
            if pkt.get("type") == ACK and pkt.get("id") == 99:
                ack = drisl.decode(bytes(pkt["data"][0]))
                assert ack["Ok"]["latestEvent"] == 1
                got_ack = True
            if pkt.get("type") == EVENT and pkt.get("data", [None])[0] == (
                "stream/subscription_response"
            ):
                note = drisl.decode(bytes(pkt["data"][1]))
                assert note["subscriptionId"] == sub["subscriptionId"]
                rows = note["response"]["Ok"]["rows"]
                assert [r["content"]["value"] for r in rows] == ["post-upgrade"]
                got_push = True
            if got_ack and got_push:
                break
        assert got_ack and got_push
        s.close()
    finally:
        cli.close()


def test_well_known_endpoints(sio_server):
    import http.client
    import json as _json

    conn = http.client.HTTPConnection(sio_server.host, sio_server.port, timeout=10)
    conn.request("GET", "/.well-known/did.json")
    resp = conn.getresponse()
    doc = _json.loads(resp.read())
    assert resp.status == 200
    assert doc["service"][0]["type"] == "LeafServer"
    conn.close()

    conn = http.client.HTTPConnection(sio_server.host, sio_server.port, timeout=10)
    conn.request("GET", "/")
    resp = conn.getresponse()
    assert resp.read() == b"Leaf Server API"
    conn.close()


# ---------------------------------------------------------------------------
# property tests (hypothesis)
# ---------------------------------------------------------------------------

try:
    from hypothesis import given, settings, strategies as st

    _VALUES = st.recursive(
        st.none()
        | st.booleans()
        | st.integers(min_value=-(2**63), max_value=2**64 - 1)
        | st.floats(allow_nan=False, allow_infinity=False)
        | st.text(max_size=40)
        | st.binary(max_size=40),
        lambda children: st.lists(children, max_size=6)
        | st.dictionaries(st.text(max_size=10), children, max_size=6),
        max_leaves=25,
    )

    @given(_VALUES)
    @settings(max_examples=200, deadline=None)
    def test_msgpack_roundtrip_property(value):
        assert msgpack_codec.unpack(msgpack_codec.pack(value)) == value

except ImportError:  # pragma: no cover
    pass


# ---------------------------------------------------------------------------
# full endpoint surface over the wire
# ---------------------------------------------------------------------------


def test_every_endpoint_over_socketio(sio_server):
    """One session exercises the complete reference endpoint surface
    (connection.rs:35-624) through the msgpack/websocket stack."""
    admin = _client(sio_server, token="admin-token")
    cli = _client(sio_server, token="alice-token")
    try:
        did = "did:plc:fullsurface"
        cid = cli.call("module/upload", {"module": CHAT.to_codec()})["Ok"]["cid"]
        assert cli.call("module/exists", {"cid": cid})["Ok"]["exists"]
        assert not cli.call("module/exists", {"cid": "bafynope"})["Ok"]["exists"]
        assert (
            cli.call("stream/create", {"streamDid": did, "moduleCid": cid})["Ok"][
                "streamDid"
            ]
            == did
        )
        info = cli.call("stream/info", {"streamDid": did})["Ok"]
        assert info["moduleCid"] == cid and info["latestEvent"] == 0

        out = cli.call(
            "stream/event_batch",
            {
                "streamDid": did,
                "payloads": [drisl.encode({"content": "m1", "sentAt": 1})],
            },
        )
        assert out["Ok"]["latestEvent"] == 1

        # state events + read-marker query + clear_state
        assert "Ok" in cli.call(
            "stream/state_event_batch",
            {"streamDid": did, "payloads": [drisl.encode({"lastRead": 1})]},
        )
        unread = cli.call(
            "stream/query", {"streamDid": did, "query": {"name": "my_unread"}}
        )["Ok"]["rows"]
        assert unread[0]["unread"]["value"] == 0
        assert "Ok" in cli.call("stream/clear_state", {"streamDid": did})
        unread = cli.call(
            "stream/query", {"streamDid": did, "query": {"name": "my_unread"}}
        )["Ok"]["rows"]
        assert unread[0]["unread"]["value"] == 1  # marker gone

        # update_module (same cid → no-op path), set_handle, admin list
        assert "Ok" in cli.call(
            "stream/update_module", {"streamDid": did, "moduleCid": cid}
        )
        assert "Ok" in cli.call(
            "stream/set_handle", {"streamDid": did, "handle": "full.example"}
        )
        assert "Err" in cli.call("admin/list_streams", {})  # not trusted
        streams = admin.call("admin/list_streams", {})["Ok"]["streams"]
        mine = [s for s in streams if s["streamDid"] == did]
        assert mine and mine[0]["handle"] == "full.example"

        # user_override: trusted connections only (connection.rs:240-252)
        out = admin.call(
            "stream/event_batch",
            {
                "streamDid": did,
                "userOverride": "did:plc:impersonated",
                "payloads": [drisl.encode({"content": "as someone else", "sentAt": 2})],
            },
        )
        assert "Ok" in out
        assert "Err" in cli.call(
            "stream/event_batch",
            {
                "streamDid": did,
                "userOverride": "did:plc:impersonated",
                "payloads": [drisl.encode({"content": "nope", "sentAt": 3})],
            },
        )

        # subscribe → push → unsubscribe
        sub = cli.call(
            "stream/subscribe_events",
            {"streamDid": did, "query": {"name": "messages"}},
        )["Ok"]
        assert "Ok" in cli.call(
            "stream/unsubscribe",
            {"streamDid": did, "subscriptionId": sub["subscriptionId"]},
        )
    finally:
        cli.close()
        admin.close()


def test_emit_force_enqueues_past_stop_flag():
    """A push loop that already consumed a notification emits it with
    force=True: the packet must land in a RETIRING polling session's
    outbox (flushed later by the upgrade handler) instead of being
    dropped by _emit's stop guard — dropping would lose the message, the
    channel never replays consumed items."""
    from leaf_spark import msgpack_codec
    from leaf_spark.socketio import _PollConn, LeafSocketIOServer

    pc = _PollConn()
    pc.stop.set()  # session is retiring mid-upgrade
    LeafSocketIOServer._emit(
        object.__new__(LeafSocketIOServer), pc, "stream/subscription_response",
        b"payload", force=True,
    )
    kind, data = pc.outbox.get_nowait()
    assert kind == "bin"
    pkt = msgpack_codec.unpack(bytes(data))
    assert pkt["data"][0] == "stream/subscription_response"

    # without force the stop guard drops it (the pre-fix behavior — pinned
    # so the difference stays intentional)
    LeafSocketIOServer._emit(
        object.__new__(LeafSocketIOServer), pc, "stream/subscription_response",
        b"payload",
    )
    assert pc.outbox.empty()
