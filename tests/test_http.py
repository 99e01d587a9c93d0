"""HTTP transport tests (VERDICT missing #4): a real listening socket
carrying the same DRISL Result acks as LeafServer.handle, with bearer-token
auth and the 10 MB upload cap enforced pre-decode."""

import pytest

from leaf_spark import drisl
from leaf_spark.catalog import StreamCatalog
from leaf_spark.http import LeafHttpServer, http_call
from leaf_spark.server import Connection, LeafServer

from .fixtures import CHAT


@pytest.fixture()
def http_server(spark, tmp_root):
    catalog = StreamCatalog(spark, tmp_root)
    srv = LeafHttpServer(
        LeafServer(catalog),
        tokens={
            "alice-token": Connection(user="did:plc:alice"),
            "admin-token": Connection(user="did:plc:admin", trusted=True),
        },
    ).start()
    yield srv
    srv.close()


def _setup_stream(srv) -> str:
    up = http_call(
        srv.host, srv.port, "module/upload", {"module": CHAT.to_codec()}, "alice-token"
    )
    cid = up["Ok"]["cid"]
    out = http_call(
        srv.host,
        srv.port,
        "stream/create",
        {"streamDid": "did:plc:httpchat", "moduleCid": cid},
        "alice-token",
    )
    assert "Ok" in out, out
    return "did:plc:httpchat"


class TestHttpTransport:
    def test_full_round_trip_over_socket(self, http_server):
        did = _setup_stream(http_server)
        out = http_call(
            http_server.host,
            http_server.port,
            "stream/event_batch",
            {
                "streamDid": did,
                "payloads": [drisl.encode({"content": "hi", "sentAt": 5})],
            },
            "alice-token",
        )
        assert out == {"Ok": {"latestEvent": 1}}
        q = http_call(
            http_server.host,
            http_server.port,
            "stream/query",
            {"streamDid": did, "query": {"name": "messages"}},
        )
        rows = q["Ok"]["rows"]
        assert len(rows) == 1
        assert rows[0]["content"]["value"] == "hi"

    def test_anonymous_write_rejected(self, http_server):
        did = _setup_stream(http_server)
        out = http_call(
            http_server.host,
            http_server.port,
            "stream/event_batch",
            {"streamDid": did, "payloads": [drisl.encode({"content": "x"})]},
        )
        assert "Err" in out and "authentication" in out["Err"].lower()

    def test_bad_token_is_anonymous(self, http_server):
        out = http_call(
            http_server.host,
            http_server.port,
            "admin/list_streams",
            {},
            "wrong-token",
        )
        assert "Err" in out and "trusted" in out["Err"]

    def test_admin_requires_trusted(self, http_server):
        _setup_stream(http_server)
        out = http_call(
            http_server.host, http_server.port, "admin/list_streams", {}, "admin-token"
        )
        assert [s["streamDid"] for s in out["Ok"]["streams"]] == ["did:plc:httpchat"]

    def test_oversize_upload_refused_pre_decode(self, http_server):
        import http.client

        conn = http.client.HTTPConnection(http_server.host, http_server.port, timeout=30)
        body = b"\x00" * (11 * 1024 * 1024)
        conn.request(
            "POST",
            "/module/upload",
            body,
            {"Authorization": "Bearer alice-token"},
        )
        resp = conn.getresponse()
        out = drisl.decode(resp.read())
        conn.close()
        assert resp.status == 413
        assert "10MB" in out["Err"]

    def test_subscription_long_poll(self, http_server):
        did = _setup_stream(http_server)
        sub = http_call(
            http_server.host,
            http_server.port,
            "stream/subscribe_events",
            {"streamDid": did, "query": {"name": "messages", "start": 1}},
            "alice-token",
        )
        sub_id = sub["Ok"]["subscriptionId"]
        http_call(
            http_server.host,
            http_server.port,
            "stream/event_batch",
            {
                "streamDid": did,
                "payloads": [drisl.encode({"content": "polled", "sentAt": 9})],
            },
            "alice-token",
        )
        out = http_call(
            http_server.host,
            http_server.port,
            "stream/poll_subscription",
            {"streamDid": did, "subscriptionId": sub_id, "timeoutSec": 10},
            "alice-token",
        )
        responses = out["Ok"]["responses"]
        assert responses, out
        texts = [
            r["content"]["value"] for resp in responses for r in resp["rows"]
        ]
        assert "polled" in texts
