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


def _es256_keypair():
    from cryptography.hazmat.primitives import serialization
    from cryptography.hazmat.primitives.asymmetric import ec

    key = ec.generate_private_key(ec.SECP256R1())
    pem = key.public_key().public_bytes(
        serialization.Encoding.PEM, serialization.PublicFormat.SubjectPublicKeyInfo
    )
    return key, pem


def _mint_jwt(private_key, claims: dict, alg: str = "ES256") -> str:
    import base64
    import json

    from cryptography.hazmat.primitives import hashes
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.asymmetric.utils import (
        decode_dss_signature,
    )

    def b64(b: bytes) -> str:
        return base64.urlsafe_b64encode(b).rstrip(b"=").decode()

    header = b64(json.dumps({"alg": alg, "typ": "JWT"}).encode())
    payload = b64(json.dumps(claims).encode())
    der = private_key.sign(f"{header}.{payload}".encode(), ec.ECDSA(hashes.SHA256()))
    r, s = decode_dss_signature(der)
    sig = b64(r.to_bytes(32, "big") + s.to_bytes(32, "big"))
    return f"{header}.{payload}.{sig}"


class TestJwtAuth:
    """A23 auth parity: ES256 ATProto-style JWTs verified against a
    host-supplied DID → key map (stand-in for plc.directory resolution)."""

    SERVER_DID = "did:plc:leafserver"

    @pytest.fixture()
    def jwt_env(self, spark, tmp_root):
        key, pem = _es256_keypair()
        catalog = StreamCatalog(spark, tmp_root)
        srv = LeafHttpServer(
            LeafServer(catalog),
            did_keys={"did:plc:alice": pem},
            audience=self.SERVER_DID,
        ).start()
        yield srv, key
        srv.close()

    def _claims(self, **over):
        import time

        base = {
            "iss": "did:plc:alice",
            "aud": self.SERVER_DID,
            "lxm": "town.muni.leaf.authenticate",
            "exp": time.time() + 600,
        }
        base.update(over)
        return base

    def test_signed_jwt_authenticates_and_writes(self, jwt_env):
        srv, key = jwt_env
        token = _mint_jwt(key, self._claims())
        up = http_call(
            srv.host, srv.port, "module/upload", {"module": CHAT.to_codec()}, token
        )
        cid = up["Ok"]["cid"]
        out = http_call(
            srv.host,
            srv.port,
            "stream/create",
            {"streamDid": "did:plc:jwtchat", "moduleCid": cid},
            token,
        )
        assert "Ok" in out, out
        out = http_call(
            srv.host,
            srv.port,
            "stream/event_batch",
            {
                "streamDid": "did:plc:jwtchat",
                "payloads": [drisl.encode({"content": "signed", "sentAt": 1})],
            },
            token,
        )
        assert out == {"Ok": {"latestEvent": 1}}
        # the event is attributed to the JWT issuer DID, not a header field
        q = http_call(
            srv.host,
            srv.port,
            "stream/query",
            {"streamDid": "did:plc:jwtchat", "query": {"name": "messages"}},
        )
        assert q["Ok"]["rows"][0]["sender"]["value"] == "did:plc:alice"

    def _status(self, srv, token):
        import http.client

        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
        conn.request(
            "POST", "/admin/list_streams", b"", {"Authorization": f"Bearer {token}"}
        )
        resp = conn.getresponse()
        out = drisl.decode(resp.read())
        conn.close()
        return resp.status, out

    def test_tampered_jwt_rejected_with_401(self, jwt_env):
        srv, key = jwt_env
        token = _mint_jwt(key, self._claims())
        head, payload, sig = token.split(".")
        import base64
        import json

        forged = json.loads(base64.urlsafe_b64decode(payload + "=="))
        forged["iss"] = "did:plc:alice"
        forged["scope"] = "everything"
        tampered = (
            head
            + "."
            + base64.urlsafe_b64encode(json.dumps(forged).encode())
            .rstrip(b"=")
            .decode()
            + "."
            + sig
        )
        status, out = self._status(srv, tampered)
        assert status == 401
        assert "signature" in out["Err"].lower()

    def test_wrong_signer_rejected(self, jwt_env):
        srv, _key = jwt_env
        other_key, _pem = _es256_keypair()  # key NOT in did_keys for alice
        status, out = self._status(srv, _mint_jwt(other_key, self._claims()))
        assert status == 401

    def test_expired_jwt_rejected(self, jwt_env):
        srv, key = jwt_env
        status, out = self._status(srv, _mint_jwt(key, self._claims(exp=1.0)))
        assert status == 401 and "expired" in out["Err"].lower()

    def test_wrong_audience_rejected(self, jwt_env):
        srv, key = jwt_env
        status, out = self._status(
            srv, _mint_jwt(key, self._claims(aud="did:plc:otherserver"))
        )
        assert status == 401 and "audience" in out["Err"].lower()

    def test_wrong_lxm_rejected(self, jwt_env):
        srv, key = jwt_env
        status, out = self._status(
            srv, _mint_jwt(key, self._claims(lxm="com.example.other"))
        )
        assert status == 401 and "lxm" in out["Err"].lower()

    def test_missing_aud_and_lxm_accepted(self, jwt_env):
        # the reference guards aud/lxm checks with if-let — a token minted
        # without either claim verifies on signature+issuer alone. Pinned
        # so a future "tighten the checks" change is a conscious divergence
        srv, key = jwt_env
        claims = self._claims()
        del claims["aud"], claims["lxm"]
        token = _mint_jwt(key, claims)
        out = http_call(
            srv.host, srv.port, "stream/info", {"streamDid": "did:plc:none"}, token
        )
        assert "AuthError" not in str(out.get("Err", ""))

    def test_unknown_issuer_rejected(self, jwt_env):
        srv, key = jwt_env
        status, out = self._status(
            srv, _mint_jwt(key, self._claims(iss="did:plc:mallory"))
        )
        assert status == 401 and "signing key" in out["Err"].lower()


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

    def test_unknown_token_is_401_not_anonymous(self, http_server):
        # reference behavior (http.rs verify_auth_token): a presented
        # credential that nothing recognizes rejects the connection — it
        # must NOT silently downgrade to anonymous, which would let a
        # client believe it authenticated
        out = http_call(
            http_server.host,
            http_server.port,
            "admin/list_streams",
            {},
            "wrong-token",
        )
        assert "Err" in out and "AuthError" in out["Err"]

    def test_jwt_without_did_keys_is_401(self, http_server):
        # http_server is built with opaque tokens only (did_keys=None): a
        # syntactic JWT cannot be verified, so it must 401 — not downgrade
        out = http_call(
            http_server.host,
            http_server.port,
            "stream/info",
            {"streamDid": "did:plc:nobody"},
            "eyJh.eyJp.c2ln",
        )
        assert "Err" in out and "AuthError" in out["Err"]

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


class TestExplorer:
    """The human console (reference explorer/ parity): a static page at
    GET /explorer plus a JSON bridge at POST /api/* sharing auth and
    endpoint surface with the DRISL transports."""

    def _json_call(self, srv, endpoint, args, token=None):
        import http.client
        import json

        conn = http.client.HTTPConnection(srv.host, srv.port, timeout=30)
        headers = {"Content-Type": "application/json"}
        if token:
            headers["Authorization"] = f"Bearer {token}"
        conn.request("POST", f"/api/{endpoint}", json.dumps(args), headers)
        resp = conn.getresponse()
        body = json.loads(resp.read())
        conn.close()
        return resp.status, body

    def test_explorer_page_served(self, http_server):
        import http.client

        conn = http.client.HTTPConnection(
            http_server.host, http_server.port, timeout=30
        )
        conn.request("GET", "/explorer")
        resp = conn.getresponse()
        page = resp.read().decode()
        assert resp.status == 200
        assert "text/html" in resp.getheader("Content-Type")
        assert "leaf_spark explorer" in page
        assert "/api/" in page  # wired to the JSON bridge
        conn.request("GET", "/nonexistent")
        assert conn.getresponse().status == 404
        conn.close()

    def test_json_bridge_full_console_flow(self, http_server):
        """Everything the console does, over JSON: upload module → create
        stream → send events → query rows → subscribe → poll → unsub."""
        st, up = self._json_call(
            http_server, "module/upload", {"module": CHAT.to_codec()},
            "alice-token",
        )
        assert st == 200 and "Ok" in up, up
        cid = up["Ok"]["cid"]

        st, out = self._json_call(
            http_server, "stream/create",
            {"streamDid": "did:plc:jsonchat", "moduleCid": cid},
            "alice-token",
        )
        assert "Ok" in out, out

        st, out = self._json_call(
            http_server, "stream/event_batch",
            {
                "streamDid": "did:plc:jsonchat",
                "payloads": [
                    {"content": "hello json", "sentAt": 1},
                    {"content": "second", "sentAt": 2},
                ],
            },
            "alice-token",
        )
        assert out["Ok"]["latestEvent"] == 2, out

        st, out = self._json_call(
            http_server, "stream/query",
            {
                "streamDid": "did:plc:jsonchat",
                "query": {"name": "messages", "start": 1, "limit": 10},
            },
        )
        rows = out["Ok"]["rows"]
        assert len(rows) == 2
        texts = {
            (v["value"] if isinstance(v, dict) and "$type" in v else v)
            for r in rows
            for k, v in r.items()
            if k == "content"
        }
        assert texts == {"hello json", "second"}

        st, out = self._json_call(
            http_server, "stream/subscribe_events",
            {
                "streamDid": "did:plc:jsonchat",
                "query": {"name": "messages", "start": 1, "limit": 10},
            },
        )
        sub = out["Ok"]["subscriptionId"]
        st, out = self._json_call(
            http_server, "stream/poll_subscription",
            {
                "streamDid": "did:plc:jsonchat",
                "subscriptionId": sub,
                "timeoutSec": 10,
            },
        )
        assert out["Ok"]["responses"], out
        st, out = self._json_call(
            http_server, "stream/unsubscribe",
            {"streamDid": "did:plc:jsonchat", "subscriptionId": sub},
        )
        assert "Ok" in out

    def test_json_bridge_auth_parity(self, http_server):
        # anonymous writes rejected exactly like the DRISL transports
        st, out = self._json_call(
            http_server, "module/upload", {"module": CHAT.to_codec()}
        )
        assert "Err" in out and "authentication required" in out["Err"]
        # unknown token → 401, never anonymous downgrade
        st, out = self._json_call(
            http_server, "module/upload", {"module": CHAT.to_codec()},
            "bogus-token",
        )
        assert st == 401 and "AuthError" in out["Err"]
