"""HTTP transport for the Leaf server API (A23 network layer).

The reference speaks DRISL over socket.io with ATProto JWT auth
(leaf-server/src/http.rs:141-242, connection.rs:35-624); that full stack —
msgpack socket.io packets over engine.io/websocket — lives in
``leaf_spark.socketio``. This module is the simpler request/response
fallback: the same message shapes over plain HTTP — a real listening
socket, concurrent connections, bearer-token auth — with the documented
divergences confined here:

- **Framing**: one request per call — ``POST /<endpoint>`` with the
  DRISL-encoded args map as the body; the response body is the
  DRISL-encoded ``{"Ok": …} | {"Err": …}`` ack (identical bytes to
  ``LeafServer.handle``). socket.io's push channel maps to long-poll:
  ``POST /stream/poll_subscription`` drains a subscription's queued
  responses (the reference pushes the same payloads via emit).
- **Auth**: ``Authorization: Bearer <token>``, two modes mirroring
  http.rs:141-242. (1) Opaque tokens resolve through an injected registry
  (``tokens: token → Connection``); an ``unsafe_auth_token`` equivalent is
  a registry entry with ``trusted=True`` (http.rs:166-180). (2) ATProto
  JWTs verify for real — ES256/ES256K signature over the JOSE signing
  input, audience/lxm/exp claim checks, issuer DID required — against a
  host-supplied DID → public-key map (``did_keys``), which stands in for
  the reference's live ``plc.directory`` DID-document resolution
  (http.rs:221-233; no network in this environment). A syntactic JWT that
  fails verification is a 401, never an anonymous downgrade.
- **Upload cap**: requests larger than ``LeafServer.MODULE_MAX_BYTES`` are
  refused before the body is decoded (connection.rs:55-57) — oversized
  bodies are drained and answered with the same Err ack.
"""

from __future__ import annotations

import base64
import binascii
import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from . import drisl
from .server import Connection, LeafServer

# the only lxm the reference accepts for socket auth (http.rs:206-210)
AUTH_LXM = "town.muni.leaf.authenticate"


class AuthError(ValueError):
    """JWT present but invalid — maps to HTTP 401 (never anonymous)."""


def _b64url(seg: str) -> bytes:
    try:
        return base64.urlsafe_b64decode(seg + "=" * (-len(seg) % 4))
    except (binascii.Error, ValueError) as ex:
        raise AuthError(f"Invalid base64url in JWT: {ex}") from ex


def verify_atproto_jwt(
    token: str,
    did_keys: dict[str, bytes],
    audience: str | None = None,
    now: float | None = None,
) -> str:
    """Verify an ATProto-style JWT and return the issuer DID.

    Claim checks mirror verify_auth_token (http.rs:182-218), including
    their CONDITIONALITY: the reference guards both checks with if-let, so
    audience is checked only when the claim is present (and a configured
    audience exists), and ``lxm`` only when present (must then equal the
    authenticate lexicon method). A token minted without aud/lxm therefore
    verifies on signature+issuer alone — reference-faithful, pinned by
    tests. The issuer DID is required; ``exp`` (when present) must be in
    the future. The signature (ES256 on P-256 or
    ES256K on secp256k1, raw r||s per RFC 7518) verifies against
    ``did_keys[iss]`` — a PEM public key supplied by the host instead of a
    live DID-document fetch. Raises :class:`AuthError` on any failure.
    """
    from cryptography.exceptions import InvalidSignature
    from cryptography.hazmat.primitives import hashes, serialization
    from cryptography.hazmat.primitives.asymmetric import ec
    from cryptography.hazmat.primitives.asymmetric.utils import (
        encode_dss_signature,
    )

    parts = token.split(".")
    if len(parts) != 3:
        raise AuthError("Invalid format for JWT auth token")
    try:
        header = json.loads(_b64url(parts[0]))
        claims = json.loads(_b64url(parts[1]))
    except json.JSONDecodeError as ex:
        raise AuthError(f"Invalid JSON in JWT: {ex}") from ex

    alg = header.get("alg")
    if alg not in ("ES256", "ES256K"):
        raise AuthError(f"Unsupported JWT alg: {alg}")

    aud = claims.get("aud")
    if aud is not None and audience is not None and aud != audience:
        raise AuthError(
            f"Invalid JWT audience: expected {audience} but got {aud}"
        )
    lxm = claims.get("lxm")
    if lxm is not None and lxm != AUTH_LXM:
        raise AuthError(f"Invalid lxm in JWT: `{lxm}` expected `{AUTH_LXM}`")
    did = claims.get("iss")
    if not did:
        raise AuthError("JWT token issuer is missing")
    exp = claims.get("exp")
    if exp is not None and float(exp) <= (now if now is not None else time.time()):
        raise AuthError("JWT token is expired")

    key_pem = did_keys.get(did)
    if key_pem is None:
        raise AuthError(f"Could not find signing key for DID: {did}")
    pub = serialization.load_pem_public_key(key_pem)

    sig = _b64url(parts[2])
    if len(sig) != 64:
        raise AuthError("Invalid JWT signature length (want raw r||s)")
    der = encode_dss_signature(
        int.from_bytes(sig[:32], "big"), int.from_bytes(sig[32:], "big")
    )
    signing_input = f"{parts[0]}.{parts[1]}".encode()
    try:
        pub.verify(der, signing_input, ec.ECDSA(hashes.SHA256()))
    except InvalidSignature as ex:
        raise AuthError("JWT signature verification failed") from ex
    return did


class LeafHttpServer:
    """Threaded HTTP front end for a LeafServer. ``port=0`` auto-assigns."""

    def __init__(
        self,
        server: LeafServer,
        host: str = "127.0.0.1",
        port: int = 0,
        tokens: dict[str, Connection] | None = None,
        did_keys: dict[str, bytes] | None = None,
        audience: str | None = None,
    ):
        self.server = server
        self.tokens = tokens or {}
        self.did_keys = did_keys
        self.audience = audience
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # silence per-request stderr logging
            def log_message(self, fmt, *args):  # noqa: A002
                pass

            def do_GET(self):  # noqa: N802
                # the human console (reference explorer/ parity): one
                # static page, no build step — everything else it needs is
                # the JSON bridge below
                if self.path.split("?", 1)[0] in ("/explorer", "/explorer/"):
                    from .explorer import EXPLORER_HTML

                    body = EXPLORER_HTML.encode()
                    self.send_response(200)
                    self.send_header("Content-Type", "text/html; charset=utf-8")
                    self.send_header("Content-Length", str(len(body)))
                    self.end_headers()
                    self.wfile.write(body)
                    return
                self.send_response(404)
                self.send_header("Content-Length", "0")
                self.end_headers()

            def do_POST(self):  # noqa: N802
                endpoint = self.path.lstrip("/")
                if endpoint.startswith("api/"):
                    self._json_bridge(endpoint[4:])
                    return
                n = int(self.headers.get("Content-Length") or 0)
                if n > LeafServer.MODULE_MAX_BYTES:
                    # refuse before decoding (reference caps the raw payload)
                    self.rfile.read(n)
                    body = drisl.encode(
                        {"Err": "ValueError: Module larger than 10MB maximum size."}
                        if endpoint == "module/upload"
                        else {"Err": "ValueError: request too large"}
                    )
                    self._reply(413, body)
                    return
                args = self.rfile.read(n) if n else b""
                try:
                    conn = outer._connection(self.headers.get("Authorization"))
                except AuthError as ex:
                    self._reply(401, drisl.encode({"Err": f"AuthError: {ex}"}))
                    return
                ack = outer.server.handle(conn, endpoint, args)
                self._reply(200, ack)

            def _json_bridge(self, endpoint: str) -> None:
                """Browser-facing adapter: JSON request → dispatch() → JSON
                Result ack. Same auth, same endpoints, same Ok/Err shape as
                the DRISL transports — only the codec differs (event
                payloads arrive as JSON values and are DRISL-encoded
                server-side, exactly what the reference explorer does
                client-side with CBOR)."""
                import json

                n = int(self.headers.get("Content-Length") or 0)
                if n > LeafServer.MODULE_MAX_BYTES:
                    self.rfile.read(n)
                    self._reply_json(413, {"Err": "ValueError: request too large"})
                    return
                try:
                    args = json.loads(self.rfile.read(n) or b"{}")
                    if not isinstance(args, dict):
                        raise ValueError("request body must be a JSON object")
                    conn = outer._connection(self.headers.get("Authorization"))
                    if endpoint in (
                        "stream/event_batch",
                        "stream/state_event_batch",
                    ):
                        args["payloads"] = [
                            drisl.encode(p) for p in args.get("payloads", [])
                        ]
                    out = outer.server.dispatch(conn, endpoint, args)
                    self._reply_json(200, {"Ok": out})
                except AuthError as ex:
                    self._reply_json(401, {"Err": f"AuthError: {ex}"})
                except Exception as ex:
                    self._reply_json(200, {"Err": f"{type(ex).__name__}: {ex}"})

            def _reply_json(self, status: int, obj) -> None:
                import base64
                import json

                def default(o):
                    if isinstance(o, (bytes, bytearray)):
                        return base64.b64encode(bytes(o)).decode()
                    raise TypeError(f"not JSON-serializable: {type(o)}")

                body = json.dumps(obj, default=default).encode()
                self.send_response(status)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def _reply(self, status: int, body: bytes) -> None:
                self.send_response(status)
                self.send_header("Content-Type", "application/octet-stream")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

        self._httpd = ThreadingHTTPServer((host, port), Handler)
        self.host, self.port = self._httpd.server_address[:2]
        self._thread = threading.Thread(target=self._httpd.serve_forever, daemon=True)

    def _connection(self, auth_header: str | None) -> Connection:
        if auth_header and auth_header.lower().startswith("bearer "):
            token = auth_header[7:].strip()
            conn = self.tokens.get(token)
            if conn is not None:
                return conn
            if self.did_keys is not None and token.count(".") == 2:
                # syntactic JWT: verify for real — failure is a 401, never
                # an anonymous downgrade (verify_auth_token rejects the
                # whole connection on any JWT error, http.rs:141-242)
                did = verify_atproto_jwt(
                    token, self.did_keys, audience=self.audience
                )
                return Connection(user=did)
            # A token WAS presented and nothing recognized it (unknown
            # opaque token, or a JWT with no did_keys configured): the
            # reference rejects the connection outright, and the socket.io
            # transport raises AuthError for the identical credential —
            # downgrading to anonymous here would let a client believe it
            # authenticated while its writes silently run unauthorized.
            raise AuthError("unknown token")
        return Connection()  # anonymous: may query/subscribe, not write

    def start(self) -> "LeafHttpServer":
        self._thread.start()
        return self

    def close(self) -> None:
        self._httpd.shutdown()
        self._httpd.server_close()
        self._thread.join(timeout=2)


def http_call(
    host: str, port: int, endpoint: str, args: dict, token: str | None = None
) -> dict:
    """Minimal client helper: one DRISL request/ack round trip."""
    import http.client

    conn = http.client.HTTPConnection(host, port, timeout=30)
    headers = {"Content-Type": "application/octet-stream"}
    if token:
        headers["Authorization"] = f"Bearer {token}"
    conn.request("POST", f"/{endpoint}", drisl.encode(args), headers)
    resp = conn.getresponse()
    out = drisl.decode(resp.read())
    conn.close()
    return out
