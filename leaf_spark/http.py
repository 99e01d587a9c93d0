"""HTTP transport for the Leaf server API (A23 network layer).

The reference speaks DRISL over socket.io with ATProto JWT auth
(leaf-server/src/http.rs:141-242, connection.rs:35-624). Neither a
socket.io stack nor ATProto network access exists in this environment, so
this transport keeps the same message shape over plain HTTP — a real
listening socket, concurrent connections, bearer-token auth — and the
documented divergences are confined here:

- **Framing**: one request per call — ``POST /<endpoint>`` with the
  DRISL-encoded args map as the body; the response body is the
  DRISL-encoded ``{"Ok": …} | {"Err": …}`` ack (identical bytes to
  ``LeafServer.handle``). socket.io's push channel maps to long-poll:
  ``POST /stream/poll_subscription`` drains a subscription's queued
  responses (the reference pushes the same payloads via emit).
- **Auth**: ``Authorization: Bearer <token>`` resolved through a token
  registry injected by the host (``tokens: token → Connection``). The
  reference validates ATProto JWTs to a DID; a deployment plugs that
  resolver in here. An ``unsafe_auth_token`` equivalent is a registry entry
  with ``trusted=True`` (http.rs:190-204).
- **Upload cap**: requests larger than ``LeafServer.MODULE_MAX_BYTES`` are
  refused before the body is decoded (connection.rs:55-57) — oversized
  bodies are drained and answered with the same Err ack.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from . import drisl
from .server import Connection, LeafServer


class LeafHttpServer:
    """Threaded HTTP front end for a LeafServer. ``port=0`` auto-assigns."""

    def __init__(
        self,
        server: LeafServer,
        host: str = "127.0.0.1",
        port: int = 0,
        tokens: dict[str, Connection] | None = None,
    ):
        self.server = server
        self.tokens = tokens or {}
        outer = self

        class Handler(BaseHTTPRequestHandler):
            # silence per-request stderr logging
            def log_message(self, fmt, *args):  # noqa: A002
                pass

            def do_POST(self):  # noqa: N802
                endpoint = self.path.lstrip("/")
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
                conn = outer._connection(self.headers.get("Authorization"))
                ack = outer.server.handle(conn, endpoint, args)
                self._reply(200, ack)

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
