"""Minimal RFC 6455 WebSocket framing over plain sockets (stdlib only).

Supports what the socket.io transport needs: the HTTP Upgrade handshake
(server accept + client offer), unfragmented text/binary data frames,
ping/pong/close control frames, and client-side masking (mandatory per
RFC 6455 §5.3). No permessage-deflate, no fragmentation reassembly beyond
contiguous continuation frames.

Handshake reads are buffered: bytes received past the end of the HTTP
headers (a peer may pipeline its first frame right behind the 101/GET) are
retained in the returned :class:`FrameSocket` — dropping them was a
read-hang bug in the first cut of this module.
"""

from __future__ import annotations

import base64
import hashlib
import os
import socket
import struct

_GUID = "258EAFA5-E914-47DA-95CA-C5AB0DC85B11"

OP_CONT, OP_TEXT, OP_BINARY = 0x0, 0x1, 0x2
OP_CLOSE, OP_PING, OP_PONG = 0x8, 0x9, 0xA


def accept_key(client_key: str) -> str:
    digest = hashlib.sha1((client_key + _GUID).encode()).digest()
    return base64.b64encode(digest).decode()


def _xor_mask(data: bytes, key: bytes) -> bytes:
    """RFC 6455 §5.3 payload masking at C speed: one big-int XOR instead of
    a per-byte Python loop (the loop capped transport throughput at a few
    hundred KB/s and serialized every large frame on the GIL — it was the
    top slice of a 2000-event batch round trip over socket.io)."""
    n = len(data)
    if not n:
        return data
    full = key * (n // 4) + key[: n % 4]
    return (
        int.from_bytes(data, "little") ^ int.from_bytes(full, "little")
    ).to_bytes(n, "little")


class FrameSocket:
    """A socket plus the unconsumed tail of the handshake read."""

    def __init__(self, sock: socket.socket, leftover: bytes = b""):
        self.sock = sock
        self._buf = bytearray(leftover)

    def _recv_exact(self, n: int) -> bytes:
        while len(self._buf) < n:
            chunk = self.sock.recv(max(n - len(self._buf), 4096))
            if not chunk:
                raise ConnectionError("websocket peer closed")
            self._buf += chunk
        out = bytes(self._buf[:n])
        del self._buf[:n]
        return out

    def read_frame(self) -> tuple[int, bytes]:
        """→ (opcode, payload). Reassembles contiguous continuation frames."""
        opcode = None
        payload = bytearray()
        while True:
            h0, h1 = self._recv_exact(2)
            fin = h0 & 0x80
            op = h0 & 0x0F
            masked = h1 & 0x80
            ln = h1 & 0x7F
            if ln == 126:
                ln = struct.unpack(">H", self._recv_exact(2))[0]
            elif ln == 127:
                ln = struct.unpack(">Q", self._recv_exact(8))[0]
            mask = self._recv_exact(4) if masked else None
            data = self._recv_exact(ln) if ln else b""
            if mask:
                data = _xor_mask(data, mask)
            if op != OP_CONT:
                opcode = op
            payload += data
            if fin:
                return opcode, bytes(payload)

    def write_frame(self, opcode: int, payload: bytes = b"", mask: bool = False) -> None:
        header = bytearray([0x80 | opcode])
        n = len(payload)
        mask_bit = 0x80 if mask else 0
        if n < 126:
            header.append(mask_bit | n)
        elif n <= 0xFFFF:
            header.append(mask_bit | 126)
            header += struct.pack(">H", n)
        else:
            header.append(mask_bit | 127)
            header += struct.pack(">Q", n)
        if mask:
            key = os.urandom(4)
            header += key
            payload = _xor_mask(payload, key)
        self.sock.sendall(bytes(header) + payload)

    def close(self) -> None:
        try:
            self.sock.close()
        except OSError:
            pass


def _read_http_head(sock: socket.socket) -> tuple[str, bytes]:
    """Read up to and including the blank line; return (head_text, leftover)."""
    data = bytearray()
    while b"\r\n\r\n" not in data:
        chunk = sock.recv(4096)
        if not chunk:
            raise ConnectionError("peer closed during handshake")
        data += chunk
    head, leftover = bytes(data).split(b"\r\n\r\n", 1)
    return head.decode("latin-1"), leftover


def parse_http_head(head: str) -> tuple[str, str, dict[str, str]]:
    """HTTP request head → (method, target, lowercase headers)."""
    lines = head.split("\r\n")
    first = lines[0].split(" ")
    method, target = first[0], first[1]
    headers = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    return method, target, headers


def accept_upgrade(
    sock: socket.socket, headers: dict[str, str], leftover: bytes
) -> "FrameSocket":
    """Complete a server-side upgrade whose HTTP head was already read."""
    key = headers.get("sec-websocket-key")
    if not key or "upgrade" not in headers.get("connection", "").lower():
        sock.sendall(b"HTTP/1.1 400 Bad Request\r\nContent-Length: 0\r\n\r\n")
        raise ConnectionError("not a websocket upgrade request")
    resp = (
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
    )
    sock.sendall(resp.encode("latin-1"))
    return FrameSocket(sock, leftover)


def server_handshake(sock: socket.socket) -> tuple[str, dict[str, str], "FrameSocket"]:
    """Read the client's HTTP Upgrade request, send 101. Returns
    (request_target, headers, frame_socket)."""
    head, leftover = _read_http_head(sock)
    lines = head.split("\r\n")
    target = lines[0].split(" ")[1]
    headers = {}
    for line in lines[1:]:
        if ":" in line:
            k, v = line.split(":", 1)
            headers[k.strip().lower()] = v.strip()
    key = headers.get("sec-websocket-key")
    if not key or "upgrade" not in headers.get("connection", "").lower():
        sock.sendall(b"HTTP/1.1 400 Bad Request\r\nContent-Length: 0\r\n\r\n")
        raise ConnectionError("not a websocket upgrade request")
    resp = (
        "HTTP/1.1 101 Switching Protocols\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Accept: {accept_key(key)}\r\n\r\n"
    )
    sock.sendall(resp.encode("latin-1"))
    return target, headers, FrameSocket(sock, leftover)


def client_handshake(sock: socket.socket, host: str, target: str) -> "FrameSocket":
    """Send the Upgrade request and validate the 101 response."""
    key = base64.b64encode(os.urandom(16)).decode()
    req = (
        f"GET {target} HTTP/1.1\r\n"
        f"Host: {host}\r\n"
        "Upgrade: websocket\r\n"
        "Connection: Upgrade\r\n"
        f"Sec-WebSocket-Key: {key}\r\n"
        "Sec-WebSocket-Version: 13\r\n\r\n"
    )
    sock.sendall(req.encode("latin-1"))
    head, leftover = _read_http_head(sock)
    status = head.split("\r\n")[0]
    if " 101 " not in status:
        raise ConnectionError(f"websocket upgrade refused: {status}")
    for line in head.split("\r\n")[1:]:
        if line.lower().startswith("sec-websocket-accept:"):
            got = line.split(":", 1)[1].strip()
            if got != accept_key(key):
                raise ConnectionError("bad Sec-WebSocket-Accept")
            return FrameSocket(sock, leftover)
    raise ConnectionError("missing Sec-WebSocket-Accept")
