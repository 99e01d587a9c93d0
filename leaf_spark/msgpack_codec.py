"""Minimal MessagePack codec (https://msgpack.org/ spec), pure stdlib.

The reference server's socket.io layer runs the msgpack parser
(leaf-server/src/http.rs:33 ``ParserConfig::msgpack()``), which frames every
socket.io packet as one msgpack map ``{type, nsp, data, id?}``. This module
implements exactly the value subset that parser uses: nil, bool, int,
float64, str, bin, array, map. No ext types, no timestamps.
"""

from __future__ import annotations

import struct
from typing import Any


def pack(v: Any) -> bytes:
    out = bytearray()
    _pack_into(v, out)
    return bytes(out)


def _pack_into(v: Any, out: bytearray) -> None:
    if v is None:
        out.append(0xC0)
    elif v is True:
        out.append(0xC3)
    elif v is False:
        out.append(0xC2)
    elif isinstance(v, int):
        if 0 <= v <= 0x7F:
            out.append(v)
        elif -32 <= v < 0:
            out.append(v & 0xFF)
        elif 0 <= v <= 0xFF:
            out += struct.pack(">BB", 0xCC, v)
        elif 0 <= v <= 0xFFFF:
            out += struct.pack(">BH", 0xCD, v)
        elif 0 <= v <= 0xFFFFFFFF:
            out += struct.pack(">BI", 0xCE, v)
        elif 0 <= v <= 0xFFFFFFFFFFFFFFFF:
            out += struct.pack(">BQ", 0xCF, v)
        elif -0x80 <= v < 0:
            out += struct.pack(">Bb", 0xD0, v)
        elif -0x8000 <= v < 0:
            out += struct.pack(">Bh", 0xD1, v)
        elif -0x80000000 <= v < 0:
            out += struct.pack(">Bi", 0xD2, v)
        elif -0x8000000000000000 <= v < 0:
            out += struct.pack(">Bq", 0xD3, v)
        else:
            raise OverflowError(f"int out of msgpack range: {v}")
    elif isinstance(v, float):
        out += struct.pack(">Bd", 0xCB, v)
    elif isinstance(v, str):
        b = v.encode("utf-8")
        n = len(b)
        if n <= 31:
            out.append(0xA0 | n)
        elif n <= 0xFF:
            out += struct.pack(">BB", 0xD9, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDA, n)
        else:
            out += struct.pack(">BI", 0xDB, n)
        out += b
    elif isinstance(v, (bytes, bytearray, memoryview)):
        b = bytes(v)
        n = len(b)
        if n <= 0xFF:
            out += struct.pack(">BB", 0xC4, n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xC5, n)
        else:
            out += struct.pack(">BI", 0xC6, n)
        out += b
    elif isinstance(v, (list, tuple)):
        n = len(v)
        if n <= 15:
            out.append(0x90 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDC, n)
        else:
            out += struct.pack(">BI", 0xDD, n)
        for item in v:
            _pack_into(item, out)
    elif isinstance(v, dict):
        n = len(v)
        if n <= 15:
            out.append(0x80 | n)
        elif n <= 0xFFFF:
            out += struct.pack(">BH", 0xDE, n)
        else:
            out += struct.pack(">BI", 0xDF, n)
        for k, val in v.items():
            _pack_into(k, out)
            _pack_into(val, out)
    else:
        raise TypeError(f"cannot msgpack {type(v)}")


def unpack(data: bytes):
    """Decode one msgpack value. Truncated or malformed input raises
    ValueError — the transport layer's catch clause handles ValueError/
    ConnectionError/OSError, and a raw IndexError/struct.error from a
    fuzzed frame would otherwise kill the connection thread with an
    unhandled traceback."""
    try:
        return _unpack_checked(data)
    except (IndexError, struct.error, TypeError, RecursionError) as ex:
        # TypeError: map key decodes to an unhashable value (fuzzed frame);
        # RecursionError: nesting bomb (b"\x91"*N) — both must surface as
        # ValueError like every other malformed frame, or they escape the
        # transport's catch clause and kill the connection thread
        raise ValueError(f"malformed msgpack payload: {ex}") from ex


def _unpack_checked(data: bytes) -> Any:
    v, pos = _unpack_at(data, 0)
    if pos != len(data):
        raise ValueError(f"trailing bytes after msgpack value at {pos}")
    return v


def _unpack_at(data: bytes, pos: int) -> tuple[Any, int]:
    b = data[pos]
    pos += 1
    if b <= 0x7F:
        return b, pos
    if b >= 0xE0:
        return b - 0x100, pos
    if 0x80 <= b <= 0x8F:
        return _unpack_map(data, pos, b & 0x0F)
    if 0x90 <= b <= 0x9F:
        return _unpack_array(data, pos, b & 0x0F)
    if 0xA0 <= b <= 0xBF:
        n = b & 0x1F
        return data[pos : pos + n].decode("utf-8"), pos + n
    if b == 0xC0:
        return None, pos
    if b == 0xC2:
        return False, pos
    if b == 0xC3:
        return True, pos
    if b in (0xC4, 0xC5, 0xC6):
        w = (1, 2, 4)[b - 0xC4]
        n = int.from_bytes(data[pos : pos + w], "big")
        pos += w
        return bytes(data[pos : pos + n]), pos + n
    if b == 0xCA:
        return struct.unpack_from(">f", data, pos)[0], pos + 4
    if b == 0xCB:
        return struct.unpack_from(">d", data, pos)[0], pos + 8
    if b in (0xCC, 0xCD, 0xCE, 0xCF):
        w = (1, 2, 4, 8)[b - 0xCC]
        return int.from_bytes(data[pos : pos + w], "big"), pos + w
    if b in (0xD0, 0xD1, 0xD2, 0xD3):
        w = (1, 2, 4, 8)[b - 0xD0]
        return int.from_bytes(data[pos : pos + w], "big", signed=True), pos + w
    if b in (0xD9, 0xDA, 0xDB):
        w = (1, 2, 4)[b - 0xD9]
        n = int.from_bytes(data[pos : pos + w], "big")
        pos += w
        return data[pos : pos + n].decode("utf-8"), pos + n
    if b in (0xDC, 0xDD):
        w = (2, 4)[b - 0xDC]
        n = int.from_bytes(data[pos : pos + w], "big")
        return _unpack_array(data, pos + w, n)
    if b in (0xDE, 0xDF):
        w = (2, 4)[b - 0xDE]
        n = int.from_bytes(data[pos : pos + w], "big")
        return _unpack_map(data, pos + w, n)
    raise ValueError(f"unsupported msgpack byte 0x{b:02x}")


def _unpack_array(data: bytes, pos: int, n: int) -> tuple[list, int]:
    items = []
    for _ in range(n):
        v, pos = _unpack_at(data, pos)
        items.append(v)
    return items, pos


def _unpack_map(data: bytes, pos: int, n: int) -> tuple[dict, int]:
    m = {}
    for _ in range(n):
        k, pos = _unpack_at(data, pos)
        v, pos = _unpack_at(data, pos)
        m[k] = v
    return m, pos
