"""Minimal zstd frame codec over the system ``libzstd`` (via ctypes), with a
pyarrow fallback.

The reference's backup archives are plain zstd frames around DRISL documents
(``zstd::encode_all``, leaf-server/src/storage.rs:667,759) — *frames*, not
parquet column chunks — so restoring a reference-written archive needs a
frame decoder that copes with a missing Frame_Content_Size field (Rust's
streaming encoder may omit it).  pyarrow's ``Codec('zstd')`` can only
decompress when the exact decompressed size is known up front, so:

- ``compress``: libzstd simple API (``ZSTD_compress`` — always embeds the
  content size), falling back to pyarrow's codec.
- ``decompress``: read the frame content size via
  ``ZSTD_getFrameContentSize``; when the frame carries it, one-shot
  ``ZSTD_decompress``; when it doesn't, the streaming
  ``ZSTD_decompressStream`` loop.  pyarrow fallback only works for
  size-carrying frames.

Everything here is the public zstd ABI (RFC 8878 / zstd.h); no third-party
Python packages.
"""

from __future__ import annotations

import ctypes
import ctypes.util

_CONTENTSIZE_UNKNOWN = 2**64 - 1  # ZSTD_CONTENTSIZE_UNKNOWN == (0ULL - 1)
_CONTENTSIZE_ERROR = 2**64 - 2


def _load() -> ctypes.CDLL | None:
    name = ctypes.util.find_library("zstd")
    if not name:
        return None
    try:
        lib = ctypes.CDLL(name)
    except OSError:
        return None
    lib.ZSTD_compressBound.restype = ctypes.c_size_t
    lib.ZSTD_compressBound.argtypes = [ctypes.c_size_t]
    lib.ZSTD_compress.restype = ctypes.c_size_t
    lib.ZSTD_compress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t,
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_int,
    ]
    lib.ZSTD_decompress.restype = ctypes.c_size_t
    lib.ZSTD_decompress.argtypes = [
        ctypes.c_void_p, ctypes.c_size_t, ctypes.c_void_p, ctypes.c_size_t,
    ]
    lib.ZSTD_isError.restype = ctypes.c_uint
    lib.ZSTD_isError.argtypes = [ctypes.c_size_t]
    lib.ZSTD_getFrameContentSize.restype = ctypes.c_ulonglong
    lib.ZSTD_getFrameContentSize.argtypes = [ctypes.c_void_p, ctypes.c_size_t]
    return lib


_LIB = _load()


def compress(data: bytes, level: int = 0) -> bytes:
    """One zstd frame around ``data`` (content size embedded), matching the
    reference's ``zstd::encode_all(data, 0)``."""
    if _LIB is not None:
        bound = _LIB.ZSTD_compressBound(len(data))
        dst = ctypes.create_string_buffer(bound)
        n = _LIB.ZSTD_compress(dst, bound, data, len(data), level)
        if _LIB.ZSTD_isError(n):
            raise OSError("ZSTD_compress failed")
        return dst.raw[:n]
    import pyarrow as pa

    return pa.Codec("zstd").compress(data, asbytes=True)


def decompress(data: bytes) -> bytes:
    """Decode one zstd frame, whether or not it embeds its content size."""
    if _LIB is None:
        return _decompress_pyarrow(data)
    size = _LIB.ZSTD_getFrameContentSize(data, len(data))
    if size == _CONTENTSIZE_ERROR:
        raise ValueError("not a zstd frame")
    if size != _CONTENTSIZE_UNKNOWN:
        dst = ctypes.create_string_buffer(max(int(size), 1))
        n = _LIB.ZSTD_decompress(dst, int(size), data, len(data))
        if _LIB.ZSTD_isError(n):
            raise OSError("ZSTD_decompress failed")
        return dst.raw[:n]
    return _decompress_streaming(data)


def _decompress_streaming(data: bytes) -> bytes:
    """ZSTD_decompressStream loop for frames without a content-size field."""
    lib = _LIB
    assert lib is not None
    lib.ZSTD_createDStream.restype = ctypes.c_void_p
    lib.ZSTD_freeDStream.argtypes = [ctypes.c_void_p]
    lib.ZSTD_DStreamOutSize.restype = ctypes.c_size_t

    class _Buf(ctypes.Structure):
        _fields_ = [
            ("dst", ctypes.c_void_p),
            ("size", ctypes.c_size_t),
            ("pos", ctypes.c_size_t),
        ]

    lib.ZSTD_decompressStream.restype = ctypes.c_size_t
    lib.ZSTD_decompressStream.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(_Buf), ctypes.POINTER(_Buf)
    ]

    ds = lib.ZSTD_createDStream()
    try:
        out_cap = lib.ZSTD_DStreamOutSize()
        out_raw = ctypes.create_string_buffer(out_cap)
        src = ctypes.create_string_buffer(data, len(data))
        inp = _Buf(ctypes.cast(src, ctypes.c_void_p), len(data), 0)
        chunks: list[bytes] = []
        while inp.pos < inp.size:
            outp = _Buf(ctypes.cast(out_raw, ctypes.c_void_p), out_cap, 0)
            ret = lib.ZSTD_decompressStream(
                ds, ctypes.byref(outp), ctypes.byref(inp)
            )
            if lib.ZSTD_isError(ret):
                raise OSError("ZSTD_decompressStream failed")
            chunks.append(out_raw.raw[: outp.pos])
            if ret == 0 and inp.pos >= inp.size:
                break
        return b"".join(chunks)
    finally:
        lib.ZSTD_freeDStream(ds)


def _decompress_pyarrow(data: bytes) -> bytes:
    import pyarrow as pa

    # pyarrow needs the exact size → only frames that embed it are readable.
    fhd = data[4]
    fcs_flag, single_seg = fhd >> 6, (fhd >> 5) & 1
    pos = 5 + (0 if single_seg else 1) + (0, 1, 2, 4)[fhd & 3]
    if fcs_flag == 0:
        if not single_seg:
            raise ValueError("zstd frame lacks a content size (need libzstd)")
        size = data[pos]
    elif fcs_flag == 1:
        size = int.from_bytes(data[pos : pos + 2], "little") + 256
    elif fcs_flag == 2:
        size = int.from_bytes(data[pos : pos + 4], "little")
    else:
        size = int.from_bytes(data[pos : pos + 8], "little")
    return pa.Codec("zstd").decompress(data, decompressed_size=size, asbytes=True)
