"""Compression codecs for the binary USD crate format (modern sections).

Three layers, matching what pxr-exported .usdc files (version >= 0.4.0)
use — the reference loads these through the USD SDK (reference:
BasicRenderer/src/Import/USDLoader.cpp); this image has no SDK, so the
codecs are self-contained:

1. **LZ4 block codec** — native C (native/lz4codec.cpp, written fresh
   from the published block format) with a pure-Python fallback.
2. **TfFastCompression framing** — a leading chunk-count byte (0 = the
   whole payload is one LZ4 block) and, for multi-chunk payloads, an
   int32 compressed-size prefix per chunk.
3. **Usd_IntegerCompression** — delta coding with a most-common-delta
   dictionary value: `commonValue` (int32/int64), then 2 bits per
   integer (0 = common delta, 1/2/3 = small/medium/large explicit
   delta), then the packed little-endian deltas; the encoded buffer is
   itself LZ4-framed. Fully vectorized with numpy here (the sequential
   prefix sum is a cumsum).
"""

from __future__ import annotations

import ctypes
import os
import struct
import subprocess
from typing import Optional

import numpy as np

_NATIVE: Optional[object] = None


def _load_native():
    global _NATIVE
    if _NATIVE is not None:
        return _NATIVE
    root = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    so = os.path.join(root, "native", "liblz4codec.so")
    src = os.path.join(root, "native", "lz4codec.cpp")
    stale = (os.path.exists(so) and os.path.exists(src)
             and os.path.getmtime(src) > os.path.getmtime(so))
    if (not os.path.exists(so) or stale) and os.path.exists(src):
        try:
            subprocess.run(["g++", "-O2", "-shared", "-fPIC", "-o", so, src],
                           check=True, capture_output=True)
        except Exception:
            pass
    if os.path.exists(so):
        lib = ctypes.CDLL(so)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        lib.lz4_decompress.restype = ctypes.c_int
        lib.lz4_decompress.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int]
        lib.lz4_compress.restype = ctypes.c_int
        lib.lz4_compress.argtypes = [u8p, ctypes.c_int, u8p, ctypes.c_int]
        lib.lz4_compress_bound.restype = ctypes.c_int
        lib.lz4_compress_bound.argtypes = [ctypes.c_int]
        _NATIVE = lib
    else:
        _NATIVE = False
    return _NATIVE


class Lz4Error(ValueError):
    pass


# ---------------------------------------------------------------------------
# LZ4 block codec
# ---------------------------------------------------------------------------

def lz4_decompress_block(src: bytes, out_size: int) -> bytes:
    """Decode one LZ4 block of known decompressed size."""
    lib = _load_native()
    if lib:
        sbuf = np.frombuffer(src, np.uint8)
        out = np.empty(out_size, np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        n = lib.lz4_decompress(sbuf.ctypes.data_as(u8p), len(src),
                               out.ctypes.data_as(u8p), out_size)
        if n < 0:
            raise Lz4Error("malformed lz4 block")
        return out[:n].tobytes()
    return _py_lz4_decompress(src, out_size)


def lz4_compress_block(src: bytes) -> bytes:
    lib = _load_native()
    if lib:
        sbuf = np.frombuffer(src, np.uint8) if src else \
            np.empty(0, np.uint8)
        cap = lib.lz4_compress_bound(len(src))
        out = np.empty(cap, np.uint8)
        u8p = ctypes.POINTER(ctypes.c_uint8)
        n = lib.lz4_compress(sbuf.ctypes.data_as(u8p), len(src),
                             out.ctypes.data_as(u8p), cap)
        if n < 0:
            raise Lz4Error("lz4 compress bound error")
        return out[:n].tobytes()
    return _py_lz4_compress(src)


def _py_lz4_decompress(src: bytes, out_size: int) -> bytes:
    out = bytearray()
    i, n = 0, len(src)
    if n == 0:
        return b""
    while True:
        if i >= n:
            raise Lz4Error("truncated lz4 block")
        token = src[i]
        i += 1
        lit = token >> 4
        if lit == 15:
            while True:
                b = src[i]
                i += 1
                lit += b
                if b != 255:
                    break
        out += src[i:i + lit]
        i += lit
        if i == n:
            break                        # final literals-only sequence
        if i > n or len(out) > out_size:
            raise Lz4Error("malformed lz4 block")
        offset = src[i] | (src[i + 1] << 8)
        i += 2
        mlen = token & 15
        if mlen == 15:
            while True:
                b = src[i]
                i += 1
                mlen += b
                if b != 255:
                    break
        mlen += 4
        if offset == 0 or offset > len(out):
            raise Lz4Error("bad lz4 match offset")
        start = len(out) - offset
        if offset >= mlen:
            out += out[start:start + mlen]
        else:
            # Overlapping match: repeat the trailing window.
            chunk = out[start:]
            reps = -(-mlen // offset)
            out += (chunk * reps)[:mlen]
    if len(out) > out_size:
        raise Lz4Error("lz4 output overflow")
    return bytes(out)


def _py_lz4_compress(src: bytes) -> bytes:
    """Valid LZ4 with no matches: one literals-only sequence (fallback
    when the native codec is unavailable — correctness over ratio)."""
    out = bytearray()
    lit = len(src)
    if lit >= 15:
        out.append(15 << 4)
        rem = lit - 15
        while rem >= 255:
            out.append(255)
            rem -= 255
        out.append(rem)
    else:
        out.append(lit << 4)
    out += src
    return bytes(out)


# ---------------------------------------------------------------------------
# TfFastCompression framing (chunked LZ4)
# ---------------------------------------------------------------------------

# Matches the SDK's per-chunk input cap (LZ4 block max ~1.9 GB); files this
# large never occur here, so compress always emits the single-chunk form.
_MAX_CHUNK = 0x7E000000


def tf_compress(data: bytes) -> bytes:
    if len(data) > _MAX_CHUNK:
        raise Lz4Error("payload exceeds single-chunk framing")
    return b"\x00" + lz4_compress_block(data)


def tf_decompress(data: bytes, out_size: int) -> bytes:
    if not data:
        return b""
    n_chunks = data[0]
    if n_chunks == 0:
        return lz4_decompress_block(data[1:], out_size)
    out = bytearray()
    off = 1
    for _ in range(n_chunks):
        (csz,) = struct.unpack_from("<i", data, off)
        off += 4
        out += lz4_decompress_block(data[off:off + csz], out_size - len(out))
        off += csz
    return bytes(out)


# ---------------------------------------------------------------------------
# Usd_IntegerCompression (delta + common-value dictionary + 2-bit codes)
# ---------------------------------------------------------------------------

def _classes(wide: bool):
    if wide:
        return np.int64, [(np.int16, 2), (np.int32, 4), (np.int64, 8)]
    return np.int32, [(np.int8, 1), (np.int16, 2), (np.int32, 4)]


def encoded_buffer_size(n: int, wide: bool = False) -> int:
    it = 8 if wide else 4
    return it + (2 * n + 7) // 8 + n * it


def encode_ints(values: np.ndarray, wide: bool = False) -> bytes:
    """The raw (pre-LZ4) integer encoding."""
    base_t, classes = _classes(wide)
    v = np.asarray(values).astype(np.int64)
    n = len(v)
    if n == 0:
        return np.zeros(1, base_t).tobytes()
    # Deltas in wrapping base-type arithmetic.
    deltas = np.diff(v, prepend=0)
    deltas = deltas.astype(np.uint64 if wide else np.uint32).astype(base_t)
    uniq, cnt = np.unique(deltas, return_counts=True)
    common = uniq[np.argmax(cnt)]
    small_t, med_t = classes[0][0], classes[1][0]
    codes = np.full(n, 3, np.uint8)
    info_s, info_m = np.iinfo(small_t), np.iinfo(med_t)
    codes[(deltas >= info_m.min) & (deltas <= info_m.max)] = 2
    codes[(deltas >= info_s.min) & (deltas <= info_s.max)] = 1
    codes[deltas == common] = 0
    ncb = (2 * n + 7) // 8
    code_bytes = np.zeros(ncb, np.uint8)
    k = np.arange(n)
    np.bitwise_or.at(code_bytes, k >> 2,
                     codes.astype(np.uint8) << ((k & 3) * 2).astype(np.uint8))
    parts = [np.asarray([common], base_t).tobytes(), code_bytes.tobytes()]
    # Payload bytes in integer order: build per-class, then interleave by
    # byte offsets.
    sizes = np.choose(codes, [0, classes[0][1], classes[1][1],
                              classes[2][1]])
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    payload = np.zeros(int(sizes.sum()), np.uint8)
    for ci, (dt, sz) in ((1, classes[0]), (2, classes[1]), (3, classes[2])):
        m = codes == ci
        if m.any():
            raw = deltas[m].astype(dt).view(np.uint8).reshape(-1, sz)
            payload[offs[m][:, None] + np.arange(sz)] = raw
    parts.append(payload.tobytes())
    return b"".join(parts)


def decode_ints(buf: bytes, n: int, wide: bool = False) -> np.ndarray:
    base_t, classes = _classes(wide)
    it = np.dtype(base_t).itemsize
    if n == 0:
        return np.zeros(0, base_t)
    common = np.frombuffer(buf, base_t, 1)[0]
    ncb = (2 * n + 7) // 8
    code_bytes = np.frombuffer(buf, np.uint8, ncb, offset=it)
    k = np.arange(n)
    codes = (code_bytes[k >> 2] >> ((k & 3) * 2).astype(np.uint8)) & 3
    sizes = np.choose(codes, [0, classes[0][1], classes[1][1],
                              classes[2][1]])
    offs = np.concatenate([[0], np.cumsum(sizes)[:-1]])
    payload = np.frombuffer(buf, np.uint8, offset=it + ncb)
    deltas = np.where(codes == 0, common, 0).astype(base_t)
    for ci, (dt, sz) in ((1, classes[0]), (2, classes[1]), (3, classes[2])):
        m = codes == ci
        if m.any():
            raw = payload[offs[m][:, None] + np.arange(sz)]
            deltas[m] = np.ascontiguousarray(raw).view(dt).reshape(-1)
    # int64 cumsum then cast = the wrapping prefix sum of the base type.
    return np.cumsum(deltas.astype(np.int64)).astype(
        np.uint64 if wide else np.uint32).astype(base_t)


def compress_ints(values: np.ndarray, wide: bool = False) -> bytes:
    """Usd_IntegerCompression::CompressToBuffer equivalent."""
    return tf_compress(encode_ints(values, wide))


def decompress_ints(buf: bytes, n: int, wide: bool = False) -> np.ndarray:
    """Usd_IntegerCompression::DecompressFromBuffer equivalent."""
    enc = tf_decompress(buf, encoded_buffer_size(n, wide))
    return decode_ints(enc, n, wide)
