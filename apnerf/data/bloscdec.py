"""Dependency-free blosc1 frame codec (decoder + fixture-grade encoder).

WIM-preprocessed ZJU caches store each frame's image/mask as a
``blosc.pack_array()`` payload (reference lib/load_zju.py:108-110), i.e. a
pickled ndarray compressed into a c-blosc 1.x frame. The ``blosc`` package is
not available in this image, so this module implements the frame format
directly:

  16-byte header: version, versionlz, flags, typesize(u8),
                  nbytes(i32 LE), blocksize(i32 LE), ctbytes(i32 LE)
  flags: 0x01 byte shuffle, 0x02 pure memcpy, 0x04 bit shuffle,
         0x10 dont-split, bits 5-7 codec format
         (0 = blosclz, 1 = lz4/lz4hc, 2 = snappy, 3 = zlib, 4 = zstd)
  then (unless memcpyed): i32 LE block-start offsets, one per block,
  each block = ``nsplits`` streams of [i32 LE cbytes | payload], where
  cbytes == neblock marks a stored-uncompressed split.

Splitting rule (c-blosc >= 1.11 decoder): typesize streams per block iff
2 <= typesize <= 16, blocksize/typesize >= 128, not the leftover block and
the dont-split flag is clear; else 1 stream. Byte shuffle groups byte j of
every element, applied per block, trailing ``blocksize % typesize`` bytes
copied verbatim.

The blosclz token stream is decoded by native/blosclz.cpp (ctypes, built on
demand like the skeletonizer); a pure-python mirror backs tests and
g++-less environments. Codec 3 (zlib) uses the stdlib. ``pack_array`` here
exists to build round-trip fixtures and write caches without blosc — its
encoder is greedy but emits fully valid frames.

VALIDATION CAVEAT: all current tests are grammar-level token streams plus
round-trips through this module's own encoder — no byte fixture produced by
the real c-blosc library exists in this environment (the ``blosc`` package
is absent and there is no egress). A shared misunderstanding of the frame
format would therefore pass CI and only surface on a real WIM-exported ZJU
cache. When any real blosc binary or cache is ever available, the FIRST
thing to add is a hard-coded ``blosc.pack_array`` byte fixture in
tests/test_bloscdec.py asserting bit-exact decode.
"""
from __future__ import annotations

import ctypes
import os
import pickle
import struct
import subprocess
import zlib

import numpy as np

MAX_DISTANCE = 8191
_FORMAT_NAMES = {0: "blosclz", 1: "lz4", 2: "snappy", 3: "zlib", 4: "zstd"}
_MIN_BUFFERSIZE = 128
_MAX_SPLITS = 16

_LIB = None
_LIB_FAILED = False


def _native_dir():
    return os.path.join(os.path.dirname(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__)))), "native")


def _load_native():
    global _LIB, _LIB_FAILED
    if _LIB is not None or _LIB_FAILED:
        return _LIB
    src = os.path.join(_native_dir(), "blosclz.cpp")
    so = os.path.join(_native_dir(), "libapnerf_blosclz.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(src)):
            subprocess.run(
                ["g++", "-O3", "-march=native", "-shared", "-fPIC",
                 "-o", so, src], check=True, capture_output=True)
        lib = ctypes.CDLL(so)
        lib.apnerf_blosclz_decompress.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64]
        lib.apnerf_blosclz_decompress.restype = ctypes.c_int64
        _LIB = lib
    except Exception as e:  # pragma: no cover
        print(f"bloscdec: native blosclz unavailable ({e}); "
              "falling back to python")
        _LIB_FAILED = True
    return _LIB


def blosclz_decompress(src: bytes, dst_size: int,
                       force_python: bool = False) -> bytes:
    """Decode one blosclz stream into exactly ``dst_size`` bytes."""
    lib = None if force_python else _load_native()
    if lib is not None:
        sbuf = np.frombuffer(src, np.uint8)
        dbuf = np.empty(dst_size, np.uint8)
        n = lib.apnerf_blosclz_decompress(
            sbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(src),
            dbuf.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), dst_size)
        if n != dst_size:
            raise ValueError(
                f"blosclz stream decoded to {n} bytes, expected {dst_size}")
        return dbuf.tobytes()
    return _blosclz_decompress_py(src, dst_size)


def _blosclz_decompress_py(src: bytes, dst_size: int) -> bytes:
    """Pure-python mirror of native/blosclz.cpp (slow; tests/fallback)."""
    ip, ip_end = 0, len(src)
    out = bytearray()
    if ip_end == 0:
        return bytes(out)
    ctrl = src[ip] & 31
    ip += 1
    loop = True
    while loop:
        if ctrl >= 32:
            length = (ctrl >> 5) - 1
            ofs = (ctrl & 31) << 8
            if length == 6:
                while True:
                    code = src[ip]
                    ip += 1
                    length += code
                    if code != 255:
                        break
            code = src[ip]
            ip += 1
            ref = len(out) - ofs - code
            if code == 255 and ofs == (31 << 8):
                ofs = (src[ip] << 8) + src[ip + 1]
                ip += 2
                ref = len(out) - ofs - MAX_DISTANCE
            if ip < ip_end:
                ctrl = src[ip]
                ip += 1
            else:
                loop = False
            length += 3
            ref -= 1
            if ref < 0:
                raise ValueError("blosclz: reference before output start")
            for _ in range(length):
                out.append(out[ref])
                ref += 1
        else:
            run = ctrl + 1
            out += src[ip:ip + run]
            ip += run
            loop = ip < ip_end
            if loop:
                ctrl = src[ip]
                ip += 1
    if len(out) != dst_size:
        raise ValueError(
            f"blosclz stream decoded to {len(out)} bytes, "
            f"expected {dst_size}")
    return bytes(out)


def _unshuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return buf
    nel = len(buf) // typesize
    body = nel * typesize
    arr = np.frombuffer(buf[:body], np.uint8).reshape(typesize, nel)
    return arr.T.tobytes() + buf[body:]


def _shuffle(buf: bytes, typesize: int) -> bytes:
    if typesize <= 1:
        return buf
    nel = len(buf) // typesize
    body = nel * typesize
    arr = np.frombuffer(buf[:body], np.uint8).reshape(nel, typesize)
    return arr.T.tobytes() + buf[body:]


def _nsplits(typesize: int, blocksize: int, leftover: bool,
             dont_split: bool) -> int:
    if (1 < typesize <= _MAX_SPLITS and blocksize // typesize
            >= _MIN_BUFFERSIZE and not leftover and not dont_split):
        return typesize
    return 1


def decompress(frame: bytes, force_python: bool = False) -> bytes:
    """blosc.decompress() equivalent for blosclz/zlib frames."""
    if len(frame) < 16:
        raise ValueError("blosc frame shorter than its 16-byte header")
    version, versionlz, flags, typesize = frame[0], frame[1], frame[2], frame[3]
    nbytes, blocksize, ctbytes = struct.unpack_from("<iii", frame, 4)
    del version, versionlz
    if ctbytes > len(frame):
        raise ValueError("blosc frame truncated "
                         f"(header says {ctbytes}, got {len(frame)})")
    if flags & 0x02:  # pure memcpy
        return bytes(frame[16:16 + nbytes])
    if flags & 0x04:
        raise NotImplementedError(
            "blosc bitshuffle filter not supported by "
            "apnerf/data/bloscdec.py — the WIM ZJU caches use byte shuffle "
            "(blosc.pack_array default); re-export the cache without "
            "bitshuffle or extend _decode_chunk here")
    codec = (flags >> 5) & 0x7
    if codec not in (0, 3):
        raise NotImplementedError(
            "blosc codec "
            f"'{_FORMAT_NAMES.get(codec, codec)}' not supported "
            "(blosclz and zlib are)")
    doshuffle = bool(flags & 0x01) and typesize > 1
    dont_split = bool(flags & 0x10)

    nblocks = max(1, -(-nbytes // blocksize)) if nbytes else 0
    bstarts = struct.unpack_from(f"<{nblocks}i", frame, 16)
    out = bytearray()
    for bi in range(nblocks):
        leftover = bi == nblocks - 1 and nbytes % blocksize != 0
        bsize = nbytes - bi * blocksize if leftover else blocksize
        nsp = _nsplits(typesize, blocksize, leftover, dont_split)
        pos = bstarts[bi]
        block = bytearray()
        for si in range(nsp):
            neblock = bsize // nsp if si < nsp - 1 else bsize - (nsp - 1) * (
                bsize // nsp)
            (cbytes,) = struct.unpack_from("<i", frame, pos)
            pos += 4
            payload = frame[pos:pos + cbytes]
            if len(payload) != cbytes:
                raise ValueError("blosc block truncated")
            pos += cbytes
            if cbytes == neblock:
                block += payload
            elif codec == 3:
                block += zlib.decompress(payload)
            else:
                block += blosclz_decompress(bytes(payload), neblock,
                                            force_python=force_python)
        if len(block) != bsize:
            raise ValueError(
                f"blosc block {bi} decoded to {len(block)} bytes, "
                f"expected {bsize}")
        if doshuffle:
            block = _unshuffle(bytes(block), typesize)
        out += block
    if len(out) != nbytes:
        raise ValueError(
            f"blosc frame decoded to {len(out)} bytes, expected {nbytes}")
    return bytes(out)


def unpack_array(frame: bytes, force_python: bool = False) -> np.ndarray:
    """blosc.unpack_array() equivalent: decompress then unpickle."""
    return pickle.loads(decompress(frame, force_python=force_python))


# ---------------------------------------------------------------------------
# Encoder (fixture-grade: greedy matcher, valid frames; used to build
# round-trip fixtures and to write caches without the blosc package)
# ---------------------------------------------------------------------------

def blosclz_compress(data: bytes) -> bytes:
    """Greedy blosclz encoder (short matches only; always decodable)."""
    n = len(data)
    out = bytearray()
    table: dict[bytes, int] = {}
    lit_start = 0
    i = 0

    def flush_literals(upto: int) -> None:
        nonlocal lit_start
        while lit_start < upto:
            run = min(32, upto - lit_start)
            out.append(run - 1)
            out.extend(data[lit_start:lit_start + run])
            lit_start += run

    while i + 3 <= n:
        key = data[i:i + 3]
        j = table.get(key)
        table[key] = i
        if j is not None and 0 < i - j <= MAX_DISTANCE - 1:
            length = 3
            while (i + length < n and length < 264
                   and data[j + length] == data[i + length]):
                length += 1
            d = i - j - 1  # stored distance (off by one)
            flush_literals(i)
            len_code = length - 2
            if len_code < 7:
                out.append((len_code << 5) | (d >> 8))
                out.append(d & 255)
            else:
                out.append((7 << 5) | (d >> 8))
                rem = len_code - 7
                while rem >= 255:
                    out.append(255)
                    rem -= 255
                out.append(rem)
                out.append(d & 255)
            i += length
            lit_start = i
        else:
            i += 1
    flush_literals(n)
    return bytes(out)


def compress(data: bytes, typesize: int = 1, shuffle: bool = True,
             cname: str = "blosclz", blocksize: int = 1 << 16) -> bytes:
    """blosc.compress() equivalent producing a valid blosc1 frame."""
    codec = {"blosclz": 0, "zlib": 3}[cname]
    nbytes = len(data)
    typesize = max(1, min(typesize, 255))
    blocksize = max(typesize, min(blocksize, max(nbytes, 1)))
    blocksize -= blocksize % typesize
    doshuffle = shuffle and typesize > 1
    flags = (0x01 if doshuffle else 0) | (codec << 5)

    nblocks = max(1, -(-nbytes // blocksize)) if nbytes else 0
    bstarts = []
    body = bytearray()
    base = 16 + 4 * nblocks
    for bi in range(nblocks):
        leftover = bi == nblocks - 1 and nbytes % blocksize != 0
        bsize = nbytes - bi * blocksize if leftover else blocksize
        block = data[bi * blocksize: bi * blocksize + bsize]
        if doshuffle:
            block = _shuffle(block, typesize)
        nsp = _nsplits(typesize, blocksize, leftover, dont_split=False)
        bstarts.append(base + len(body))
        off = 0
        for si in range(nsp):
            neblock = bsize // nsp if si < nsp - 1 else bsize - (nsp - 1) * (
                bsize // nsp)
            chunk = block[off:off + neblock]
            off += neblock
            packed = (blosclz_compress(chunk) if codec == 0
                      else zlib.compress(chunk, 5))
            if len(packed) >= neblock:
                packed = chunk  # stored: cbytes == neblock marks it
            body += struct.pack("<i", len(packed)) + packed
    ctbytes = base + len(body)
    if ctbytes >= nbytes + 16:  # compression lost: memcpyed frame
        header = struct.pack("<BBBBiii", 2, 1, 0x02,
                             typesize, nbytes, blocksize, 16 + nbytes)
        return header + data
    header = struct.pack("<BBBBiii", 2, 1, flags, typesize, nbytes,
                         blocksize, ctbytes)
    return header + struct.pack(f"<{nblocks}i", *bstarts) + bytes(body)


def pack_array(arr: np.ndarray, cname: str = "blosclz") -> bytes:
    """blosc.pack_array() equivalent (pickle then compress)."""
    payload = pickle.dumps(arr, protocol=pickle.HIGHEST_PROTOCOL)
    return compress(payload, typesize=arr.itemsize, cname=cname)
