"""Pure-Python XXH64 matching Spark's ``F.xxhash64`` bit-for-bit.

Spark's XxHash64 expression (sql/catalyst XXH64.java) hashes each
column's bytes with XXH64, chaining: the hash of column i becomes the
seed for column i+1, starting from seed 42.  String columns hash their
UTF-8 bytes.  We reproduce that here so the Spark-free oracle can
compute the same ``doc_id = xxhash64(repo, path, commit)`` the engine
derives (SURVEY.md section 1.1 / FIXTURES.md section 1).

Verified against Spark in tests/test_xxh64.py.
"""

from __future__ import annotations

import struct

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_M = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M


def _round(acc: int, inp: int) -> int:
    acc = (acc + inp * _P2) & _M
    acc = _rotl(acc, 31)
    return (acc * _P1) & _M


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _M


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned XXH64 of ``data`` with ``seed``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M
        v2 = (seed + _P2) & _M
        v3 = seed & _M
        v4 = (seed - _P1) & _M
        while i <= n - 32:
            w = struct.unpack_from("<QQQQ", data, i)
            v1 = _round(v1, w[0])
            v2 = _round(v2, w[1])
            v3 = _round(v3, w[2])
            v4 = _round(v4, w[3])
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _M
        h = _merge_round(h, v1)
        h = _merge_round(h, v2)
        h = _merge_round(h, v3)
        h = _merge_round(h, v4)
    else:
        h = (seed + _P5) & _M
    h = (h + n) & _M
    while i <= n - 8:
        h ^= _round(0, struct.unpack_from("<Q", data, i)[0])
        h = (_rotl(h, 27) * _P1 + _P4) & _M
        i += 8
    if i <= n - 4:
        h ^= (struct.unpack_from("<I", data, i)[0] * _P1) & _M
        h = (_rotl(h, 23) * _P2 + _P3) & _M
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M
        h = (_rotl(h, 11) * _P1) & _M
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _M
    h ^= h >> 29
    h = (h * _P3) & _M
    h ^= h >> 32
    return h


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64_cols(*values: str | bytes | int, seed: int = 42) -> int:
    """Signed int64 equal to Spark ``F.xxhash64(*cols)`` for the row.

    Strings hash their UTF-8 bytes; ints hash their little-endian
    8-byte form (Spark hashLong is hashInt-pair based for longs —
    actually XXH64.hashLong(l, seed) hashes the 8-byte value with a
    dedicated path; we replicate via the byte path which is equivalent
    for the string-only use in this engine).
    """
    h = seed
    for v in values:
        if isinstance(v, str):
            b = v.encode("utf-8")
        elif isinstance(v, bytes):
            b = v
        else:
            b = struct.pack("<q", v)
        h = xxh64(b, h & _M)
    return _to_signed(h)


def doc_id_of(repo: str, path: str, commit: str) -> int:
    """The engine's deterministic document identity (FIXTURES.md §1)."""
    return xxhash64_cols(repo, path, commit)
