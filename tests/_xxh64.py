"""Pure-Python XXH64 (public spec, github.com/Cyan4973/xxHash) used as
an INDEPENDENT oracle for Spark's `xxhash64` in differential tests.
Spark evaluates xxhash64 over the UTF-8 bytes with seed 42
(catalyst XXH64, validated against the canonical vectors upstream);
this mirror lets pytest replay MinHash/SimHash pipelines in pure
Python without touching any Spark code path."""

from __future__ import annotations

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5
_MASK = (1 << 64) - 1


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _MASK


def _round(acc: int, lane: int) -> int:
    acc = (acc + lane * _P2) & _MASK
    return (_rotl(acc, 31) * _P1) & _MASK


def _merge_round(h: int, v: int) -> int:
    h ^= _round(0, v)
    return (h * _P1 + _P4) & _MASK


def xxh64(data: bytes, seed: int = 42) -> int:
    """Unsigned 64-bit XXH64 of ``data``."""
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _MASK
        v2 = (seed + _P2) & _MASK
        v3 = seed & _MASK
        v4 = (seed - _P1) & _MASK
        while i + 32 <= n:
            v1 = _round(v1, int.from_bytes(data[i:i + 8], "little"))
            v2 = _round(v2, int.from_bytes(data[i + 8:i + 16], "little"))
            v3 = _round(v3, int.from_bytes(data[i + 16:i + 24], "little"))
            v4 = _round(v4, int.from_bytes(data[i + 24:i + 32], "little"))
            i += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & _MASK
        for v in (v1, v2, v3, v4):
            h = _merge_round(h, v)
    else:
        h = (seed + _P5) & _MASK
    h = (h + n) & _MASK
    while i + 8 <= n:
        h ^= _round(0, int.from_bytes(data[i:i + 8], "little"))
        h = (_rotl(h, 27) * _P1 + _P4) & _MASK
        i += 8
    if i + 4 <= n:
        h ^= (int.from_bytes(data[i:i + 4], "little") * _P1) & _MASK
        h = (_rotl(h, 23) * _P2 + _P3) & _MASK
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _MASK
        h = (_rotl(h, 11) * _P1) & _MASK
        i += 1
    h ^= h >> 33
    h = (h * _P2) & _MASK
    h ^= h >> 29
    h = (h * _P3) & _MASK
    h ^= h >> 32
    return h


def xxh64_signed(s: str, seed: int = 42) -> int:
    """Spark-typed result: signed 64-bit of the UTF-8 bytes (what
    ``F.xxhash64(string_col)`` returns)."""
    h = xxh64(s.encode("utf-8"), seed)
    return h - (1 << 64) if h >= (1 << 63) else h


def xxh64_long(v: int, seed: int = 42) -> int:
    """Spark XxHash64 over one BIGINT value: xxh64 of the 8-byte
    little-endian two's-complement encoding (bit-identical to
    Catalyst's hashLong — verified against F.xxhash64(long_col))."""
    import struct
    return xxh64(struct.pack("<q", v), seed)


def xxh64_slot_signed(h: int, i: int) -> int:
    """Spark ``xxhash64(h, iL)`` over two BIGINT columns: Catalyst
    chains per-column hashes, each column hashed with the running
    result as seed (initial seed 42). Signed 64-bit result."""
    u = xxh64_long(i, xxh64_long(h, 42))
    return u - (1 << 64) if u >= (1 << 63) else u
