"""Pure-Python twin of Spark's ``xxhash64`` expression (XXH64, seed 42) —
oracle-side only, used by tools/make_golden_sql.py to compute expected
results for engine queries built on F.xxhash64 (simhash, MinHash-LSH)
WITHOUT running the Spark engine.

Semantics mirror the published XXH64 algorithm as specialized by Spark
(org.apache.spark.sql.catalyst.expressions.XxHash64 /
org.apache.spark.unsafe.hash.XXH64 — public Apache source):

* multi-column ``xxhash64(c1, c2, ...)`` chains: the running hash starts at
  seed 42 and each column's value is hashed with the previous result as the
  seed;
* IntegerType values go through ``hashInt`` (the int is zero-EXTENDED to a
  long after masking — Spark widens with ``& 0xFFFFFFFFL``);
* LongType values go through ``hashLong``;
* StringType values hash their UTF-8 bytes with the full XXH64 body.

Verified bit-for-bit against Spark in tests/test_sparkhash.py.
"""

from __future__ import annotations

M = (1 << 64) - 1
P1 = 0x9E3779B185EBCA87
P2 = 0xC2B2AE3D27D4EB4F
P3 = 0x165667B19E3779F9
P4 = 0x85EBCA77C2B2AE63
P5 = 0x27D4EB2F165667C5

DEFAULT_SEED = 42


def _rotl(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & M


def _fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * P2) & M
    h ^= h >> 29
    h = (h * P3) & M
    h ^= h >> 32
    return h


def hash_int(i: int, seed: int) -> int:
    """XXH64.hashInt: 4-byte int input (Spark IntegerType)."""
    h = (seed + P5 + 4) & M
    h ^= ((i & 0xFFFFFFFF) * P1) & M
    h = (_rotl(h, 23) * P2 + P3) & M
    return _fmix(h)


def hash_long(l: int, seed: int) -> int:
    """XXH64.hashLong: 8-byte long input (Spark LongType)."""
    h = (seed + P5 + 8) & M
    h ^= (_rotl((l & M) * P2 & M, 31) * P1) & M
    h = (_rotl(h, 27) * P1 + P4) & M
    return _fmix(h)


def hash_bytes(data: bytes, seed: int) -> int:
    """Standard XXH64 over a byte string (Spark StringType/BinaryType path:
    XXH64.hashUnsafeBytesBlock — the published algorithm)."""
    n = len(data)
    off = 0
    if n >= 32:
        v1 = (seed + P1 + P2) & M
        v2 = (seed + P2) & M
        v3 = seed & M
        v4 = (seed - P1) & M
        while off + 32 <= n:
            k1 = int.from_bytes(data[off : off + 8], "little")
            v1 = (_rotl((v1 + k1 * P2) & M, 31) * P1) & M
            k2 = int.from_bytes(data[off + 8 : off + 16], "little")
            v2 = (_rotl((v2 + k2 * P2) & M, 31) * P1) & M
            k3 = int.from_bytes(data[off + 16 : off + 24], "little")
            v3 = (_rotl((v3 + k3 * P2) & M, 31) * P1) & M
            k4 = int.from_bytes(data[off + 24 : off + 32], "little")
            v4 = (_rotl((v4 + k4 * P2) & M, 31) * P1) & M
            off += 32
        h = (_rotl(v1, 1) + _rotl(v2, 7) + _rotl(v3, 12) + _rotl(v4, 18)) & M
        for v in (v1, v2, v3, v4):
            h ^= (_rotl((v * P2) & M, 31) * P1) & M
            h = (h * P1 + P4) & M
    else:
        h = (seed + P5) & M
    h = (h + n) & M
    while off + 8 <= n:
        k = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl((k * P2) & M, 31) * P1) & M
        h = (_rotl(h, 27) * P1 + P4) & M
        off += 8
    if off + 4 <= n:
        k = int.from_bytes(data[off : off + 4], "little")
        h ^= (k * P1) & M
        h = (_rotl(h, 23) * P2 + P3) & M
        off += 4
    while off < n:
        h ^= (data[off] * P5) & M
        h = (_rotl(h, 11) * P1) & M
        off += 1
    return _fmix(h)


def _to_signed(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def xxhash64(*values, seed: int = DEFAULT_SEED) -> int:
    """Spark ``F.xxhash64(*cols)`` twin. Each value is one of:
    ('int', i) | ('long', l) | ('str', s) — or a bare Python object with
    type inferred the way F.lit would: int -> 'int' if it fits int32 else
    'long'; str -> 'str'. Returns the SIGNED 64-bit result like Spark."""
    h = seed & M
    for v in values:
        if isinstance(v, tuple):
            kind, val = v
        elif isinstance(v, bool):
            raise TypeError("bool not supported")
        elif isinstance(v, int):
            kind, val = ("int", v) if -(1 << 31) <= v < (1 << 31) else ("long", v)
        elif isinstance(v, str):
            kind, val = "str", v
        elif isinstance(v, bytes):
            kind, val = "bytes", v
        else:
            raise TypeError(type(v))
        if kind == "int":
            h = hash_int(val & 0xFFFFFFFF, h)
        elif kind == "long":
            h = hash_long(val & M, h)
        elif kind == "str":
            h = hash_bytes(val.encode("utf-8"), h)
        elif kind == "bytes":
            h = hash_bytes(val, h)
        else:
            raise ValueError(kind)
    return _to_signed(h)
