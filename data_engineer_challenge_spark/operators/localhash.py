"""Pure-Python replicas of Spark's hash expressions, BIT-EXACT.

The sparkless point-serving tier (``IVFVectorIndex.probe_local``,
``InvertedTextIndex.probe_local``, ``MinHashIndex.probe_local``)
answers single queries with no JVM, but the persisted layouts are
keyed by Spark's own hash expressions — ``pmod(hash(term), N)``
partition dirs, xxhash64 shingle hashes. These replicas let the
driver-side paths compute the SAME keys. All are public algorithms
(Appleby's Murmur3 x86_32, Collet's xxHash64) in the exact variants
Spark's ``Murmur3Hash`` / ``XxHash64`` expressions implement (seed
42, little-endian lanes, Java signed-byte tails, per-child seed
chaining); bit-equality against ``F.hash`` / ``F.xxhash64`` is
test-pinned over strings (ASCII/multibyte/empty/long), longs, and
multi-argument chains.
"""

from __future__ import annotations

_M32 = 0xFFFFFFFF
_M64 = (1 << 64) - 1

# ---- Murmur3 x86_32 (Spark's F.hash) --------------------------------

_C1, _C2 = 0xCC9E2D51, 0x1B873593


def _m3_mix(h1: int, k1: int) -> int:
    k1 = (k1 * _C1) & _M32
    k1 = ((k1 << 15) | (k1 >> 17)) & _M32
    k1 = (k1 * _C2) & _M32
    h1 ^= k1
    h1 = ((h1 << 13) | (h1 >> 19)) & _M32
    return (h1 * 5 + 0xE6546B64) & _M32


def _m3_fmix(h1: int, length: int) -> int:
    h1 ^= length
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def spark_murmur3_string(s: str, seed: int = 42) -> int:
    """``F.hash`` on a string: Murmur3 x86_32 over UTF-8 bytes —
    4-byte little-endian lanes, then each TAIL byte mixed
    individually as a SIGNED Java byte (``hashUnsafeBytes``), fmix
    over the byte length. Signed int32 result."""
    data = s.encode("utf-8")
    h1 = seed & _M32
    n = len(data)
    lanes = n - n % 4
    for i in range(0, lanes, 4):
        h1 = _m3_mix(h1, int.from_bytes(data[i : i + 4], "little"))
    for i in range(lanes, n):
        b = data[i]
        if b >= 0x80:
            b -= 0x100  # Java bytes are signed
        h1 = _m3_mix(h1, b % (1 << 32))
    return _m3_fmix(h1, n)


def spark_murmur3_long(value: int, seed: int = 42) -> int:
    """``F.hash`` on a long: Murmur3's ``hashLong`` — the value's two
    little-endian 4-byte halves as lanes, fmix over length 8."""
    v = value & _M64
    h1 = _m3_mix(seed & _M32, v & _M32)
    h1 = _m3_mix(h1, (v >> 32) & _M32)
    return _m3_fmix(h1, 8)


# ---- xxHash64 (Spark's F.xxhash64) -----------------------------------

_P1 = 0x9E3779B185EBCA87
_P2 = 0xC2B2AE3D27D4EB4F
_P3 = 0x165667B19E3779F9
_P4 = 0x85EBCA77C2B2AE63
_P5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _xx_fmix(h: int) -> int:
    h ^= h >> 33
    h = (h * _P2) & _M64
    h ^= h >> 29
    h = (h * _P3) & _M64
    h ^= h >> 32
    return h


def _xx_long_u(value: int, seed: int) -> int:
    """xxHash64 of ONE long (Spark's ``XxHash64.hashLong``),
    UNSIGNED result — the chaining form (a child's hash seeds the
    next child)."""
    v = value & _M64
    h = (seed + _P5 + 8) & _M64
    k1 = (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
    h ^= k1
    h = ((_rotl64(h, 27) * _P1) + _P4) & _M64
    return _xx_fmix(h)


def _to_signed64(h: int) -> int:
    return h - (1 << 64) if h >= (1 << 63) else h


def spark_xxhash64_longs(values, seed: int = 42) -> int:
    """``F.xxhash64(a, b, ...)`` over LONG columns: each child's hash
    seeds the next (Spark folds children left to right). Signed
    int64 result."""
    h = seed
    for v in values:
        h = _xx_long_u(v, h)
    return _to_signed64(h)


def spark_xxhash64_string(s: str, seed: int = 42) -> int:
    """``F.xxhash64`` on a string: xxHash64 over UTF-8 bytes in
    Spark's ``hashUnsafeBytes`` form (32-byte stripes, then 8-byte
    lanes, one 4-byte lane, per-byte tail). Signed int64 result."""
    data = s.encode("utf-8")
    n = len(data)
    i = 0
    if n >= 32:
        v1 = (seed + _P1 + _P2) & _M64
        v2 = (seed + _P2) & _M64
        v3 = seed & _M64
        v4 = (seed - _P1) & _M64
        while i <= n - 32:
            v1 = (_rotl64((v1 + int.from_bytes(data[i : i + 8], "little") * _P2) & _M64, 31) * _P1) & _M64
            v2 = (_rotl64((v2 + int.from_bytes(data[i + 8 : i + 16], "little") * _P2) & _M64, 31) * _P1) & _M64
            v3 = (_rotl64((v3 + int.from_bytes(data[i + 16 : i + 24], "little") * _P2) & _M64, 31) * _P1) & _M64
            v4 = (_rotl64((v4 + int.from_bytes(data[i + 24 : i + 32], "little") * _P2) & _M64, 31) * _P1) & _M64
            i += 32
        h = (
            _rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)
        ) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P2) & _M64, 31) * _P1) & _M64
            h = ((h * _P1) + _P4) & _M64
    else:
        h = (seed + _P5) & _M64
    h = (h + n) & _M64
    while i <= n - 8:
        k1 = int.from_bytes(data[i : i + 8], "little")
        h ^= (_rotl64((k1 * _P2) & _M64, 31) * _P1) & _M64
        h = ((_rotl64(h, 27) * _P1) + _P4) & _M64
        i += 8
    if i <= n - 4:
        k1 = int.from_bytes(data[i : i + 4], "little")
        h ^= (k1 * _P1) & _M64
        h = ((_rotl64(h, 23) * _P2) + _P3) & _M64
        i += 4
    while i < n:
        h ^= (data[i] * _P5) & _M64
        h = (_rotl64(h, 11) * _P1) & _M64
        i += 1
    return _to_signed64(_xx_fmix(h))
