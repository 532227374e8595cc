"""Driver-side twins of the Catalyst hash functions on the probe path.

The interactive cache probes (``Crawler.status()`` / ``cached()`` — the
reference's O(1)-local ``Base#status``/``cached?``, /root/reference/lib/
sinew/base.rb:95-122) must not launch a Spark job per call. The engine's
request identity is ``xxhash64(method, canonical_url, body)`` and the
seen-shard routing is ``pmod(hash(key), n_shards)`` — both Catalyst
expressions. This module reimplements exactly those two hash functions in
pure Python so the driver can compute a request's key and shard locally
and binary-search the seen-key shard file directly:

- ``xxh64``: the xxHash64 algorithm (Collet's spec) as implemented by
  Spark's ``XXH64.hashUnsafeBytes`` — little-endian 8-byte stripes, the
  4-byte then 1-byte tail, same avalanche. Multi-column chaining follows
  the ``XxHash64`` expression: seed 42, each column rehashes with the
  running value as seed, nulls skipped.
- ``murmur3_hash_long``: Spark's ``Murmur3_x86_32.hashLong`` (seed 42) —
  the ``F.hash`` of a BIGINT column — low word then high word, 32-bit
  lanes.

Parity with the JVM versions is pinned empirically by
tests/test_urls.py::test_local_hash_twins_match_spark over random and
adversarial inputs (every tail length 0..40, unicode, null chaining).
"""

from __future__ import annotations

_M64 = (1 << 64) - 1
_M32 = (1 << 32) - 1

_P64_1 = 0x9E3779B185EBCA87
_P64_2 = 0xC2B2AE3D27D4EB4F
_P64_3 = 0x165667B19E3779F9
_P64_4 = 0x85EBCA77C2B2AE63
_P64_5 = 0x27D4EB2F165667C5


def _rotl64(x: int, r: int) -> int:
    return ((x << r) | (x >> (64 - r))) & _M64


def _fmix64(h: int) -> int:
    h ^= h >> 33
    h = (h * _P64_2) & _M64
    h ^= h >> 29
    h = (h * _P64_3) & _M64
    h ^= h >> 32
    return h


def xxh64(data: bytes, seed: int) -> int:
    """xxHash64 of ``data`` with ``seed`` (unsigned in, unsigned out)."""
    seed &= _M64
    length = len(data)
    off = 0
    if length >= 32:
        v1 = (seed + _P64_1 + _P64_2) & _M64
        v2 = (seed + _P64_2) & _M64
        v3 = seed
        v4 = (seed - _P64_1) & _M64
        limit = length - 32
        while off <= limit:
            v1 = (_rotl64((v1 + int.from_bytes(data[off : off + 8], "little") * _P64_2) & _M64, 31) * _P64_1) & _M64
            v2 = (_rotl64((v2 + int.from_bytes(data[off + 8 : off + 16], "little") * _P64_2) & _M64, 31) * _P64_1) & _M64
            v3 = (_rotl64((v3 + int.from_bytes(data[off + 16 : off + 24], "little") * _P64_2) & _M64, 31) * _P64_1) & _M64
            v4 = (_rotl64((v4 + int.from_bytes(data[off + 24 : off + 32], "little") * _P64_2) & _M64, 31) * _P64_1) & _M64
            off += 32
        h = (_rotl64(v1, 1) + _rotl64(v2, 7) + _rotl64(v3, 12) + _rotl64(v4, 18)) & _M64
        for v in (v1, v2, v3, v4):
            h ^= (_rotl64((v * _P64_2) & _M64, 31) * _P64_1) & _M64
            h = (h * _P64_1 + _P64_4) & _M64
    else:
        h = (seed + _P64_5) & _M64
    h = (h + length) & _M64
    while off + 8 <= length:
        k1 = int.from_bytes(data[off : off + 8], "little")
        h ^= (_rotl64((k1 * _P64_2) & _M64, 31) * _P64_1) & _M64
        h = (_rotl64(h, 27) * _P64_1 + _P64_4) & _M64
        off += 8
    if off + 4 <= length:
        h ^= (int.from_bytes(data[off : off + 4], "little") * _P64_1) & _M64
        h = (_rotl64(h, 23) * _P64_2 + _P64_3) & _M64
        off += 4
    while off < length:
        h ^= (data[off] * _P64_5) & _M64
        h = (_rotl64(h, 11) * _P64_1) & _M64
        off += 1
    return _fmix64(h)


def _to_signed64(x: int) -> int:
    x &= _M64
    return x - (1 << 64) if x >= (1 << 63) else x


def xxhash64_cols(*values: "str | None", seed: int = 42) -> int:
    """Spark's ``xxhash64(col, ...)`` over string columns: running hash
    starts at 42, each non-null value rehashes its UTF-8 bytes with the
    running value as seed. Returns the signed 64-bit Spark long."""
    h = seed & _M64
    for v in values:
        if v is None:
            continue
        h = xxh64(v.encode("utf-8"), h)
    return _to_signed64(h)


# --- Murmur3_x86_32.hashLong (Spark F.hash of one BIGINT, seed 42) -----------

_MC1 = 0xCC9E2D51
_MC2 = 0x1B873593


def _rotl32(x: int, r: int) -> int:
    return ((x << r) | (x >> (32 - r))) & _M32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * _MC1) & _M32
    k1 = _rotl32(k1, 15)
    return (k1 * _MC2) & _M32


def _mix_h1(h1: int, k1: int) -> int:
    h1 ^= k1
    h1 = _rotl32(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _M32


def murmur3_hash_long(value: int, seed: int = 42) -> int:
    """Spark ``F.hash(bigint_col)``: Murmur3_x86_32.hashLong — the long's
    low then high 32-bit words through the standard lanes, finalized with
    length 8. Returns the signed 32-bit Spark int."""
    v = value & _M64
    low = v & _M32
    high = (v >> 32) & _M32
    h1 = _mix_h1(seed & _M32, _mix_k1(low))
    h1 = _mix_h1(h1, _mix_k1(high))
    h1 ^= 8
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _M32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _M32
    h1 ^= h1 >> 16
    return h1 - (1 << 32) if h1 >= (1 << 31) else h1


def request_key_local(method: str, canonical_url: str, body: str | None) -> int:
    """Driver-side twin of urls.request_key_expr: the signed-long request
    identity ``xxhash64(upper(method), canonical_url, coalesce(body, ''))``."""
    return xxhash64_cols((method or "GET").upper(), canonical_url, body or "")


def shard_of_key(key: int, n_shards: int) -> int:
    """Driver-side twin of the shard stores' ``pmod(hash(key), n_shards)``
    routing (Python ``%`` on the signed hash == Spark pmod for positive n)."""
    return murmur3_hash_long(key) % n_shards
