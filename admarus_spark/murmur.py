"""Murmur3 x86_32 in Spark's variant — driver-side parity with ``F.hash``.

Spark's ``hash()`` for strings is Murmur3 x86_32, seed 42, over the UTF-8
bytes, with Spark's own tail handling: the trailing (len % 4) bytes are each
processed as a full mix round with the *sign-extended* byte value (see
Murmur3_x86_32.hashUnsafeBytes in the public Spark source). We reimplement
it so the query driver can compute a term's posting bucket
``pmod(hash(term), n_buckets)`` without launching a job. A pytest asserts
parity against ``F.hash`` on a word sample.
"""

from __future__ import annotations

_MASK32 = 0xFFFFFFFF


def _i32(x: int) -> int:
    x &= _MASK32
    return x - (1 << 32) if x >= (1 << 31) else x


def _rotl(x: int, r: int) -> int:
    x &= _MASK32
    return ((x << r) | (x >> (32 - r))) & _MASK32


def _mix_k1(k1: int) -> int:
    k1 = (k1 * 0xCC9E2D51) & _MASK32
    k1 = _rotl(k1, 15)
    return (k1 * 0x1B873593) & _MASK32


def _mix_h1(h1: int, k1: int) -> int:
    h1 = (h1 ^ k1) & _MASK32
    h1 = _rotl(h1, 13)
    return (h1 * 5 + 0xE6546B64) & _MASK32


def _fmix(h1: int, length: int) -> int:
    h1 = (h1 ^ length) & _MASK32
    h1 ^= h1 >> 16
    h1 = (h1 * 0x85EBCA6B) & _MASK32
    h1 ^= h1 >> 13
    h1 = (h1 * 0xC2B2AE35) & _MASK32
    h1 ^= h1 >> 16
    return h1


def spark_hash_string(s: str, seed: int = 42) -> int:
    """Equals Spark SQL ``hash(s)`` (int32, possibly negative)."""
    data = s.encode("utf-8")
    h1 = seed & _MASK32
    n = len(data)
    n4 = (n // 4) * 4
    for i in range(0, n4, 4):
        k1 = int.from_bytes(data[i : i + 4], "little")
        h1 = _mix_h1(h1, _mix_k1(k1))
    for i in range(n4, n):
        b = data[i]
        b = b - 256 if b >= 128 else b  # sign-extended byte
        h1 = _mix_h1(h1, _mix_k1(b & _MASK32))
    return _i32(_fmix(h1, n))


def term_bucket(term: str, n_buckets: int) -> int:
    """Equals Spark ``pmod(hash(term), n_buckets)``."""
    return spark_hash_string(term) % n_buckets


def spark_hash_int(i: int, seed: int = 42) -> int:
    """Equals Spark SQL ``hash(i)`` for a 32-bit int column (one Murmur3 mix
    round over the int value + finalize with length 4 — see
    Murmur3_x86_32.hashInt in the public Spark source)."""
    h1 = _mix_h1(seed & _MASK32, _mix_k1(i & _MASK32))
    return _i32(_fmix(h1, 4))


def identity_partition_keys(n: int) -> list[int]:
    """Routing keys that make DataFrame.repartition(n, key) an IDENTITY
    partitioner over bucket ids: ``keys[tb]`` is an int whose Spark hash
    lands in shuffle partition ``tb`` (``pmod(spark_hash_int(keys[tb]), n)
    == tb``), found by driver-side probing (coupon-collector, ~n·ln n
    probes of a pure Python hash — microseconds).

    DataFrames expose no custom partitioner, and ``repartitionByRange``
    pays a sampling pass over the child plan; routing through these probe
    keys gives exactly one term-hash bucket per shuffle partition with a
    plain hash repartition — no sampling job, no balls-in-bins collision
    skew (a straggler factor at one-wave parallelism)."""
    keys: dict[int, int] = {}
    j = 0
    while len(keys) < n:
        p = spark_hash_int(j) % n
        if p not in keys:
            keys[p] = j
        j += 1
    return [keys[p] for p in range(n)]
