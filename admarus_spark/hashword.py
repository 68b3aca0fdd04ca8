"""Bit-for-bit parity port of the reference word hash.

Reference: ``/root/reference/daemon/src/index/index.rs:180-192`` (duplicated at
``kamilata/tests/common/movies.rs:88-98``)::

    let mut result = 1usize;
    for c in word.bytes() {
        for i in 0..8 {
            result = result.overflowing_mul(c as usize + RANDOM_SEED[i*2]).0;
            result = result.overflowing_add(c as usize + RANDOM_SEED[i*2+1]).0;
        }
    }
    vec![result % (FILTER_SIZE * 8)]

A 1-probe bloom filter over FILTER_SIZE*8 = 1,000,000 bits
(``daemon/src/node.rs:3``). Used here for the per-partition term-presence
summaries that drive query-time partition pruning (the Spark analog of the
Kamilata bloom routing, ``daemon/src/query/matching.rs:19-41``).
"""

from __future__ import annotations

import numpy as np

from . import FILTER_BITS

RANDOM_SEED = (
    542587211452,
    5242354514,
    245421154,
    4534542154,
    542866467,
    545245414,
    7867569786914,
    88797854597,
    24542187316,
    645785447,
    434963879,
    4234274,
    55418648642,
    69454242114688,
    74539841,
    454214578213,
)


def hash_word(word: str, filter_bits: int = FILTER_BITS) -> int:
    """Single bloom bit index for a word (pure Python, exact u64 wraparound)."""
    result = 1
    mask = (1 << 64) - 1
    for c in word.encode("utf-8"):
        for i in range(8):
            result = (result * (c + RANDOM_SEED[2 * i])) & mask
            result = (result + (c + RANDOM_SEED[2 * i + 1])) & mask
    return result % filter_bits


def hash_words(words: np.ndarray | list[str], filter_bits: int = FILTER_BITS) -> np.ndarray:
    """Vectorized hash over an array of words (NumPy uint64 wraparound).

    Words are processed byte-column-wise: pad to the max byte length and walk
    positions; padding bytes must not perturb the state, so we only apply the
    update where the word still has bytes (masked multiply-add).
    """
    enc = [w.encode("utf-8") for w in words]
    n = len(enc)
    if n == 0:
        return np.empty(0, dtype=np.uint64)
    maxlen = max(len(b) for b in enc) or 1
    buf = np.zeros((n, maxlen), dtype=np.uint64)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    for r, b in enumerate(enc):
        buf[r, : len(b)] = np.frombuffer(b, dtype=np.uint8)
    seeds = np.array(RANDOM_SEED, dtype=np.uint64)
    result = np.ones(n, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for pos in range(maxlen):
            c = buf[:, pos]
            active = pos < lens
            r = result.copy()
            for i in range(8):
                r = r * (c + seeds[2 * i]) + (c + seeds[2 * i + 1])
            result = np.where(active, r, result)
    return result % np.uint64(filter_bits)


def build_filter(words, filter_bits: int = FILTER_BITS) -> np.ndarray:
    """Build a packed bloom bitset (uint8 array, little-endian bit order
    within bytes, matching the reference's ``get_bit``/``set_bit``:
    ``kamilata/src/filters.rs:16-46`` uses ``(byte >> (idx % 8)) & 1``)."""
    bits = hash_words(np.asarray(list(words), dtype=object), filter_bits)
    out = np.zeros((filter_bits + 7) // 8, dtype=np.uint8)
    byte_idx = (bits // 8).astype(np.int64)
    bit_in_byte = (bits % 8).astype(np.int64)
    np.bitwise_or.at(out, byte_idx, (1 << bit_in_byte).astype(np.uint8))
    return out


def filter_get(filt: np.ndarray, word: str, filter_bits: int = FILTER_BITS) -> bool:
    """Reference get_word semantics (kamilata/src/filters.rs:29-31)."""
    i = hash_word(word, filter_bits)
    return bool((int(filt[i // 8]) >> (i % 8)) & 1)
