"""hash_word parity (daemon/src/index/index.rs:180-192) + bloom semantics."""

import numpy as np

from admarus_spark.hashword import build_filter, filter_get, hash_word, hash_words

# goldens computed from the exact reference algorithm (u64 wraparound,
# RANDOM_SEED from index.rs:184, result % 1_000_000)
GOLDENS = {
    "hunger": 147761,
    "rust": 153375,
    "the": 650486,
    "license": 988406,
}


def test_goldens_stable():
    for w, bit in GOLDENS.items():
        assert hash_word(w) == bit


def test_vectorized_matches_scalar():
    words = list(GOLDENS) + ["a", "zz", "xylophone", "ipfs", "123", "abcdefghijklmnop", ""]
    got = hash_words(np.array(words, dtype=object)).tolist()
    want = [hash_word(w) for w in words]
    assert got == want


def test_bloom_membership():
    words = ["alpha", "beta", "gamma", "lang=en"]
    filt = build_filter(words)
    assert all(filter_get(filt, w) for w in words)
    # absent words: overwhelmingly likely absent in a 1M-bit filter
    misses = sum(filter_get(filt, f"absent{i}") for i in range(50))
    assert misses <= 1
