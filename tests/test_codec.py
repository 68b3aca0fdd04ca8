"""Property tests for the posting codec (hypothesis)."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from admarus_spark.index.codec import (
    decode_postings,
    decode_varint,
    encode_postings,
    encode_varint,
    merge_encoded_chunks,
)


@given(
    st.lists(st.integers(min_value=0, max_value=2**63 - 1), max_size=500)
)
@settings(max_examples=60, deadline=None)
def test_varint_roundtrip(vals):
    a = np.array(vals, dtype=np.uint64)
    assert decode_varint(encode_varint(a)).tolist() == vals


@given(
    st.integers(min_value=1, max_value=900),
    st.integers(min_value=0, max_value=2**31),
    st.randoms(use_true_random=False),
)
@settings(max_examples=40, deadline=None)
def test_postings_roundtrip_and_merge(n, base, rnd):
    rng = np.random.RandomState(rnd.randint(0, 2**31 - 1))
    ids = base + np.cumsum(rng.randint(1, 1000, size=n)).astype(np.int64)
    tfs = rng.randint(1, 1000, size=n).astype(np.int64)
    dls = rng.randint(3, 100000, size=n).astype(np.int64)
    enc = encode_postings(ids, tfs, dls, block_size=64)
    i2, t2, d2 = decode_postings(
        enc["ids_blob"], enc["tfs_blob"], enc["dls_blob"], enc["block_firsts"], enc["block_lens"]
    )
    assert np.array_equal(ids, i2) and np.array_equal(tfs, t2) and np.array_equal(dls, d2)

    # block skipping with byte offsets
    nb = len(enc["block_lens"])
    keep = rng.rand(nb) < 0.5
    i3, t3, d3 = decode_postings(
        enc["ids_blob"], enc["tfs_blob"], enc["dls_blob"],
        enc["block_firsts"], enc["block_lens"],
        keep, enc["ids_offs"], enc["tfs_offs"], enc["dls_offs"],
    )
    mask = np.repeat(keep, np.asarray(enc["block_lens"]))
    assert np.array_equal(i3, ids[mask]) and np.array_equal(t3, tfs[mask]) and np.array_equal(d3, dls[mask])

    # salted-chunk merge == whole-list encode (decoded equality)
    if n > 4:
        cut = sorted(rng.choice(np.arange(1, n), size=min(3, n - 1), replace=False))
        parts = np.split(np.arange(n), cut)
    else:
        parts = [np.arange(n)]
    chunks = [
        {k: v for k, v in encode_postings(ids[p], tfs[p], dls[p], block_size=64).items()}
        for p in parts
        if len(p)
    ]
    # rename to merge input keys
    chunks = [
        {
            "ids_blob": c["ids_blob"], "tfs_blob": c["tfs_blob"], "dls_blob": c["dls_blob"],
            "block_firsts": c["block_firsts"], "block_lens": c["block_lens"],
            "ids_offs": c["ids_offs"], "tfs_offs": c["tfs_offs"], "dls_offs": c["dls_offs"],
        }
        for c in chunks
    ]
    m = merge_encoded_chunks(chunks)
    i4, t4, d4 = decode_postings(
        m["ids_blob"], m["tfs_blob"], m["dls_blob"], m["block_firsts"], m["block_lens"]
    )
    assert np.array_equal(ids, i4) and np.array_equal(tfs, t4) and np.array_equal(d4, dls)


def test_empty():
    enc = encode_postings(np.empty(0, np.int64), np.empty(0, np.int64), np.empty(0, np.int64))
    i, t, d = decode_postings(
        enc["ids_blob"], enc["tfs_blob"], enc["dls_blob"], enc["block_firsts"], enc["block_lens"]
    )
    assert i.size == t.size == d.size == 0
