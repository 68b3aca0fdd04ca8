"""Tokenizer parity goldens (daemon/src/documents.rs:48-52 semantics)."""

import pandas as pd

from admarus_spark.tokenizer import tokenize, tokenize_series

CASES = {
    "Hello, World!": ["hello", "world"],
    "a of if to": [],  # all len<3 dropped
    "the-quick_brown fox123": ["the", "quick", "brown", "fox123"],
    "CamelCase XMLHttpRequest": ["camelcase", "xmlhttprequest"],
    "été naïve café": ["caf"],  # non-ASCII letters are separators; 'caf' survives
    "x42 123 12": ["x42", "123"],
    "foo::bar(baz, qux)": ["foo", "bar", "baz", "qux"],
    "": [],
    "ab": [],
    "abc": ["abc"],
    "AAA\nBBB\tccc": ["aaa", "bbb", "ccc"],
    "dup dup dup": ["dup", "dup", "dup"],  # duplicates kept (tf by repetition)
}


def test_goldens():
    for text, want in CASES.items():
        assert tokenize(text) == want, text


def test_series_parity():
    texts = list(CASES) + [None]
    got = tokenize_series(pd.Series(texts, dtype=object)).tolist()
    want = [tokenize(t) for t in CASES] + [[]]
    assert got == want


def test_unicode_lowercase_then_ascii_split():
    # uppercase non-ASCII lowercases first, stays non-alnum ASCII, splits
    assert tokenize("ÉTÉ abcÉdef") == ["abc", "def"]
