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


def test_catalyst_expr_matches_python_tokenize(spark):
    """The r6 pure-Catalyst tokenizer (tokenize_expr) must agree with the
    Python reference on the goldens, the unicode-lowercase cases and NULL
    (the pandas UDF's fillna semantics: null text -> [])."""
    from pyspark.sql import functions as F

    from admarus_spark.tokenizer import tokenize_expr

    texts = list(CASES) + ["ÉTÉ abcÉdef", "İstanbul KELVİN K abc", None]
    want = [tokenize(t) if t is not None else [] for t in texts]
    df = spark.createDataFrame([(t,) for t in texts], "t string")
    got = [r[0] for r in df.select(tokenize_expr(F.col("t"))).collect()]
    assert got == want


def test_duckdb_expr_matches_python_tokenize_property():
    """The DuckDB oracle fragment (DUCKDB_TOKENS_EXPR — the ONE SQL
    definition every oracle formats) must agree with the Python reference
    tokenizer on adversarial inputs: unicode case folds, the \x0B vertical
    tab (inside Java's \\s but not RE2's — the class is spelled out for
    exactly this reason), digits-only runs, and long separator runs."""
    import duckdb
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from admarus_spark.tokenizer import DUCKDB_TOKENS_EXPR

    con = duckdb.connect()
    expr = DUCKDB_TOKENS_EXPR.format(col="t")

    alphabet = st.sampled_from(
        list("abcXYZ019_-./:(),!") + ["\x0b", "\t", "\n", " ", "é", "É", "ß", "中"]
    )
    texts = st.lists(alphabet, min_size=0, max_size=40).map("".join)

    @settings(max_examples=300, deadline=None)
    @given(texts)
    def check(text):
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [text]).fetchone()[0]
        assert got == tokenize(text), repr(text)

    check()
    for text in CASES:
        got = con.execute(f"SELECT {expr} FROM (SELECT ? AS t)", [text]).fetchone()[0]
        assert got == tokenize(text), repr(text)
