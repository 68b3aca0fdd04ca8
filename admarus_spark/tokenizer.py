"""Tokenizer with exact parity to the reference.

Reference rule (``/root/reference/daemon/src/documents.rs:48-52``, restated at
``:134``, ``:231-234`` and ``webui/src/result/scores.rs:38-43``)::

    text.to_lowercase()
        .split(|c: char| !c.is_ascii_alphanumeric())
        .filter(|w| w.len() >= 3)

i.e. lowercase the whole text, split on every char that is NOT ASCII
``[0-9a-z]`` (after lowercasing, ASCII uppercase is gone), keep tokens of
length >= 3, KEEP duplicates (term frequency comes from repetition).

Two implementations that must agree exactly:

- :func:`tokenize` — pure Python, used by the NumPy oracle.
- :func:`tokenize_series` — vectorized pandas implementation used inside the
  Spark ``pandas_udf`` (Arrow-batched; no per-row Python).

The equivalent ANSI-SQL (DuckDB oracle) expression is
``list_filter(regexp_split_to_array(lower(text), '[^0-9a-z]+'), t -> length(t) >= 3)``.
"""

from __future__ import annotations

import re

import pandas as pd

TOKEN_SPLIT_RE = re.compile(r"[^0-9a-z]+")
MIN_TOKEN_LEN = 3

# DuckDB SQL fragment producing the token array for a text column — the ONE
# definition every oracle formats (CLAUDE.md parity rule; the Spark side
# tokenizes via make_tokenize_udf, never via a SQL twin that could drift).
DUCKDB_TOKENS_EXPR = (
    "list_filter(regexp_split_to_array(lower({col}), '[^0-9a-z]+'),"
    " t -> length(t) >= 3)"
)


def tokenize(text: str) -> list[str]:
    """Reference-parity tokenizer (pure Python; oracle side)."""
    return [t for t in TOKEN_SPLIT_RE.split(text.lower()) if len(t) >= MIN_TOKEN_LEN]


TOKEN_RUN_RE = re.compile(r"[0-9a-z]{3,}")


def tokenize_series(texts: pd.Series) -> pd.Series:
    """Vectorized tokenizer over a pandas Series of strings.

    Returns a Series of ``list[str]``. Used inside the Spark pandas UDF.
    Implementation note: a maximal ``[0-9a-z]`` run survives the reference's
    split-then-filter rule iff its length is >= 3, so ``findall`` of
    ``[0-9a-z]{3,}`` (greedy => maximal runs) is exactly equivalent to
    split-on-non-alnum + length filter — and avoids materializing the
    dropped short tokens (pandas C string machinery, no per-row Python).
    """
    return texts.fillna("").str.lower().str.findall(TOKEN_RUN_RE)


def make_tokenize_udf():
    """Build the Spark pandas UDF lazily (keeps pyspark import optional)."""
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    @F.pandas_udf(T.ArrayType(T.StringType()))
    def tokenize_udf(texts: pd.Series) -> pd.Series:
        return tokenize_series(texts)

    return tokenize_udf


def tokenize_expr(col):
    """Pure-Catalyst tokenizer Column (r6): the same split-on-non-[0-9a-z] +
    length>=3 rule as ``tokenize``, expressed with built-ins so tokenize-heavy
    query paths stay inside whole-stage codegen — no ArrowEvalPython node, no
    JVM<->Python transfer of the text and token arrays (guide §4.1; measured
    15-25% faster than the pandas UDF on the tf/df/shingle shapes at sf1.0,
    OPTIMIZATION_r06.md).

    Parity notes: Java regex ``[^0-9a-z]+`` and RE2/Python agree on this
    spelled-out class (no ``\\s``-style class differences); leading/trailing
    empty split tokens fall to the length filter on both engines; ``lower``
    differences across engines can only matter if a non-ASCII char lowercases
    INTO [0-9a-z], and the mixed-script cases (İ→i+combining dot, K→k) agree
    between java.lang.String, Python str.lower and DuckDB — pinned by
    tests/test_tokenizer.py::test_catalyst_expr_matches_python_tokenize.
    NULL text yields [] (the pandas UDF's fillna behaviour), so size()/
    explode_outer shapes stay identical on null-bearing corpora.

    The index build keeps the vectorized pandas path: its fused
    tokenize+tf-upsert (`build._tokenize_tf_map`) computes per-doc tf inside
    the Arrow batch with no explode/groupBy at all, which beats both
    expression forms for that shape."""
    from pyspark.sql import functions as F

    toks = F.filter(
        F.split(F.lower(col), "[^0-9a-z]+"),
        lambda t: F.length(t) >= MIN_TOKEN_LEN,
    )
    return F.coalesce(toks, F.array().cast("array<string>"))
