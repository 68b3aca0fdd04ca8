"""admarus_spark — a PySpark-native inverted-index + BM25 search engine.

A from-scratch reimplementation of the indexing / query semantics of
Mubelotix/admarus (a Rust p2p IPFS search engine), re-expressed as an
idiomatic Spark DataFrame pipeline:

- tokenizer parity with ``daemon/src/documents.rs:48-52`` (lowercase,
  split on non-ASCII-alphanumeric, keep tokens of length >= 3),
- query AST / grammar parity with ``daemon/src/query/query.pest`` and
  ``daemon/src/query/parsing.rs`` (AND/OR/NOT/n-of-m/key=value,
  bare multi-word = OR),
- candidate generation per ``daemon/src/query/matching.rs:70-84``,
- boolean gate semantics per ``daemon/src/query/matching.rs:43-66``,
- ranking by pinned BM25 (k1=1.2, b=0.75, idf=ln(1+(N-df+.5)/(df+.5)))
  with an n-of-m fold (NAmong -> mean of top-n matched child scores),
  tie-break (score desc, doc_id asc) — see SURVEY.md §7.3.

The execution engine is Spark DataFrames end-to-end; all custom logic
lives in vectorized pandas/Arrow UDFs (no per-row Python).
"""

__version__ = "0.1.0"

BM25_K1 = 1.2
BM25_B = 0.75
BLOCK_SIZE = 128          # docs per posting block (block-max granularity)
FILTER_BITS = 1_000_000   # reference bloom size: daemon/src/node.rs:3 (125000 bytes * 8)
