"""Pre-r2 index layouts (no per-block ``block_lasts`` id bounds) must still
answer every query shape exactly — the engine's pruning layers each fall
back (decode-all-blocks, no conjunctive id bounds, no driver BMW masks)
rather than referencing the missing column (r5 review #2: _collect_block_meta
selected block_lasts unconditionally and raised AnalysisException on any
multi-term max-fold query against a legacy index)."""

import shutil

import pytest
from pyspark.sql import functions as F

from admarus_spark.corpus import make_docs_corpus
from admarus_spark.index.build import IndexBuilder
from admarus_spark.oracle import OracleIndex
from admarus_spark.search.engine import SearchEngine

QUERIES = [
    "license",
    "parser lexer bloom",          # max fold -> BMW mask path when wand auto
    "parser AND lexer",            # conjunctive id-bounds path
    "2(parser, lexer, bloom)",     # n-of-m pigeonhole path
    "parser AND NOT bloom",
]


@pytest.fixture(scope="module")
def legacy_idx(spark, tmp_path_factory):
    docs = make_docs_corpus(150, seed=33)
    d = str(tmp_path_factory.mktemp("idx_legacy_post"))
    IndexBuilder(spark, d, n_buckets=4, salt_chunks=2).build(
        spark.createDataFrame(docs), input_token="legacy"
    )
    # strip the r2 column the way a pre-r2 index simply never had it
    post = spark.read.parquet(f"{d}/postings").drop("block_lasts")
    nxt = f"{d}/postings_legacy"
    post.write.mode("overwrite").partitionBy("tb").parquet(nxt)
    shutil.rmtree(f"{d}/postings")
    shutil.move(nxt, f"{d}/postings")
    return d, docs


def test_legacy_index_queries_are_exact(spark, legacy_idx):
    d, docs = legacy_idx
    eng = SearchEngine(spark, d)
    assert eng.wand_safe is True  # stats carry bm_avgdl: BMW WOULD be tried
    oracle = OracleIndex(docs)
    opaths = {i: p for i, p in enumerate(oracle.docs["path"])}
    for q in QUERIES:
        got = sorted((r["path"], r["score"]) for r in eng.search(q, 10**6).collect())
        want = sorted((opaths[i], s) for i, s in oracle.search(q, 10**6))
        assert got == want, q


def test_legacy_index_batched_queries_are_exact(spark, legacy_idx):
    d, docs = legacy_idx
    eng = SearchEngine(spark, d)
    oracle = OracleIndex(docs)
    opaths = {i: p for i, p in enumerate(oracle.docs["path"])}
    qmap = {f"q{i}": q for i, q in enumerate(QUERIES)}
    rows = eng.search_many(qmap, k=10).collect()
    for i, q in enumerate(QUERIES):
        got = sorted(
            (r["path"], r["score"]) for r in rows if r["query_id"] == f"q{i}"
        )
        want = sorted((opaths[di], s) for di, s in oracle.search(q, 10))
        assert got == want, q
