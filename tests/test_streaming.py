"""Structured Streaming surface: readStream over a doc drop-directory ->
foreachBatch(IncrementalIndexer.update) — the streaming twin of the
reference's periodic re-crawl (daemon/src/index/mod.rs:7-8)."""

import json
import os

from admarus_spark.corpus import make_docs_corpus
from admarus_spark.index.build import IndexBuilder
from admarus_spark.search.engine import SearchEngine
from admarus_spark.streaming.incremental import IncrementalIndexer

DOCS_SCHEMA = "repo string, path string, commit string, lang string, content string, content_sha256 string"


def test_streaming_ingest(spark, tmp_path):
    base = make_docs_corpus(150, seed=1)
    idx = str(tmp_path / "idx_stream")
    IndexBuilder(spark, idx, n_buckets=4, salt_chunks=2).build(
        spark.createDataFrame(base), input_token="stream-base"
    )

    drop_dir = tmp_path / "drops"
    drop_dir.mkdir()
    extra = make_docs_corpus(60, seed=2)
    extra["path"] = extra["path"].str.replace("src/", "landed/", regex=False)
    half = len(extra) // 2
    for i, chunk in enumerate((extra.iloc[:half], extra.iloc[half:])):
        with open(drop_dir / f"batch{i}.json", "w") as f:
            for _, row in chunk.iterrows():
                f.write(json.dumps(dict(row)) + "\n")

    inc = IncrementalIndexer(spark, idx)
    stream = spark.readStream.schema(DOCS_SCHEMA).json(str(drop_dir))
    q = (
        stream.writeStream.foreachBatch(inc.foreach_batch_handler())
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    eng = SearchEngine(spark, idx)
    assert eng.n_docs == len(base) + len(extra)
    res = eng.search("license", 10**6).collect()
    assert any(r["path"].startswith("landed/") for r in res)
