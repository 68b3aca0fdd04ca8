#!/usr/bin/env python
"""Scaling-efficiency evidence (north rule: >= 0.8 from N to 4N executors).

No real multi-executor cluster exists in this sandbox, so per the driver's
instruction the same job runs at two parallelism levels — local[8] (N) and
local[32] (4N) — in separate JVMs on the same input, and we report both
throughputs plus ``efficiency = (throughput_32 / throughput_8) / 4``.

Usage:
    python scale_bench.py                 # parent: runs both, writes BENCH/
    python scale_bench.py --worker 8      # one measurement (internal)
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

CORPUS_PARQUET = os.environ.get("SPARK_GRAFT_SCALE_CORPUS", "/tmp/admarus_scale_corpus.parquet")
N_DOCS = int(os.environ.get("SPARK_GRAFT_SCALE_DOCS", "800000"))
QUERY_BATCH = [
    "license", "parser AND lexer", "bloom / sketch / minhash", "2(posting, inverted, bm25)",
    "compiler AND NOT kernel", "lang=python AND shuffle", "retrieval ranking relevance",
    "checksum digest cipher", "partition AND shuffle", "hashmap AND btree",
]


def ensure_corpus() -> None:
    if os.path.exists(CORPUS_PARQUET):
        return
    import pyarrow as pa
    import pyarrow.parquet as pq

    from admarus_spark.corpus import make_bench_corpus

    pdf = make_bench_corpus(N_DOCS)
    # small row groups -> the single file is splittable across many tasks
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False), CORPUS_PARQUET, row_group_size=2048
    )


def worker(cpus: int) -> None:
    from admarus_spark.index.build import IndexBuilder
    from admarus_spark.search.engine import SearchEngine
    from admarus_spark.session import get_spark

    spark = get_spark(app_name=f"admarus_scale_{cpus}", master=f"local[{cpus}]")
    # Warmup, never timed: (a) spawn + prime ALL Python workers concurrently
    # (each fresh worker pays multi-second pandas/numpy imports — production
    # executors are warm, and cold-start is not what the N->4N scaling
    # criterion measures); (b) one small build to compile codegen plans.
    n = spark.sparkContext.defaultParallelism

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        time.sleep(2.0)
        yield from batches

    spark.range(0, n, 1, n).mapInPandas(_warm, "id long").count()
    docs = spark.read.parquet(CORPUS_PARQUET)
    widx = f"/tmp/admarus_scale_warm_{cpus}"
    shutil.rmtree(widx, ignore_errors=True)
    IndexBuilder(spark, widx, n_buckets=8, salt_chunks=2).build(
        docs.limit(2000), input_token=f"warm:{cpus}:{time.time()}", resume=False
    )
    shutil.rmtree(widx, ignore_errors=True)
    idx = f"/tmp/admarus_scale_idx_{cpus}"
    shutil.rmtree(idx, ignore_errors=True)
    t0 = time.time()
    b = IndexBuilder(spark, idx, n_buckets=32, salt_chunks=8)
    b.build(docs, input_token=f"scale:{cpus}:{time.time()}", resume=False)
    build_sec = time.time() - t0
    eng = SearchEngine(spark, idx)
    eng.search("license", 10).collect()  # engine warmup (summaries, plans)
    qmap = {f"q{i}": q for i, q in enumerate(QUERY_BATCH)}
    eng.search_many(qmap, 10).collect()  # plan warmup
    t0 = time.time()
    eng.search_many(qmap, 10).collect()
    query_sec = time.time() - t0
    stats = b.metrics["stage1_tokenize"]
    print(
        json.dumps(
            {
                "cpus": cpus,
                "build_sec": build_sec,
                "query_sec": query_sec,
                "n_docs": stats["n_docs"],
                "total_tokens": stats["total_tokens"],
            }
        )
    )


def run_worker(cpus: int) -> dict:
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
        capture_output=True, text=True, check=True, cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> None:
    """Interleave 8/32 measurements and take the per-level MIN: environmental
    noise on this shared VM is strictly one-sided (host contention only adds
    time), so min-of-N is the unbiased estimator of the job's true cost."""
    ensure_corpus()
    rounds = int(os.environ.get("SPARK_GRAFT_SCALE_ROUNDS", "3"))
    runs8, runs32 = [], []
    for _ in range(rounds):
        runs8.append(run_worker(8))
        runs32.append(run_worker(32))
    r8 = min(runs8, key=lambda r: r["build_sec"])
    r32 = min(runs32, key=lambda r: r["build_sec"])
    r8["query_sec"] = min(r["query_sec"] for r in runs8)
    r32["query_sec"] = min(r["query_sec"] for r in runs32)
    thr8 = r8["n_docs"] / r8["build_sec"]
    thr32 = r32["n_docs"] / r32["build_sec"]
    eff_build = (thr32 / thr8) / 4.0
    q8 = len(QUERY_BATCH) / r8["query_sec"]
    q32 = len(QUERY_BATCH) / r32["query_sec"]
    eff_query = (q32 / q8) / 4.0
    report = {
        "rounds": rounds,
        "all_build_secs": {"local8": [round(r["build_sec"], 2) for r in runs8],
                            "local32": [round(r["build_sec"], 2) for r in runs32]},
        "n_docs": r8["n_docs"],
        "total_tokens": r8["total_tokens"],
        "build": {
            "local8_sec": round(r8["build_sec"], 2),
            "local32_sec": round(r32["build_sec"], 2),
            "local8_docs_per_sec": round(thr8, 1),
            "local32_docs_per_sec": round(thr32, 1),
            "scaling_efficiency_8_to_32": round(eff_build, 3),
        },
        "query_batch": {
            "local8_sec": round(r8["query_sec"], 2),
            "local32_sec": round(r32["query_sec"], 2),
            "local8_qps": round(q8, 2),
            "local32_qps": round(q32, 2),
            "scaling_efficiency_8_to_32": round(eff_query, 3),
        },
    }
    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/SCALING.json", "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
