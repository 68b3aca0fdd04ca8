#!/usr/bin/env python
"""A/B the stage-2 tid-dictionary shuffle vs the legacy string shuffle.

Builds the same corpus twice per parallelism level — once with the tid
dictionary (default) and once with `SPARK_GRAFT_S2_MAX_DICT_TERMS=0`
(string fallback) — in separate JVMs, and reports stage-2 wall seconds.
Evidence for the r5 claim that shuffling fixed-width (tid, doc_id, meta)
rows instead of UTF-8 term strings cuts the bandwidth-bound stage.

Usage: python BENCH/tid_ab.py [n_docs]   (default 200000)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

# python BENCH/tid_ab.py puts BENCH/ (the script dir) on sys.path, not the
# repo root — add it so the worker subprocess can import admarus_spark
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = (
    int(sys.argv[1])
    if len(sys.argv) > 1 and sys.argv[1] != "--worker"
    else int(os.environ.get("TID_AB_DOCS", "200000"))
)


def worker(cpus: int, tid: bool) -> None:
    import shutil

    from admarus_spark.index.build import IndexBuilder
    from admarus_spark.session import get_spark

    spark = get_spark(app_name=f"tid_ab_{cpus}_{tid}", master=f"local[{cpus}]")
    n = spark.sparkContext.defaultParallelism

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        time.sleep(2.0)
        yield from batches

    spark.range(0, n, 1, n).mapInPandas(_warm, "id long").count()
    corpus = os.environ["SPARK_GRAFT_SCALE_CORPUS"]
    docs = spark.read.parquet(corpus).limit(N_DOCS)
    idx = f"/tmp/tid_ab_idx_{cpus}"
    shutil.rmtree(idx, ignore_errors=True)
    b = IndexBuilder(spark, idx, n_buckets=32, salt_chunks=8)
    b.build(docs, input_token=f"ab:{cpus}:{tid}:{time.time()}", resume=False)
    s2 = b.metrics["stage2_postings"]
    print(json.dumps({
        "cpus": cpus, "tid": s2.get("tid_dict"), "s2_sec": s2["seconds"],
        "dict_sec": s2.get("dict_sec"), "n_vocab": s2.get("n_vocab"),
        "shuffle_write_bytes": s2.get("shuffle_write_bytes"),
    }), flush=True)


def run(cpus: int, tid: bool) -> dict:
    env = dict(os.environ)
    env["SPARK_GRAFT_SCALE_CORPUS"] = os.environ.get(
        "SPARK_GRAFT_SCALE_CORPUS", "/tmp/admarus_scale_corpus_v200000.parquet"
    )
    if not tid:
        env["SPARK_GRAFT_S2_MAX_DICT_TERMS"] = "0"
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--worker", str(cpus), str(int(tid))],
        capture_output=True, text=True, check=True, env=env,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    return json.loads(out.stdout.strip().splitlines()[-1])


if __name__ == "__main__":
    if len(sys.argv) > 3 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]), bool(int(sys.argv[3])))
    else:
        rounds = int(os.environ.get("TID_AB_ROUNDS", "2"))
        res: dict[str, list] = {}
        sbytes: dict[str, int] = {}
        for _ in range(rounds):
            for cpus in (1, 4):
                for tid in (True, False):
                    r = run(cpus, tid)
                    key = f"local{cpus}_{'tid' if tid else 'str'}"
                    res.setdefault(key, []).append(r["s2_sec"])
                    if r.get("shuffle_write_bytes"):
                        sbytes[key] = r["shuffle_write_bytes"]
        report = {
            "n_docs": N_DOCS,
            "s2_sec_all": {k: [round(x, 2) for x in v] for k, v in res.items()},
            "s2_sec_min": {k: round(min(v), 2) for k, v in res.items()},
            # deterministic per variant (same rows either way) — the direct
            # evidence that the tid swap cuts exchange volume
            "shuffle_write_bytes": sbytes,
        }
        print(json.dumps(report, indent=2))
        with open("BENCH/TID_AB.json", "w") as f:
            json.dump(report, f, indent=2)
