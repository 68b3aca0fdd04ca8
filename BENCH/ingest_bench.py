#!/usr/bin/env python
"""Incremental-ingest throughput ladder -> BENCH/INGEST.json.

Measures the steady-state crawl-loop regime the reference runs in
(daemon/src/index/mod.rs update loop — its README quotes 11 docs/sec for
exactly this): an existing big index absorbs a delta of changed + new
documents via ``IncrementalIndexer.update()``, then clears the tombstone
debt with ``compact()``.

Each sample copies the persisted 800k-doc ladder index
(/tmp/admarus_scale_idx_{cpus}, left by scale_bench build workers) to a
scratch dir, ingests a delta of SPARK_GRAFT_INGEST_DOCS docs (default
8000 = 1%: half changed content on existing (repo, path) keys — the
update tombstones the old generation and re-indexes under a new doc_id —
half brand-new paths), and times update() and compact() separately.
Levels are interleaved per round and each level reports its MIN
(one-sided host noise, same methodology as SCALING.json); every sample
is committed. The copy, session startup and worker warmup are never
timed.

Usage: python BENCH/ingest_bench.py            (rounds x levels, artifact)
       python BENCH/ingest_bench.py --worker 4 (one sample, JSON line)
"""
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

ROUNDS = int(os.environ.get("INGEST_ROUNDS", "2"))
LEVELS = [int(c) for c in os.environ.get("INGEST_LEVELS", "1,4").split(",")]
N_DELTA = int(os.environ.get("SPARK_GRAFT_INGEST_DOCS", "8000"))
VOCAB = int(os.environ.get("SPARK_GRAFT_SCALE_VOCAB", "200000"))
OUT_JSON = os.environ.get("INGEST_OUT", os.path.join(REPO, "BENCH", "INGEST.json"))
# keyed by delta size AND vocab: resuming must not mix samples taken
# against differently-shaped corpora into the per-level MIN aggregates
OUT_JSONL = os.environ.get("INGEST_JSONL", f"/tmp/ingest_n{N_DELTA}_v{VOCAB}.jsonl")


def worker(cpus: int) -> None:
    import pandas as pd

    from admarus_spark.corpus import make_bench_corpus
    from admarus_spark.session import get_spark
    from admarus_spark.streaming.incremental import IncrementalIndexer

    src = f"/tmp/admarus_scale_idx_{cpus}"
    if not os.path.isdir(src):
        raise SystemExit(f"{src} missing — run scale_bench.py first")
    idx = f"/tmp/admarus_ingest_idx_{cpus}"
    shutil.rmtree(idx, ignore_errors=True)
    shutil.copytree(src, idx)

    spark = get_spark(app_name=f"admarus_ingest_{cpus}", master=f"local[{cpus}]")
    n = spark.sparkContext.defaultParallelism

    def _warm(batches):
        import numpy  # noqa: F401
        import pandas  # noqa: F401

        time.sleep(2.0)
        yield from batches

    spark.range(0, n, 1, n).mapInPandas(_warm, "id long").count()

    # Delta: half CHANGED (same (repo, path) keys as the main corpus's
    # chunk 0 — make_bench_corpus repeats the per-chunk key formula, the
    # c0/ prefix matches scale_bench.ensure_corpus — with different-seed
    # content, so update() tombstones the old generation), half NEW paths.
    half = N_DELTA // 2
    changed = make_bench_corpus(half, seed=999, vocab_size=VOCAB or None)
    changed["path"] = "c0/" + changed["path"]
    fresh = make_bench_corpus(N_DELTA - half, seed=1001, vocab_size=VOCAB or None)
    fresh["path"] = "delta0/" + fresh["path"]
    delta_pdf = pd.concat([changed, fresh], ignore_index=True)

    inc = IncrementalIndexer(spark, idx)
    # Plan/codegen warmup on a 64-doc slice of new paths the timed delta
    # does not touch (steady-state loops run warm; the first update in a
    # JVM pays one-time py4j/codegen costs that are not ingest throughput).
    warm_pdf = make_bench_corpus(64, seed=2002, vocab_size=VOCAB or None)
    warm_pdf["path"] = "warm0/" + warm_pdf["path"]
    inc.update(spark.createDataFrame(warm_pdf), input_token=f"warm:{cpus}")

    delta = spark.createDataFrame(delta_pdf)
    t0 = time.time()
    m = inc.update(delta, input_token=f"ingest:{cpus}")
    update_sec = time.time() - t0

    t0 = time.time()
    c = inc.compact()
    compact_sec = time.time() - t0
    spark.stop()

    line = json.dumps(
        {
            "cpus": cpus,
            "n_delta": N_DELTA,
            "rows_new": m["rows_new"],
            "rows_changed": m["rows_changed"],
            "update_sec": round(update_sec, 2),
            "ingest_docs_per_sec": round(N_DELTA / update_sec, 1),
            "compact_sec": round(compact_sec, 2),
            "dead_compacted": c.get("dead"),
        }
    )
    sys.stdout.flush()
    print(line, flush=True)


def main() -> None:
    samples = []
    if os.path.exists(OUT_JSONL):
        with open(OUT_JSONL) as f:
            samples = [json.loads(l) for l in f if l.strip()]
        print(f"resuming with {len(samples)} prior samples", flush=True)
    total = ROUNDS * len(LEVELS)
    # resume by per-level sample count (not list position): prior runs with
    # different LEVELS/ROUNDS must only satisfy cells they actually measured
    prior: dict = {}
    for s in samples:
        prior[s["cpus"]] = prior.get(s["cpus"], 0) + 1
    consumed: dict = {}
    with open(OUT_JSONL, "a") as sink:
        for r in range(ROUNDS):
            for cpus in LEVELS:
                if consumed.get(cpus, 0) < prior.get(cpus, 0):
                    consumed[cpus] = consumed.get(cpus, 0) + 1
                    continue
                out = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--worker", str(cpus)],
                    capture_output=True, text=True, cwd=REPO,
                )
                if out.returncode != 0:
                    print(out.stderr[-3000:], flush=True)
                    raise SystemExit(f"worker failed: cpus={cpus}")
                line = out.stdout.strip().splitlines()[-1]
                rec = json.loads(line)
                samples.append(rec)
                sink.write(line + "\n")
                sink.flush()
                print(f"[{len(samples)}/{total}] {rec}", flush=True)

    best = {}
    for cpus in LEVELS:
        cell = [s for s in samples if s["cpus"] == cpus]
        if cell:
            best[cpus] = min(cell, key=lambda s: s["update_sec"])
    eff = None
    if 1 in best and 4 in best:
        eff = round(best[1]["update_sec"] / best[4]["update_sec"] / 4, 3)
    report = {
        "n_delta": N_DELTA,
        "base_index": "800k docs / 200k-term realistic vocab (same as SCALING.json)",
        "note": (
            "incremental crawl-loop ingest: update() absorbs a 1% delta "
            "(half changed content -> tombstone + new generation, half new "
            "paths), compact() then clears the tombstone debt. Min per "
            "level over interleaved rounds; copy/startup/warmup untimed."
        ),
        "samples": samples,
        "min_update_sec": {f"local{c}": best[c]["update_sec"] for c in best},
        "ingest_docs_per_sec": {
            f"local{c}": best[c]["ingest_docs_per_sec"] for c in best
        },
        "min_compact_sec": {
            f"local{c}": min(s["compact_sec"] for s in samples if s["cpus"] == c)
            for c in best
        },
        "update_1_to_4_efficiency": eff,
    }
    with open(OUT_JSON, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps({k: report[k] for k in
                      ("min_update_sec", "ingest_docs_per_sec",
                       "min_compact_sec", "update_1_to_4_efficiency")}, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 2 and sys.argv[1] == "--worker":
        worker(int(sys.argv[2]))
    else:
        main()
