#!/usr/bin/env python
"""spark-submit entry: the crawl-loop tick — absorb a delta of documents
into an existing index via the O(delta) generational append, optionally
folding debt with a compaction.

    spark-submit --py-files admarus_spark.zip jobs/ingest.py \
        --delta /data/delta_parquet --index /data/index \
        [--token crawl-2026-08-18] [--compact] \
        [--auto-compact-frac 0.1] [--auto-compact-gens 16]

Semantics (streaming/incremental.py): rows are deduped against the live
dictionary on (repo, path); changed content re-indexes as a NEW document
and tombstones the old id (tombstone-first — crash-safe); new postings
APPEND as a generation (no old bucket read or rewritten). --compact (or
the auto knobs) folds generations and purges tombstones, re-enabling
block-max pruning. Re-running with an already-applied delta is a no-op.

The batch twin of the reference daemon's 100-second re-crawl loop
(daemon/src/index/index.rs:36-131); for a continuous source use
``streaming.incremental.foreach_batch_handler`` with readStream.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--delta", required=True, help="delta docs parquet/table path")
    ap.add_argument("--index", required=True, help="existing index directory")
    ap.add_argument("--token", default="delta", help="input snapshot token")
    ap.add_argument("--compact", action="store_true", help="compact after the update")
    ap.add_argument("--auto-compact-frac", type=float, default=None,
                    help="compact when tombstones exceed this fraction of the corpus")
    ap.add_argument("--auto-compact-gens", type=int, default=None,
                    help="compact when this many generational appends are pending")
    args = ap.parse_args()

    from admarus_spark.session import get_spark
    from admarus_spark.streaming.incremental import IncrementalIndexer

    spark = get_spark(app_name="admarus-ingest")
    inc = IncrementalIndexer(
        spark,
        args.index,
        auto_compact_frac=args.auto_compact_frac,
        auto_compact_gens=args.auto_compact_gens,
    )
    out = inc.update(spark.read.parquet(args.delta), input_token=args.token)
    if args.compact and "compaction" not in out:
        out["compaction"] = inc.compact()
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
