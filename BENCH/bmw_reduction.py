#!/usr/bin/env python
"""Measure cross-term BMW decode pruning on a realistic-vocab index.

Prints one JSON line per query: blocks kept / total under the shared global
threshold (exact — the keep masks are computed driver-side), plus a parity
check that the pruned top-k equals the wand=off top-k. Run against a 200k+
doc index built from the scale corpus (see CLAUDE.md bench notes).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

IDX = sys.argv[1] if len(sys.argv) > 1 else "/tmp/prof_idx_1"
QUERIES = [
    "bloom / sketch / minhash",
    "parser lexer bloom",
    "retrieval ranking relevance",
    "partition shuffle executor",
    "license compiler",
]


def main() -> None:
    from admarus_spark.search.engine import SearchEngine
    from admarus_spark.session import get_spark

    spark = get_spark(app_name="bmw_reduction", master="local[8]")
    eng = SearchEngine(spark, IDX)
    for q in QUERIES:
        pruned = [
            (r["doc_id"], r["score"]) for r in eng.search(q, 10).collect()
        ]
        stats = dict(eng.last_bmw or {})
        full = [
            (r["doc_id"], r["score"]) for r in eng.search(q, 10, wand="off").collect()
        ]
        stats.update(
            {
                "query": q,
                "match": pruned == full,
                "reduction_pct": (
                    round(100.0 * (1 - stats["blocks_kept"] / stats["blocks_total"]), 1)
                    if stats.get("blocks_total")
                    else None
                ),
            }
        )
        print(json.dumps(stats), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
