#!/usr/bin/env python
"""spark-submit entry: run queries against a built index.

    spark-submit --py-files admarus_spark.zip jobs/search.py \
        --index /data/index --query "rust AND NOT windows" [--k 10]
    spark-submit ... jobs/search.py --index /data/index \
        --queries-json '{"q1": "license", "q2": "parser lexer"}'   # batched
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", default=None)
    ap.add_argument("--queries-json", default=None, help="batched: {id: query}")
    ap.add_argument("--k", type=int, default=10)
    args = ap.parse_args()

    from admarus_spark.search.engine import SearchEngine
    from admarus_spark.session import get_spark

    spark = get_spark(app_name="admarus-search")
    eng = SearchEngine(spark, args.index)
    if args.queries_json:
        df = eng.search_many(json.loads(args.queries_json), k=args.k)
    elif args.query:
        df = eng.search(args.query, k=args.k)
    else:
        ap.error("--query or --queries-json required")
        return
    for row in df.collect():
        print(json.dumps(row.asDict(), default=str))


if __name__ == "__main__":
    main()
