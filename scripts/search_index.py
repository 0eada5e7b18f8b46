#!/usr/bin/env python
"""Cluster query entry point.

    spark-submit --py-files ferret_spark.zip scripts/search_index.py \
        --index <index path> --query 'bm25 AND "inverted index"~2' \
        [--k 10] [--similarity bm25|tfidf] [--sort "n_chars DESC"] \
        [--analyzer standard]
"""

from __future__ import annotations

import os
import sys

# local runs without --py-files: resolve the package from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import argparse
import json
import sys
import time


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--index", required=True)
    ap.add_argument("--query", required=True, help="FQL query string")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--similarity", default="bm25")
    ap.add_argument("--sort", default=None, help='e.g. "n_chars DESC, SCORE"')
    ap.add_argument("--analyzer", default=None)
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("ferret-search").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    from ferret_spark.parser import QueryParser
    from ferret_spark.segments import SegmentIndex

    idx = SegmentIndex.load(spark, args.index)
    tokenized = [f for f, a in idx.field_config.items() if a != "keyword"]
    p = QueryParser(
        default_field=tokenized[0] if tokenized else "content",
        fields=list(idx.field_config),
        tokenized_fields=tokenized,
        analyzer=args.analyzer
        or (idx.field_config.get(tokenized[0], "standard") if tokenized else "standard"),
    )
    q = p.parse(args.query)
    if q is None:
        print(json.dumps({"hits": [], "parsed": None}))
        return 0
    t0 = time.time()
    if args.sort:
        from ferret_spark.sorting import search_sorted

        rows = search_sorted(idx, q, args.sort, k=args.k).collect()
    else:
        rows = idx.search(q, k=args.k, similarity=args.similarity).collect()
    from ferret_spark.parser import to_s

    print(
        json.dumps(
            {
                "parsed": to_s(q, p.default_field),
                "latency_ms": round((time.time() - t0) * 1000, 1),
                "hits": [
                    {"doc_id": r["doc_id"], "score": round(r["score"], 4)}
                    for r in rows
                ],
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
