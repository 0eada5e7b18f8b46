#!/usr/bin/env python
"""Query-batching throughput evidence: B queries answered one-per-job vs
ONE batch_search job, on the sf0.1 documents index.

Measures, for B in (8, 32, 128): wall for the sequential loop (each
query its own plan_topk job+collect, the per-query latency a user sees),
wall for the single batch_search call, and derived queries/sec for both.
Verifies en route that every batched result equals its single-query
twin (doc ids + float32 scores) — the speedup must not buy drift.

Writes BENCH/BATCH_SEARCH.md and prints one JSON line.

Usage: python scripts/batch_throughput.py  [SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SIZES = tuple(
    int(s) for s in os.environ.get("FERRET_BATCH_SIZES", "8,32,128").split(",")
)
OUT_MD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH",
    "BATCH_SEARCH.md",
)


def _mk_queries(idx, n):
    """Deterministic mixed workload: terms drawn from the index's own
    term dictionary ordered by df desc (hot -> mid), plus AND / OR / NOT
    and exact/sloppy phrase combinations of adjacent picks."""
    from ferret_spark.query import (
        MUST,
        MUST_NOT,
        SHOULD,
        BooleanQuery,
        PhraseQuery,
        TermQuery,
    )

    rows = (
        idx.term_stats.where("field = 'text'")
        .orderBy("df", "term", ascending=[False, True])
        .limit(4 * n)
        .collect()
    )
    terms = [r["term"] for r in rows]

    def tt(t):
        return TermQuery(field="text", term=t)

    qs = []
    i = 0
    while len(qs) < n:
        t1, t2 = terms[(2 * i) % len(terms)], terms[(2 * i + 1) % len(terms)]
        kind = i % 6
        if kind == 0:
            qs.append(tt(t1))
        elif kind == 1:
            qs.append(BooleanQuery.of((tt(t1), MUST), (tt(t2), MUST)))
        elif kind == 2:
            qs.append(BooleanQuery.of((tt(t1), SHOULD), (tt(t2), SHOULD)))
        elif kind == 3:
            qs.append(BooleanQuery.of((tt(t1), MUST), (tt(t2), MUST_NOT)))
        elif kind == 4:
            qs.append(PhraseQuery.of("text", [t1, t2]))
        else:
            qs.append(PhraseQuery.of("text", [t1, t2], slop=8))
        i += 1
    return qs


def main():
    from ferret_spark.batch import batch_search
    from ferret_spark.index import SparkIndex
    from ferret_spark.search import plan_topk, spark_rewrite
    from ferret_spark.session import get_spark

    spark = get_spark(master=f"local[{CPUS}]", shuffle_partitions=CPUS)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    field_config = {"text": "whitespace", "lang": "keyword", "source": "keyword"}
    t0 = time.time()
    idx = SparkIndex.build(spark, docs, field_config, doc_id_col="doc_id")
    idx.postings.count()  # materialize the persisted tables (warm reader)
    idx.term_stats.count()
    t_build = time.time() - t0

    results = []
    for b in SIZES:
        qs = _mk_queries(idx, b)
        # warm both paths once on a single query (JIT/codegen caches)
        plan_topk(idx, spark_rewrite(idx, qs[0]), k=10).collect()
        batch_search(idx, qs[:2], k=10).collect()

        t0 = time.time()
        singles = []
        for q in qs:
            singles.append(
                plan_topk(idx, spark_rewrite(idx, q), k=10).collect()
            )
        t_seq = time.time() - t0

        t0 = time.time()
        rows = batch_search(idx, qs, k=10).collect()
        t_batch = time.time() - t0

        by_qid = {}
        for r in rows:
            by_qid.setdefault(r["query_id"], []).append(r)
        mismatches = 0
        for qid, single in enumerate(singles):
            got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
            ok = [r["doc_id"] for r in got] == [r["doc_id"] for r in single] and all(
                np.float32(g["score"]) == np.float32(s["score"])
                for g, s in zip(got, single)
            )
            mismatches += 0 if ok else 1
        results.append(
            {
                "batch": b,
                "seq_wall_s": round(t_seq, 2),
                "batch_wall_s": round(t_batch, 2),
                "seq_qps": round(b / t_seq, 2),
                "batch_qps": round(b / t_batch, 2),
                "speedup": round(t_seq / t_batch, 2),
                "mismatched_queries": mismatches,
            }
        )
        print(json.dumps(results[-1]), file=sys.stderr)

    lines = [
        "# BATCH_SEARCH — query-batching throughput (batch_search)",
        "",
        f"- corpus: {SF_DIR} documents ({idx.n_docs} docs), "
        f"local[{CPUS}], index build+warm {t_build:.1f}s",
        "- workload: terms from the index's own df-desc term dictionary; "
        "mix of term / AND / OR / NOT / exact-phrase / sloppy-phrase "
        "(1/6 each)",
        "- sequential = one plan_topk job per query (the per-query latency "
        "path); batch = ONE batch_search job for the whole set",
        "- every batched result verified equal to its single-query twin "
        "(doc ids + float32 scores) in the same run",
        "",
        "| B | sequential wall s | batch wall s | seq q/s | batch q/s | speedup | mismatches |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in results:
        lines.append(
            f"| {r['batch']} | {r['seq_wall_s']} | {r['batch_wall_s']} | "
            f"{r['seq_qps']} | {r['batch_qps']} | {r['speedup']}x | "
            f"{r['mismatched_queries']} |"
        )
    lines += [
        "",
        "At 1000 executors the same plan holds: one term-pushed tf scan "
        "bounded by the union of query terms, ONE positional scan for "
        "all phrases (candidate semi-join drops hot-slot postings "
        "map-side), a broadcast clause table, one partial-combined "
        "(query_id, doc_id) aggregation, one mapInPandas kernel "
        "dispatch, one per-query top-k window — per-query fixed cost "
        "(job submission, scan setup, collect) is paid once per BATCH "
        "instead of once per query.",
        "",
    ]
    with open(OUT_MD, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"sf_dir": SF_DIR, "results": results}))


if __name__ == "__main__":
    main()
