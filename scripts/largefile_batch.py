#!/usr/bin/env python
"""Query-log throughput on the 2M-doc segmented index: sequential
segment_search vs ONE segment_batch_search job.

At largefile scale the per-query wall is dominated by fixed cost (job
submission, segments scan setup, term_stats join, collect) — ~1.7-2.5s
warm per query at 2M docs (BENCH/LARGEFILE_RUN.md) regardless of how
cheap the per-doc work is.  segment_batch_search amortizes all of it:
one scan, one broadcast df join, one _SegEval per segment serving every
query (shared posting decode), one ranked window.  This script measures
both paths for B in FERRET_BATCH_SIZES on the SAME index and verifies
every batched result equals its single-query twin (doc ids + float32
scores) in-run.  Writes BENCH/LARGEFILE_BATCH.md.

Reuses (or builds) the FERRET_LARGE_DIR index exactly like
largefile_run.py — run that first with FERRET_LARGE_DIR set to skip the
~6 min build here.

Usage: FERRET_LARGE_DIR=/tmp/ferret_large python scripts/largefile_batch.py
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_DOCS = int(os.environ.get("FERRET_LARGE_DOCS", "2000000"))
N_BATCHES = int(os.environ.get("FERRET_LARGE_BATCHES", "16"))
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
SIZES = tuple(
    int(s) for s in os.environ.get("FERRET_BATCH_SIZES", "8,32,128").split(",")
)
OUT_MD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "LARGEFILE_BATCH.md",
)
FIELD_CONFIG = {
    "content": "standard_nostop",
    "lang": "keyword",
    "commit": "keyword",
}


def _mk_queries(idx, n):
    """Deterministic mixed workload over the index's own df-desc term
    dictionary: term / AND / OR / NOT, hot -> mid terms."""
    from pyspark.sql import functions as F

    from ferret_spark.query import MUST, MUST_NOT, SHOULD, BooleanQuery, TermQuery

    rows = (
        idx.index.term_stats.where(F.col("field") == "content")
        .orderBy(F.desc("df"), F.asc("term"))
        .limit(4 * n)
        .collect()
    )
    terms = [r["term"] for r in rows]

    def tt(t):
        return TermQuery(field="content", term=t)

    qs = []
    i = 0
    while len(qs) < n:
        t1, t2 = terms[(2 * i) % len(terms)], terms[(2 * i + 1) % len(terms)]
        kind = i % 4
        if kind == 0:
            qs.append(tt(t1))
        elif kind == 1:
            qs.append(BooleanQuery.of((tt(t1), MUST), (tt(t2), MUST)))
        elif kind == 2:
            qs.append(BooleanQuery.of((tt(t1), SHOULD), (tt(t2), SHOULD)))
        else:
            qs.append(BooleanQuery.of((tt(t1), MUST), (tt(t2), MUST_NOT)))
        i += 1
    return qs


def main():
    from pyspark.sql import functions as F

    from ferret_spark.fixtures import synth_corpus_df
    from ferret_spark.ind import FerretIndex
    from ferret_spark.session import get_spark

    keep_dir = os.environ.get("FERRET_LARGE_DIR", "/tmp/ferret_large")
    os.makedirs(keep_dir, exist_ok=True)
    spark = get_spark(
        master=f"local[{CPUS}]",
        shuffle_partitions=max(32, CPUS * 2),
        app_name="ferret-largefile-batch",
    )
    spark.sparkContext.setLogLevel("ERROR")
    idx = FerretIndex(
        spark, os.path.join(keep_dir, "idx"), FIELD_CONFIG,
        seg_size=4096, salt_buckets=16, merge_factor=4,
    )
    t_build = 0.0
    if idx.size() != N_DOCS:
        if idx.size():  # partial build from an interrupted run: start over
            import shutil

            shutil.rmtree(os.path.join(keep_dir, "idx"), ignore_errors=True)
            idx = FerretIndex(
                spark, os.path.join(keep_dir, "idx"), FIELD_CONFIG,
                seg_size=4096, salt_buckets=16, merge_factor=4,
            )
        batch_n = N_DOCS // N_BATCHES
        t0 = time.time()
        for b in range(N_BATCHES):
            # materialize the synthetic slice to parquet first (as
            # largefile_run does): add_documents traverses the corpus
            # several times, and re-deriving the generator each pass is
            # ~10x the add itself
            corpus = synth_corpus_df(
                spark, batch_n, num_partitions=max(32, CPUS),
                start=b * batch_n, with_id=True,
            ).withColumn("doc_id", F.col("doc_id") - F.lit(b * batch_n))
            cpath = os.path.join(keep_dir, f"batch_{b}")
            corpus.write.mode("overwrite").parquet(cpath)
            idx.add_documents(spark.read.parquet(cpath), doc_id_col="doc_id")
            import shutil

            shutil.rmtree(cpath, ignore_errors=True)
            print(json.dumps({"built_batch": b}), flush=True)
        t_build = time.time() - t0
    print(json.dumps({"docs": idx.size(), "build_s": round(t_build, 1)}),
          flush=True)

    results = []
    for b in SIZES:
        qs = _mk_queries(idx, b)
        # warm both paths (JIT/codegen + packed-deletes cache)
        idx.search(qs[0], k=10).collect()
        idx.search_batch(qs[:2], k=10).collect()

        t0 = time.time()
        singles = [idx.search(q, k=10).collect() for q in qs]
        t_seq = time.time() - t0

        t0 = time.time()
        rows = idx.search_batch(qs, k=10).collect()
        t_batch = time.time() - t0

        by_qid = {}
        for r in rows:
            by_qid.setdefault(r["query_id"], []).append(r)
        mismatches = 0
        for qid, single in enumerate(singles):
            got = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
            ok = [r["doc_id"] for r in got] == [
                r["doc_id"] for r in single
            ] and all(
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
        print(json.dumps(results[-1]), flush=True)

    lines = [
        "# LARGEFILE_BATCH — query-log throughput at 2M docs "
        "(segment_batch_search)",
        "",
        f"- index: {idx.size():,} docs, seg_size 4096, local[{CPUS}] "
        f"(reused from FERRET_LARGE_DIR)" + (
            f", rebuilt in {t_build:.0f}s" if t_build else ""
        ),
        "- workload: df-desc dictionary terms, 1/4 each "
        "term / AND / OR / NOT",
        "- sequential = one segment_search job per query (the warm "
        "per-query latency path); batch = ONE segment_batch_search job",
        "- every batched result verified equal to its single-query twin "
        "(doc ids + float32 scores) in the same run",
        "",
        "| B | sequential wall s | batch wall s | seq q/s | batch q/s |"
        " speedup | mismatches |",
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
        "The fixed per-query cost (job submission, segments scan setup, "
        "broadcast df join, collect) is paid once per BATCH; per-query "
        "incremental cost is one numpy fold per segment over posting "
        "lists that decode once for the whole batch. At 1000 executors "
        "the same plan holds — the scan is bounded by the union of query "
        "terms and the only per-query data is the (query_id, doc_id, "
        "score) top-k rows.",
        "",
    ]
    with open(OUT_MD, "w") as f:
        f.write("\n".join(lines))
    print(json.dumps({"docs": idx.size(), "results": results}))


if __name__ == "__main__":
    main()
