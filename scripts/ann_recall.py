#!/usr/bin/env python
"""Recall@k evidence for the approximate ANN paths (VERDICT r4 item 3).

For a set of query vectors, compares each approximate top-k against the
brute-force cosine baseline (ann_cosine_topk):
  - IVF with the TRAINED spherical-k-means codebook (the shipped default)
  - IVF with the old fixed seeded-gaussian quantizer (the r4 baseline)
  - single-probe-ball LSH (multiprobe hamming<=2)
Writes BENCH/ANN_RECALL.md and prints one JSON line.

Usage: python scripts/ann_recall.py  [SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = int(os.environ.get("FERRET_RECALL_QUERIES", "16"))
K = 10
OUT_MD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "ANN_RECALL.md",
)


def main():
    from ferret_spark.session import get_spark
    from ferret_spark import pipeline as P

    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
        app_name="ferret-ann-recall",
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_vecs = P._emb(spark, SF_DIR).count()
    qids = [i * max(1, n_vecs // N_QUERIES) for i in range(N_QUERIES)]
    dim = P._emb_dim(spark, SF_DIR)
    fixed_cents = P._ivf_centroid_literals(dim)

    t0 = time.time()
    truth = {
        q: {r["vec_id"] for r in
            P.ann_cosine_topk(spark, SF_DIR, query_vec_id=q, k=K).collect()}
        for q in qids
    }
    t_brute = time.time() - t0

    def recall(fn, **kw):
        hits = 0
        for q in qids:
            got = {r["vec_id"] for r in
                   fn(spark, SF_DIR, query_vec_id=q, k=K, **kw).collect()}
            hits += len(got & truth[q])
        return hits / (K * len(qids))

    r_trained = recall(P.ann_ivf_topk)
    r_fixed = recall(P.ann_ivf_topk, cents=fixed_cents)
    r_lsh = recall(P.ann_lsh_topk)

    md = [
        "# ANN_RECALL — recall@10 vs brute-force cosine "
        f"({SF_DIR}, {n_vecs} vectors, {len(qids)} queries)",
        "",
        "| path | recall@10 | notes |",
        "|---|---|---|",
        f"| IVF trained codebook (shipped) | **{r_trained:.3f}** | "
        f"{P.IVF_CENTROIDS} centroids, nprobe {P.IVF_NPROBE}, "
        f"spherical k-means on a {P.IVF_TRAIN_SAMPLE}-vector sample |",
        f"| IVF fixed gaussian quantizer (r4) | {r_fixed:.3f} | "
        "same nprobe — the untrained baseline |",
        f"| LSH multiprobe (hamming<=2) | {r_lsh:.3f} | 12 planes |",
        "",
        f"Brute-force baseline wall: {t_brute:.1f}s for {len(qids)} "
        "queries. Query ids are an even stride over vec_id.",
        "",
    ]
    os.makedirs(os.path.dirname(OUT_MD), exist_ok=True)
    with open(OUT_MD, "w") as f:
        f.write("\n".join(md))
    print(json.dumps({
        "sf_dir": SF_DIR, "n_vecs": n_vecs, "queries": len(qids), "k": K,
        "recall_ivf_trained": round(r_trained, 4),
        "recall_ivf_fixed": round(r_fixed, 4),
        "recall_lsh": round(r_lsh, 4),
    }))


if __name__ == "__main__":
    main()
