#!/usr/bin/env python
"""Recall@k evidence for the approximate ANN paths.

Two layers of evidence:

1. **Operating curve** (recall@10 vs nprobe, for 16 and 32 centroids):
   computed driver-side in numpy with EXACTLY the operator's arithmetic
   (same codebooks via ivf_trained_centroids, same max-dot assignment,
   same round-6 cosine / vec_id tie-break).  This is what lets a user
   pick nprobe/centroids; the shipped IVF_NPROBE default is the smallest
   nprobe whose recall@10 >= 0.8 on this table.
2. **Live verification**: the real Spark operator (ann_ivf_topk) runs at
   the shipped default for every query and its result set must EQUAL the
   analytic prediction — so the curve provably describes the operator,
   not a lookalike.  The trained-vs-fixed-vs-LSH comparison also runs
   live.

Writes BENCH/ANN_RECALL.md and prints one JSON line.

Usage: python scripts/ann_recall.py  [SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1]
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_QUERIES = int(os.environ.get("FERRET_RECALL_QUERIES", "16"))
K = 10
CENTROID_COUNTS = (16, 32)
NPROBES = (1, 2, 4, 6, 8, 12, 16)
OUT_MD = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "BENCH", "ANN_RECALL.md",
)


def _load_vectors():
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{SF_DIR}/embeddings.parquet", columns=["vec_id", "embedding"]
    )
    vid = t.column("vec_id").to_numpy()
    arr = t.column("embedding").combine_chunks()
    flat = arr.values.to_numpy(zero_copy_only=False).astype(np.float64)
    offs = arr.offsets.to_numpy()
    dim = int(offs[1] - offs[0])
    x = flat.reshape(-1, dim)
    order = np.argsort(vid, kind="stable")
    return x[order], dim


def _topk_ids(cand_ids, cos, k):
    """Engine tie-break: round-6 cosine desc, vec_id asc."""
    cos = np.round(cos, 6)
    idx = np.lexsort((cand_ids, -cos))
    return cand_ids[idx[:k]]


def main():
    from ferret_spark import pipeline as P
    from ferret_spark.session import get_spark

    x, dim = _load_vectors()
    n = len(x)
    norms = np.linalg.norm(x, axis=1)
    qids = [i * max(1, n // N_QUERIES) for i in range(N_QUERIES)]

    truth = {}
    for q in qids:
        ids = np.arange(n)
        mask = ids != q
        cos = (x[mask] @ x[q]) / (norms[mask] * norms[q])
        truth[q] = set(_topk_ids(ids[mask], cos, K).tolist())

    # ---- analytic operating curve ---------------------------------------
    curve = []  # (ncent, nprobe, recall)
    predicted_default = {}
    for ncent in CENTROID_COUNTS:
        cents = np.array(P.ivf_trained_centroids(SF_DIR, n=ncent))
        assign = np.argmax(x @ cents.T, axis=1)
        for nprobe in NPROBES:
            if nprobe > ncent:
                continue
            hits = 0
            for q in qids:
                qd = x[q] @ cents.T
                probe = np.argsort(-qd, kind="stable")[:nprobe]
                cand = np.flatnonzero(np.isin(assign, probe))
                cand = cand[cand != q]
                cos = (x[cand] @ x[q]) / (norms[cand] * norms[q])
                got = _topk_ids(cand, cos, K)
                if ncent == P.IVF_CENTROIDS and nprobe == P.IVF_NPROBE:
                    predicted_default[q] = got.tolist()
                hits += len(set(got.tolist()) & truth[q])
            curve.append((ncent, nprobe, hits / (K * len(qids))))

    # ---- live Spark runs ------------------------------------------------
    spark = get_spark(
        master=f"local[{os.environ.get('SPARK_GRAFT_CPUS', '8')}]",
        shuffle_partitions=16,
        app_name="ferret-ann-recall",
    )
    spark.sparkContext.setLogLevel("ERROR")
    fixed_cents = P._ivf_centroid_literals(dim)

    def live_recall(fn, check_against=None, **kw):
        hits = 0
        for q in qids:
            rows = fn(spark, SF_DIR, query_vec_id=q, k=K, **kw).collect()
            got = [r["vec_id"] for r in rows]
            if check_against is not None and got != check_against[q]:
                raise AssertionError(
                    f"live operator diverges from analytic prediction for "
                    f"query {q}: {got} vs {check_against[q]}"
                )
            hits += len(set(got) & truth[q])
        return hits / (K * len(qids))

    t0 = time.time()
    r_live = live_recall(P.ann_ivf_topk, check_against=predicted_default)
    t_live = time.time() - t0
    r_fixed = live_recall(P.ann_ivf_topk, cents=fixed_cents)
    r_lsh = live_recall(P.ann_lsh_topk)

    default_recall = next(
        r for c, p, r in curve
        if c == P.IVF_CENTROIDS and p == P.IVF_NPROBE
    )

    md = [
        f"# ANN_RECALL — recall@10 vs brute-force cosine ({SF_DIR}, "
        f"{n} vectors, dim {dim}, {len(qids)} queries)",
        "",
        "## IVF operating curve (trained spherical-k-means codebooks)",
        "",
        "| centroids | nprobe | scan fraction | recall@10 |",
        "|---|---|---|---|",
    ]
    for ncent, nprobe, r in curve:
        mark = (
            " **<- shipped default**"
            if ncent == P.IVF_CENTROIDS and nprobe == P.IVF_NPROBE
            else ""
        )
        md.append(
            f"| {ncent} | {nprobe} | {nprobe / ncent:.3f} | "
            f"{r:.3f}{mark} |"
        )
    md += [
        "",
        f"Shipped default: {P.IVF_CENTROIDS} centroids, nprobe "
        f"{P.IVF_NPROBE} -> recall@10 **{default_recall:.3f}** (the "
        "smallest nprobe clearing 0.8). The live Spark operator was run "
        f"at this point for all {len(qids)} queries and returned exactly "
        f"the analytically predicted id lists (wall {t_live:.1f}s); the "
        "curve therefore describes the real operator.",
        "",
        "**Caveat — synthetic embeddings.** The testdata embeddings are "
        "near-uniform on the sphere, so coarse-quantizer lists carry "
        "little signal and recall tracks the scan fraction (0.8 recall "
        "costs probing half the lists). On real clustered embedding "
        "distributions the same codebook shape reaches high recall at "
        "much smaller nprobe; `ann_ivf_topk(..., nprobe=...)` exposes "
        "the knob per call, and this script regenerates the curve for "
        "any table.",
        "",
        "## Shipped default vs baselines (live Spark runs)",
        "",
        "| path | recall@10 | notes |",
        "|---|---|---|",
        f"| IVF trained codebook (shipped) | **{r_live:.3f}** | "
        f"{P.IVF_CENTROIDS} centroids, nprobe {P.IVF_NPROBE}, "
        f"spherical k-means on a {P.IVF_TRAIN_SAMPLE}-vector sample |",
        f"| IVF fixed gaussian quantizer (r4) | {r_fixed:.3f} | "
        "same nprobe — the untrained baseline |",
        f"| LSH multiprobe (hamming<=2) | {r_lsh:.3f} | 12 planes |",
        "",
        "Query ids are an even stride over vec_id.",
        "",
    ]
    os.makedirs(os.path.dirname(OUT_MD), exist_ok=True)
    with open(OUT_MD, "w") as f:
        f.write("\n".join(md))
    print(json.dumps({
        "sf_dir": SF_DIR, "n_vecs": n, "queries": len(qids), "k": K,
        "curve": [
            {"centroids": c, "nprobe": p, "recall": round(r, 4)}
            for c, p, r in curve
        ],
        "default": {
            "centroids": P.IVF_CENTROIDS, "nprobe": P.IVF_NPROBE,
            "recall_live": round(r_live, 4),
        },
        "recall_ivf_fixed": round(r_fixed, 4),
        "recall_lsh": round(r_lsh, 4),
    }))


if __name__ == "__main__":
    main()
