"""Connected-components canonicalization + TF-IDF keywords."""

import numpy as np
import pytest
from pyspark.sql import functions as F


def _cc_reference(pairs):
    """Driver-side union-find for the expected clustering."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_label_propagation_matches_union_find(spark, monkeypatch):
    """Chain + triangle + singleton-pair topology, incl. a diameter-4
    chain that needs multiple propagation rounds."""
    import ferret_spark.pipeline as P

    pairs = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12),
             (20, 21), (30, 31), (31, 40), (39, 40)]
    pairs_df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    monkeypatch.setattr(
        P, "dedup_minhash_lsh", lambda s, d, **kw: pairs_df
    )
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in P.dedup_clusters(spark, "unused").collect()
    }
    assert got == _cc_reference(pairs)
    # canonical representative is the component's min doc_id
    assert got[5] == 1 and got[12] == 10 and got[40] == 30


def test_dedup_clusters_on_real_pairs(spark):
    """End-to-end over the sf0.001 documents: every clustered doc pairs
    with at least one other doc of the same cluster, labels are component
    minima, and the clustering agrees with union-find over the pairs."""
    from ferret_spark.pipeline import dedup_clusters, dedup_minhash_lsh

    sf = "/root/testdata/sf0.001"
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in dedup_minhash_lsh(spark, sf).collect()
    ]
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in dedup_clusters(spark, sf).collect()
    }
    assert got == _cc_reference(pairs)


def test_keywords_tfidf_shape_and_signal(spark):
    from ferret_spark.pipeline import keywords_tfidf

    out = keywords_tfidf(spark, "/root/testdata/sf0.001", k=3).collect()
    assert len(out) > 0
    for r in out[:20]:
        kws = r["keywords"].split(",")
        assert 1 <= len(kws) <= 3
        assert all(kws)


def test_keywords_tfidf_rare_term_wins(spark, tmp_path):
    """A term unique to one doc must outrank corpus-wide terms."""
    import ferret_spark.pipeline as P

    rows = [(0, "common words here plus zebra zebra"),
            (1, "common words here again and again"),
            (2, "common words here more common words")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    path = str(tmp_path / "docs")
    df.write.parquet(path + "/documents.parquet")
    out = {
        r["doc_id"]: r["keywords"]
        for r in P.keywords_tfidf(spark, path, k=1).collect()
    }
    assert out[0] == "zebra"


def test_long_chain_converges_via_pointer_doubling(spark, monkeypatch):
    """A 60-hop pair chain (diameter far above the old 20-round budget)
    must converge — pointer doubling closes diameter D in O(log D) rounds —
    and every node must get the component-min label."""
    import ferret_spark.pipeline as P

    pairs = [(i, i + 1) for i in range(60)]
    pairs_df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    monkeypatch.setattr(P, "dedup_minhash_lsh", lambda s, d, **kw: pairs_df)
    got = {
        r["doc_id"]: r["cluster_id"]
        for r in P.dedup_clusters(spark, "unused").collect()
    }
    assert got == {i: 0 for i in range(61)}


def test_non_convergence_raises_not_silent(spark, monkeypatch):
    """With the round budget forced below what the topology needs, the
    function must raise — never return partial, inconsistent labels."""
    import ferret_spark.pipeline as P

    pairs = [(i, i + 1) for i in range(200)]
    pairs_df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    monkeypatch.setattr(P, "dedup_minhash_lsh", lambda s, d, **kw: pairs_df)
    with pytest.raises(RuntimeError, match="did not converge"):
        P.dedup_clusters(spark, "unused", max_iters=2)


def test_ann_ivf_exact_rerank(spark):
    """IVF probes coarse lists, but the re-rank within candidates is
    EXACT cosine: every returned (vec, cosine) must agree with the
    brute-force scorer, descending, self excluded."""
    from ferret_spark.pipeline import ann_cosine_topk, ann_ivf_topk

    sf = "/root/testdata/sf0.001"
    ivf = [(r["vec_id"], r["cosine"]) for r in ann_ivf_topk(spark, sf).collect()]
    assert len(ivf) == 10
    assert all(ivf[i][1] >= ivf[i + 1][1] for i in range(len(ivf) - 1))
    assert all(v != 0 for v, _ in ivf)
    brute = {
        r["vec_id"]: r["cosine"]
        for r in ann_cosine_topk(spark, sf, k=10**6).collect()
    }
    for v, c in ivf:
        assert brute[v] == c, (v, c, brute.get(v))


def test_driver_cc_matches_distributed_loop(spark, monkeypatch):
    """r7 bounded driver CC fast path: labels must equal the distributed
    label-propagation loop's fixed point on a mixed topology (chains,
    triangles, isolated pairs, a star)."""
    import random

    import ferret_spark.pipeline as P

    rng = random.Random(7)
    pairs = set()
    # chains
    base = 0
    for ln in (1, 2, 5, 9):
        for i in range(ln):
            pairs.add((base + i, base + i + 1))
        base += ln + 10
    # star + triangle + random extra edges
    for i in range(1000, 1008):
        pairs.add((999, i))
    pairs.update({(2000, 2001), (2001, 2002), (2000, 2002)})
    for _ in range(200):
        a, b = rng.randrange(3000, 3100), rng.randrange(3000, 3100)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    pairs_df = spark.createDataFrame(
        sorted(pairs), "doc_a long, doc_b long"
    )
    monkeypatch.setattr(P, "dedup_minhash_lsh", lambda s, d, **kw: pairs_df)
    got_driver = {
        r["doc_id"]: r["cluster_id"]
        for r in P.dedup_clusters(spark, "unused").collect()
    }
    monkeypatch.setattr(P, "CC_DRIVER_EDGE_BOUND", 0)
    got_dist = {
        r["doc_id"]: r["cluster_id"]
        for r in P.dedup_clusters(spark, "unused").collect()
    }
    assert got_driver == got_dist
    assert len(got_driver) > 0
