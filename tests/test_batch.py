"""batch_search parity: every query in a batch must return exactly the
single-query declarative planner's top-k (doc order AND float32 scores),
since both fold the same float64 contributions in the same order. Plus
plan-shape guards: the whole batch reads postings ONCE (union predicate
pushed into the scan) and unsupported shapes raise."""

import numpy as np
import pytest

from ferret_spark.batch import batch_search
from ferret_spark.fixtures import GOLDEN_FIELD_CONFIG, golden_rows
from ferret_spark.index import SparkIndex
from ferret_spark.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
    WildcardQuery,
)
from ferret_spark.search import plan_topk, spark_rewrite


def T(t, field="content", boost=1.0):
    return TermQuery(field=field, term=t, boost=boost)


BATCH = [
    T("word2"),
    T("word1"),
    T("zzzzz"),  # df == 0: absent from results
    BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST)),
    BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST), (T("word2"), SHOULD)),
    BooleanQuery.of((T("word2"), SHOULD), (T("word3"), SHOULD)),
    BooleanQuery.of((T("word3"), MUST), (T("word2"), MUST_NOT)),
    BooleanQuery.of((T("word3"), MUST_NOT)),  # pure NOT -> MatchAll MUST
    BooleanQuery.of((T("word3", boost=2.0), MUST), (T("quick", boost=0.5), SHOULD)),
    BooleanQuery.of((T("word1"), MUST), (T("word1"), SHOULD)),  # repeated term
    PrefixQuery(field="content", prefix="word"),  # rewrite -> MultiTermQuery
    WildcardQuery(field="content", pattern="w*d2"),
    FuzzyQuery(field="content", term="worde", min_sim=0.5),
    # phrases: their own positional scan + per-qid kernel dispatch
    PhraseQuery.of("content", ["quick", "brown"]),              # exact 2-slot
    PhraseQuery.of("content", ["word1", "word3"], slop=4),      # sloppy 2-slot
    PhraseQuery.of("content", ["quick", "brown", "fox"], slop=3),  # k=3 sloppy
    PhraseQuery.of("content", ["word1", "word2", "word1"], slop=5),  # repeats
    PhraseQuery.of("content", ["word2"]),                       # 1-slot
    PhraseQuery.of("content", ["word1", "zzzzz"]),              # dead slot
    PhraseQuery(  # multi-alternative slot + skip offset
        field="content",
        positions=((0, ("quick", "word1")), (2, ("fox", "word3"))),
        slop=6,
    ),
]

K = 25


@pytest.fixture(scope="module")
def sidx(spark):
    rows = golden_rows()
    corpus = spark.createDataFrame(
        [dict(r, doc_id=i) for i, r in enumerate(rows)]
    )
    return SparkIndex.build(spark, corpus, GOLDEN_FIELD_CONFIG, doc_id_col="doc_id")


def test_batch_matches_single_query_topk(sidx):
    got = batch_search(sidx, BATCH, k=K).collect()
    by_qid = {}
    for r in got:
        by_qid.setdefault(r["query_id"], []).append(r)
    for rows in by_qid.values():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
            range(1, len(rows) + 1)
        )
    for qid, q in enumerate(BATCH):
        want = plan_topk(sidx, spark_rewrite(sidx, q), k=K).collect()
        have = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in have] == [r["doc_id"] for r in want], (
            qid,
            q,
        )
        for h, w in zip(have, want):
            assert np.float32(h["score"]) == np.float32(w["score"]), (qid, q)


def test_batch_empty_and_pure_not(sidx):
    got = batch_search(sidx, BATCH, k=K).collect()
    qids = {r["query_id"] for r in got}
    assert 2 not in qids  # df == 0 term
    # pure MUST_NOT rewrites to MatchAll MUST + NOT: all-but-excluded,
    # every survivor scoring the MatchAll 1.0 (same as the single planner)
    not_rows = [r for r in got if r["query_id"] == 7]
    assert not_rows and all(r["score"] == 1.0 for r in not_rows)


def test_batch_score_round_mode(sidx):
    got = batch_search(sidx, [T("word2")], k=5, score_round=4).collect()
    assert got, "rounded mode returned nothing"
    for r in got:
        assert abs(r["score"] - round(r["score"], 4)) < 1e-12


@pytest.mark.parametrize(
    "bad",
    [
        MatchAllQuery(),
        # a single-clause inner boolean flattens in spark_rewrite, so the
        # genuinely-nested case needs >=2 inner clauses
        BooleanQuery.of(
            (BooleanQuery.of((T("word1"), SHOULD), (T("word3"), SHOULD)), MUST),
            (T("word2"), MUST),
        ),
        # phrases batch top-level only, not as boolean clauses
        BooleanQuery.of(
            (PhraseQuery.of("content", ["quick", "brown"]), MUST),
            (T("word2"), MUST),
        ),
    ],
)
def test_batch_unsupported_raises(sidx, bad):
    with pytest.raises(ValueError):
        batch_search(sidx, [T("word1"), bad], k=5)


def test_batch_single_postings_scan(spark, tmp_path):
    """The whole batch must be ONE pushed postings scan: save/load the
    index (postings become a parquet source) and count parquet scans of
    the postings path in the executed plan."""
    rows = golden_rows()
    corpus = spark.createDataFrame(
        [dict(r, doc_id=i) for i, r in enumerate(rows)]
    )
    idx = SparkIndex.build(spark, corpus, GOLDEN_FIELD_CONFIG, doc_id_col="doc_id")
    path = str(tmp_path / "bidx")
    idx.save(path)
    loaded = SparkIndex.load(spark, path)
    df = batch_search(loaded, [q for q in BATCH[:7] if True], k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the plan toString truncates the parquet Location path, so count scan
    # NODES: BATCH[:7] has no MatchAll clause, so postings is the only
    # parquet source in the plan and there must be exactly one scan of it
    n_file_scans = plan.count("FileScan parquet")
    assert n_file_scans == 1, plan
    # the union term predicate reaches the scan (rowgroup pruning tier)
    assert "term" in plan and " IN (" in plan, plan
    df.collect()  # and it actually runs


def test_batch_phrase_plan_shape(spark, tmp_path):
    """A mixed term+phrase batch must stay bounded-scan: one tf-only
    postings scan for the term queries, one positional scan for ALL
    phrases, one candidate scan for the rarest-slot semi-join (3 total,
    independent of batch size), and exactly one Python eval node (the
    mapInPandas kernel dispatch) regardless of how many phrases batch."""
    rows = golden_rows()
    corpus = spark.createDataFrame(
        [dict(r, doc_id=i) for i, r in enumerate(rows)]
    )
    idx = SparkIndex.build(spark, corpus, GOLDEN_FIELD_CONFIG, doc_id_col="doc_id")
    path = str(tmp_path / "pidx")
    idx.save(path)
    loaded = SparkIndex.load(spark, path)
    batch = [
        T("word1"),
        BooleanQuery.of((T("word2"), MUST), (T("word3"), SHOULD)),
        PhraseQuery.of("content", ["quick", "brown"]),
        PhraseQuery.of("content", ["word1", "word3"], slop=4),
        PhraseQuery.of("content", ["quick", "brown", "fox"], slop=2),
    ]
    df = batch_search(loaded, batch, k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 3, plan
    n_py = plan.count("MapInPandas") + plan.count("ArrowEvalPython")
    assert n_py == 1, plan
    df.collect()  # and it actually runs
