"""segment_batch_search parity: every query in a batch must return
exactly segment_search's top-k (doc order AND float32 scores) — both
run the same _SegEval fold per segment, so any drift is a bug.  Plus
plan-shape guards (one segments scan + one term_stats scan for the
whole batch, one applyInPandas) and unsupported-shape errors."""

import numpy as np
import pytest

from ferret_spark.fixtures import GOLDEN_FIELD_CONFIG, golden_rows
from ferret_spark.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    PhraseQuery,
    PrefixQuery,
    TermQuery,
)
from ferret_spark.segments import SegmentIndexBuilder
from ferret_spark.wand import segment_batch_search, segment_search


def T(t, field="content", boost=1.0):
    return TermQuery(field=field, term=t, boost=boost)


BATCH = [
    T("word1"),
    T("word2"),
    T("zzzzz"),  # df == 0: absent from results
    BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST)),
    BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST), (T("word2"), SHOULD)),
    BooleanQuery.of((T("word2"), SHOULD), (T("word3"), SHOULD)),
    BooleanQuery.of((T("word3"), MUST), (T("word2"), MUST_NOT)),
    BooleanQuery.of((T("word3"), MUST_NOT)),  # pure NOT -> MatchAll MUST
    BooleanQuery.of((T("word3", boost=2.0), MUST), (T("quick", boost=0.5), SHOULD)),
    PrefixQuery(field="content", prefix="word"),  # rewrite -> MultiTermQuery
]

K = 25


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    rows = [dict(r, doc_id=i) for i, r in enumerate(golden_rows())]
    path = str(tmp_path_factory.mktemp("bseg_idx"))
    # seg_size 6 -> multiple segments, so cross-segment merge is exercised
    return SegmentIndexBuilder(
        spark, path, GOLDEN_FIELD_CONFIG, seg_size=6
    ).build(spark.createDataFrame(rows), doc_id_col="doc_id")


def test_seg_batch_matches_segment_search(seg):
    got = segment_batch_search(seg, BATCH, k=K).collect()
    by_qid = {}
    for r in got:
        by_qid.setdefault(r["query_id"], []).append(r)
    for rows in by_qid.values():
        assert [r["rank"] for r in sorted(rows, key=lambda r: r["rank"])] == list(
            range(1, len(rows) + 1)
        )
    for qid, q in enumerate(BATCH):
        want = segment_search(seg, q, k=K).collect()
        have = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in have] == [r["doc_id"] for r in want], (
            qid,
            q,
        )
        for h, w in zip(have, want):
            assert np.float32(h["score"]) == np.float32(w["score"]), (qid, q)


def test_seg_batch_empty_and_pure_not(seg):
    got = segment_batch_search(seg, BATCH, k=K).collect()
    qids = {r["query_id"] for r in got}
    assert 2 not in qids  # df == 0 term matches nothing
    not_rows = [r for r in got if r["query_id"] == 7]
    assert not_rows and all(r["score"] == 1.0 for r in not_rows)


@pytest.mark.parametrize(
    "bad",
    [
        PhraseQuery.of("content", ["quick", "brown"]),
        BooleanQuery.of(
            (PhraseQuery.of("content", ["quick", "brown"]), MUST),
            (T("word2"), MUST),
        ),
    ],
)
def test_seg_batch_unsupported_raises(seg, bad):
    with pytest.raises(ValueError):
        segment_batch_search(seg, [T("word1"), bad], k=5)


def test_seg_batch_facade_with_deletes(spark, tmp_path):
    """FerretIndex.search_batch applies the same packed-deletes path as
    search(): after a delete, batch results equal per-query search()
    exactly — the deleted doc gone, global dfs unchanged (lazy apply)."""
    from ferret_spark.ind import FerretIndex

    rows = [dict(r, doc_id=i) for i, r in enumerate(golden_rows())]
    idx = FerretIndex(
        spark, str(tmp_path / "fbatch"), GOLDEN_FIELD_CONFIG, seg_size=6
    )
    idx.add_documents(spark.createDataFrame(rows), doc_id_col="doc_id")
    batch = BATCH[:2] + [BATCH[3], BATCH[9]]
    before = segment_batch_search(idx.index, batch, k=K).collect()
    gone = {r["doc_id"] for r in before if r["query_id"] == 0}
    assert gone
    idx.delete_by_term("content", "word1")  # lazy delete, dfs unchanged
    got = idx.search_batch(batch, k=K).collect()
    assert not gone & {r["doc_id"] for r in got}
    by_qid = {}
    for r in got:
        by_qid.setdefault(r["query_id"], []).append(r)
    for qid, q in enumerate(batch):
        want = idx.search(q, k=K).collect()
        have = sorted(by_qid.get(qid, []), key=lambda r: r["rank"])
        assert [r["doc_id"] for r in have] == [r["doc_id"] for r in want], qid
        for h, w in zip(have, want):
            assert np.float32(h["score"]) == np.float32(w["score"]), qid


def test_seg_batch_term_budget_split(seg):
    """A term budget smaller than the batch's union forces sub-jobs; the
    result (query_id mapping, docs, float32 scores) must be identical to
    the unsplit run."""
    whole = segment_batch_search(seg, BATCH, k=K, term_budget=0).collect()
    split = segment_batch_search(seg, BATCH, k=K, term_budget=3).collect()

    def keyed(rows):
        return sorted(
            (r["query_id"], r["rank"], r["doc_id"], np.float32(r["score"]))
            for r in rows
        )

    assert keyed(split) == keyed(whole)


def test_seg_batch_plan_shape(seg):
    """The whole batch (no MatchAll) must be ONE segments scan + ONE
    term_stats scan (the broadcast gdf join) and exactly one Python
    eval node, independent of batch size."""
    df = segment_batch_search(seg, BATCH[:7], k=10)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert plan.count("FileScan parquet") == 2, plan
    n_py = plan.count("FlatMapGroupsInPandas") + plan.count("MapInPandas")
    assert n_py == 1, plan
    df.collect()  # and it actually runs
