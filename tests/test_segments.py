"""Segmented compressed index: rank-identity vs oracle, merge correctness,
manifest/resume, WAND-prune parity (north_rule: segments + compression +
hierarchical salted merge + resume + block-max pruning)."""

import numpy as np
import pytest

from ferret_spark.codec import decode_posting_list
from ferret_spark.fixtures import GOLDEN_FIELD_CONFIG, golden_rows, synth_corpus_pdf
from ferret_spark.oracle import OracleIndex
from ferret_spark.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    TermQuery,
)
from ferret_spark.segments import SegmentIndex, SegmentIndexBuilder, read_manifest

from tests.test_search_spark import GOLDEN_QUERIES, SYNTH_QUERIES, T


@pytest.fixture(scope="module")
def golden_seg(spark, tmp_path_factory):
    rows = golden_rows()
    oracle = OracleIndex(rows, GOLDEN_FIELD_CONFIG)
    pdf_rows = [dict(r, doc_id=i) for i, r in enumerate(rows)]
    corpus = spark.createDataFrame(pdf_rows)
    path = str(tmp_path_factory.mktemp("golden_seg"))
    b = SegmentIndexBuilder(
        spark, path, GOLDEN_FIELD_CONFIG, seg_size=5, salt_buckets=2
    )
    sidx = b.build(corpus, doc_id_col="doc_id")
    return oracle, sidx


def assert_seg_rank_identical(oracle, sidx, q, k=25, prune=True):
    expected = oracle.search(q, k=k)
    got = [
        (r["doc_id"], r["score"])
        for r in sidx.search(q, k=k, prune=prune).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in expected], (
        f"doc order mismatch: {got} vs {expected}"
    )
    for (gd, gs), (ed, es) in zip(got, expected):
        assert np.float32(gs) == np.float32(es), (gd, gs, es)


@pytest.mark.parametrize("name,q", GOLDEN_QUERIES, ids=[n for n, _ in GOLDEN_QUERIES])
def test_golden_segment_rank_identity(golden_seg, name, q):
    oracle, sidx = golden_seg
    assert_seg_rank_identical(oracle, sidx, q)


def test_merged_postings_match_oracle(golden_seg):
    oracle, sidx = golden_seg
    rows = sidx.merged.where(
        (sidx.merged.field == "content")
    ).collect()
    got = {}
    for r in rows:
        row = {
            "doc_bin": bytes(r["doc_bin"]),
            "tf_bin": bytes(r["tf_bin"]),
            "pos_bin": bytes(r["pos_bin"]),
            "dl_bin": bytes(r["dl_bin"]),
            "block_meta": [bm.asDict() for bm in r["block_meta"]],
            "df": r["df"],
        }
        ids, tfs, pos, dls = decode_posting_list(row)
        got[r["term"]] = (ids.tolist(), tfs.tolist(), [p.tolist() for p in pos])
    want = oracle.postings["content"]
    assert set(got.keys()) == set(want.keys())
    for term, plist in want.items():
        ids = [d for d, _, _ in plist]
        tfs = [t for _, t, _ in plist]
        poss = [list(p) for _, _, p in plist]
        gids, gtfs, gpos = got[term]
        assert gids == ids, term
        assert gtfs == tfs, term
        assert gpos == poss, term


@pytest.fixture(scope="module")
def synth_seg(spark, tmp_path_factory):
    pdf = synth_corpus_pdf(120, mu=3.0, sigma=0.8)
    fc = {"content": "letter", "lang": "keyword"}
    corpus = spark.createDataFrame(pdf)
    path = str(tmp_path_factory.mktemp("synth_seg"))
    b = SegmentIndexBuilder(spark, path, fc, seg_size=16, salt_buckets=3)
    sidx = b.build(corpus, id_cols=("repo", "path", "commit"))
    id_map = {
        r["commit"]: r["doc_id"]
        for r in sidx.docs.select("commit", "doc_id").collect()
    }
    rows = sorted(pdf.to_dict("records"), key=lambda r: id_map[r["commit"]])
    oracle = OracleIndex(rows, fc)
    return oracle, sidx


@pytest.mark.parametrize("name,q", SYNTH_QUERIES, ids=[n for n, _ in SYNTH_QUERIES])
def test_synth_segment_rank_identity(synth_seg, name, q):
    oracle, sidx = synth_seg
    assert_seg_rank_identical(oracle, sidx, q, k=15)


def test_wand_prune_parity(synth_seg):
    oracle, sidx = synth_seg
    # multi-term disjunction is the pruned path; compare against unpruned
    q = PrefixQuery(field="content", prefix="re")
    pruned = [(r["doc_id"], r["score"]) for r in sidx.search(q, k=10, prune=True).collect()]
    exact = [(r["doc_id"], r["score"]) for r in sidx.search(q, k=10, prune=False).collect()]
    assert pruned == exact
    assert_seg_rank_identical(oracle, sidx, q, k=10, prune=True)


def test_resume_after_crash(spark, tmp_path_factory):
    pdf = synth_corpus_pdf(50, mu=2.5, sigma=0.5)
    fc = {"content": "letter"}
    corpus = spark.createDataFrame(pdf)

    path_a = str(tmp_path_factory.mktemp("resume_a"))
    path_b = str(tmp_path_factory.mktemp("resume_b"))

    # uninterrupted build
    full = SegmentIndexBuilder(spark, path_a, fc, seg_size=8).build(
        corpus, id_cols=("repo", "path", "commit")
    )
    # crash after 'segments', then resume
    crash_builder = SegmentIndexBuilder(spark, path_b, fc, seg_size=8)
    out = crash_builder.build(
        corpus, id_cols=("repo", "path", "commit"), stop_after="segments"
    )
    assert out is None
    m = read_manifest(spark, path_b)
    assert set(m.keys()) == {"docs", "segments"}
    seg_mtime_before = m["segments"]["ts"]
    resumed = crash_builder.build(corpus, id_cols=("repo", "path", "commit"))
    m2 = read_manifest(spark, path_b)
    assert set(m2.keys()) == {"docs", "segments", "merged", "term_stats", "meta"}
    # earlier stages were NOT recomputed (same manifest timestamp)
    assert m2["segments"]["ts"] == seg_mtime_before

    # resumed index answers identically to the uninterrupted one
    q = BooleanQuery.of((T("def"), MUST), (T("return"), SHOULD))
    a = [(r["doc_id"], r["score"]) for r in full.search(q, k=10).collect()]
    b = [(r["doc_id"], r["score"]) for r in resumed.search(q, k=10).collect()]
    assert a == b


def test_manifest_metrics(golden_seg, spark):
    _, sidx = golden_seg
    m = read_manifest(spark, sidx.path)
    for stage in ["docs", "segments", "merged", "term_stats", "meta"]:
        assert m[stage]["status"] == "done"
        assert m[stage]["elapsed_sec"] >= 0
    assert m["docs"]["rows"] == 18
    assert m["segments"]["bytes"] > 0


def test_fql_string_query_end_to_end(golden_seg):
    # FQL string -> parse -> segment search; parity with the equivalent tree
    oracle, sidx = golden_seg
    got = [
        (r["doc_id"], r["score"])
        for r in sidx.query(
            'word1 AND word3 "quick brown fox"~4', k=20, analyzer="whitespace"
        ).collect()
    ]
    from ferret_spark.parser import QueryParser

    p = QueryParser(
        default_field="content",
        fields=list(GOLDEN_FIELD_CONFIG),
        tokenized_fields=["content"],
        analyzer="whitespace",
    )
    q = p.parse('word1 AND word3 "quick brown fox"~4')
    exp = oracle.search(q, k=20)
    assert [d for d, _ in got] == [d for d, _ in exp]


def test_filter_cache_reuses_range_expansion(golden_seg):
    """Second execution of the same range filter must not touch the term
    dictionary (frt_filter_get_bv caching analog): poison term_stats after
    the first run and re-run."""
    from ferret_spark.query import RangeQuery

    from ferret_spark.wand import _range_to_const

    _, sidx = golden_seg
    q = RangeQuery(field="date", lower="20051006", upper="20051010", typed=False)
    first = {r["doc_id"] for r in sidx.search(q, k=None).collect()}
    assert ("range", "date", "20051006", "20051010", True, True, False) in (
        sidx.filter_cache
    )
    # the cached rewrite must not re-scan the term dictionary: poison
    # term_stats and re-run the rewrite
    saved = sidx.term_stats
    try:
        sidx.term_stats = None  # would crash on any term-dict access
        rw = _range_to_const(sidx, q)
    finally:
        sidx.term_stats = saved
    assert set(rw.terms) and rw.field == "date"
    second = {r["doc_id"] for r in sidx.search(q, k=None).collect()}
    assert second == first


def test_typed_range_pushdown_no_full_collect(golden_seg):
    """Typed RangeQuery must filter term_stats IN SPARK (term_num column),
    never collect the whole dictionary driver-side."""
    from ferret_spark.query import RangeQuery
    from ferret_spark.wand import _range_to_const, ConstantScoreTerms

    _, sidx = golden_seg
    q = RangeQuery(field="number", lower=-1.0, upper=1.0, typed=True)
    rw = _range_to_const(sidx, q)
    assert isinstance(rw, ConstantScoreTerms)
    # term_num shadow column exists and the expansion matches a manual scan
    assert "term_num" in sidx.term_stats.columns
    import pyspark.sql.functions as F

    expect = {
        r["term"]
        for r in sidx.term_stats.where(
            (F.col("field") == "number")
            & F.col("term_num").isNotNull()
            & (F.col("term_num") >= -1.0)
            & (F.col("term_num") <= 1.0)
        ).collect()
    }
    assert set(rw.terms) == expect and len(expect) > 0
