"""Per-filter doc-result caching (frt_filter_get_bv analog,
c/src/filter.c:24-38): the first execution of a ConstantScore filter
materializes its matching doc-id set as a per-generation parquet; repeated
executions ship the cached ids (packed per-segment rows) and never re-scan
the filter's postings. Mutations (add/optimize) invalidate by generation."""

import os

import pytest

from ferret_spark.query import MUST, BooleanQuery, Clause, RangeQuery, TermQuery
from ferret_spark.segments import SegmentIndexBuilder


@pytest.fixture()
def fidx(spark, tmp_path):
    rows = [
        {"doc_id": i, "content": f"alpha w{i % 4}", "num": str(i)}
        for i in range(40)
    ]
    path = str(tmp_path / "fc_idx")
    return SegmentIndexBuilder(
        spark, path, {"content": "whitespace", "num": "keyword"}, seg_size=16
    ).build(spark.createDataFrame(rows), doc_id_col="doc_id")


def _q():
    return BooleanQuery(
        clauses=(
            Clause(TermQuery(field="content", term="w1"), MUST),
            Clause(RangeQuery(field="num", lower=5, upper=25, typed=True), MUST),
        )
    )


def test_second_execution_skips_filter_posting_scan(fidx, monkeypatch):
    import ferret_spark.wand as W

    first = {(r["doc_id"], round(r["score"], 6))
             for r in fidx.search(_q(), k=None).collect()}
    assert {d for d, _ in first} == {d for d in range(5, 26) if d % 4 == 1}
    cdir = os.path.join(fidx.path, "filter_cache", "v0")
    assert os.path.isdir(cdir) and os.listdir(cdir)

    # the cached path must not recompute the filter's doc set
    def boom(*a, **k):  # pragma: no cover - called means cache missed
        raise AssertionError("filter posting scan re-ran despite cache")

    monkeypatch.setattr(W, "_filter_docs_df", boom)
    second = {(r["doc_id"], round(r["score"], 6))
              for r in fidx.search(_q(), k=None).collect()}
    assert second == first


def test_filter_only_query_served_from_cache(fidx, monkeypatch):
    import ferret_spark.wand as W

    q = RangeQuery(field="num", lower=30, upper=39, typed=True)
    got = {r["doc_id"] for r in fidx.search(q, k=None).collect()}
    assert got == set(range(30, 40))
    monkeypatch.setattr(W, "_filter_docs_df", lambda *a, **k: 1 / 0)
    again = {r["doc_id"] for r in fidx.search(q, k=None).collect()}
    assert again == got


def test_cache_disabled_flag(fidx):
    fidx.filter_doc_cache = False
    q = RangeQuery(field="num", lower=0, upper=3, typed=True)
    got = {r["doc_id"] for r in fidx.search(q, k=None).collect()}
    assert got == {0, 1, 2, 3}
    tag_dirs = []
    root = os.path.join(fidx.path, "filter_cache", "v0")
    if os.path.isdir(root):
        tag_dirs = os.listdir(root)
    # the disabled search must not have added a new cache entry for ITS key
    from ferret_spark.wand import ConstantScoreTerms, _filter_cache_key

    tag = _filter_cache_key(
        ConstantScoreTerms(field="num", terms=("0", "1", "2", "3"))
    )
    assert tag not in tag_dirs


def test_mutation_invalidates_cache(spark, tmp_path):
    from ferret_spark.ind import FerretIndex

    rows = [{"doc_id": i, "content": "tok", "num": str(i)} for i in range(10)]
    idx = FerretIndex(
        spark, str(tmp_path / "mut"),
        {"content": "whitespace", "num": "keyword"}, seg_size=8,
    )
    idx.add_documents(spark.createDataFrame(rows), doc_id_col="doc_id")
    q = RangeQuery(field="num", lower=2, upper=6, typed=True)
    got = {r["doc_id"] for r in idx.search(q, k=None).collect()}
    assert got == set(range(2, 7))
    gen0 = idx.index.generation
    more = [{"doc_id": i, "content": "tok", "num": str(i + 3)} for i in range(4)]
    idx.add_documents(spark.createDataFrame(more), doc_id_col="doc_id")
    assert idx.index.generation > gen0
    # stale generation cache dirs are gone; query sees the new docs
    fc = os.path.join(idx.path, "filter_cache")
    if os.path.isdir(fc):
        assert all(d == f"v{idx.index.generation}" for d in os.listdir(fc))
    got2 = {r["doc_id"] for r in idx.search(q, k=None).collect()}
    base = idx.index.id_ranges[1][0]
    assert got2 == set(range(2, 7)) | {base + i for i in range(4) if 2 <= i + 3 <= 6}


def test_filter_cache_gc_after_optimize(spark, tmp_path):
    """optimize() bumps the generation and must leave only the live
    generation's filter_cache dir behind (stale v{g} dirs would otherwise
    accumulate unboundedly over a long-lived mutating index)."""
    from ferret_spark.ind import FerretIndex
    from ferret_spark.query import RangeQuery

    rows = [{"doc_id": i, "content": "tok", "num": str(i)} for i in range(12)]
    idx = FerretIndex(
        spark, str(tmp_path / "gc_opt"),
        {"content": "whitespace", "num": "keyword"}, seg_size=8,
    )
    idx.add_documents(spark.createDataFrame(rows), doc_id_col="doc_id")
    q = RangeQuery(field="num", lower=3, upper=8, typed=True)
    assert {r["doc_id"] for r in idx.search(q, k=None).collect()} == set(
        range(3, 9)
    )
    fc = os.path.join(idx.path, "filter_cache")
    assert os.path.isdir(fc) and os.listdir(fc)
    stale = set(os.listdir(fc))
    idx.optimize()
    cur = f"v{idx.index.generation}"
    left = set(os.listdir(fc)) if os.path.isdir(fc) else set()
    assert left <= {cur}
    assert not (stale & left)
    # cache repopulates under the new generation and stays correct
    assert {r["doc_id"] for r in idx.search(q, k=None).collect()} == set(
        range(3, 9)
    )
