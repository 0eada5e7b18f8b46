"""Standalone FilteredQuery surface (c/src/q_filtered_query.c): the hit
score is the sub-query's score unchanged; the filter only constrains the
doc set, and term/range filters flow through the per-generation cached
filter machinery."""

import numpy as np
import pytest

import ferret_spark as fs
from ferret_spark.oracle import OracleIndex


ROWS = [
    {"id": i, "content": f"alpha beta w{i % 5} tail", "grp": f"g{i % 3}"}
    for i in range(30)
]
FC = {"content": "whitespace", "grp": "keyword"}


@pytest.fixture(scope="module")
def oidx():
    return OracleIndex(ROWS, FC)


def test_scores_equal_subquery_scores(oidx):
    q = fs.TermQuery(field="content", term="alpha")
    base = dict(oidx.search(q, k=10**6))
    fq = fs.FilteredQuery(
        query=q, filter=fs.QueryFilter(fs.TermQuery(field="grp", term="g1"))
    )
    hits = oidx.search(fq, k=10**6)
    assert hits, "filter should keep the g1 docs"
    for doc, score in hits:
        assert doc % 3 == 1
        assert np.float32(score) == np.float32(base[doc])
    assert len(hits) == sum(1 for r in ROWS if r["id"] % 3 == 1)


def test_range_filter(oidx):
    q = fs.TermQuery(field="content", term="beta")
    fq = fs.FilteredQuery(
        query=q,
        filter=fs.RangeFilter(field="grp", lower="g0", upper="g1"),
    )
    hits = oidx.search(fq, k=10**6)
    assert hits and all(doc % 3 in (0, 1) for doc, _ in hits)


def test_filtered_query_segment_engine(spark, tmp_path):
    from ferret_spark.ind import FerretIndex

    df = spark.createDataFrame(
        [(r["id"], r["content"], r["grp"]) for r in ROWS],
        "doc_id long, content string, grp string",
    )
    idx = FerretIndex(spark, str(tmp_path / "idx"), FC, seg_size=8)
    idx.add_documents(df, doc_id_col="doc_id")

    q = fs.TermQuery(field="content", term="alpha")
    base = {
        r["doc_id"]: np.float32(r["score"])
        for r in idx.search(q, k=None).collect()
    }
    fq = fs.FilteredQuery(
        query=q,
        filter=fs.RangeFilter(field="grp", lower="g1", upper="g1"),
    )
    hits = idx.search(fq, k=None).collect()
    assert hits and all(r["doc_id"] % 3 == 1 for r in hits)
    for r in hits:
        assert np.float32(r["score"]) == base[r["doc_id"]]
    # the range filter landed in the per-generation doc-set cache
    import os

    fc = os.path.join(idx.path, "filter_cache")
    assert os.path.isdir(fc) and any(os.scandir(fc))
