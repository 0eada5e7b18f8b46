"""Classic TF-IDF similarity mode — reference-score parity with doc boosts
and norm-byte quantization. These are the reference's own top-doc goldens
that BM25 cannot reproduce (they depend on TF-IDF + boost=row+1):
tm_searcher.rb:97-107 (AND top=14, AND+SHOULD top=8) and
c/test/test_search.c:587-588 (phrase slop-4 top=17)."""

import numpy as np
import pytest

from ferret_spark.fixtures import GOLDEN_FIELD_CONFIG, golden_rows
from ferret_spark.oracle import OracleIndex
from ferret_spark.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    MatchAllQuery,
    PhraseQuery,
    TermQuery,
)
from ferret_spark.segments import SegmentIndexBuilder
from ferret_spark.similarity import byte2float, float2byte


def T(t):
    return TermQuery(field="content", term=t)


@pytest.fixture(scope="module")
def tfidf_oracle():
    rows = [dict(r, _boost=i + 1.0) for i, r in enumerate(golden_rows())]
    return OracleIndex(
        rows, GOLDEN_FIELD_CONFIG, similarity="tfidf", boost_col="_boost"
    )


def test_norm_byte_codec_roundtrip():
    # quantization lattice: decode(encode(x)) <= x, monotone, exact at
    # powers of two (c/src/helper.c)
    for f in [0.5, 1.0, 2.0, 4.0, 0.25]:
        assert byte2float(float2byte(f)) == f
    assert float2byte(0.0) == 0 and byte2float(0) == 0.0
    prev = -1.0
    for b in range(0, 256, 7):
        v = byte2float(b)
        assert v >= prev
        prev = v


def test_reference_top_docs_boolean(tfidf_oracle):
    # tm_searcher.rb:97-103 — top must be doc 14
    q = BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST))
    hits = tfidf_oracle.search(q, k=18)
    assert {d for d, _ in hits} == {2, 3, 6, 8, 11, 14}
    assert hits[0][0] == 14
    # :105-107 — adding word2 SHOULD flips top to doc 8
    q2 = BooleanQuery.of(
        (T("word1"), MUST), (T("word3"), MUST), (T("word2"), SHOULD)
    )
    hits2 = tfidf_oracle.search(q2, k=18)
    assert {d for d, _ in hits2} == {2, 3, 6, 8, 11, 14}
    assert hits2[0][0] == 8


def test_reference_top_doc_phrase_slop4(tfidf_oracle):
    # test_search.c:587-588 — "quick brown fox"~4 hits {1,16,17} top=17
    q = PhraseQuery.of("content", ["quick", "brown", "fox"], slop=4)
    hits = tfidf_oracle.search(q, k=18)
    assert {d for d, _ in hits} == {1, 16, 17}
    assert hits[0][0] == 17


@pytest.fixture(scope="module")
def tfidf_pair(spark, tmp_path_factory):
    rows = [dict(r, doc_id=i) for i, r in enumerate(golden_rows())]
    path = str(tmp_path_factory.mktemp("tfidf_idx"))
    sidx = SegmentIndexBuilder(
        spark, path, GOLDEN_FIELD_CONFIG, seg_size=5
    ).build(spark.createDataFrame(rows), doc_id_col="doc_id")
    boosts = {i: i + 1.0 for i in range(18)}
    oracle_rows = [dict(r, _boost=i + 1.0) for i, r in enumerate(golden_rows())]
    oracle = OracleIndex(
        oracle_rows, GOLDEN_FIELD_CONFIG, similarity="tfidf", boost_col="_boost"
    )
    return oracle, sidx, boosts


TFIDF_QUERIES = [
    T("word2"),
    T("quick"),
    BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST)),
    BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST), (T("word2"), SHOULD)),
    BooleanQuery.of((T("word3"), SHOULD), (T("word2"), SHOULD)),
    BooleanQuery.of((T("word3"), MUST), (T("word2"), MUST_NOT)),
    PhraseQuery.of("content", ["quick", "brown", "fox"], slop=4),
    PhraseQuery.of("content", ["quick", None, "fox"], slop=1),
    MatchAllQuery(),
]


@pytest.mark.parametrize(
    "q", TFIDF_QUERIES, ids=[str(i) for i in range(len(TFIDF_QUERIES))]
)
def test_tfidf_rank_identity_spark(tfidf_pair, q):
    oracle, sidx, boosts = tfidf_pair
    exp = oracle.search(q, k=20)
    got = [
        (r["doc_id"], r["score"])
        for r in sidx.search(
            q, k=20, similarity="tfidf", doc_boosts=boosts
        ).collect()
    ]
    assert [d for d, _ in got] == [d for d, _ in exp], (got, exp)
    for (gd, gs), (ed, es) in zip(got, exp):
        assert np.float32(gs) == np.float32(es), (gd, gs, es)
