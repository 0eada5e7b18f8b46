"""Span query goldens ported from ruby/test/unit/search/tc_spans.rb
(30-doc corpus :16-47; expected hit sets per test). Hit sets are
scoring-independent and port verbatim; rank identity between oracle and
the segment engine is asserted on top."""

import numpy as np
import pytest

from ferret_spark.oracle import OracleIndex
from ferret_spark.segments import SegmentIndexBuilder
from ferret_spark.spans import (
    SpanFirstQuery,
    SpanMultiTermQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPrefixQuery,
    SpanTermQuery,
)

LINES = [
    "start finish one two three four five six seven",
    "start one finish two three four five six seven",
    "start one two finish three four five six seven flip",
    "start one two three finish four five six seven",
    "start one two three four finish five six seven",
    "start one two three four five finish six seven",
    "start one two three four five six finish seven eight",
    "start one two three four five six seven finish eight nine",
    "start one two three four five six finish seven eight",
    "start one two three four five finish six seven",
    "start one two three four finish five six seven",
    "start one two three finish four five six seven",
    "start one two finish three four five six seven flop",
    "start one finish two three four five six seven",
    "start finish one two three four five six seven",
    "start start  one two three four five six seven",
    "finish start one two three four five six seven",
    "finish one start two three four five six seven toot",
    "finish one two start three four five six seven",
    "finish one two three start four five six seven",
    "finish one two three four start five six seven",
    "finish one two three four five start six seven",
    "finish one two three four five six start seven eight",
    "finish one two three four five six seven start eight nine",
    "finish one two three four five six start seven eight",
    "finish one two three four five start six seven",
    "finish one two three four start five six seven",
    "finish one two three start four five six seven",
    "finish one two start three four five six seven",
    "finish one start two three four five six seven",
    "finish start one two three four five six seven",
]

FC = {"content": "whitespace"}

T1 = SpanTermQuery(field="content", term="start")
T2 = SpanTermQuery(field="content", term="finish")
T3 = SpanTermQuery(field="content", term="two")
T4 = SpanTermQuery(field="content", term="five")

FINISH_FIRST = list(range(16, 31))

GOLDENS = [
    # tc_spans.rb test_span_term_query
    (SpanTermQuery(field="content", term="nine"), {7, 23}),
    (SpanTermQuery(field="content", term="eight"), {6, 7, 8, 22, 23, 24}),
    # test_span_multi_term_query
    (
        SpanMultiTermQuery(field="content", terms=("eight", "nine")),
        {6, 7, 8, 22, 23, 24},
    ),
    (
        SpanMultiTermQuery(field="content", terms=("flip", "flop", "toot", "nine")),
        {2, 7, 12, 17, 23},
    ),
    # test_span_prefix_query
    (SpanPrefixQuery(field="content", prefix="fl"), {2, 12}),
    # test_span_near_query
    (SpanNearQuery(clauses=(T1, T2), in_order=True), {0, 14}),
    (SpanNearQuery(clauses=(T1, T2)), {0, 14, 16, 30}),
    (SpanNearQuery(clauses=(T1, T2), slop=1, in_order=True), {0, 1, 13, 14}),
    (SpanNearQuery(clauses=(T1, T2), slop=1), {0, 1, 13, 14, 16, 17, 29, 30}),
    (
        SpanNearQuery(clauses=(T1, T2), slop=4, in_order=True),
        {0, 1, 2, 3, 4, 10, 11, 12, 13, 14},
    ),
    (
        SpanNearQuery(clauses=(T1, T2), slop=4),
        {0, 1, 2, 3, 4, 10, 11, 12, 13, 14, 16, 17, 18, 19, 20, 26, 27, 28, 29, 30},
    ),
    (
        SpanNearQuery(
            clauses=(
                SpanPrefixQuery(field="content", prefix="se"),
                SpanPrefixQuery(field="content", prefix="fl"),
            ),
            slop=0,
        ),
        {2, 12},
    ),
    # test_span_not_query
    (
        SpanNotQuery(
            inc=SpanNearQuery(clauses=(T1, T2), slop=4, in_order=True),
            exc=SpanNearQuery(clauses=(T3, T4), slop=4, in_order=True),
        ),
        {0, 1, 13, 14},
    ),
    (
        SpanNotQuery(
            inc=SpanNearQuery(clauses=(T1, T2), slop=4),
            exc=SpanNearQuery(clauses=(T3, T4), slop=4, in_order=True),
        ),
        {0, 1, 13, 14, 16, 17, 29, 30},
    ),
    (
        SpanNotQuery(
            inc=SpanNearQuery(clauses=(T1, T3), slop=4, in_order=True),
            exc=SpanNearQuery(clauses=(T2, T4), slop=8),
        ),
        {2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 15},
    ),
    # test_span_first_query
    (SpanFirstQuery(match=T2, end=1), set(FINISH_FIRST)),
    (
        SpanFirstQuery(match=T2, end=5),
        {0, 1, 2, 3, 11, 12, 13, 14} | set(FINISH_FIRST),
    ),
    # test_span_or_query
    (
        SpanOrQuery(
            clauses=(
                SpanNearQuery(clauses=(T1, T2), slop=1, in_order=True),
                SpanNearQuery(clauses=(T2, T4), slop=0),
            )
        ),
        {0, 1, 4, 5, 9, 10, 13, 14},
    ),
    (
        SpanOrQuery(
            clauses=(
                SpanNearQuery(clauses=(T1, T2), slop=0),
                SpanNearQuery(clauses=(T2, T4), slop=1),
            )
        ),
        {0, 3, 4, 5, 6, 8, 9, 10, 11, 14, 16, 30},
    ),
]


@pytest.fixture(scope="module")
def oracle():
    return OracleIndex([{"content": ln} for ln in LINES], FC)


@pytest.mark.parametrize(
    "q,expected", GOLDENS, ids=[str(i) for i in range(len(GOLDENS))]
)
def test_span_hit_sets_oracle(oracle, q, expected):
    assert oracle.hits(q) == expected


@pytest.fixture(scope="module")
def seg(spark, tmp_path_factory):
    rows = [{"doc_id": i, "content": ln} for i, ln in enumerate(LINES)]
    path = str(tmp_path_factory.mktemp("span_idx"))
    return SegmentIndexBuilder(spark, path, FC, seg_size=7).build(
        spark.createDataFrame(rows), doc_id_col="doc_id"
    )


SPARK_SUBSET = [0, 3, 5, 8, 11, 12, 14, 16, 18]


@pytest.mark.parametrize("i", SPARK_SUBSET)
def test_span_rank_identity_spark(oracle, seg, i):
    q, expected = GOLDENS[i]
    got = [(r["doc_id"], r["score"]) for r in seg.search(q, k=31).collect()]
    assert {d for d, _ in got} == expected
    exp = oracle.search(q, k=31)
    assert [d for d, _ in got] == [d for d, _ in exp]
    for (gd, gs), (ed, es) in zip(got, exp):
        assert np.float32(gs) == np.float32(es), (gd, gs, es)


def test_spannot_scoring_terms_exclude_exc():
    # spanxq_get_terms returns only the inclusion clause's terms
    # (c/src/q_span.c:2202-2205) — exc must not enter the idf sum
    from ferret_spark.spans import (
        SpanNotQuery,
        SpanTermQuery,
        scoring_terms,
        span_terms,
    )

    q = SpanNotQuery(
        inc=SpanTermQuery(field="content", term="quick"),
        exc=SpanTermQuery(field="content", term="fox"),
    )
    assert scoring_terms(q) == ["quick"]
    assert sorted(span_terms(q)) == ["fox", "quick"]
