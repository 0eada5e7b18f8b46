"""Sort-by-field goldens ported from
ruby/test/unit/search/tc_search_and_sort.rb (the 10-doc corpus at :14-25;
expected orders :110-160). Score-dependent orders that rely on the
reference's doc-boost TF-IDF are not portable to BM25 and are skipped;
field-sort orders (with doc_id tie-break) port verbatim."""

import pytest

from ferret_spark.query import TermQuery
from ferret_spark.segments import SegmentIndexBuilder
from ferret_spark.sorting import (
    DOC_ID,
    SCORE,
    SortField,
    parse_sort,
    scan,
    search_sorted,
    search_stats,
    sort_to_s,
)

DOCS = [
    {"x": "findall", "string": "a", "int": "6", "float": "0.01"},
    {"x": "findall", "string": "c", "int": "5", "float": "0.1"},
    {"x": "findall", "string": "e", "int": "2", "float": "0.001"},
    {"x": "findall", "string": "g", "int": "1", "float": "1.0"},
    {"x": "findall", "string": None, "int": "3", "float": "0.0001"},
    {"x": "findall", "string": "", "int": "4", "float": "10.0"},
    {"x": "findall", "string": "h", "int": "5", "float": "0.00001"},
    {"x": "findall", "string": "f", "int": "2", "float": "100.0"},
    {"x": "findall", "string": "d", "int": "3", "float": "1000.0"},
    {"x": "findall", "string": "b", "int": "4", "float": "0.000001"},
]

FC = {"x": "whitespace", "string": "keyword", "int": "keyword", "float": "keyword"}


@pytest.fixture(scope="module")
def sidx(spark, tmp_path_factory):
    rows = [dict(r, doc_id=i) for i, r in enumerate(DOCS)]
    corpus = spark.createDataFrame(rows)
    path = str(tmp_path_factory.mktemp("sort_idx"))
    return SegmentIndexBuilder(spark, path, FC, seg_size=3).build(
        corpus, doc_id_col="doc_id"
    )


Q = TermQuery(field="x", term="findall")

GOLDEN_SORTS = [
    # (sort spec, expected order) — tc_search_and_sort.rb:110-160
    ([SortField("", "doc_id")], [0, 1, 2, 3, 4, 5, 6, 7, 8, 9]),
    ([SortField("int", "integer", reverse=True)], [0, 1, 6, 5, 9, 4, 8, 2, 7, 3]),
    ("int DESC", [0, 1, 6, 5, 9, 4, 8, 2, 7, 3]),
    ([SortField("int", "integer")], [3, 2, 7, 4, 8, 5, 9, 1, 6, 0]),
    ("int", [3, 2, 7, 4, 8, 5, 9, 1, 6, 0]),
    ([SortField("int", "byte")], [3, 2, 7, 4, 8, 5, 9, 1, 6, 0]),
    ([SortField("int", "byte", reverse=True)], [0, 1, 6, 5, 9, 4, 8, 2, 7, 3]),
    ([SortField("float", "float")], [9, 6, 4, 2, 0, 1, 3, 5, 7, 8]),
    ("float, SCORE", [9, 6, 4, 2, 0, 1, 3, 5, 7, 8]),
    ([SortField("float", "float", reverse=True)], [8, 7, 5, 3, 1, 0, 2, 4, 6, 9]),
    ("string", [0, 9, 1, 8, 2, 7, 3, 6, 4, 5]),
    ([SortField("int"), SortField("string")], [3, 2, 7, 8, 4, 9, 5, 1, 6, 0]),
    (
        "int DESC, string DESC",
        [0, 6, 1, 5, 9, 4, 8, 7, 2, 3],
    ),
]


@pytest.mark.parametrize(
    "spec,expected",
    GOLDEN_SORTS,
    ids=[str(i) for i in range(len(GOLDEN_SORTS))],
)
def test_sort_golden(sidx, spec, expected):
    got = [r["doc_id"] for r in search_sorted(sidx, Q, spec, k=10).collect()]
    assert got == expected
    # offset/limit window (do_test_top_docs :42-52)
    got2 = [
        r["doc_id"] for r in search_sorted(sidx, Q, spec, k=3, offset=3).collect()
    ]
    assert got2 == expected[3:6]


def test_sort_field_to_s():
    # tc_search_and_sort.rb:55-95
    assert SortField("", "score").to_s() == "<SCORE>"
    assert SortField("MyScore", "score", True).to_s() == "MyScore:<SCORE>!"
    assert SortField("", "doc_id").to_s() == "<DOC>"
    assert SortField("MyDoc", "doc_id", True).to_s() == "MyDoc:<DOC>!"
    assert SortField("date", "integer").to_s() == "date:<integer>"
    assert SortField("date", "integer", True).to_s() == "date:<integer>!"
    assert SortField("price", "float").to_s() == "price:<float>"
    assert SortField("content", "string", True).to_s() == "content:<string>!"
    assert SortField("auto_field", "auto").to_s() == "auto_field:<auto>"


def test_sort_to_s():
    assert (
        sort_to_s([SortField("", "score"), SortField("", "doc_id")])
        == "Sort[<SCORE>, <DOC>]"
    )
    assert (
        sort_to_s(parse_sort(["one", "two"]))
        == "Sort[one:<auto>, two:<auto>, <DOC>]"
    )


def test_scan_docid_order(sidx):
    got = [r["doc_id"] for r in scan(sidx, Q, offset=2, limit=4).collect()]
    assert got == [2, 3, 4, 5]


def test_search_stats(sidx):
    st = search_stats(sidx, Q)
    assert st["total_hits"] == 10
    assert st["max_score"] > 0
