"""Hit-set goldens from the reference search suites, run against the
pure-Python oracle searcher (FIXTURES.md §3; sources:
ruby/test/unit/search/tm_searcher.rb, c/test/test_search.c).

Hit SETS are scoring-independent, so they port verbatim even though we
score with BM25 instead of the reference's TF-IDF. Top-doc assertions from
the reference depend on TF-IDF + doc boosts and are NOT ported; instead
rank-identity between oracle and Spark is asserted in test_search_spark.py.
"""

import numpy as np
import pytest

from ferret_spark.fixtures import GOLDEN_FIELD_CONFIG, golden_rows
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
    WildcardQuery,
)


@pytest.fixture(scope="module")
def idx():
    return OracleIndex(golden_rows(), GOLDEN_FIELD_CONFIG)


def T(t, field="content", boost=1.0):
    return TermQuery(field=field, term=t, boost=boost)


def test_term_word2(idx):
    # tm_searcher.rb:6-9 / test_search.c:367
    assert idx.hits(T("word2")) == {1, 4, 8}


def test_term_word1_all(idx):
    assert idx.hits(T("word1")) == set(range(18))


def test_term_quick(idx):
    # test_search.c:413
    assert idx.hits(T("quick")) == {1, 11, 14, 16, 17}


def test_bool_must_must(idx):
    # word1 AND word3 — tm_searcher.rb:97-103
    q = BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST))
    assert idx.hits(q) == {2, 3, 6, 8, 11, 14}


def test_bool_must_should(idx):
    # (word1 AND word3) word2 — SHOULD doesn't widen the MUST set
    q = BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST), (T("word2"), SHOULD))
    assert idx.hits(q) == {2, 3, 6, 8, 11, 14}
    # but doc 8 (the only one matching word2 too) gets the extra score
    scores = dict(idx.search(q, k=18))
    assert all(scores[8] > scores[d] for d in [2, 3, 6, 11, 14])


def test_bool_must_not(idx):
    # word3 NOT word2 — tm_searcher.rb:109-112
    q = BooleanQuery.of((T("word3"), MUST), (T("word2"), MUST_NOT))
    assert idx.hits(q) == {2, 3, 6, 11, 14}


def test_bool_pure_not(idx):
    # NOT word3 => implicit MatchAll MUST (c/src/q_boolean.c:1402-1404)
    # (tm_searcher.rb:114-116: tq2 is field:word3)
    q = BooleanQuery.of((T("word3"), MUST_NOT))
    assert idx.hits(q) == {0, 1, 4, 5, 7, 9, 10, 12, 13, 15, 16, 17}


def test_bool_should_or(idx):
    q = BooleanQuery.of((T("word2"), SHOULD), (T("word3"), SHOULD))
    assert idx.hits(q) == {1, 2, 3, 4, 6, 8, 11, 14}


def test_match_all(idx):
    assert idx.hits(MatchAllQuery()) == set(range(18))


def test_phrase_exact(idx):
    # "quick brown fox" — test_search.c:585
    q = PhraseQuery.of("content", ["quick", "brown", "fox"])
    assert idx.hits(q) == {1}


def test_phrase_slop4_qbf(idx):
    # "quick brown fox"~4 — test_search.c:587-588 (hits {1,16,17}, the
    # slop-0 case is {1} only)
    q = PhraseQuery.of("content", ["quick", "brown", "fox"], slop=4)
    assert idx.hits(q) == {1, 16, 17}
    q1 = PhraseQuery.of("content", ["quick", "brown", "fox"], slop=1)
    assert idx.hits(q1) == {1}


def test_phrase_skip_ladder(idx):
    # "quick <> fox" slop ladder — tm_searcher.rb:139-152
    q = PhraseQuery.of("content", ["quick", None, "fox"])
    assert idx.hits(q) == {1, 11, 14}
    q = PhraseQuery.of("content", ["quick", None, "fox"], slop=1)
    assert idx.hits(q) == {1, 11, 14, 16}
    q = PhraseQuery.of("content", ["quick", None, "fox"], slop=4)
    assert idx.hits(q) == {1, 11, 14, 16, 17}


def test_phrase_multi_term(idx):
    # tm_searcher.rb:256-265: ["quick|fast", "brown|red|hairy", "fox"]
    q = PhraseQuery.of(
        "content", [("quick", "fast"), ("brown", "red", "hairy"), "fox"]
    )
    assert idx.hits(q) == {1, 8, 11, 14}
    q4 = PhraseQuery.of(
        "content", [("quick", "fast"), ("brown", "red", "hairy"), "fox"], slop=4
    )
    assert idx.hits(q4) == {1, 8, 11, 14, 16, 17}


def test_phrase_multi_term_skip(idx):
    # "word1 <> quick|fast": doc 16 has word1@0 quick@2
    q = PhraseQuery.of("content", ["word1", None, ("quick", "fast")])
    assert idx.hits(q) == {16}
    q2 = PhraseQuery.of("content", ["the", ("quick", "fast"), ("brown", "red")])
    assert idx.hits(q2) == {1, 8, 11}


def test_phrase_same_offset_conjunction():
    # Same-offset constraints are conjunctive — the reference's
    # phq_add_term(term, 0) / "a&b" notation (c/test/test_search.c:633-641:
    # "quick red RED&fox"~4 hits only the doc where both align).
    from ferret_spark.oracle import OracleIndex

    rows = [
        {"content": "alpha multi-part-word beta"},
        {"content": "alpha multipartword beta"},
    ]
    idx2 = OracleIndex(
        rows, {"content": "hyphen_ws"}
    )
    # conjunctive: position 1 must hold BOTH the concat and "multi"
    q = PhraseQuery(
        field="content",
        positions=((0, ("alpha",)), (1, ("multipartword",)), (1, ("multi",))),
    )
    assert idx2.hits(q) == {0}


def test_phrase_repeated_terms_slop():
    # repeats + slop exercise sphsc_check_repeats
    # (c/test/test_search.c:644-651: "one two one" hits the doc both ways)
    from ferret_spark.oracle import OracleIndex

    rows = [
        {"content": "word1 word3 one two one"},
        {"content": "word1 one two"},
    ]
    idx2 = OracleIndex(rows, {"content": "whitespace"})
    q = PhraseQuery.of("content", ["one", "two", "one"])
    assert idx2.hits(q) == {0}
    q = PhraseQuery.of("content", ["one", "two", "one"], slop=2)
    assert idx2.hits(q) == {0}


def test_prefix(idx):
    q = PrefixQuery(field="content", prefix="word")
    assert idx.hits(q) == set(range(18))
    q = PrefixQuery(field="category", prefix="cat1")
    assert idx.hits(q) == {0, 1, 2, 3, 4, 13, 14, 15, 16, 17}


def test_wildcard(idx):
    q = WildcardQuery(field="content", pattern="w*d2")
    assert idx.hits(q) == {1, 4, 8}
    q = WildcardQuery(field="content", pattern="q?ick")
    assert idx.hits(q) == {1, 11, 14, 16, 17}


def test_fuzzy(idx):
    # word1/word2/word3 are all within edit distance 1 of "worde"
    q = FuzzyQuery(field="content", term="worde", min_sim=0.5)
    assert idx.hits(q) == set(range(18))
    q = FuzzyQuery(field="content", term="quickk", min_sim=0.7)
    assert idx.hits(q) == {1, 11, 14, 16, 17}


def test_range_string(idx):
    q = RangeQuery(field="date", lower="20051006", upper="20051010")
    assert idx.hits(q) == {6, 7, 8, 9, 10}
    q = RangeQuery(field="date", lower="20051006", upper="20051010",
                   include_lower=False, include_upper=False)
    assert idx.hits(q) == {7, 8, 9}


def test_range_typed(idx):
    # TypedRangeQuery numeric semantics (c/src/q_range.c:330-430)
    q = RangeQuery(field="number", lower=-1.0, upper=1.0, typed=True)
    assert idx.hits(q) == {0, 1, 4, 10, 15, 17}


def test_tie_break_score_desc_doc_asc(idx):
    # all word1-only docs have identical scores -> doc_id ascending
    hits = idx.search(T("word1"), k=18)
    docs = [d for d, _ in hits]
    scores = [s for _, s in hits]
    assert sorted(scores, reverse=True) == scores
    same = [d for d, s in hits if s == hits[0][1]]
    assert same == sorted(same)


def test_scores_are_float32(idx):
    hits = idx.search(T("word2"), k=5)
    assert all(isinstance(s, np.float32) for _, s in hits)


def test_bm25_length_normalization(idx):
    # word2 appears once in docs 1 (len 6), 4 (len 2), 8 (len 7):
    # shortest doc wins under BM25
    hits = idx.search(T("word2"), k=3)
    assert hits[0][0] == 4
    assert [d for d, _ in hits] == [4, 1, 8]
