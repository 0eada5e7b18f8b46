"""Highlighter excerpt-selection goldens ported from the reference's
tm_searcher.rb test_highlighter (ruby/test/unit/search/tm_searcher.rb:
267-400) — token-exact strings through the sliding-window excerpt PQ,
zero-and-recalc selection, padding, merge, expand and ellipsis rules
(searcher_highlight c/src/search.c:836-965)."""

from ferret_spark.highlight import highlight
from ferret_spark.query import (
    BooleanQuery,
    Clause,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    SHOULD,
    TermQuery,
)

TEXT = (
    "the words we are searching for are one and two also "
    "sometimes looking for them as a phrase like this; one "
    "two lets see how it goes"
)
DATES = "20070505 20071230 20060920 20081111"


def _hl(q, text, **kw):
    kw.setdefault("field", "field")
    return highlight("whitespace", q, text, **kw)


def test_term_one_excerpt():
    q = TermQuery(field="field", term="one")
    assert _hl(q, TEXT, excerpt_length=10, num_excerpts=1) == [
        "...are <b>one</b>..."
    ]


def test_term_two_excerpts():
    q = TermQuery(field="field", term="one")
    assert _hl(q, TEXT, excerpt_length=10, num_excerpts=2) == [
        "...are <b>one</b>...",
        "...this; <b>one</b>...",
    ]


def test_term_three_excerpts_pads_at_start():
    q = TermQuery(field="field", term="one")
    assert _hl(q, TEXT, excerpt_length=10, num_excerpts=3) == [
        "the words...",
        "...are <b>one</b>...",
        "...this; <b>one</b>...",
    ]


def test_term_four_excerpts_longer_start_pad():
    q = TermQuery(field="field", term="one")
    assert _hl(q, TEXT, excerpt_length=10, num_excerpts=4) == [
        "the words we are...",
        "...are <b>one</b>...",
        "...this; <b>one</b>...",
    ]


def test_term_five_excerpts_merges_start():
    q = TermQuery(field="field", term="one")
    assert _hl(q, TEXT, excerpt_length=10, num_excerpts=5) == [
        "the words we are searching for are <b>one</b>...",
        "...this; <b>one</b>...",
    ]


def test_term_twenty_excerpts_whole_field():
    q = TermQuery(field="field", term="one")
    assert _hl(q, TEXT, excerpt_length=10, num_excerpts=20) == [
        "the words we are searching for are <b>one</b> and two also "
        "sometimes looking for them as a phrase like this; <b>one</b> "
        "two lets see how it goes"
    ]


def test_term_long_excerpt_whole_field():
    q = TermQuery(field="field", term="one")
    assert _hl(q, TEXT, excerpt_length=1000, num_excerpts=1) == [
        "the words we are searching for are <b>one</b> and two also "
        "sometimes looking for them as a phrase like this; <b>one</b> "
        "two lets see how it goes"
    ]


def _bool(*qs):
    return BooleanQuery(clauses=tuple(Clause(q, SHOULD) for q in qs))


def test_bool_two_terms():
    q = _bool(
        TermQuery(field="field", term="one"),
        TermQuery(field="field", term="two"),
    )
    assert _hl(q, TEXT, excerpt_length=15, num_excerpts=2) == [
        "...<b>one</b> and <b>two</b>...",
        "...this; <b>one</b> <b>two</b>...",
    ]


def test_bool_terms_plus_phrase_merges_range():
    q = _bool(
        TermQuery(field="field", term="one"),
        TermQuery(field="field", term="two"),
        PhraseQuery.of("field", ["one", "two"]),
    )
    assert _hl(q, TEXT, excerpt_length=15, num_excerpts=2) == [
        "...<b>one</b> and <b>two</b>...",
        "...this; <b>one two</b>...",
    ]


def test_phrase_match_outranks_on_score():
    # the phrase site is the merger of three matches -> higher priority
    q = _bool(
        TermQuery(field="field", term="one"),
        TermQuery(field="field", term="two"),
        PhraseQuery.of("field", ["one", "two"]),
    )
    assert _hl(q, TEXT, excerpt_length=15, num_excerpts=1) == [
        "...this; <b>one two</b>..."
    ]


def test_wrong_field_no_matches():
    q = TermQuery(field="wrong_field", term="one")
    assert _hl(q, TEXT, excerpt_length=15, num_excerpts=1) == []


def test_two_phrases_and_terms():
    q = _bool(
        PhraseQuery.of("field", ["the", "words"]),
        PhraseQuery.of("field", ["for", "are", "one", "and", "two"]),
        TermQuery(field="field", term="words"),
        TermQuery(field="field", term="one"),
        TermQuery(field="field", term="two"),
    )
    assert _hl(q, TEXT, excerpt_length=10, num_excerpts=1) == [
        "<b>the words</b>..."
    ]
    assert _hl(q, TEXT, excerpt_length=10, num_excerpts=2) == [
        "<b>the words</b>...",
        "...<b>one</b> <b>two</b>...",
    ]


def test_range_and_prefix_highlight():
    cases = [
        (
            RangeQuery(field="dates", lower="20081111", include_lower=True),
            "20070505 20071230 20060920 <b>20081111</b>",
        ),
        (
            RangeQuery(field="dates", lower="20070101", include_lower=True),
            "<b>20070505</b> <b>20071230</b> 20060920 <b>20081111</b>",
        ),
        (
            PrefixQuery(field="dates", prefix="2007"),
            "<b>20070505</b> <b>20071230</b> 20060920 20081111",
        ),
    ]
    for q, expected in cases:
        got = highlight(
            "whitespace", q, DATES, field="dates",
            excerpt_length=150, num_excerpts=2,
        )
        assert got == [expected], (q, got)


def test_span_near_highlight():
    """spanq_get_matchv_i: spans compact to full ranges, then each scoring
    term occurrence inside a span highlights individually."""
    from ferret_spark.spans import SpanNearQuery, SpanTermQuery

    q = SpanNearQuery(
        clauses=(
            SpanTermQuery(field="field", term="one"),
            SpanTermQuery(field="field", term="two"),
        ),
        slop=0,
        in_order=True,
    )
    got = _hl(q, TEXT, excerpt_length=15, num_excerpts=1)
    assert got == ["...this; <b>one</b> <b>two</b>..."]


def test_span_not_excludes_exc_terms():
    from ferret_spark.spans import SpanNotQuery, SpanTermQuery

    # "one" spans not near... exclusion never highlights its own terms
    q = SpanNotQuery(
        inc=SpanTermQuery(field="field", term="one"),
        exc=SpanTermQuery(field="field", term="nonexistent"),
    )
    got = _hl(q, TEXT, excerpt_length=10, num_excerpts=2)
    assert got == ["...are <b>one</b>...", "...this; <b>one</b>..."]
