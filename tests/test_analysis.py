"""Tokenizer/filter goldens ported from the reference
(c/test/test_analysis.c, ruby/test/unit/analysis/tc_token_stream.rb),
restricted to the v1 pipeline (FIXTURES.md §5)."""

import pandas as pd

from ferret_spark.analysis import (
    ENGLISH_STOP_WORDS,
    Analyzer,
    get_analyzer,
)

TEXT = 'DBalmain@gmail.com is My e-mail 52   #$ Address. 23#!$'


def terms(pairs):
    return [t for t, _ in pairs]


def positions(pairs):
    return [p for _, p in pairs]


def test_whitespace_tokenizer():
    a = Analyzer("whitespace", lowercase=False)
    assert terms(a.analyze(TEXT)) == [
        "DBalmain@gmail.com", "is", "My", "e-mail", "52", "#$",
        "Address.", "23#!$",
    ]
    assert positions(a.analyze(TEXT)) == list(range(8))


def test_whitespace_lower():
    a = get_analyzer("whitespace")
    assert terms(a.analyze(TEXT)) == [
        "dbalmain@gmail.com", "is", "my", "e-mail", "52", "#$",
        "address.", "23#!$",
    ]


def test_letter_tokenizer():
    a = Analyzer("letter", lowercase=False)
    assert terms(a.analyze(TEXT)) == [
        "DBalmain", "gmail", "com", "is", "My", "e", "mail", "Address",
    ]


def test_letter_lower():
    a = get_analyzer("letter")
    assert terms(a.analyze(TEXT)) == [
        "dbalmain", "gmail", "com", "is", "my", "e", "mail", "address",
    ]


def test_stop_filter_position_gaps():
    # pos_inc accumulation across dropped tokens (c/src/analysis.c:1143-1150)
    a = Analyzer("whitespace", lowercase=True, stop_words=ENGLISH_STOP_WORDS)
    got = a.analyze("the quick brown fox and the lazy dog")
    assert got == [("quick", 1), ("brown", 2), ("fox", 3), ("lazy", 6), ("dog", 7)]


def test_hyphen_filter():
    # concat then parts, pos_inc 0/1 (c/src/analysis.c:1271-1335)
    a = Analyzer("whitespace", lowercase=True, hyphens=True)
    got = a.analyze("start multi-hyphened-word end")
    assert got == [
        ("start", 0),
        ("multihyphenedword", 1),
        ("multi", 1),
        ("hyphened", 2),
        ("word", 3),
        ("end", 4),
    ]


def test_standard_tokenizer_rules():
    a = Analyzer("standard", lowercase=True)
    got = terms(a.analyze("Dave's résumé, at http://www.davebalmain.com/ 1234.23"))
    assert "dave" in got
    # known-proto URLs drop the proto (scanner `skip`) + trailing slash
    assert "www.davebalmain.com" in got
    assert "1234.23" in got
    # acronym dots stripped
    assert terms(a.analyze("I.B.M. rocks")) == ["ibm", "rocks"]
    # hyphen compound kept whole
    assert terms(a.analyze("wal-mart under_score")) == ["wal-mart", "under_score"]


# token-by-token goldens from the reference test suite
# (do_standard_tokenizer / do_mb_standard_tokenizer / test_standard_analyzer,
# c/test/test_analysis.c:484-700)
STD_TOK_TEXT = (
    "DBalmain@gmail.com is My e-mail -52  #$ Address. 23#!$ "
    "http://www.google.com/results/ T.N.T. 123-1235-ASD-1234 "
    "underscored_word, won't we're"
)
STD_TOK_EXPECT = [
    "DBalmain@gmail.com", "is", "My", "e-mail", "-52", "Address", "23",
    "www.google.com/results", "TNT", "123-1235-ASD-1234",
    "underscored_word", "won't", "we're",
]


def test_standard_tokenizer_reference_goldens():
    a = Analyzer("standard", lowercase=False)
    assert terms(a.analyze(STD_TOK_TEXT)) == STD_TOK_EXPECT


def test_mb_standard_tokenizer_reference_goldens():
    text = (
        STD_TOK_TEXT + " 23#!$ ÁÄGÇ®ÊËÌ¯ÚØÃ¬ÖÎÍ "
        "badchar it's groups' Barnes&Noble file:///home/user/ "
        "svn://www.davebalmain.com/ www,.google.com www.google.com "
        "dave@balmain@gmail.com \"quoted string\" continue *star"
    )
    expect = STD_TOK_EXPECT + [
        "23", "ÁÄGÇ", "ÊËÌ", "ÚØÃ", "ÖÎÍ",
        "badchar", "it", "groups", "Barnes&Noble", "home/user",
        "svn://www.davebalmain.com", "www", "google.com", "www.google.com",
        "dave@balmain", "gmail.com", "quoted", "string", "continue", "star",
    ]
    a = Analyzer("standard_mb", lowercase=False)
    assert terms(a.analyze(text)) == expect


def test_standard_analyzer_reference_goldens():
    # test_standard_analyzer (c/test/test_analysis.c:591-615): full chain
    # with HyphenFilter — (term, position) pairs derived from the golden
    # pos_inc stream 1,2,1,0,1,3,1,1,1,1
    text = (
        "DBalmain@gmail.com is My e-mail and the Address. -23!$ "
        "http://www.google.com/results/ T.N.T. 123-1235-ASD-1234"
    )
    a = get_analyzer("standard_hyphen")
    got = a.analyze(text)
    assert got == [
        ("dbalmain@gmail.com", 0),
        ("my", 2),
        ("email", 3),
        ("e", 3),
        ("mail", 4),
        ("address", 7),
        ("-23", 8),
        ("www.google.com/results", 9),
        ("tnt", 10),
        ("123-1235-asd-1234", 11),
    ]


def test_pandas_surface_matches_python():
    texts = [TEXT, "the quick brown fox", "", "word1 word2 word1"]
    for name in ["letter", "whitespace", "standard_nostop"]:
        a = get_analyzer(name)
        vec = a.tokens_pandas(pd.Series(texts))
        for text, arr in zip(texts, vec):
            got = [(t, i) for i, t in enumerate(arr) if t is not None]
            assert got == a.analyze(text), (name, text)


def test_stop_filter_pandas_none_slots():
    a = Analyzer("whitespace", lowercase=True, stop_words=ENGLISH_STOP_WORDS)
    arr = a.tokens_pandas(pd.Series(["the quick brown fox"]))[0]
    assert arr == [None, "quick", "brown", "fox"]


def test_stem_filter_golden():
    # tc_token_stream.rb:455-464 — debate variants all stem to "debat"
    a = Analyzer("letter", lowercase=True, stem=True)
    got = terms(a.analyze("Debate Debates DEBATED DEBating Debater"))
    assert got == ["debat"] * 5


def test_stem_pandas_matches_python():
    a = get_analyzer("stem_en")
    texts = ["Debate Debates DEBATED", "running runner ran", ""]
    vec = a.tokens_pandas(pd.Series(texts))
    for text, arr in zip(texts, vec):
        got = [(t, i) for i, t in enumerate(arr) if t is not None]
        assert got == a.analyze(text)


def test_mapping_filter_golden():
    # tc_token_stream.rb:376-430 (subset): accent folding incl. the
    # multi-char 'œ' -> 'oek' longest-match case
    mapping = {}
    for ks, v in [
        ("àáâãäåāă", "a"), ("æ", "ae"), ("ďđ", "d"), ("çćčĉċ", "c"),
        ("èéêëēęěĕė", "e"), ("œ", "oek"), ("ùúûüūůűŭũų", "u"),
    ]:
        for k in ks:
            mapping[k] = v
    a = Analyzer("letter_unicode", lowercase=False, mappings=mapping)
    got = terms(a.analyze("aàáâãäåāăb cæd eďđf gçćčĉċh cœd"))
    assert got == ["aaaaaaaaab", "caed", "eddf", "gccccch", "coekd"]


def test_mapping_pandas_matches_python():
    a = Analyzer("letter_unicode", lowercase=True, mappings={"é": "e", "œ": "oek"})
    texts = ["café cœur", "plain"]
    vec = a.tokens_pandas(pd.Series(texts))
    for text, arr in zip(texts, vec):
        got = [(t, i) for i, t in enumerate(arr) if t is not None]
        assert got == a.analyze(text)


def test_stemmed_search_end_to_end():
    # stemmed index: morphological variants match each other
    from ferret_spark.oracle import OracleIndex
    from ferret_spark.query import TermQuery

    rows = [
        {"content": "the runner was running fast"},
        {"content": "he runs daily"},
        {"content": "walking is fine"},
    ]
    idx = OracleIndex(rows, {"content": "stem_en"})
    # query term is analyzed by the same pipeline at parse time; here we
    # pass the stemmed form directly (parser handles analysis)
    assert idx.hits(TermQuery(field="content", term="run")) == {0, 1}
    from ferret_spark.parser import QueryParser

    p = QueryParser(default_field="content", fields=["content"],
                    tokenized_fields=["content"], analyzer="stem_en")
    q = p.parse("running")
    assert idx.hits(q) == {0, 1}
