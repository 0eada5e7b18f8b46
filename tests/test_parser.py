"""FQL parser goldens — ported verbatim from
ruby/test/unit/query_parser/tc_query_parser.rb:10-107 (same parser config:
default_field xxx, fields [xxx, field, f1, f2], tokenized [xxx, f1, f2])."""

import pytest

from ferret_spark.parser import QueryParser, to_s

PAIRS = [
    ["", ""],
    ["*:word", "word field:word f1:word f2:word"],
    ["word", "word"],
    ["field:word", "field:word"],
    ['"word1 word2 word#"', '"word1 word2 word"'],
    ['"word1 %%% word3"', '"word1 <> word3"~1'],
    ['field:"one two three"', 'field:"one two three"'],
    ['field:"one %%% three"', 'field:"one %%% three"'],
    ['f1:"one %%% three"', 'f1:"one <> three"~1'],
    ['field:"one <> three"', 'field:"one <> three"'],
    ['field:"one <> three <>"', 'field:"one <> three"'],
    ['field:"one <> <> <> three <>"', 'field:"one <> <> <> three"'],
    [
        'field:"one <> 222 <> three|four|five <>"',
        'field:"one <> 222 <> three|four|five"',
    ],
    [
        'field:"on1|tw2 THREE|four|five six|seven"',
        'field:"on1|tw2 THREE|four|five six|seven"',
    ],
    ['field:"testing|trucks"', 'field:"testing|trucks"'],
    ["[aaa bbb]", "[aaa bbb]"],
    ["{aaa bbb]", "{aaa bbb]"],
    ["field:[aaa bbb}", "field:[aaa bbb}"],
    ["{aaa bbb}", "{aaa bbb}"],
    ["{aaa>", "{aaa>"],
    ["[aaa>", "[aaa>"],
    ["field:<a\\ aa}", "field:<a aa}"],
    ["<aaa]", "<aaa]"],
    [">aaa", "{aaa>"],
    [">=aaa", "[aaa>"],
    ["<aaa", "<aaa}"],
    ["[A>", "[a>"],
    ["field:<=aaa", "field:<aaa]"],
    ["REQ one REQ two", "+one +two"],
    ["REQ one two", "+one two"],
    ["one REQ two", "one +two"],
    ["+one +two", "+one +two"],
    ["+one two", "+one two"],
    ["one +two", "one +two"],
    ["-one -two", "-one -two"],
    ["-one two", "-one two"],
    ["one -two", "one -two"],
    ["!one !two", "-one -two"],
    ["!one two", "-one two"],
    ["one !two", "one -two"],
    ["NOT one NOT two", "-one -two"],
    ["NOT one two", "-one two"],
    ["one NOT two", "one -two"],
    ["NOT two", "-two +*"],
    ["one two", "one two"],
    ["one OR two", "one two"],
    ["one AND two", "+one +two"],
    ["one two AND three", "one two +three"],
    ["one two OR three", "one two three"],
    ["one (two AND three)", "one (+two +three)"],
    ["one AND (two OR three)", "+one +(two three)"],
    [
        "field:(one AND (two OR three))",
        "+field:one +(field:two field:three)",
    ],
    ["one AND (two OR [aaa vvv})", "+one +(two [aaa vvv})"],
    [
        "one AND (f1:two OR f2:three) AND four",
        "+one +(f1:two f2:three) +four",
    ],
    ["one^1.23", "one^1.23"],
    ["(one AND two)^100.23", "(+one +two)^100.23"],
    ["field:(one AND two)^100.23", "(+field:one +field:two)^100.23"],
    [
        "field:(one AND [aaa bbb]^23.3)^100.23",
        "(+field:one +field:[aaa bbb]^23.3)^100.23",
    ],
    ['(REQ field:"one two three")^23', 'field:"one two three"^23.0'],
    ["asdf~0.2", "asdf~0.2"],
    ["field:asdf~0.2", "field:asdf~0.2"],
    ["asdf~0.2^100.0", "asdf~0.2^100.0"],
    ["field:asdf~0.2^0.1", "field:asdf~0.2^0.1"],
    ['field:"asdf <> asdf|asdf"~4', 'field:"asdf <> asdf|asdf"~4'],
    ['"one two three four five"~5', '"one two three four five"~5'],
    ["ab?de", "ab?de"],
    ["ab*de", "ab*de"],
    ["asdf?*?asd*dsf?asfd*asdf?", "asdf?*?asd*dsf?asfd*asdf?"],
    ["field:a* AND field:(b*)", "+field:a* +field:b*"],
    ["field:abc~ AND field:(b*)", "+field:abc~ +field:b*"],
    ["asdf?*?asd*dsf?asfd*asdf?^20.0", "asdf?*?asd*dsf?asfd*asdf?^20.0"],
    ["*:xxx", "xxx field:xxx f1:xxx f2:xxx"],
    ["f1|f2:xxx", "f1:xxx f2:xxx"],
    ["*:asd~0.2", "asd~0.2 field:asd~0.2 f1:asd~0.2 f2:asd~0.2"],
    ["f1|f2:asd~0.2", "f1:asd~0.2 f2:asd~0.2"],
    ["*:a?d*^20.0", "(a?d* field:a?d* f1:a?d* f2:a?d*)^20.0"],
    ["f1|f2:a?d*^20.0", "(f1:a?d* f2:a?d*)^20.0"],
    [
        '*:"asdf <> xxx|yyy"',
        '"asdf <> xxx|yyy" field:"asdf <> xxx|yyy" f1:"asdf <> xxx|yyy" '
        'f2:"asdf <> xxx|yyy"',
    ],
    ['f1|f2:"asdf <> xxx|yyy"', 'f1:"asdf <> xxx|yyy" f2:"asdf <> xxx|yyy"'],
    ['f1|f2:"asdf <> do|yyy"', 'f1:"asdf <> yyy" f2:"asdf <> yyy"'],
    ['f1|f2:"do|cat"', "f1:cat f2:cat"],
    ["*:[bbb xxx]", "[bbb xxx] field:[bbb xxx] f1:[bbb xxx] f2:[bbb xxx]"],
    ["f1|f2:[bbb xxx]", "f1:[bbb xxx] f2:[bbb xxx]"],
    [
        "*:(xxx AND bbb)",
        "+(xxx field:xxx f1:xxx f2:xxx) +(bbb field:bbb f1:bbb f2:bbb)",
    ],
    ["f1|f2:(xxx AND bbb)", "+(f1:xxx f2:xxx) +(f1:bbb f2:bbb)"],
    ['"onewordphrase"', "onewordphrase"],
    ["who'd", "who'd"],
]


@pytest.fixture(scope="module")
def parser():
    return QueryParser(
        default_field="xxx",
        fields=["xxx", "field", "f1", "f2"],
        tokenized_fields=["xxx", "f1", "f2"],
        analyzer="standard",
    )


@pytest.mark.parametrize(
    "qstr,expected", PAIRS, ids=[p[0] or "<empty>" for p in PAIRS]
)
def test_parse_to_s(parser, qstr, expected):
    q = parser.parse(qstr)
    assert to_s(q, "xxx") == expected
