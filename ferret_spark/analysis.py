"""Analysis pipelines: tokenizers + token filters.

Semantics ported from the reference (WHAT only):
- WhitespaceTokenizer: maximal non-space runs       (c/src/analysis.c:285-312)
- LetterTokenizer:     maximal alphabetic runs      (c/src/analysis.c:422-449)
- StandardTokenizer:   Ragel rules approximated by one ordered-alternation
                       regex                        (c/src/scanner.in:8-42)
- LowerCaseFilter                                   (c/src/analysis.c:1376-1397)
- StopFilter: drops stoplisted tokens but *keeps position gaps* by
  accumulating pos_inc                              (c/src/analysis.c:1136-1192)
- HyphenFilter: "multi-part-word" emits the concatenation then each part
  (pos_inc 0 then 1,1,...)                          (c/src/analysis.c:1271-1335)

Two execution surfaces share ONE implementation of the rules:
- ``analyze(text)``                 pure Python, used by the oracle searcher
- ``tokens_pandas(series)``         vectorized over a pandas Series, used
                                    inside pandas/Arrow UDFs (never per-row
                                    Python in the Spark hot path)

Position encoding in the Spark path: a token array where the array index IS
the position; stop-dropped slots hold None so `posexplode` + null-filter
preserves positional gaps exactly like pos_inc accumulation. Pipelines with
same-position emissions (hyphen concat) return explicit (term, pos) pair
arrays instead.
"""

from __future__ import annotations

import re
from typing import Callable, Iterable

import pandas as pd

# Snowball lists (c/src/stopwords.c). StandardAnalyzer's default is the
# FULL list (standard_analyzer_new, c/src/analysis.c:1563-1566 ->
# FULL_ENGLISH_STOP_WORDS via c/src/analysis.c:1196).
ENGLISH_STOP_WORDS = frozenset(
    """a an and are as at be but by for if in into is it no not of on or such
    that the their then there these they this to was with""".split()
)

FULL_ENGLISH_STOP_WORDS = frozenset(
    """a about above after again against all am an and any are aren't as at
    be because been before being below between both but by cannot can't
    could couldn't did didn't do does doesn't doing don't down during each
    few for from further had hadn't has hasn't have haven't having he he'd
    he'll her here here's hers herself he's him himself his how how's i i'd
    if i'll i'm in into is isn't it its it's itself i've let's me more most
    mustn't my myself no nor not of off on once only or other ought our
    ours ourselves out over own same shan't she she'd she'll she's should
    shouldn't so some such than that that's the their theirs them
    themselves then there there's these they they'd they'll they're they've
    this those through to too under until up very was wasn't we we'd we'll
    were we're weren't we've what what's when when's where where's which
    while who whom who's why why's with won't would wouldn't you you'd
    you'll your you're yours yourself yourselves you've""".split()
)

_WS_RE = re.compile(r"\S+")
_LETTER_RE = re.compile(r"[A-Za-z]+")
_LETTER_U_RE = re.compile(r"[^\W\d_]+", re.UNICODE)


def _std_regex(AL: str, AN: str) -> re.Pattern:
    """StandardTokenizer as ONE ordered alternation mirroring the Ragel
    rules (c/src/scanner.in:8-42 + url.rl + email.rl), in priority order
    (longest-match ties in the scanner resolve the same way for every
    golden in c/test/test_analysis.c):

      url          alnum+ '://' urlc+        (proto http/https/ftp/file is
                                              stripped afterward — the
                                              scanner's `skip` action; one
                                              trailing '/' truncated)
      email        RFC2822 dot-atom@dot-atom (email.rl)
      domain       subdomains + known TLD or 2-letter country (+port, /?)
      possessive   token'[sS]? not followed by alnum  (trunc 1-2)
      contraction  alpha+'alpha+                      (won't, we're)
      acronym      (alpha '.')+ alpha                 (dots stripped)
      company      token[&@]token?                    (Barnes&Noble, t@t)
      decimal      [+-]?digits.digits
      compound     alnum+([-_]alnum+)*                (e-mail, a_b, words)
      signed int   [+-]digits

    All alternatives are non-capturing (C-level str.findall stays on the
    hot path) with possessive quantifiers so failed alternatives bail
    without backtracking; the rule-specific skip/trunc/STRIP actions are
    recovered afterward from the token TEXT in _std_fix (each transform
    trigger — '://', trailing '/', trailing apostrophe, single-letter
    dots — identifies its rule unambiguously)."""
    atext = r"[A-Za-z0-9!#$%&'*+\-/=?^_`{|}~]"
    urlc = r"[A-Za-z0-9.,/_\-@:]"
    tld = r"com|edu|biz|gov|int|info|mil|net|org|[A-Za-z][A-Za-z]"
    pat = (
        rf"[A-Za-z0-9]++://{urlc}++"
        rf"|{atext}++(?:\.{atext}++)*+@{atext}++(?:\.{atext}++)*+"
        # domain/acronym unit-runs stay GREEDY: the required tail (tld /
        # final letter) may need the last unit given back ("google.com."
        # at sentence end, "I.B.M.")
        rf"|(?:[A-Za-z0-9](?:[A-Za-z0-9\-]*[A-Za-z0-9])?\.)+"
        rf"(?:{tld})(?::[0-9]++)?+/?+"
        rf"|{AL}{AN}*+['’][sS]?(?!{AN}|['’])"
        rf"|{AL}++['’]{AL}++"
        rf"|(?:{AL}\.)+{AL}"
        rf"|{AL}{AN}*+[&@](?:{AL}{AN}*+)?+"
        rf"|[+\-]?+[0-9]++\.[0-9]++"
        rf"|{AN}++(?:[-_]{AN}++)*+"
        rf"|[+\-][0-9]++"
    )
    return re.compile(pat, re.UNICODE)


_STANDARD_RE = _std_regex("[A-Za-z]", "[A-Za-z0-9]")
_STANDARD_MB_RE = _std_regex(r"[^\W\d_]", r"[^\W_]")
_PROTO_STRIP_RE = re.compile(r"^(?:https?|ftp|file):/+")
_ACRO_FULL_RE = re.compile(r"(?:[^\W\d_]\.)+[^\W\d_]$", re.UNICODE)


def _std_fix(tok: str) -> str:
    """Scanner skip/trunc/STRIP actions, recovered from the token text.
    Plain words (the overwhelming majority) cost three constant-time
    checks."""
    c0 = tok[-1]
    if c0 in "/’'":
        if "://" in tok:  # url: strip known proto + trailing slash
            tok = _PROTO_STRIP_RE.sub("", tok)
            return tok[:-1] if tok.endswith("/") else tok
        return tok[:-1]  # bare domain trailing /, or possessive '
    if "://" in tok:  # url without trailing slash
        return _PROTO_STRIP_RE.sub("", tok)
    if c0 in "sS" and len(tok) > 1 and tok[-2] in "'’":
        return tok[:-2]  # possessive 's
    if "." in tok and "@" not in tok and _ACRO_FULL_RE.match(tok):
        return tok.replace(".", "")  # acronym
    return tok


def _std_findall(text: str, rx: re.Pattern) -> list[str]:
    out = []
    for t in rx.findall(text):
        t = _std_fix(t)
        if t:
            out.append(t)
    return out


def _hyphen_splittable(t: str) -> bool:
    """HyphenFilter predicate (hf_next, c/src/analysis.c:1271-1335): split
    only when the token PAST ITS FIRST CHAR is letters + at least one
    hyphen and nothing else ('e-mail' splits; '123-1235-ASD-1234' and
    '-52' don't)."""
    if len(t) < 2:
        return False
    seen_hyphen = False
    for ch in t[1:]:
        if ch == "-":
            seen_hyphen = True
        elif not ch.isalpha():
            return False
    return seen_hyphen


# ---------------------------------------------------------------------------
# Pure-Python pipeline (oracle)


def _tokenize(text: str, kind: str) -> list[str]:
    if kind == "whitespace":
        return _WS_RE.findall(text)
    if kind == "letter":
        return _LETTER_RE.findall(text)
    if kind == "letter_unicode":
        return _LETTER_U_RE.findall(text)
    if kind == "standard":
        return _std_findall(text, _STANDARD_RE)
    if kind == "standard_mb":
        return _std_findall(text, _STANDARD_MB_RE)
    raise ValueError(f"unknown tokenizer {kind!r}")


class Analyzer:
    """A named pipeline: tokenizer + ordered filters.

    ``analyze(text)`` -> list of (term, position). Position gaps from stop
    removal are preserved (pos_inc accumulation,
    c/src/analysis.c:1143-1150).
    """

    def __init__(
        self,
        tokenizer: str = "letter",
        lowercase: bool = True,
        stop_words: frozenset | None = None,
        hyphens: bool = False,
        name: str | None = None,
        mappings: dict[str, str] | None = None,
        stem: bool | str = False,
    ):
        self.tokenizer = tokenizer
        self.lowercase = lowercase
        self.stop_words = stop_words
        self.hyphens = hyphens
        self.name = name or tokenizer
        self.stem = stem
        self.mappings = mappings
        if mappings:
            # longest-match-first alternation (the reference's byte-trie
            # multimapper semantics, c/src/multimapper.c)
            keys = sorted(mappings, key=len, reverse=True)
            self._map_re = re.compile("|".join(re.escape(k) for k in keys))
        else:
            self._map_re = None

    def _apply_map(self, t: str) -> str:
        return self._map_re.sub(lambda m: self.mappings[m.group(0)], t)

    # -- oracle surface ----------------------------------------------------
    def analyze(self, text: str) -> list[tuple[str, int]]:
        toks = _tokenize(text, self.tokenizer)
        if self._map_re is not None:
            toks = [self._apply_map(t) for t in toks]
        if self.lowercase:
            toks = [t.lower() for t in toks]
        out: list[tuple[str, int]] = []
        pos = -1
        for t in toks:
            pos += 1
            if self.stop_words is not None and t in self.stop_words:
                continue  # position still advanced (pos_inc accumulation)
            if self.hyphens and _hyphen_splittable(t):
                parts = [p for p in t.split("-") if p]
                if len(parts) > 1:
                    # concat at the token's position, then each part with
                    # pos_inc 0,1,1,... (c/src/analysis.c:1271-1335)
                    out.append(("".join(parts), pos))
                    for j, p in enumerate(parts):
                        out.append((p, pos + j))
                    pos += len(parts) - 1
                    continue
            out.append((t, pos))
        if self.stem:
            from ferret_spark.snowball import get_stemmer

            _stem = get_stemmer(self.stem)
            out = [(_stem(t), p) for t, p in out]
        return out

    # -- vectorized surface (inside pandas UDFs) ----------------------------
    def tokens_pandas(self, s: pd.Series) -> pd.Series:
        """Series[str] -> Series[list[str|None]] where index == position.

        Hyphen pipelines are not expressible with index==position; they go
        through ``pairs_pandas`` instead.
        """
        if self.hyphens:
            raise ValueError("hyphen pipeline requires pairs_pandas")
        s = s.fillna("")
        std_rx = None
        if self.tokenizer == "whitespace":
            toks = s.str.findall(_WS_RE)
        elif self.tokenizer == "letter":
            toks = s.str.findall(_LETTER_RE)
        elif self.tokenizer == "letter_unicode":
            toks = s.str.findall(_LETTER_U_RE)
        elif self.tokenizer == "standard":
            std_rx = _STANDARD_RE
        elif self.tokenizer == "standard_mb":
            std_rx = _STANDARD_MB_RE
        else:
            raise ValueError(self.tokenizer)
        if std_rx is not None and (
            self.lowercase
            and self.stop_words is None
            and self._map_re is None
            and not self.stem
        ):
            # hot path (StandardAnalyzer pipelines with no stop/map/stem —
            # the index-build inverter): ONE fused pass instead of the
            # findall -> _std_findall loop -> fix loop chain. _std_fix is
            # inlined for the overwhelmingly common plain-word case (no
            # './'’@ in the token) — same transforms, same order.
            findall = std_rx.findall
            fix = _std_fix

            def one(t):
                out = []
                for tok in findall(t):
                    if (
                        tok[-1] in "/'’"
                        or "." in tok
                        or "://" in tok
                        or (tok[-1] in "sS" and tok[-2:-1] in ("'", "’"))
                    ):
                        tok = fix(tok)
                        if not tok:
                            continue
                    out.append(tok.lower())
                return out

            return s.map(one)
        if std_rx is not None:
            toks = s.map(lambda t: _std_findall(t, std_rx))
        # one fused pass: map + lowercase + stop + stem (standard-rule
        # transforms already applied inside _std_findall)
        lower = self.lowercase
        sw = self.stop_words
        mapped = self._map_re is not None
        do_stem = self.stem
        if do_stem:
            from ferret_spark.snowball import get_stemmer

            _stem = get_stemmer(self.stem)

        def fix(ts):
            out = []
            for t in ts:
                if mapped:
                    t = self._apply_map(t)
                if lower:
                    t = t.lower()
                if sw is not None and t in sw:
                    out.append(None)
                    continue
                out.append(_stem(t) if do_stem else t)
            return out

        if lower or sw is not None or mapped or do_stem:
            toks = toks.map(fix)
        return toks

    def pairs_pandas(self, s: pd.Series) -> pd.Series:
        """Series[str] -> Series[list[(term, pos)]] — general form."""
        return s.fillna("").map(self.analyze)

    # -- offsets surface (highlighting) -------------------------------------
    def analyze_offsets(self, text: str) -> list[tuple[str, int, int, int]]:
        """[(term, pos, start_char, end_char)] — token char offsets for
        excerpt highlighting (reference tokens carry start/end,
        c/include/analysis.h:20-27)."""
        if self.tokenizer == "whitespace":
            rx = _WS_RE
        elif self.tokenizer == "letter":
            rx = _LETTER_RE
        elif self.tokenizer == "letter_unicode":
            rx = _LETTER_U_RE
        elif self.tokenizer == "standard":
            rx = _STANDARD_RE
        elif self.tokenizer == "standard_mb":
            rx = _STANDARD_MB_RE
        else:
            raise ValueError(self.tokenizer)
        std = self.tokenizer in ("standard", "standard_mb")
        if self.stem:
            from ferret_spark.snowball import get_stemmer

            _stem = get_stemmer(self.stem)
        out = []
        pos = -1
        for m in rx.finditer(text):
            t = m.group(0)
            if std:
                t = _std_fix(t)
                if not t:
                    continue
            if self._map_re is not None:
                t = self._apply_map(t)
            if self.lowercase:
                t = t.lower()
            pos += 1
            if self.stop_words is not None and t in self.stop_words:
                continue
            if self.stem:
                t = _stem(t)
            out.append((t, pos, m.start(), m.end()))
        return out


# Registry. The north-star default is letter+lowercase
# (frt_letter_analyzer_new(true), c/src/analysis.c:534-540).
ANALYZERS: dict[str, Analyzer] = {
    "letter": Analyzer("letter", lowercase=True, name="letter"),
    "whitespace": Analyzer("whitespace", lowercase=True, name="whitespace"),
    "whitespace_raw": Analyzer("whitespace", lowercase=False, name="whitespace_raw"),
    "standard": Analyzer(
        "standard",
        lowercase=True,
        stop_words=FULL_ENGLISH_STOP_WORDS,
        name="standard",
    ),
    "standard_nostop": Analyzer("standard", lowercase=True, name="standard_nostop"),
    # multibyte StandardTokenizer (scanner_mb.c analog: unicode letters are
    # word chars; URL/email sub-machines stay ASCII like the reference)
    "standard_mb": Analyzer(
        "standard_mb",
        lowercase=True,
        stop_words=FULL_ENGLISH_STOP_WORDS,
        name="standard_mb",
    ),
    "standard_mb_nostop": Analyzer(
        "standard_mb", lowercase=True, name="standard_mb_nostop"
    ),
    "standard_mb_raw": Analyzer(
        "standard_mb", lowercase=False, name="standard_mb_raw"
    ),
    # full reference StandardAnalyzer chain incl. HyphenFilter
    # (standard_analyzer_new_with_words; pairs surface only — hyphen
    # emissions share positions)
    "standard_hyphen": Analyzer(
        "standard",
        lowercase=True,
        stop_words=ENGLISH_STOP_WORDS,
        hyphens=True,
        name="standard_hyphen",
    ),
    "hyphen_ws": Analyzer(
        "whitespace", lowercase=True, hyphens=True, name="hyphen_ws"
    ),
    "stop_ws": Analyzer(
        "whitespace",
        lowercase=True,
        stop_words=ENGLISH_STOP_WORDS,
        name="stop_ws",
    ),
    # StemAnalyzer analog (letter + lowercase + Porter)
    "stem_en": Analyzer("letter", lowercase=True, stem=True, name="stem_en"),
    # full StandardAnalyzer + stemming
    "standard_stem": Analyzer(
        "standard",
        lowercase=True,
        stop_words=FULL_ENGLISH_STOP_WORDS,
        stem=True,
        name="standard_stem",
    ),
}


def get_analyzer(name: "str | Analyzer") -> Analyzer:
    if isinstance(name, Analyzer):  # instances pass through (custom
        return name  # analyzers, e.g. per-language stem configs)
    return ANALYZERS[name]
