"""FQL (Ferret Query Language) parser + Ferret-format query printing.

A hand-rolled recursive-descent reimplementation of the reference's yacc
grammar (c/src/q_parser.y:226-287; lexer rules :289-420; semantics:
get_term_q :?, get_phrase_query :922-1026, get_wild_q, get_r_q, boolean
clause combination add_and_cls/add_or_cls/get_bool_q :575-660).

Golden spec: ~100 (input, to_s) pairs at
ruby/test/unit/query_parser/tc_query_parser.rb:10-107.

Key semantics ported:
- clause list: AND upgrades the new clause (and the first, when the list
  has exactly one) to MUST unless prohibited; OR/default appends as-is
- 1-clause result collapses; 1 prohibited clause gains +MatchAll
- field stack: `field:`, `f1|f2:`, `*:` fan out leaf constructors, >1
  field -> BooleanQuery of SHOULD clauses (FLDS macro)
- words are analyzed per field (tokenized_fields); stopworded words vanish
  (dropping clauses / phrase positions, adding phrase slop per the
  pos_inc rules); wildcard/range bounds are lowercased but not tokenized
- a trailing-star-only wildcard becomes PrefixQuery; bare '*' MatchAll
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field as dfield

from ferret_spark.analysis import get_analyzer
from ferret_spark.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    Clause,
    FuzzyQuery,
    MatchAllQuery,
    MultiTermQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RangeQuery,
    TermQuery,
    WildcardQuery,
)

DEFAULT_FUZZY_MIN_SIM = 0.5
DEFAULT_FUZZY_PRE_LEN = 0

_NOT_WORD = set(" \t()[]{}!\"~^|<>=")
_SPECIALS = set("&:()[]{}!\"~^|<>=*?+-")


class QueryParser:
    def __init__(
        self,
        default_field: str = "content",
        fields: list[str] | None = None,
        tokenized_fields: list[str] | None = None,
        analyzer: str = "standard",
        or_default: bool = True,
        wild_lower: bool = True,
    ):
        self.default_field = default_field
        self.all_fields = fields or [default_field]
        self.tokenized_fields = (
            tokenized_fields if tokenized_fields is not None else list(self.all_fields)
        )
        self.analyzer = get_analyzer(analyzer)
        self.or_default = or_default
        self.wild_lower = wild_lower

    # ------------------------------------------------------------------ lex
    def _lex(self, s: str):
        """Yield tokens: (kind, value). Kinds: WORD, WILD, AND, OR, REQ,
        NOT, and single chars ( ) [ ] { } < > = | ~ ^ : "  """
        toks = []
        i, n = 0, len(s)
        clause_start = True
        while i < n:
            c = s[i]
            if c in " \t\r\n":
                i += 1
                clause_start = True
                continue
            if c in "+-!" and clause_start:
                nxt = s[i + 1] if i + 1 < n else ""
                if nxt and nxt not in " \t":
                    toks.append(("REQ" if c == "+" else "NOT", c))
                    i += 1
                    continue
            if c in "()[]{}<>=|~^:\"":
                toks.append((c, c))
                i += 1
                clause_start = c in "(\"" or c in "[{<"
                continue
            # word
            buf = []
            is_wild = False
            while i < n:
                c = s[i]
                if c == "\\":
                    if i + 1 < n:
                        buf.append(s[i + 1])
                        i += 2
                    else:
                        buf.append("\\")
                        i += 1
                    continue
                if c == ":":
                    if i + 1 < n and s[i + 1] == ":":
                        buf.append("::")
                        i += 2
                        continue
                    break
                if c in _NOT_WORD:
                    break
                if c in "*?":
                    is_wild = True
                buf.append(c)
                i += 1
            word = "".join(buf)
            if not word:
                i += 1  # stray special (e.g. lone '*' handled via WILD below)
                continue
            if word == "AND" or word == "&&":
                toks.append(("AND", word))
            elif word == "OR" or word == "||":
                toks.append(("OR", word))
            elif word == "NOT":
                toks.append(("NOT", word))
            elif word == "REQ":
                toks.append(("REQ", word))
            elif is_wild:
                toks.append(("WILD", word))
            else:
                toks.append(("WORD", word))
            clause_start = False
        return toks

    # ---------------------------------------------------------------- parse
    def parse(self, s: str) -> Query | None:
        # '*' needs lexer help: a lone '*' that is not '*:' is a wildcard
        toks = self._lex(s)
        # merge '*' ':' pattern: lexer above drops bare specials like '*';
        # re-lex treating '*' explicitly
        toks = self._fix_star(s)
        self._toks = toks
        self._pos = 0
        q = self._parse_bool([None])
        return q

    def _fix_star(self, s: str):
        """Lex with '*' kept: as part of a word it's a wildcard char; a
        bare '*' followed by ':' is the all-fields marker; a bare '*' alone
        is the match-all wildcard."""
        toks = []
        i, n = 0, len(s)
        clause_start = True
        while i < n:
            c = s[i]
            if c in " \t\r\n":
                i += 1
                clause_start = True
                continue
            if c in "+-!" and clause_start:
                nxt = s[i + 1] if i + 1 < n else ""
                if nxt and nxt not in " \t":
                    toks.append(("REQ" if c == "+" else "NOT", c))
                    i += 1
                    continue
            if c in "()[]{}<>=|~^:\"":
                toks.append((c, c))
                i += 1
                clause_start = c in '("[{<'
                continue
            buf = []
            is_wild = False
            while i < n:
                c = s[i]
                if c == "\\":
                    if i + 1 < n:
                        buf.append(s[i + 1])
                        i += 2
                    else:
                        buf.append("\\")
                        i += 1
                    continue
                if c == ":":
                    if i + 1 < n and s[i + 1] == ":":
                        buf.append("::")
                        i += 2
                        continue
                    break
                if c in _NOT_WORD:
                    break
                if c in "*?":
                    is_wild = True
                buf.append(c)
                i += 1
            word = "".join(buf)
            if word == "AND" or word == "&&":
                toks.append(("AND", word))
            elif word == "OR" or word == "||":
                toks.append(("OR", word))
            elif word == "NOT":
                toks.append(("NOT", word))
            elif word == "REQ":
                toks.append(("REQ", word))
            elif word == "*":
                # bare star: all-fields marker if ':' follows, else wildcard
                if i < n and s[i] == ":":
                    toks.append(("STAR", "*"))
                else:
                    toks.append(("WILD", "*"))
            elif is_wild:
                toks.append(("WILD", word))
            elif word:
                toks.append(("WORD", word))
            clause_start = False
        return toks

    def _peek(self, k=0):
        p = self._pos + k
        return self._toks[p] if p < len(self._toks) else ("EOF", "")

    def _next(self):
        t = self._peek()
        self._pos += 1
        return t

    def _parse_bool(self, fields: list[str | None]) -> Query | None:
        clauses: list[Clause] = []
        while True:
            kind, _ = self._peek()
            if kind in ("EOF", ")"):
                break
            if kind == "AND":
                self._next()
                cls = self._parse_clause(fields)
                if cls is not None:
                    if len(clauses) == 1 and clauses[0].occur != MUST_NOT:
                        clauses[0] = Clause(clauses[0].query, MUST)
                    if cls.occur != MUST_NOT:
                        cls = Clause(cls.query, MUST)
                    clauses.append(cls)
                continue
            if kind == "OR":
                self._next()
                cls = self._parse_clause(fields)
                if cls is not None:
                    clauses.append(cls)
                continue
            cls = self._parse_clause(fields)
            if cls is not None:
                if self.or_default:
                    clauses.append(cls)
                else:
                    if len(clauses) == 1 and clauses[0].occur != MUST_NOT:
                        clauses[0] = Clause(clauses[0].query, MUST)
                    if cls.occur != MUST_NOT:
                        cls = Clause(cls.query, MUST)
                    clauses.append(cls)
        return _get_bool_q(clauses)

    def _parse_clause(self, fields) -> Clause | None:
        kind, _ = self._peek()
        occur = SHOULD
        if kind == "REQ":
            self._next()
            occur = MUST
        elif kind == "NOT":
            self._next()
            occur = MUST_NOT
        q = self._parse_boosted(fields)
        if q is None:
            return None
        return Clause(q, occur)

    def _parse_boosted(self, fields) -> Query | None:
        q = self._parse_q(fields)
        if self._peek()[0] == "^":
            self._next()
            k, v = self._peek()
            if k in ("WORD",):
                self._next()
                try:
                    boost = float(v)
                    if q is not None:
                        q = dataclasses.replace(q, boost=boost)
                except ValueError:
                    pass
        return q

    def _parse_q(self, fields) -> Query | None:
        kind, val = self._peek()
        if kind == "(":
            self._next()
            if self._peek()[0] == ")":
                self._next()
                return BooleanQuery()
            q = self._parse_bool(fields)
            if self._peek()[0] == ")":
                self._next()
            return q
        if kind == '"':
            return self._parse_phrase(fields)
        if kind in ("[", "{", "<", ">"):
            return self._parse_range(fields)
        if kind == "STAR":
            # '*:' all fields
            self._next()
            if self._peek()[0] == ":":
                self._next()
                return self._parse_q(list(self.all_fields))
            return MatchAllQuery()
        if kind in ("WORD", "WILD"):
            # field prefix? WORD ('|' WORD)* ':'
            fl = self._try_field_prefix()
            if fl is not None:
                return self._parse_q(fl)
            self._next()
            if kind == "WILD":
                return self._flds(fields, lambda f: self._get_wild_q(f, val))
            # fuzzy?
            if self._peek()[0] == "~":
                nk, nv = self._peek(1)
                if nk == "WORD" and _is_number(nv):
                    self._next()
                    self._next()
                    return self._flds(
                        fields, lambda f: self._get_fuzzy_q(f, val, float(nv))
                    )
                self._next()
                return self._flds(
                    fields,
                    lambda f: self._get_fuzzy_q(f, val, DEFAULT_FUZZY_MIN_SIM),
                )
            return self._flds(fields, lambda f: self._get_term_q(f, val))
        # unknown token: skip (parse-error recovery mode)
        self._next()
        return None

    def _try_field_prefix(self) -> list[str] | None:
        save = self._pos
        names = []
        if self._peek()[0] != "WORD":
            return None
        names.append(self._next()[1])
        while self._peek()[0] == "|" and self._peek(1)[0] == "WORD":
            self._next()
            names.append(self._next()[1])
        if self._peek()[0] == ":":
            self._next()
            return names
        self._pos = save
        return None

    # ------------------------------------------------------- leaf builders
    def _tokenize(self, field: str | None, word: str) -> list[tuple[str, int]]:
        """Analyze a query word for a field -> [(text, pos_inc)].
        Untokenized fields pass the word through verbatim."""
        f = field or self.default_field
        if f not in self.tokenized_fields:
            return [(word, 1)]
        pairs = self.analyzer.analyze(word)
        out = []
        prev = -1
        for text, pos in pairs:
            out.append((text, pos - prev))
            prev = pos
        return out

    def _flds(self, fields, func) -> Query | None:
        fl = [f or self.default_field for f in fields]
        if len(fl) == 1:
            return func(fl[0])
        subs = [func(f) for f in fl]
        clauses = [Clause(sq, SHOULD) for sq in subs if sq is not None]
        if not clauses:
            return None
        return BooleanQuery(clauses=tuple(clauses))

    def _get_term_q(self, field: str, word: str) -> Query | None:
        toks = self._tokenize(field, word)
        if not toks:
            return None
        if len(toks) == 1:
            return TermQuery(field=field, term=toks[0][0])
        # multiple tokens -> phrase with slop per extra pos_inc token
        positions: list[tuple[int, tuple[str, ...]]] = []
        slop = 0
        pos = 0
        first = True
        for text, pos_inc in toks:
            if pos_inc or first:
                if not first:
                    pos += 1
                    slop += 1  # "add some slop since single term was expected"
                positions.append((pos, (text,)))
                first = False
            else:
                off, alts = positions[-1]
                positions[-1] = (off, alts + (text,))
        return PhraseQuery(field=field, positions=tuple(positions), slop=slop)

    def _get_fuzzy_q(self, field: str, word: str, min_sim: float) -> Query | None:
        toks = self._tokenize(field, word)
        if not toks:
            return None
        return FuzzyQuery(
            field=field,
            term=toks[0][0],
            min_sim=min_sim,
            prefix_len=DEFAULT_FUZZY_PRE_LEN,
        )

    def _get_wild_q(self, field: str, pattern: str) -> Query:
        if self.wild_lower and field in self.tokenized_fields:
            pattern = pattern.lower()
        if pattern == "*":
            return MatchAllQuery()
        if pattern.endswith("*") and not any(
            c in "*?" for c in pattern[:-1]
        ):
            return PrefixQuery(field=field, prefix=pattern[:-1])
        return WildcardQuery(field=field, pattern=pattern)

    def _parse_range(self, fields) -> Query | None:
        kind, _ = self._next()

        def word():
            if self._peek()[0] in ("WORD", "WILD"):
                return self._next()[1]
            return None

        lower = upper = None
        inc_l = inc_u = False
        if kind in ("[", "{"):
            inc_l = kind == "["
            w1 = word()
            nk = self._peek()[0]
            if nk in ("]", "}"):
                # unreachable in valid input
                self._next()
                return None
            if nk == ">":
                self._next()
                lower = w1
                inc_u = False
                upper = None
            else:
                w2 = word()
                ck = self._peek()[0]
                if ck in ("]", "}"):
                    self._next()
                    inc_u = ck == "]"
                lower, upper = w1, w2
        elif kind == "<":
            if self._peek()[0] == "=":
                self._next()
                upper = word()
                inc_u = True
            else:
                upper = word()
                ck = self._peek()[0]
                if ck in ("]", "}"):
                    self._next()
                    inc_u = ck == "]"
                else:
                    inc_u = False
        elif kind == ">":
            if self._peek()[0] == "=":
                self._next()
                lower = word()
                inc_l = True
            else:
                lower = word()
                inc_l = False
        return self._flds(
            fields, lambda f: self._get_r_q(f, lower, upper, inc_l, inc_u)
        )

    def _get_r_q(self, field, lower, upper, inc_l, inc_u) -> Query:
        if self.wild_lower and field in self.tokenized_fields:
            lower = lower.lower() if lower else lower
            upper = upper.lower() if upper else upper
        return RangeQuery(
            field=field,
            lower=lower,
            upper=upper,
            include_lower=inc_l,
            include_upper=inc_u,
        )

    def _parse_phrase(self, fields) -> Query | None:
        self._next()  # consume '"'
        # Phrase words: list of (pending_gaps, [words]); <> adds a gap
        positions: list[tuple[int, list[str]]] = []
        pending = 0
        while True:
            kind, val = self._peek()
            if kind in ('"', "EOF"):
                self._next()
                break
            if kind == "<" and self._peek(1)[0] == ">":
                self._next()
                self._next()
                pending += 1
                continue
            if kind == "|" and self._peek(1)[0] in ("WORD", "WILD") and positions:
                self._next()
                positions[-1][1].append(self._next()[1])
                continue
            if kind in ("WORD", "WILD"):
                self._next()
                positions.append((pending, [val]))
                pending = 0
                continue
            self._next()  # skip stray
        slop = None
        if self._peek()[0] == "~":
            nk, nv = self._peek(1)
            if nk == "WORD" and _is_number(nv):
                self._next()
                self._next()
                slop = int(float(nv))
        if not positions:
            return None
        return self._flds(
            fields, lambda f: self._get_phrase_query(f, positions, slop)
        )

    def _get_phrase_query(self, field, positions, slop_in) -> Query | None:
        """Port of get_phrase_query (c/src/q_parser.y:922-1026)."""
        pos_cnt = len(positions)
        if pos_cnt == 1:
            words = positions[0][1]
            if len(words) == 1:
                return self._get_term_q(field, words[0])
            terms = []
            for w in words:
                toks = self._tokenize(field, w)
                if toks:
                    terms.append(toks[0][0])
            if not terms:
                return BooleanQuery()
            if len(terms) == 1:
                return TermQuery(field=field, term=terms[0])
            return MultiTermQuery(
                field=field, terms=tuple((t, 1.0) for t in terms)
            )
        # multi-position
        out_positions: list[tuple[int, tuple[str, ...]]] = []
        slop = slop_in or 0
        pos_inc = 0
        cur_pos = -1
        for gap, words in positions:
            if pos_inc:
                slop += 1
            pos_inc += gap + 1
            if len(words) == 1:
                toks = self._tokenize(field, words[0])
                for text, t_inc in toks:
                    if t_inc:
                        cur_pos += pos_inc if pos_inc else t_inc
                        out_positions.append((cur_pos, (text,)))
                    else:
                        if out_positions:
                            off, alts = out_positions[-1]
                            out_positions[-1] = (off, alts + (text,))
                        slop += 1
                    pos_inc = 0
            else:
                added = False
                for w in words:
                    toks = self._tokenize(field, w)
                    if toks:
                        text = toks[0][0]
                        if not added:
                            cur_pos += pos_inc if pos_inc else toks[0][1]
                            out_positions.append((cur_pos, (text,)))
                            added = True
                            pos_inc = 0
                        else:
                            off, alts = out_positions[-1]
                            out_positions[-1] = (off, alts + (text,))
        if not out_positions:
            return None
        return PhraseQuery(
            field=field, positions=tuple(out_positions), slop=slop
        )


def _get_bool_q(clauses: list[Clause]) -> Query | None:
    if not clauses:
        return None
    if len(clauses) == 1:
        c = clauses[0]
        if c.occur == MUST_NOT:
            return BooleanQuery(
                clauses=(c, Clause(MatchAllQuery(), MUST))
            )
        return c.query
    return BooleanQuery(clauses=tuple(clauses))


def _is_number(s: str) -> bool:
    try:
        float(s)
        return True
    except ValueError:
        return False


# ---------------------------------------------------------------------------
# Ferret-format to_s


def _fmt_boost(q: Query) -> str:
    return "" if q.boost == 1.0 else f"^{str(float(q.boost))}"


def to_s(q: Query | None, default_field: str = "content") -> str:
    if q is None:
        return ""
    if isinstance(q, TermQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        return f"{pre}{q.term}{_fmt_boost(q)}"
    if isinstance(q, MatchAllQuery):
        return f"*{_fmt_boost(q)}"
    if isinstance(q, PrefixQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        return f"{pre}{q.prefix}*{_fmt_boost(q)}"
    if isinstance(q, WildcardQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        return f"{pre}{q.pattern}{_fmt_boost(q)}"
    if isinstance(q, FuzzyQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        sim = "" if q.min_sim == DEFAULT_FUZZY_MIN_SIM else str(float(q.min_sim))
        return f"{pre}{q.term}~{sim}{_fmt_boost(q)}"
    if isinstance(q, MultiTermQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        terms = "|".join(t for t, _ in q.terms)
        return f'{pre}"{terms}"{_fmt_boost(q)}'
    if isinstance(q, RangeQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        lo, hi = q.lower, q.upper
        if lo is not None and hi is not None:
            lb = "[" if q.include_lower else "{"
            ub = "]" if q.include_upper else "}"
            return f"{pre}{lb}{lo} {hi}{ub}{_fmt_boost(q)}"
        if lo is not None:
            lb = "[" if q.include_lower else "{"
            return f"{pre}{lb}{lo}>{_fmt_boost(q)}"
        ub = "]" if q.include_upper else "}"
        return f"{pre}<{hi}{ub}{_fmt_boost(q)}"
    if isinstance(q, PhraseQuery):
        pre = "" if q.field == default_field else f"{q.field}:"
        # group constraints by offset: alternatives joined by '|',
        # same-offset conjunctions by '&', gaps printed as '<>'
        by_off: dict[int, list[str]] = {}
        for off, alts in q.positions:
            by_off.setdefault(off, []).append("|".join(alts))
        parts = []
        prev = -1
        for off in sorted(by_off):
            for _ in range(off - prev - 1):
                parts.append("<>")
            parts.append("&".join(by_off[off]))
            prev = off
        slop = f"~{q.slop}" if q.slop else ""
        return f'{pre}"{" ".join(parts)}"{slop}{_fmt_boost(q)}'
    if isinstance(q, BooleanQuery):
        parts = []
        for c in q.clauses:
            prefix = {MUST: "+", MUST_NOT: "-", SHOULD: ""}[c.occur]
            inner = to_s(c.query, default_field)
            if isinstance(c.query, BooleanQuery) and c.query.boost == 1.0:
                inner = f"({inner})"
            parts.append(f"{prefix}{inner}")
        body = " ".join(parts)
        if q.boost != 1.0:
            return f"({body}){_fmt_boost(q)}"
        return body
    raise TypeError(type(q).__name__)
