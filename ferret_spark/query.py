"""Query tree shared by the Python oracle and the Spark planner.

Mirrors the reference's Query object model (reference: c/include/search.h,
BooleanClause occur types c/include/search.h:266-271) as plain dataclasses.
Rewrite rules (multi-term expansion, 1-clause collapse, implicit MatchAll
for all-prohibited booleans — c/src/q_boolean.c:1339-1406,
c/src/q_prefix.c:36-78, c/src/q_fuzzy.c:177-230) are applied by
``rewrite()`` against a term dictionary before planning.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Sequence

MUST = "MUST"
SHOULD = "SHOULD"
MUST_NOT = "MUST_NOT"

DEFAULT_FIELD = "content"

# Cap mirroring the reference's MultiTermQuery max_terms
# (c/src/q_multi_term.c:41-120, default 512 via MULTI_TERM_QUERY_MAX_TERMS).
MAX_EXPANDED_TERMS = 512


@dataclass(frozen=True)
class Query:
    boost: float = 1.0


@dataclass(frozen=True)
class TermQuery(Query):
    field: str = DEFAULT_FIELD
    term: str = ""


@dataclass(frozen=True)
class Clause:
    query: "Query" = None  # type: ignore[assignment]
    occur: str = SHOULD


@dataclass(frozen=True)
class BooleanQuery(Query):
    clauses: tuple[Clause, ...] = ()

    @staticmethod
    def of(*pairs) -> "BooleanQuery":
        return BooleanQuery(clauses=tuple(Clause(q, o) for q, o in pairs))


@dataclass(frozen=True)
class PhraseQuery(Query):
    """Positional phrase. ``positions`` is a sequence of (offset, terms)
    where ``terms`` is 1+ alternatives at that offset (multi-term position,
    reference: frt_mtdpe_new c/include/index.h:461-462). Gaps in offsets
    express the FQL ``<>`` skip syntax ("the <> fox")."""

    field: str = DEFAULT_FIELD
    positions: tuple[tuple[int, tuple[str, ...]], ...] = ()
    slop: int = 0

    @staticmethod
    def of(field: str, terms: Sequence, slop: int = 0) -> "PhraseQuery":
        pos = []
        for i, t in enumerate(terms):
            if t is None:  # skip slot ("<>")
                continue
            alts = (t,) if isinstance(t, str) else tuple(t)
            pos.append((i, alts))
        return PhraseQuery(field=field, positions=tuple(pos), slop=slop)


@dataclass(frozen=True)
class PrefixQuery(Query):
    field: str = DEFAULT_FIELD
    prefix: str = ""


@dataclass(frozen=True)
class WildcardQuery(Query):
    field: str = DEFAULT_FIELD
    pattern: str = ""  # glob with * and ?


@dataclass(frozen=True)
class FuzzyQuery(Query):
    field: str = DEFAULT_FIELD
    term: str = ""
    min_sim: float = 0.5  # reference default c/src/q_fuzzy.c
    prefix_len: int = 0


@dataclass(frozen=True)
class RangeQuery(Query):
    """Range over an untokenized (keyword) or numeric field.
    Reference: c/src/q_range.c (string ranges 218-277, typed 330-430)."""

    field: str = DEFAULT_FIELD
    lower: str | float | None = None
    upper: str | float | None = None
    include_lower: bool = True
    include_upper: bool = True
    typed: bool = False  # numeric interpretation


@dataclass(frozen=True)
class MatchAllQuery(Query):
    pass


# ---------------------------------------------------------------------------
# Filters + FilteredQuery (c/src/q_filtered_query.c, c/src/filter.c)


@dataclass(frozen=True)
class Filter:
    """Marker base for filter objects (frt_filt_t analog). Filters
    constrain the matching doc set without contributing score; their
    doc-id sets are cached per index generation (frt_filter_get_bv,
    c/src/filter.c:24-38 — see wand._attach_filter_cache)."""


@dataclass(frozen=True)
class RangeFilter(Filter):
    """String range filter (frt_rfilt_new, c/src/q_range.c:218-277)."""

    field: str = DEFAULT_FIELD
    lower: str | float | None = None
    upper: str | float | None = None
    include_lower: bool = True
    include_upper: bool = True
    typed: bool = False


def TypedRangeFilter(**kw) -> RangeFilter:
    """Numeric range filter (frt_trfilt_new, c/src/q_range.c:330-430)."""
    return RangeFilter(typed=True, **kw)


@dataclass(frozen=True)
class QueryFilter(Filter):
    """Any query as a filter (frt_qfilt_new, c/src/q_filtered_query.c /
    c/src/filter.c:128-180): matching docs constrain, score is ignored."""

    query: "Query" = None  # type: ignore[assignment]


@dataclass(frozen=True)
class FilteredQuery(Query):
    """Scored query restricted to a filter's doc set; the hit score is the
    sub-query's score unchanged (fqsc_score returns the sub-scorer's
    score verbatim, c/src/q_filtered_query.c:21-25). Rewrites to a
    BooleanQuery of (MUST query, MUST zero-boost filter clause): every
    returned hit matches both clauses, so coord = matching/total = 1 and
    the zero-boost clause adds 0 — the composition is score-exact in
    both bm25 and tfidf modes, while range/term filters flow into the
    per-generation cached-filter machinery."""

    query: "Query" = None  # type: ignore[assignment]
    filter: Filter = None  # type: ignore[assignment]


def filter_as_query(f: Filter) -> "Query":
    """The filter's zero-boost query form (constrains, never scores)."""
    import dataclasses

    if isinstance(f, RangeFilter):
        return RangeQuery(
            boost=0.0,
            field=f.field,
            lower=f.lower,
            upper=f.upper,
            include_lower=f.include_lower,
            include_upper=f.include_upper,
            typed=f.typed,
        )
    if isinstance(f, QueryFilter):
        return dataclasses.replace(f.query, boost=0.0)
    raise TypeError(f"not a Filter: {f!r}")


@dataclass(frozen=True)
class MultiTermQuery(Query):
    """OR over boosted terms — the rewrite target of prefix/wildcard/fuzzy
    (c/src/q_multi_term.c)."""

    field: str = DEFAULT_FIELD
    terms: tuple[tuple[str, float], ...] = ()  # (term, boost)


# ---------------------------------------------------------------------------
# Rewrite (driver-side, against a term dictionary: dict field -> set of terms
# or a callable field -> iterable of terms)


def glob_to_regex(pattern: str) -> str:
    out = []
    for ch in pattern:
        if ch == "*":
            out.append(".*")
        elif ch == "?":
            out.append(".")
        else:
            out.append(re.escape(ch))
    return "^" + "".join(out) + "$"


def edit_distance(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def fuzzy_score(term: str, target: str, prefix_len: int) -> float:
    """Similarity used as the expansion boost: 1 - dist/min(len) over the
    non-prefix parts (reference: fuzq_score_mn c/src/q_fuzzy.c:28-141)."""
    t, g = term[prefix_len:], target[prefix_len:]
    if not t and not g:
        return 1.0
    m = min(len(t), len(g)) + prefix_len
    if m == 0:
        return 0.0
    return 1.0 - edit_distance(t, g) / m


def expand_terms(q: Query, field_terms) -> list[tuple[str, float]]:
    """Expand a multi-term query against the sorted term dictionary of its
    field. ``field_terms`` is an iterable of terms (sorted not required).
    Keeps at most MAX_EXPANDED_TERMS by (boost desc, term asc), mirroring the
    reference's min-boost PQ (c/src/q_multi_term.c:41-120)."""
    out: list[tuple[str, float]] = []
    if isinstance(q, PrefixQuery):
        out = [(t, 1.0) for t in field_terms if t.startswith(q.prefix)]
    elif isinstance(q, WildcardQuery):
        rx = re.compile(glob_to_regex(q.pattern))
        out = [(t, 1.0) for t in field_terms if rx.match(t)]
    elif isinstance(q, FuzzyQuery):
        pre = q.term[: q.prefix_len]
        for t in field_terms:
            if not t.startswith(pre):
                continue
            s = fuzzy_score(q.term, t, q.prefix_len)
            if s > q.min_sim:
                out.append((t, s))
    else:  # pragma: no cover
        raise TypeError(type(q))
    out.sort(key=lambda ts: (-ts[1], ts[0]))
    return out[:MAX_EXPANDED_TERMS]


def rewrite(q: Query, term_dict) -> Query:
    """Rewrite to primitive queries to fixpoint (isea_rewrite,
    c/src/search.c:1217-1229). ``term_dict`` maps field -> collection of
    terms present in the index."""
    if isinstance(q, FilteredQuery):
        return BooleanQuery(
            boost=q.boost,
            clauses=(
                Clause(rewrite(q.query, term_dict), MUST),
                Clause(rewrite(filter_as_query(q.filter), term_dict), MUST),
            ),
        )
    if isinstance(q, (PrefixQuery, WildcardQuery, FuzzyQuery)):
        terms = expand_terms(q, term_dict.get(q.field, ()))
        return MultiTermQuery(boost=q.boost, field=q.field, terms=tuple(terms))
    if isinstance(q, BooleanQuery):
        clauses = [Clause(rewrite(c.query, term_dict), c.occur) for c in q.clauses]
        # 1-clause non-prohibited boolean collapses to the clause
        # (bq_rewrite c/src/q_boolean.c:1339-1406)
        if len(clauses) == 1 and clauses[0].occur != MUST_NOT:
            inner = clauses[0].query
            if q.boost != 1.0:
                inner = _with_boost(inner, inner.boost * q.boost)
            return inner
        # all-prohibited boolean gets an implicit MatchAll MUST
        # (c/src/q_boolean.c:1402-1404)
        if clauses and all(c.occur == MUST_NOT for c in clauses):
            clauses.append(Clause(MatchAllQuery(), MUST))
        return BooleanQuery(boost=q.boost, clauses=tuple(clauses))
    return q


def _with_boost(q: Query, boost: float) -> Query:
    import dataclasses

    return dataclasses.replace(q, boost=boost)


def query_terms(q: Query) -> list[tuple[str, str]]:
    """All (field, term) pairs a query touches (post-rewrite)."""
    if isinstance(q, TermQuery):
        return [(q.field, q.term)]
    if isinstance(q, MultiTermQuery):
        return [(q.field, t) for t, _ in q.terms]
    if isinstance(q, PhraseQuery):
        return [(q.field, t) for _, alts in q.positions for t in alts]
    if isinstance(q, BooleanQuery):
        return [ft for c in q.clauses for ft in query_terms(c.query)]
    return []
