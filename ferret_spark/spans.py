"""Span queries — positional span enumeration + scoring.

Reference: c/src/q_span.c (2391 LoC). Query types: SpanTerm, SpanMultiTerm,
SpanPrefix, SpanFirst(end<=n), SpanOr, SpanNot(inc, exc), SpanNear(slop,
in_order). Per-doc span enumeration is ported from the reference's
iterators (sne_next_unordered_match / sne_next_ordered_match
c/src/q_span.c:995-1110); scoring accumulates
freq += 1/(match_length + 1) per emitted span (spansc_score
c/src/q_span.c:205-260, match_length = end - start) and applies the BM25
tf normalization with the idf-sum of the query's terms (our engine's
phrase-weight convention).

Spans are (start, end) with end exclusive (term at p -> (p, p+1)).
"""

from __future__ import annotations

from dataclasses import dataclass

from ferret_spark.query import Query


@dataclass(frozen=True)
class SpanTermQuery(Query):
    field: str = "content"
    term: str = ""


@dataclass(frozen=True)
class SpanMultiTermQuery(Query):
    field: str = "content"
    terms: tuple[str, ...] = ()


@dataclass(frozen=True)
class SpanPrefixQuery(Query):
    field: str = "content"
    prefix: str = ""
    max_terms: int = 256  # reference SpanPrefixQuery default


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    match: "Query" = None  # type: ignore[assignment]
    end: int = 1


@dataclass(frozen=True)
class SpanOrQuery(Query):
    clauses: tuple = ()


@dataclass(frozen=True)
class SpanNotQuery(Query):
    inc: "Query" = None  # type: ignore[assignment]
    exc: "Query" = None  # type: ignore[assignment]


@dataclass(frozen=True)
class SpanNearQuery(Query):
    clauses: tuple = ()
    slop: int = 0
    in_order: bool = False


SPAN_TYPES = (
    SpanTermQuery,
    SpanMultiTermQuery,
    SpanPrefixQuery,
    SpanFirstQuery,
    SpanOrQuery,
    SpanNotQuery,
    SpanNearQuery,
)


def is_span(q) -> bool:
    return isinstance(q, SPAN_TYPES)


def span_field(q) -> str:
    if isinstance(q, (SpanTermQuery, SpanMultiTermQuery, SpanPrefixQuery)):
        return q.field
    if isinstance(q, SpanFirstQuery):
        return span_field(q.match)
    if isinstance(q, SpanOrQuery):
        return span_field(q.clauses[0])
    if isinstance(q, SpanNotQuery):
        return span_field(q.inc)
    if isinstance(q, SpanNearQuery):
        return span_field(q.clauses[0])
    raise TypeError(type(q))


def span_terms(q, term_dict=None) -> list[str]:
    """Terms the span query touches (prefix expanded vs term_dict list)."""
    if isinstance(q, SpanTermQuery):
        return [q.term]
    if isinstance(q, SpanMultiTermQuery):
        return list(q.terms)
    if isinstance(q, SpanPrefixQuery):
        if term_dict is None:
            return []
        out = sorted(t for t in term_dict if t.startswith(q.prefix))
        return out[: q.max_terms]
    if isinstance(q, SpanFirstQuery):
        return span_terms(q.match, term_dict)
    if isinstance(q, SpanOrQuery):
        return [t for c in q.clauses for t in span_terms(c, term_dict)]
    if isinstance(q, SpanNotQuery):
        # only inc contributes to scoring terms (exc filters)
        return span_terms(q.inc, term_dict) + span_terms(q.exc, term_dict)
    if isinstance(q, SpanNearQuery):
        return [t for c in q.clauses for t in span_terms(c, term_dict)]
    raise TypeError(type(q))


def scoring_terms(q, term_dict=None) -> list[str]:
    """Terms contributing to the idf sum. Mirrors the reference's
    get_terms(): spanxq_get_terms (c/src/q_span.c:2202-2205) returns ONLY
    the inclusion clause's terms, so SpanNot's exclusion terms never enter
    the weight — unlike span_terms(), which also lists exc terms because
    their postings must still be fetched to filter."""
    if isinstance(q, SpanNotQuery):
        return scoring_terms(q.inc, term_dict)
    if isinstance(q, SpanFirstQuery):
        return scoring_terms(q.match, term_dict)
    if isinstance(q, (SpanOrQuery, SpanNearQuery)):
        return [t for c in q.clauses for t in scoring_terms(c, term_dict)]
    return span_terms(q, term_dict)


# ---------------------------------------------------------------------------
# per-doc span enumeration; positions_of: term -> sorted positions list


def doc_spans(q, positions_of, term_dict=None) -> list[tuple[int, int]]:
    """All spans the reference's enumerators would emit for one doc,
    in emission order."""
    if isinstance(q, SpanTermQuery):
        return [(p, p + 1) for p in positions_of(q.term)]
    if isinstance(q, (SpanMultiTermQuery, SpanPrefixQuery)):
        terms = span_terms(q, term_dict)
        spans = sorted(
            {(p, p + 1) for t in terms for p in positions_of(t)}
        )
        return spans
    if isinstance(q, SpanFirstQuery):
        return [
            (s, e)
            for s, e in doc_spans(q.match, positions_of, term_dict)
            if e <= q.end
        ]
    if isinstance(q, SpanOrQuery):
        out = []
        for c in q.clauses:
            out.extend(doc_spans(c, positions_of, term_dict))
        return sorted(set(out))
    if isinstance(q, SpanNotQuery):
        inc = doc_spans(q.inc, positions_of, term_dict)
        exc = doc_spans(q.exc, positions_of, term_dict)
        if not exc:
            return inc
        return [
            (s, e)
            for s, e in inc
            if not any(es < e and ee > s for es, ee in exc)
        ]
    if isinstance(q, SpanNearQuery):
        clause_spans = [
            doc_spans(c, positions_of, term_dict) for c in q.clauses
        ]
        if any(not cs for cs in clause_spans):
            return []
        if q.in_order:
            return _near_ordered(clause_spans, q.slop)
        return _near_unordered(clause_spans, q.slop)
    raise TypeError(type(q))


def _near_unordered(clause_spans, slop):
    """Port of sne_next_unordered_match (c/src/q_span.c:995-1037),
    restricted to one doc."""
    idx = [0] * len(clause_spans)
    out = []
    while True:
        min_start, max_end, lengths_sum = None, 0, 0
        min_i = 0
        for i, cs in enumerate(clause_spans):
            s, e = cs[idx[i]]
            if e > max_end:
                max_end = e
            if min_start is None or s < min_start:
                min_start = s
                min_i = i
            lengths_sum += e - s
        if (max_end - min_start - lengths_sum) <= slop:
            out.append((min_start, max_end))
        idx[min_i] += 1
        if idx[min_i] >= len(clause_spans[min_i]):
            return out


def _near_ordered(clause_spans, slop):
    """Port of sne_next_ordered_match (c/src/q_span.c:1039-1110),
    restricted to one doc."""
    n = len(clause_spans)
    idx = [0] * n
    out = []
    while idx[0] < len(clause_spans[0]):
        prev_s, prev_e = clause_spans[0][idx[0]]
        start0 = prev_s
        lengths = prev_e - prev_s
        ok = True
        for k in range(1, n):
            cs = clause_spans[k]
            while idx[k] < len(cs) and (
                cs[idx[k]][0] < prev_s
                or (cs[idx[k]][0] == prev_s and cs[idx[k]][1] < prev_e)
            ):
                idx[k] += 1
            if idx[k] >= len(cs):
                return out
            prev_s, prev_e = cs[idx[k]]
            lengths += prev_e - prev_s
        if ok:
            if (prev_e - start0 - lengths) <= slop:
                out.append((start0, prev_e))
            idx[0] += 1
    return out


def span_freq(q, positions_of, term_dict=None) -> float:
    """freq = sum of 1/(end - start + 1) over emitted spans
    (spansc_score, c/src/q_span.c:205-260)."""
    f = 0.0
    for s, e in doc_spans(q, positions_of, term_dict):
        f += 1.0 / ((e - s) + 1.0)
    return f
