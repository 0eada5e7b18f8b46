"""Pure-Python reference searcher ("the oracle").

Implements the reference's operator semantics — Term / Boolean
(MUST/SHOULD/MUST_NOT) / Phrase (exact + sloppy + multi-term positions +
skips) / MultiTerm / Range / MatchAll — with BM25 substituted for the
classic TF-IDF similarity (north_rule). The Spark engine must be
rank-identical (top-k docIDs + float32 scores) to this searcher.

Semantics parity citations:
- exact phrase freq: alignment count          (ephsc_phrase_freq, c/src/q_phrase.c:364-404)
- sloppy phrase freq: min-window PQ, freq += 1/(match_length+1)
                                              (sphsc_phrase_freq, c/src/q_phrase.c:454-515)
- repeats handling                            (sphsc_check_repeats, c/src/q_phrase.c:427-452)
- boolean composition                         (c/src/q_boolean.c counting_sum_scorer_create:856-964)
- top-k tie-break: score desc, doc_id asc     (hit_lt, c/src/search.c:91-99)
- BM25 replaces TF-IDF; coord factor dropped (as Lucene 8 does for BM25)
"""

from __future__ import annotations

import heapq
import math
from collections import defaultdict

import numpy as np

from ferret_spark.analysis import Analyzer, get_analyzer
from ferret_spark.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    MatchAllQuery,
    MultiTermQuery,
    PhraseQuery,
    Query,
    RangeQuery,
    TermQuery,
    rewrite,
)

K1 = 1.2
B = 0.75


def bm25_idf(df: int, n_docs: int) -> float:
    """Robertson-Sparck-Jones idf with +1 floor (Lucene BM25 form)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def bm25_tf(tf: float, dl: float, avgdl: float) -> float:
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


class OracleIndex:
    """In-memory inverted index over a list of row dicts.

    ``field_config`` maps field name -> analyzer name, or "keyword" for
    untokenized fields (FRT_INDEX_UNTOKENIZED, c/include/index.h:73-96).
    """

    def __init__(
        self,
        rows: list[dict],
        field_config: dict[str, str],
        similarity: str = "bm25",
        boost_col: str | None = None,
    ):
        self.n_docs = len(rows)
        self.field_config = field_config
        self.similarity = similarity
        self.doc_boosts = [
            float(r.get(boost_col, 1.0)) if boost_col else 1.0 for r in rows
        ]
        # field -> term -> list[(doc_id, tf, positions)]
        self.postings: dict[str, dict[str, list]] = defaultdict(dict)
        self.doc_len: dict[str, list[int]] = {}
        self.avgdl: dict[str, float] = {}
        self.values: dict[str, list] = {}  # raw stored values per field

        for field, aname in field_config.items():
            lens = [0] * self.n_docs
            vals = [None] * self.n_docs
            fp: dict[str, list] = defaultdict(list)
            analyzer: Analyzer | None = (
                None if aname == "keyword" else get_analyzer(aname)
            )
            for doc_id, row in enumerate(rows):
                v = row.get(field)
                vals[doc_id] = v
                if v is None:
                    continue
                if analyzer is None:
                    fp[str(v)].append((doc_id, 1, [0]))
                    lens[doc_id] = 1
                    continue
                occ: dict[str, list[int]] = defaultdict(list)
                n_tokens = 0
                for term, pos in analyzer.analyze(str(v)):
                    occ[term].append(pos)
                    n_tokens += 1
                lens[doc_id] = n_tokens
                for term, positions in occ.items():
                    fp[term].append((doc_id, len(positions), positions))
            self.postings[field] = dict(fp)
            self.doc_len[field] = lens
            self.avgdl[field] = (sum(lens) / self.n_docs) if self.n_docs else 0.0
            self.values[field] = vals

    # -- term dictionary for rewrites ---------------------------------------
    def term_dict(self) -> dict[str, list[str]]:
        return {f: sorted(p.keys()) for f, p in self.postings.items()}

    # -- scoring ------------------------------------------------------------
    def _score_term(self, field: str, term: str, boost: float) -> dict[int, float]:
        plist = self.postings.get(field, {}).get(term)
        if not plist:
            return {}
        idf = bm25_idf(len(plist), self.n_docs)
        avgdl = self.avgdl[field]
        lens = self.doc_len[field]
        return {
            d: boost * idf * bm25_tf(tf, lens[d], avgdl) for d, tf, _ in plist
        }

    def _score(self, q: Query) -> dict[int, float]:
        if isinstance(q, TermQuery):
            return self._score_term(q.field, q.term, q.boost)
        if isinstance(q, MatchAllQuery):
            return {d: q.boost * 1.0 for d in range(self.n_docs)}
        if isinstance(q, MultiTermQuery):
            # accumulate per-term contributions, then sum in sorted-term
            # order and apply q.boost once — mirrors the Spark plan exactly
            # so float64 addition order (and hence float32 ranks) match
            contrib: dict[int, list[tuple[str, float]]] = defaultdict(list)
            for term, tboost in q.terms:
                for d, s in self._score_term(q.field, term, tboost).items():
                    contrib[d].append((term, s))
            out = {}
            for d, pairs in contrib.items():
                s = 0.0
                for _, v in sorted(pairs):
                    s += v
                out[d] = q.boost * s
            return out
        if isinstance(q, RangeQuery):
            return {d: q.boost * 1.0 for d in self._range_docs(q)}
        if isinstance(q, BooleanQuery):
            return self._score_boolean(q)
        if isinstance(q, PhraseQuery):
            return self._score_phrase(q)
        from ferret_spark.spans import is_span

        if is_span(q):
            return self._score_span(q)
        raise TypeError(f"unsupported query {type(q).__name__}")

    def _score_span(self, q) -> dict[int, float]:
        from ferret_spark.spans import (
            scoring_terms,
            span_field,
            span_freq,
            span_terms,
        )

        field = span_field(q)
        fp = self.postings.get(field, {})
        term_dict = sorted(fp.keys())
        # fetch postings for all terms; idf only over get_terms() (SpanNot
        # excludes its exc clause, spanxq_get_terms c/src/q_span.c:2202-2205)
        terms = sorted(set(span_terms(q, term_dict)))
        sterms = set(scoring_terms(q, term_dict))
        idf_sum = 0.0
        cand: set[int] = set()
        pos_by_doc: dict[int, dict[str, list[int]]] = {}
        for t in terms:
            plist = fp.get(t)
            if not plist:
                continue
            if t in sterms:
                idf_sum += bm25_idf(len(plist), self.n_docs)
            for d, _tf, positions in plist:
                cand.add(d)
                pos_by_doc.setdefault(d, {})[t] = positions
        lens = self.doc_len[field]
        avgdl = self.avgdl[field]
        out: dict[int, float] = {}
        for d in cand:
            pmap = pos_by_doc.get(d, {})
            freq = span_freq(q, lambda t: pmap.get(t, []), term_dict)
            if freq > 0.0:
                out[d] = (
                    q.boost * idf_sum * bm25_tf(freq, lens[d], avgdl)
                )
        return out

    def _range_docs(self, q: RangeQuery) -> list[int]:
        vals = self.values.get(q.field, [])
        out = []
        for d, v in enumerate(vals):
            if v is None:
                continue
            if q.typed:
                try:
                    x = float(v)
                except (TypeError, ValueError):
                    continue
                lo = float(q.lower) if q.lower is not None else None
                hi = float(q.upper) if q.upper is not None else None
            else:
                x = str(v)
                lo = str(q.lower) if q.lower is not None else None
                hi = str(q.upper) if q.upper is not None else None
            if lo is not None and (x < lo or (x == lo and not q.include_lower)):
                continue
            if hi is not None and (x > hi or (x == hi and not q.include_upper)):
                continue
            out.append(d)
        return out

    def _score_boolean(self, q: BooleanQuery) -> dict[int, float]:
        musts = [c for c in q.clauses if c.occur == MUST]
        shoulds = [c for c in q.clauses if c.occur == SHOULD]
        nots = [c for c in q.clauses if c.occur == MUST_NOT]

        must_scores = [self._score(c.query) for c in musts]
        should_scores = [self._score(c.query) for c in shoulds]
        not_docs: set[int] = set()
        for c in nots:
            not_docs |= set(self._score(c.query).keys())

        if musts:
            cand = set(must_scores[0].keys())
            for ms in must_scores[1:]:
                cand &= ms.keys()
        else:
            cand = set()
            for ss in should_scores:
                cand |= ss.keys()
        cand -= not_docs

        out: dict[int, float] = {}
        for d in cand:
            s = 0.0
            for ms in must_scores:
                s += ms[d]
            for ss in should_scores:
                s += ss.get(d, 0.0)
            out[d] = q.boost * s
        return out

    # -- phrase -------------------------------------------------------------
    def _score_phrase(self, q: PhraseQuery) -> dict[int, float]:
        field = q.field
        if not q.positions:
            return {}
        # per slot: union posting map doc -> sorted positions (multi-term
        # position enum, frt_mtdpe_new c/include/index.h:461-462)
        slot_maps: list[dict[int, list[int]]] = []
        idf_sum = 0.0
        for _, alts in q.positions:
            m: dict[int, list[int]] = defaultdict(list)
            for t in alts:
                plist = self.postings.get(field, {}).get(t)
                if not plist:
                    continue
                idf_sum += bm25_idf(len(plist), self.n_docs)
                for d, _tf, positions in plist:
                    m[d].extend(positions)
            slot_maps.append({d: sorted(ps) for d, ps in m.items()})
        if len(q.positions) == 1:
            # degenerate single-slot phrase scores like a term disjunction
            # at that slot
            m = slot_maps[0]
            avgdl = self.avgdl[field]
            lens = self.doc_len[field]
            return {
                d: q.boost * idf_sum * bm25_tf(len(ps), lens[d], avgdl)
                for d, ps in m.items()
            }
        cand = set(slot_maps[0].keys())
        for m in slot_maps[1:]:
            cand &= m.keys()
        offsets = [off for off, _ in q.positions]
        repeats = _has_repeats(q)
        avgdl = self.avgdl[field]
        lens = self.doc_len[field]
        out: dict[int, float] = {}
        for d in cand:
            adjusted = [
                [p - off for p in slot_maps[i][d]] for i, off in enumerate(offsets)
            ]
            if q.slop == 0:
                freq = float(len(set(adjusted[0]).intersection(*adjusted[1:])))
            else:
                freq = sloppy_phrase_freq(adjusted, offsets, q.slop, repeats)
            if freq > 0.0:
                out[d] = q.boost * idf_sum * bm25_tf(freq, lens[d], avgdl)
        return out

    # -- classic TF-IDF similarity (reference default) -----------------------
    def _norm(self, field: str, d: int) -> float:
        from ferret_spark.similarity import NORM_TABLE, encode_norm

        return NORM_TABLE[
            encode_norm(1.0, self.doc_boosts[d], self.doc_len[field][d])
        ]

    def _phrase_freqs(self, q: PhraseQuery) -> tuple[dict[int, float], float, dict]:
        """(doc -> phrase_freq, idf_sum_bm25-unused, slot machinery reused).
        Returns freq map plus per-doc dl lookup is via self.doc_len."""
        field = q.field
        slot_maps: list[dict[int, list[int]]] = []
        for _, alts in q.positions:
            m: dict[int, list[int]] = defaultdict(list)
            for t in alts:
                plist = self.postings.get(field, {}).get(t)
                if not plist:
                    continue
                for d, _tf, positions in plist:
                    m[d].extend(positions)
            slot_maps.append({d: sorted(ps) for d, ps in m.items()})
        if not slot_maps or any(not m for m in slot_maps):
            return {}, 0.0, {}
        if len(q.positions) == 1:
            return (
                {d: float(len(ps)) for d, ps in slot_maps[0].items()},
                0.0,
                {},
            )
        cand = set(slot_maps[0].keys())
        for m in slot_maps[1:]:
            cand &= m.keys()
        offsets = [off for off, _ in q.positions]
        repeats = _has_repeats(q)
        freqs: dict[int, float] = {}
        for d in cand:
            adjusted = [
                [p - off for p in slot_maps[i][d]] for i, off in enumerate(offsets)
            ]
            if q.slop == 0:
                f = float(len(set(adjusted[0]).intersection(*adjusted[1:])))
            else:
                f = sloppy_phrase_freq(adjusted, offsets, q.slop, repeats)
            if f > 0.0:
                freqs[d] = f
        return freqs, 0.0, {}

    def _score_tfidf(self, q: Query) -> dict[int, float]:
        from ferret_spark import similarity as S

        dfs = {
            (f, t): len(pl)
            for f, ps in self.postings.items()
            for t, pl in ps.items()
        }
        qnorm = S.query_norm(
            S.sum_sq_weights(q, dfs, self.n_docs, None)
        )
        return self._tfidf_node(q, dfs, qnorm, 1.0)

    def _tfidf_node(self, q: Query, dfs, qnorm: float, anc: float):
        from ferret_spark import similarity as S

        b = anc * q.boost
        if isinstance(q, TermQuery):
            plist = self.postings.get(q.field, {}).get(q.term)
            if not plist:
                return {}
            i = S.idf(dfs.get((q.field, q.term), 0), self.n_docs)
            val = i * i * b * qnorm
            return {
                d: S.tf(tf_) * val * self._norm(q.field, d)
                for d, tf_, _ in plist
            }
        if isinstance(q, MultiTermQuery):
            out: dict[int, float] = defaultdict(float)
            for t, tb in sorted(q.terms):
                plist = self.postings.get(q.field, {}).get(t)
                if not plist:
                    continue
                i = S.idf(dfs.get((q.field, t), 0), self.n_docs)
                val = i * i * tb * b * qnorm
                for d, tf_, _ in plist:
                    out[d] += S.tf(tf_) * val * self._norm(q.field, d)
            return dict(out)
        if isinstance(q, PhraseQuery):
            freqs, _, _ = self._phrase_freqs(q)
            idf_sum = 0.0
            for _, alts in q.positions:
                for t in alts:
                    idf_sum += S.idf(dfs.get((q.field, t), 0), self.n_docs)
            val = idf_sum * idf_sum * b * qnorm
            return {
                d: S.tf(f) * val * self._norm(q.field, d)
                for d, f in freqs.items()
            }
        if isinstance(q, MatchAllQuery):
            val = 1.0 * b * qnorm
            return {d: val for d in range(self.n_docs)}
        if isinstance(q, RangeQuery):
            val = 1.0 * b * qnorm
            return {d: val for d in self._range_docs(q)}
        if isinstance(q, BooleanQuery):
            musts = [c.query for c in q.clauses if c.occur == MUST]
            shoulds = [c.query for c in q.clauses if c.occur == SHOULD]
            nots = [c.query for c in q.clauses if c.occur == MUST_NOT]
            mscores = [self._tfidf_node(m, dfs, qnorm, b) for m in musts]
            sscores = [self._tfidf_node(s, dfs, qnorm, b) for s in shoulds]
            not_docs: set[int] = set()
            for nq in nots:
                not_docs |= set(self._tfidf_node(nq, dfs, qnorm, b).keys())
            if musts:
                cand = set(mscores[0].keys())
                for ms in mscores[1:]:
                    cand &= ms.keys()
            else:
                cand = set()
                for ss in sscores:
                    cand |= ss.keys()
            cand -= not_docs
            max_overlap = len(musts) + len(shoulds)
            out = {}
            for d in cand:
                s = 0.0
                matches = 0
                for ms in mscores:
                    s += ms[d]
                    matches += 1
                for ss in sscores:
                    if d in ss:
                        s += ss[d]
                        matches += 1
                out[d] = s * (matches / max_overlap)
            return out
        raise TypeError(type(q).__name__)

    # -- public API ---------------------------------------------------------
    def search(self, q: Query, k: int = 10, offset: int = 0):
        """Top-k [(doc_id, float32 score)] — score desc, doc_id asc."""
        q = rewrite(q, self.term_dict())
        scores = (
            self._score_tfidf(q)
            if self.similarity == "tfidf"
            else self._score(q)
        )
        hits = sorted(
            ((d, np.float32(s)) for d, s in scores.items()),
            key=lambda ds: (-ds[1], ds[0]),
        )
        return hits[offset : offset + k]

    def hits(self, q: Query) -> set[int]:
        q = rewrite(q, self.term_dict())
        if self.similarity == "tfidf":
            return set(self._score_tfidf(q).keys())
        return set(self._score(q).keys())

    def count(self, q: Query) -> int:
        return len(self.hits(q))


def _has_repeats(q: PhraseQuery) -> bool:
    seen: set[str] = set()
    for _, alts in q.positions:
        for t in alts:
            if t in seen:
                return True
            seen.add(t)
    return False


class _PP:
    """PhrasePosition: iterator over offset-adjusted positions
    (c/src/q_phrase.c PhPos)."""

    __slots__ = ("positions", "idx", "offset")

    def __init__(self, positions: list[int], offset: int):
        self.positions = positions
        self.idx = 0
        self.offset = offset

    @property
    def position(self) -> int:
        return self.positions[self.idx]

    def next(self) -> bool:
        self.idx += 1
        return self.idx < len(self.positions)

    def key(self):
        # pp_less_than orders by position then offset
        return (self.position, self.offset)


def _check_repeats(pp: _PP, pps: list[_PP], count: int) -> bool:
    """Port of sphsc_check_repeats (c/src/q_phrase.c:427-452)."""
    j = 0
    while j < count:
        ppj = pps[j]
        if ppj.offset == pp.offset:
            j += 1
            continue
        if ppj.position + ppj.offset == pp.position + pp.offset:
            if not pp.next():
                return False
            j = 0
            continue
        j += 1
    return True


def sloppy_phrase_freq(
    adjusted: list[list[int]], offsets: list[int], slop: int, check_repeats: bool
) -> float:
    """Port of sphsc_phrase_freq (c/src/q_phrase.c:454-515): min-window PQ,
    each window with match_length <= slop adds 1/(match_length+1)."""
    pps = [_PP(ps, off) for ps, off in zip(adjusted, offsets)]
    heap: list[tuple[tuple[int, int], int]] = []
    last_pos = 0
    freq = 0.0
    for i, pp in enumerate(pps):
        if check_repeats and i > 0:
            # the reference passes count = i - 1 here (c/src/q_phrase.c:478)
            if not _check_repeats(pp, pps, i - 1):
                return freq
        if pp.position > last_pos:
            last_pos = pp.position
        heapq.heappush(heap, (pp.key(), i))
    done = False
    while not done:
        _, i = heapq.heappop(heap)
        pp = pps[i]
        pos = start = pp.position
        next_pos = heap[0][0][0]
        while pos <= next_pos:
            start = pos
            if not pp.next() or (
                check_repeats and not _check_repeats(pp, pps, len(pps))
            ):
                done = True
                break
            pos = pp.position
        match_length = last_pos - start
        if match_length <= slop:
            freq += 1.0 / (match_length + 1.0)
        if not done:
            if pp.position > last_pos:
                last_pos = pp.position
            heapq.heappush(heap, (pp.key(), i))
    return freq
