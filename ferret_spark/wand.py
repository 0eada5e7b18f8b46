"""Segment-parallel scoring with block-max pruning.

Execution shape (the reference's own distributed blueprint — MultiSearcher
with global df via CachedDFSearcher, c/src/search.c:1443-1840,1305-1441):

1. driver: rewrite query against term_stats (global df/N/avgdl constants)
2. ship the query's terms to the segments table (parquet term pushdown)
3. groupBy(seg_id).applyInPandas: each segment (a doc-range shard) decodes
   its posting rows and computes EXACT BM25 scores for its doc range,
   block-max pruning where the query shape allows (skip lists analog,
   c/src/index.c:2999-3065, upgraded to block-max WAND), emits local top-k
4. global top-k: orderBy(float32 score desc, doc_id asc).limit(k)

Score parity: every float64 operation mirrors the oracle
(term contributions added in sorted-term order, clause sums in clause
order, boost applied at the same node), so float32 ranks are identical.
Pruning uses a strict (1 - 1e-6) margin below the current kth f32 score,
which exceeds float32 rounding error, so pruning can never drop a doc that
could enter the top-k or change a tie.
"""

from __future__ import annotations

import heapq
from dataclasses import dataclass

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ferret_spark.codec import decode_posting_list
from ferret_spark.oracle import K1, B, bm25_idf, sloppy_phrase_freq
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
)
from ferret_spark.search import ConstantScoreMatch, spark_rewrite


@dataclass(frozen=True)
class ConstantScoreTerms(Query):
    """Docs having any of ``terms`` score boost*1.0 — the rewrite target of
    RangeQuery on keyword fields (ConstantScoreQuery over a RangeFilter,
    c/src/q_range.c:498-509)."""

    field: str = "content"
    terms: tuple[str, ...] = ()


# Past this many matching terms a range stops materializing the term list
# driver-side and becomes a segment-evaluated predicate instead — the
# reference's RangeFilter never collects the term list either (BitVector is
# built reader-side while walking the term dict, c/src/q_range.c:218-277).
RANGE_EXPAND_CAP = 512


@dataclass(frozen=True)
class ConstantScoreRange(Query):
    """Fallback rewrite of a wide RangeQuery: the bound is NOT expanded to a
    term list; it ships as a predicate pushed into the segments scan (term
    string/numeric comparison) and re-checked per posting row in the segment
    evaluator. Driver memory stays O(1) regardless of how many terms match
    (the 10^12-scale high-cardinality-field case)."""

    field: str = "content"
    lower: str | float | None = None
    upper: str | float | None = None
    include_lower: bool = True
    include_upper: bool = True
    typed: bool = False

    def matches(self, term: str) -> bool:
        if self.typed:
            try:
                v = float(term)
            except (TypeError, ValueError):
                return False
        else:
            v = term
        lo, hi = self.lower, self.upper
        if self.typed:
            lo = None if lo is None else float(lo)
            hi = None if hi is None else float(hi)
        else:
            lo = None if lo is None else str(lo)
            hi = None if hi is None else str(hi)
        if lo is not None and (v < lo or (v == lo and not self.include_lower)):
            return False
        if hi is not None and (v > hi or (v == hi and not self.include_upper)):
            return False
        return True

    def spark_cond(self):
        """Predicate over the segments table's `term` column (pushed into
        the scan; for typed bounds the cast runs executor-side)."""
        col = (
            F.expr("try_cast(term as double)") if self.typed
            else F.col("term")
        )
        cond = col.isNotNull()
        if self.lower is not None:
            lo = float(self.lower) if self.typed else str(self.lower)
            cond = cond & (col >= lo if self.include_lower else col > lo)
        if self.upper is not None:
            hi = float(self.upper) if self.typed else str(self.upper)
            cond = cond & (col <= hi if self.include_upper else col < hi)
        return (F.col("field") == self.field) & cond


@dataclass(frozen=True)
class CachedFilterDocs(Query):
    """A filter whose matching doc-id set is cached index-side
    (frt_filter_get_bv analog, c/src/filter.c:24-38): the ids are a
    per-generation parquet under {index}/filter_cache and ride the seg_id
    shuffle as packed __filt__ rows — repeated filtered searches never
    re-scan the filter's postings."""

    field: str = "content"
    tag: str = ""


def _filter_cache_key(node) -> str:
    import hashlib

    if isinstance(node, ConstantScoreTerms):
        raw = repr(("terms", node.field, node.terms))
    elif isinstance(node, ConstantScoreMatch):
        raw = repr(("match", node.field, node.prefix, node.pattern))
    else:
        raw = repr(
            (
                "range", node.field, node.lower, node.upper,
                node.include_lower, node.include_upper, node.typed,
            )
        )
    return hashlib.md5(raw.encode()).hexdigest()[:16]


def _filter_docs_df(index, node) -> DataFrame:
    """Matching doc ids for a ConstantScore filter node — one small decode
    job over JUST the filter's posting rows (term/range pushdown into the
    segments scan), distributed end-to-end."""
    from ferret_spark.segments import _row_to_codec

    if isinstance(node, ConstantScoreTerms):
        cond = (F.col("field") == node.field) & F.col("term").isin(
            list(node.terms)
        )
    else:
        cond = node.spark_cond()

    def dec(batches):
        for pdf in batches:
            outs = []
            for r in pdf.to_dict("records"):
                ids, _tfs, _pos, _dls = decode_posting_list(
                    _row_to_codec(r), with_positions=False
                )
                outs.append(ids)
            yield pd.DataFrame(
                {
                    "doc_id": np.concatenate(outs)
                    if outs
                    else np.empty(0, dtype=np.int64)
                }
            )

    return index.segments.where(cond).mapInPandas(dec, "doc_id long").distinct()


def _attach_filter_cache(index, q: Query):
    """Replace ConstantScore filter nodes with CachedFilterDocs backed by a
    per-generation doc-id parquet. First use computes + persists the set;
    later searches of the same filter ship the cached ids and skip the
    posting scan entirely. Invalidation is structural: the generation
    (meta version, bumped by add/optimize) is part of the cache path."""
    import os

    path = getattr(index, "path", None)
    if not path or not getattr(index, "filter_doc_cache", True):
        return q, {}
    gen = getattr(index, "generation", 0)
    cached: dict[str, str] = {}

    def walk(node):
        if isinstance(
            node, (ConstantScoreTerms, ConstantScoreRange, ConstantScoreMatch)
        ):
            tag = _filter_cache_key(node)
            cdir = os.path.join(path, "filter_cache", f"v{gen}", tag)
            try:
                if not os.path.exists(os.path.join(cdir, "_SUCCESS")):
                    _filter_docs_df(index, node).write.mode(
                        "overwrite"
                    ).parquet(cdir)
                cached[tag] = cdir
                return CachedFilterDocs(
                    boost=node.boost, field=node.field, tag=tag
                )
            except Exception:  # read-only index dir -> uncached semantics
                return node
        if isinstance(node, BooleanQuery):
            from ferret_spark.query import Clause

            return BooleanQuery(
                boost=node.boost,
                clauses=tuple(
                    Clause(walk(c.query), c.occur) for c in node.clauses
                ),
            )
        return node

    return walk(q), cached


def _bm25_tf_np(tf, dl, avgdl: float):
    tf = tf.astype(np.float64)
    dl = dl.astype(np.float64)
    return tf * (K1 + 1.0) / (tf + K1 * (1.0 - B + B * dl / avgdl))


def wand_rewrite(index, q: Query) -> Query:
    """spark_rewrite + RangeQuery -> ConstantScoreTerms via term-dict scan
    + SpanPrefix -> SpanMultiTerm expansion."""
    from ferret_spark.spans import is_span

    if is_span(q):
        return _expand_span(index, q)
    q = spark_rewrite(index, q)
    return _range_to_const(index, q)


def _expand_span(index, q):
    import dataclasses

    from ferret_spark.spans import (
        SpanFirstQuery,
        SpanMultiTermQuery,
        SpanNearQuery,
        SpanNotQuery,
        SpanOrQuery,
        SpanPrefixQuery,
    )

    if isinstance(q, SpanPrefixQuery):
        # truncation is in term order, so the cap is pushed into the
        # term-dict scan (TakeOrderedAndProject) — the driver never sees
        # more than max_terms rows no matter how wide the prefix
        # (FrtSpanPrefixQuery max_terms, c/src/q_span.c)
        rows = (
            index.term_stats.where(
                (F.col("field") == q.field)
                & F.col("term").startswith(q.prefix)
            )
            .select("term")
            .orderBy("term")
            .limit(q.max_terms)
            .collect()
        )
        terms = [r["term"] for r in rows]
        return SpanMultiTermQuery(boost=q.boost, field=q.field, terms=tuple(terms))
    if isinstance(q, SpanFirstQuery):
        return dataclasses.replace(q, match=_expand_span(index, q.match))
    if isinstance(q, SpanOrQuery):
        return dataclasses.replace(
            q, clauses=tuple(_expand_span(index, c) for c in q.clauses)
        )
    if isinstance(q, SpanNotQuery):
        return dataclasses.replace(
            q,
            inc=_expand_span(index, q.inc),
            exc=_expand_span(index, q.exc),
        )
    if isinstance(q, SpanNearQuery):
        return dataclasses.replace(
            q, clauses=tuple(_expand_span(index, c) for c in q.clauses)
        )
    return q


def _range_to_const(index, q: Query) -> Query:
    if isinstance(q, RangeQuery):
        # per-index filter cache (frt_filter_get_bv analog,
        # c/src/filter.c:24-38): a repeated range filter reuses its
        # expanded term set instead of re-scanning the term dictionary
        cache = getattr(index, "filter_cache", None)
        ckey = (
            "range", q.field, q.lower, q.upper,
            q.include_lower, q.include_upper, q.typed,
        )
        if cache is not None and ckey in cache:
            return ConstantScoreTerms(
                boost=q.boost, field=q.field, terms=cache[ckey]
            )
        ts = index.term_stats.where(F.col("field") == q.field)
        if q.typed:
            # numeric bounds pushed into the term_stats scan via the
            # build-time term_num column (parquet rowgroup pruning) — only
            # the MATCHING terms ever reach the driver, never the whole
            # term dictionary (O(vocabulary) driver collect is a
            # 10^12-scale killer)
            if "term_num" in ts.columns:
                num = F.col("term_num")
            else:  # legacy index layout without the shadow column
                num = F.expr("try_cast(term as double)")
            cond = num.isNotNull()
            if q.lower is not None:
                lo = float(q.lower)
                cond = cond & (num >= lo if q.include_lower else num > lo)
            if q.upper is not None:
                hi = float(q.upper)
                cond = cond & (num <= hi if q.include_upper else num < hi)
        else:
            cond = F.lit(True)
            if q.lower is not None:
                lo = str(q.lower)
                cond = cond & (
                    F.col("term") >= lo if q.include_lower else F.col("term") > lo
                )
            if q.upper is not None:
                hi = str(q.upper)
                cond = cond & (
                    F.col("term") <= hi if q.include_upper else F.col("term") < hi
                )
        # expansion is CAPPED (max_terms analog, c/src/q_multi_term.c:41-120):
        # collect at most cap+1 terms; past the cap the range stays a pushed
        # predicate (ConstantScoreRange) and the driver never materializes
        # the term list — a wide range over a high-cardinality numeric field
        # would otherwise collect O(vocabulary) terms
        out = [
            r["term"]
            for r in ts.where(cond).select("term")
            .limit(RANGE_EXPAND_CAP + 1).collect()
        ]
        if len(out) > RANGE_EXPAND_CAP:
            return ConstantScoreRange(
                boost=q.boost,
                field=q.field,
                lower=q.lower,
                upper=q.upper,
                include_lower=q.include_lower,
                include_upper=q.include_upper,
                typed=q.typed,
            )
        expanded = tuple(sorted(out))
        if cache is not None:
            cache[ckey] = expanded
        return ConstantScoreTerms(boost=q.boost, field=q.field, terms=expanded)
    if isinstance(q, BooleanQuery):
        from ferret_spark.query import Clause

        return BooleanQuery(
            boost=q.boost,
            clauses=tuple(
                Clause(_range_to_const(index, c.query), c.occur) for c in q.clauses
            ),
        )
    return q


def _exact_pair_cond(pairs):
    """Pushed scan predicate listing EXACTLY the requested (field, term)
    pairs — an OR of per-field term lists, not the fields x terms
    cross-product (which over-scans postings whenever a batch spans
    multiple fields; VERDICT r6 finding #2)."""
    by_field: dict[str, list[str]] = {}
    for f, t in pairs:
        by_field.setdefault(f, []).append(t)
    cond = None
    for f in sorted(by_field):
        c = (F.col("field") == f) & F.col("term").isin(sorted(by_field[f]))
        cond = c if cond is None else (cond | c)
    return cond


def _collect_terms(q: Query) -> list[tuple[str, str]]:
    from ferret_spark.spans import is_span, span_field, span_terms

    if is_span(q):
        return [(span_field(q), t) for t in span_terms(q)]
    if isinstance(q, TermQuery):
        return [(q.field, q.term)]
    if isinstance(q, (MultiTermQuery, ConstantScoreTerms)):
        return [(q.field, t) for t in (
            [t for t, _ in q.terms] if isinstance(q, MultiTermQuery) else q.terms
        )]
    if isinstance(q, PhraseQuery):
        return [(q.field, t) for _, alts in q.positions for t in alts]
    if isinstance(q, BooleanQuery):
        return [ft for c in q.clauses for ft in _collect_terms(c.query)]
    return []


def _collect_ranges(q: Query) -> list[Query]:
    """Uncapped pushed-predicate nodes in the tree (range bounds and
    prefix/wildcard matches) — these reach the segments scan as predicates
    instead of term expansions."""
    if isinstance(q, (ConstantScoreRange, ConstantScoreMatch)):
        return [q]
    if isinstance(q, BooleanQuery):
        return [r for c in q.clauses for r in _collect_ranges(c.query)]
    return []


def _query_needs_all_docs(q: Query) -> bool:
    if isinstance(q, MatchAllQuery):
        return True
    if isinstance(q, BooleanQuery):
        return any(_query_needs_all_docs(c.query) for c in q.clauses)
    return False


def _needs_absent_dfs(q: Query) -> bool:
    """True when scoring needs global dfs for terms NOT present in a
    segment: phrase/span idf sums cover every (globally alive) query term,
    while term/multiterm/const nodes only read dfs of locally-present
    postings."""
    from ferret_spark.spans import is_span

    if isinstance(q, PhraseQuery) or is_span(q):
        return True
    if isinstance(q, BooleanQuery):
        return any(_needs_absent_dfs(c.query) for c in q.clauses)
    return False


# ---------------------------------------------------------------------------
# per-segment evaluation


class _SegEval:
    """Evaluates a query tree over one segment's decoded posting rows.
    Nodes return (mask bool[seg_n], score float64[seg_n])."""

    def __init__(
        self, rows_by_ft, dfs, n_docs, avgdl_map, base, seg_n, id_ranges=None
    ):
        self.rows = rows_by_ft  # (field, term) -> codec row dict
        self.dfs = dfs
        self.n_docs = n_docs
        self.avgdl = avgdl_map
        self.base = base
        self.seg_n = seg_n
        self.id_ranges = id_ranges or [[0, n_docs]]
        self._decoded: dict[tuple, tuple] = {}

    def decoded(self, field, term, with_positions=False):
        key = (field, term, with_positions)
        if key not in self._decoded:
            row = self.rows.get((field, term))
            if row is None:
                self._decoded[key] = None
            else:
                ids, tfs, pos, dls = decode_posting_list(
                    row, with_positions=with_positions
                )
                self._decoded[key] = (ids - self.base, tfs, pos, dls)
        return self._decoded[key]

    def _zero(self):
        return np.zeros(self.seg_n, dtype=bool), np.zeros(self.seg_n, dtype=np.float64)

    def eval(self, q: Query):
        if isinstance(q, TermQuery):
            return self._eval_term(q)
        if isinstance(q, MultiTermQuery):
            return self._eval_multi(q)
        if isinstance(q, ConstantScoreTerms):
            return self._eval_const(q)
        if isinstance(q, (ConstantScoreRange, ConstantScoreMatch)):
            return self._eval_const_range(q)
        if isinstance(q, CachedFilterDocs):
            return self._eval_cached_filter(q)
        if isinstance(q, BooleanQuery):
            return self._eval_bool(q)
        if isinstance(q, PhraseQuery):
            return self._eval_phrase(q)
        from ferret_spark.spans import is_span

        if is_span(q):
            return self._eval_span(q)
        if isinstance(q, MatchAllQuery):
            mask = np.zeros(self.seg_n, dtype=bool)
            for lo, hi in self.id_ranges:
                a = max(lo, self.base) - self.base
                b = min(hi, self.base + self.seg_n) - self.base
                if b > a:
                    mask[a:b] = True
            score = np.zeros(self.seg_n, dtype=np.float64)
            score[mask] = q.boost * 1.0
            return mask, score
        raise TypeError(type(q).__name__)

    def _eval_term(self, q: TermQuery):
        mask, score = self._zero()
        df = self.dfs.get((q.field, q.term), 0)
        dec = self.decoded(q.field, q.term)
        if df == 0 or dec is None:
            return mask, score
        local, tfs, _, dls = dec
        idf = bm25_idf(df, self.n_docs)
        contrib = q.boost * idf * _bm25_tf_np(tfs, dls, self.avgdl[q.field])
        mask[local] = True
        score[local] = contrib
        return mask, score

    def _eval_multi(self, q: MultiTermQuery):
        mask, score = self._zero()
        # sorted-term accumulation order (parity with oracle/planner)
        for term, tboost in sorted(q.terms):
            df = self.dfs.get((q.field, term), 0)
            dec = self.decoded(q.field, term)
            if df == 0 or dec is None:
                continue
            local, tfs, _, dls = dec
            idf = bm25_idf(df, self.n_docs)
            contrib = tboost * idf * _bm25_tf_np(tfs, dls, self.avgdl[q.field])
            score[local] += contrib
            mask[local] = True
        score[mask] *= q.boost
        score[~mask] = 0.0
        return mask, score

    def _eval_const(self, q: ConstantScoreTerms):
        mask, score = self._zero()
        for term in q.terms:
            dec = self.decoded(q.field, term)
            if dec is None:
                continue
            mask[dec[0]] = True
        score[mask] = q.boost * 1.0
        return mask, score

    def _eval_cached_filter(self, q: "CachedFilterDocs"):
        """Mask from the cached doc-id set shipped as a packed __filt__ row
        (this segment's slice only) — no posting decode."""
        mask, score = self._zero()
        local = getattr(self, "cached_filters", {}).get(q.tag)
        if local is not None and len(local):
            sel = local[(local >= 0) & (local < self.seg_n)]
            mask[sel] = True
        score[mask] = q.boost * 1.0
        return mask, score

    def _eval_const_range(self, q: "ConstantScoreRange"):
        """Uncapped-range fallback: the segments scan already filtered rows
        to the bound (spark_cond pushed predicate), but rows for OTHER
        clauses of the same field also land in this task — re-check the
        bound per term. Term list never touches the driver (RangeFilter
        semantics, c/src/q_range.c:218-277)."""
        mask, score = self._zero()
        for (field, term) in self.rows:
            if field != q.field or not q.matches(term):
                continue
            dec = self.decoded(field, term)
            if dec is None:
                continue
            mask[dec[0]] = True
        score[mask] = q.boost * 1.0
        return mask, score

    def _eval_bool(self, q: BooleanQuery):
        musts = [c.query for c in q.clauses if c.occur == MUST]
        shoulds = [c.query for c in q.clauses if c.occur == SHOULD]
        nots = [c.query for c in q.clauses if c.occur == MUST_NOT]
        total = np.zeros(self.seg_n, dtype=np.float64)
        if musts:
            mask = np.ones(self.seg_n, dtype=bool)
            for m in musts:
                mm, ms = self.eval(m)
                mask &= mm
                total += ms
            for s in shoulds:
                sm, ss = self.eval(s)
                total += ss
        else:
            if not shoulds:
                return self._zero()
            mask = np.zeros(self.seg_n, dtype=bool)
            for s in shoulds:
                sm, ss = self.eval(s)
                mask |= sm
                total += ss
        for n_ in nots:
            nm, _ = self.eval(n_)
            mask &= ~nm
        out = np.zeros(self.seg_n, dtype=np.float64)
        out[mask] = q.boost * total[mask]
        return mask, out

    def _eval_span(self, q):
        from ferret_spark.oracle import bm25_tf
        from ferret_spark.spans import (
            scoring_terms,
            span_field,
            span_freq,
            span_terms,
        )

        mask, score = self._zero()
        field = span_field(q)
        # postings are fetched for ALL terms (exc clauses filter), but the
        # idf sum covers only get_terms() — SpanNot excludes exc
        # (spanxq_get_terms, c/src/q_span.c:2202-2205)
        terms = sorted(set(span_terms(q)))  # already expanded driver-side
        sterms = set(scoring_terms(q))
        idf_sum = 0.0
        pos_by_doc: dict[int, dict[str, list]] = {}
        dl_by_doc: dict[int, int] = {}
        for t in terms:
            df = self.dfs.get((field, t), 0)
            if df > 0 and t in sterms:
                idf_sum += bm25_idf(df, self.n_docs)
            dec = self.decoded(field, t, with_positions=True)
            if dec is None:
                continue
            local, tfs, pos, dls = dec
            for i, d in enumerate(local):
                pos_by_doc.setdefault(int(d), {})[t] = pos[i].tolist()
                dl_by_doc[int(d)] = int(dls[i])
        avgdl = self.avgdl[field]
        for d, pmap in pos_by_doc.items():
            freq = span_freq(q, lambda t: pmap.get(t, []))
            if freq > 0.0:
                mask[d] = True
                score[d] = (
                    q.boost * idf_sum * bm25_tf(freq, dl_by_doc[d], avgdl)
                )
        return mask, score

    def _eval_phrase(self, q: PhraseQuery):
        mask, score = self._zero()
        if not q.positions:
            return mask, score
        field = q.field
        # idf_sum accumulates over GLOBAL dfs in slot/alt order (same
        # float64 add sequence as the oracle)
        idf_sum = 0.0
        for _, alts in q.positions:
            for t in alts:
                df = self.dfs.get((field, t), 0)
                if df > 0:
                    idf_sum += bm25_idf(df, self.n_docs)
        out = self._phrase_freqs_flat(q)
        if out is None:
            out = self._phrase_freqs_dict(q)
        docs, freq_arr, dl = out
        if docs.size == 0:
            return mask, score
        avgdl = self.avgdl[field]
        nz = freq_arr > 0.0
        f = freq_arr[nz]
        dd = docs[nz]
        # same float64 grouping as the scalar form:
        # ((boost*idf_sum) * (f*(K1+1))) / (f + K1*(1-B+B*dl/avgdl))
        s = (
            q.boost
            * idf_sum
            * (f * (K1 + 1.0))
            / (f + K1 * (1.0 - B + B * dl[nz] / avgdl))
        )
        mask[dd] = True
        score[dd] = s
        return mask, score

    def _phrase_freqs_flat(self, q: PhraseQuery):
        """Vectorized phrase frequencies over this segment:
        (cand_local_ids, freqs, doc_lens) — or None when a slot has
        multiple segment-live alternatives (the rare multi-term-position
        case keeps the dict path).

        No per-posting Python anywhere: flat position decode (one cumsum
        per posting list), candidate set via sorted np.intersect1d, the
        candidates' position runs extracted with a ragged gather, then
        the whole-segment batch kernels (phrase_np) score every doc at
        once.  Only repeated-term phrases walk per doc (genuinely
        sequential semantics)."""
        field = q.field
        empty = (np.empty(0, dtype=np.int64), np.zeros(0), np.zeros(0))
        decs = []
        for _, alts in q.positions:
            live = [
                d
                for d in (
                    self.decoded(field, t, with_positions="flat") for t in alts
                )
                if d is not None
            ]
            if not live:
                return empty
            if len(live) > 1:
                return None
            decs.append(live[0])
        return _phrase_freqs_from_decs(q, decs)

    def _phrase_freqs_dict(self, q: PhraseQuery):
        """Dict-built phrase frequencies — the multi-alternative-slot
        path (per-doc position-list merge across a slot's terms)."""
        field = q.field
        empty = (np.empty(0, dtype=np.int64), np.zeros(0), np.zeros(0))
        slot_pos: list[dict[int, np.ndarray]] = []
        slot_dls: dict[int, int] = {}
        for _, alts in q.positions:
            m: dict[int, list] = {}
            for t in alts:
                dec = self.decoded(field, t, with_positions=True)
                if dec is None:
                    continue
                local, tfs, pos, dls = dec
                for i, d in enumerate(local):
                    plist = pos[i]
                    if d in m:
                        m[d].append(plist)
                    else:
                        m[d] = [plist]
                    slot_dls[int(d)] = int(dls[i])
            if not m:
                return empty
            slot_pos.append(
                {
                    d: (np.sort(np.concatenate(ls)) if len(ls) > 1 else ls[0])
                    for d, ls in m.items()
                }
            )
        cand = set(slot_pos[0].keys())
        for m in slot_pos[1:]:
            cand &= m.keys()
        if not cand:
            return empty
        offsets = [off for off, _ in q.positions]
        repeats = _phrase_repeats(q)
        docs = np.fromiter(sorted(cand), dtype=np.int64, count=len(cand))
        if len(q.positions) == 1:
            freq_arr = np.fromiter(
                (float(len(slot_pos[0][int(d)])) for d in docs),
                dtype=np.float64, count=len(docs),
            )
        else:
            freq_arr = _phrase_freq_vec(q, slot_pos, offsets, repeats, docs)
        dl = np.fromiter(
            (slot_dls[int(d)] for d in docs), dtype=np.float64, count=len(docs)
        )
        return docs, freq_arr, dl


def _phrase_freq_vec(q, slot_pos, offsets, repeats, docs):
    """Per-candidate-doc phrase freqs, vectorized where the shape allows:
    exact phrases batch through the k-way group-count kernel, 2-term
    sloppy phrases through the alternating-chain kernel (phrase_np) —
    one numpy pass over the whole segment's candidates instead of a
    Python walk per doc.  >=3-slot sloppy / repeated-term phrases keep
    the per-doc oracle walk (heap + repeat reconciliation is genuinely
    sequential)."""
    from ferret_spark.phrase_np import exact_freqk_batch, sloppy_freq2_batch

    k = len(q.positions)
    if q.slop == 0:
        return exact_freqk_batch(
            [[slot_pos[i][int(d)] for d in docs] for i in range(k)], offsets
        )
    if k == 2 and not repeats:
        return sloppy_freq2_batch(
            [slot_pos[0][int(d)] for d in docs],
            [slot_pos[1][int(d)] for d in docs],
            offsets[0],
            offsets[1],
            q.slop,
        )
    out = np.zeros(len(docs), dtype=np.float64)
    for j, d in enumerate(docs):
        adjusted = [
            [int(p) - offsets[i] for p in slot_pos[i][int(d)]]
            for i in range(k)
        ]
        out[j] = sloppy_phrase_freq(adjusted, offsets, q.slop, repeats)
    return out


def _phrase_repeats(q: PhraseQuery) -> bool:
    seen = set()
    for _, alts in q.positions:
        for t in alts:
            if t in seen:
                return True
            seen.add(t)
    return False


def _phrase_freqs_from_decs(q: PhraseQuery, decs):
    """Kernel dispatch over per-slot decoded postings: ``decs[j]`` is
    (ids sorted, tfs, (pos_flat, bounds), dls) in ANY consistent id
    space (segment-local or global) -> (cand_ids, freqs, dls).  Shared
    by the per-segment evaluator and the cross-segment phrase path
    (which passes streams concatenated across a whole segment group)."""
    from ferret_spark.phrase_np import (
        exact_freqk_flat,
        sloppy_freq2_flat,
        sloppy_freqk_flat,
    )

    empty = (np.empty(0, dtype=np.int64), np.zeros(0), np.zeros(0))
    cand = decs[0][0]
    for d in decs[1:]:
        cand = np.intersect1d(cand, d[0], assume_unique=True)
    if cand.size == 0:
        return empty
    offsets = [off for off, _ in q.positions]
    repeats = _phrase_repeats(q)
    k = len(decs)
    flats, lens = [], []
    dl = None
    for j, (local, tfs, (pflat, bounds), dls) in enumerate(decs):
        if len(cand) == len(local):
            # every posting doc is a candidate (hot terms co-occur):
            # the flat stream is already exactly the gather result
            flats.append(pflat)
            lens.append(tfs)
            if j == 0:
                dl = dls.astype(np.float64)
            continue
        idx = np.searchsorted(local, cand)
        ln = tfs[idx]
        starts = bounds[idx]
        total = int(ln.sum())
        out_starts = np.concatenate(([0], np.cumsum(ln)[:-1]))
        gidx = np.repeat(starts - out_starts, ln) + np.arange(
            total, dtype=np.int64
        )
        flats.append(pflat[gidx])
        lens.append(ln)
        if j == 0:
            dl = dls[idx].astype(np.float64)
    if k == 1:
        freq = lens[0].astype(np.float64)
    elif q.slop == 0:
        freq = exact_freqk_flat(flats, lens, offsets)
    elif k == 2 and not repeats:
        freq = sloppy_freq2_flat(
            flats[0], lens[0], flats[1], lens[1],
            offsets[0], offsets[1], q.slop,
        )
    elif not repeats:
        # k>=3 sloppy, no repeated terms: lockstep vectorization of
        # the heap walk — all candidate docs advance one event per
        # iteration, no per-doc Python
        freq = sloppy_freqk_flat(flats, lens, offsets, q.slop)
    else:
        # repeated-term slots keep the per-doc walk: the repeat
        # reconciliation (sphsc_check_repeats) mutates sibling
        # iterators mid-pop and is genuinely sequential
        freq = np.zeros(len(cand), dtype=np.float64)
        bnds = [np.concatenate(([0], np.cumsum(l))) for l in lens]
        for i in range(len(cand)):
            adjusted = [
                (flats[j][bnds[j][i] : bnds[j][i + 1]] - offsets[j]).tolist()
                for j in range(k)
            ]
            freq[i] = sloppy_phrase_freq(adjusted, offsets, q.slop, repeats)
    return cand, freq, dl


class _SegEvalTFIDF(_SegEval):
    """Classic TF-IDF scoring (reference default similarity) over a
    segment — mirrors OracleIndex._tfidf_node float-for-float. qnorm is the
    driver-computed query norm; doc_boosts maps global doc_id -> boost."""

    def __init__(self, *args, qnorm: float = 1.0, doc_boosts=None, **kw):
        super().__init__(*args, **kw)
        self.qnorm = qnorm
        self.doc_boosts = doc_boosts or {}

    def _norms(self, local, dls):
        from ferret_spark.similarity import NORM_TABLE, encode_norm

        out = np.empty(len(local), dtype=np.float64)
        for i in range(len(local)):
            b = self.doc_boosts.get(int(local[i]) + self.base, 1.0)
            out[i] = NORM_TABLE[encode_norm(1.0, b, int(dls[i]))]
        return out

    def eval(self, q: Query, anc: float = 1.0):
        from ferret_spark import similarity as S

        b = anc * q.boost
        mask, score = self._zero()
        if isinstance(q, TermQuery):
            dec = self.decoded(q.field, q.term)
            if dec is None:
                return mask, score
            local, tfs, _, dls = dec
            i = S.idf(self.dfs.get((q.field, q.term), 0), self.n_docs)
            val = i * i * b * self.qnorm
            score[local] = np.sqrt(tfs.astype(np.float64)) * val * self._norms(
                local, dls
            )
            mask[local] = True
            return mask, score
        if isinstance(q, MultiTermQuery):
            for t, tb in sorted(q.terms):
                dec = self.decoded(q.field, t)
                if dec is None:
                    continue
                local, tfs, _, dls = dec
                i = S.idf(self.dfs.get((q.field, t), 0), self.n_docs)
                val = i * i * tb * b * self.qnorm
                score[local] += np.sqrt(
                    tfs.astype(np.float64)
                ) * val * self._norms(local, dls)
                mask[local] = True
            return mask, score
        if isinstance(q, ConstantScoreTerms):
            for t in q.terms:
                dec = self.decoded(q.field, t)
                if dec is not None:
                    mask[dec[0]] = True
            score[mask] = 1.0 * b * self.qnorm
            return mask, score
        if isinstance(q, (ConstantScoreRange, ConstantScoreMatch)):
            mask, _ = _SegEval._eval_const_range(self, q)
            score[mask] = 1.0 * b * self.qnorm
            return mask, score
        if isinstance(q, CachedFilterDocs):
            mask, _ = _SegEval._eval_cached_filter(self, q)
            score[mask] = 1.0 * b * self.qnorm
            return mask, score
        if isinstance(q, MatchAllQuery):
            for lo, hi in self.id_ranges:
                a = max(lo, self.base) - self.base
                z = min(hi, self.base + self.seg_n) - self.base
                if z > a:
                    mask[a:z] = True
            score[mask] = 1.0 * b * self.qnorm
            return mask, score
        if isinstance(q, PhraseQuery):
            return self._eval_phrase_tfidf(q, b)
        if isinstance(q, BooleanQuery):
            musts = [c.query for c in q.clauses if c.occur == MUST]
            shoulds = [c.query for c in q.clauses if c.occur == SHOULD]
            nots = [c.query for c in q.clauses if c.occur == MUST_NOT]
            total = np.zeros(self.seg_n, dtype=np.float64)
            matches = np.zeros(self.seg_n, dtype=np.int64)
            if musts:
                mask = np.ones(self.seg_n, dtype=bool)
                for m in musts:
                    mm, ms = self.eval(m, b)
                    mask &= mm
                    total += ms
                    matches += mm
                for s in shoulds:
                    sm, ss = self.eval(s, b)
                    total += ss
                    matches += sm
            else:
                if not shoulds:
                    return self._zero()
                mask = np.zeros(self.seg_n, dtype=bool)
                for s in shoulds:
                    sm, ss = self.eval(s, b)
                    mask |= sm
                    total += ss
                    matches += sm
            for n_ in nots:
                nm, _ = self.eval(n_, b)
                mask &= ~nm
            max_overlap = len(musts) + len(shoulds)
            out = np.zeros(self.seg_n, dtype=np.float64)
            sel = np.flatnonzero(mask)
            out[sel] = total[sel] * (matches[sel] / max_overlap)
            return mask, out
        raise TypeError(f"tfidf mode: unsupported {type(q).__name__}")

    def _eval_phrase_tfidf(self, q: PhraseQuery, b: float):
        from ferret_spark import similarity as S

        mask, score = self._zero()
        if not q.positions:
            return mask, score
        field = q.field
        idf_sum = 0.0
        for _, alts in q.positions:
            for t in alts:
                idf_sum += S.idf(self.dfs.get((field, t), 0), self.n_docs)
        val = idf_sum * idf_sum * b * self.qnorm
        freqs, dl_by_doc = self._phrase_freqs_local(q)
        for d, f in freqs.items():
            boost_d = self.doc_boosts.get(int(d) + self.base, 1.0)
            from ferret_spark.similarity import NORM_TABLE, encode_norm

            norm = NORM_TABLE[encode_norm(1.0, boost_d, dl_by_doc[d])]
            mask[d] = True
            score[d] = S.tf(f) * val * norm
        return mask, score

    def _phrase_freqs_local(self, q: PhraseQuery):
        """doc(local) -> phrase_freq, plus dl map (mirrors oracle)."""
        out = self._phrase_freqs_flat(q)
        if out is None:
            out = self._phrase_freqs_dict(q)
        docs, freq_arr, dl = out
        freqs = {
            int(d): float(f)
            for d, f in zip(docs.tolist(), freq_arr.tolist())
            if f > 0.0
        }
        dls_map = {
            int(d): int(x) for d, x in zip(docs.tolist(), dl.tolist())
        }
        return freqs, dls_map


# ---------------------------------------------------------------------------
# block-max WAND for top-level disjunctions


def _wand_multiterm_topk(
    ev: _SegEval, q: MultiTermQuery, k: int, del_local=None
):
    """Interval block-max WAND: build the piecewise upper-bound function
    from block metadata, visit intervals in decreasing ub order, stop when
    the bound can no longer beat the kth score."""
    terms = []
    for term, tboost in sorted(q.terms):
        df = ev.dfs.get((q.field, term), 0)
        row = ev.rows.get((q.field, term))
        if df == 0 or row is None:
            continue
        idf = bm25_idf(df, ev.n_docs)
        terms.append((term, tboost, idf, row))
    if not terms:
        return [], []
    avgdl = ev.avgdl[q.field]
    events: dict[int, float] = {}
    for term, tboost, idf, row in terms:
        for bm in row["block_meta"]:
            mtf = float(bm["max_tf"])
            mdl = float(max(bm.get("min_dl", 0), 0))
            ub = (
                tboost
                * idf
                * (mtf * (K1 + 1.0))
                / (mtf + K1 * (1.0 - B + B * mdl / avgdl))
            )
            lo = int(bm["first"]) - ev.base
            hi = int(bm["last"]) - ev.base + 1
            events[lo] = events.get(lo, 0.0) + ub
            events[hi] = events.get(hi, 0.0) - ub
    bounds = sorted(events.keys())
    intervals = []  # (ub_sum, lo, hi)
    acc = 0.0
    for i, b in enumerate(bounds):
        acc += events[b]
        if i + 1 < len(bounds) and acc > 0:
            intervals.append((acc, b, bounds[i + 1]))
    intervals.sort(key=lambda t: -t[0])

    heap: list[tuple[np.float32, int]] = []  # (score_f32, -doc_id) min-heap
    exact: dict[int, float] = {}  # doc -> exact float64 score
    decoded = {}
    for term, tboost, idf, row in terms:
        local, tfs, _, dls = ev.decoded(q.field, term)
        decoded[term] = (local, tboost * idf * _bm25_tf_np(tfs, dls, avgdl))

    for ub_sum, lo, hi in intervals:
        if len(heap) >= k:
            theta = float(heap[0][0])
            if q.boost * ub_sum < theta * (1.0 - 1e-6):
                break
        width = hi - lo
        acc_s = np.zeros(width, dtype=np.float64)
        seen = np.zeros(width, dtype=bool)
        for term, _, _, _ in terms:
            local, contrib = decoded[term]
            sel = (local >= lo) & (local < hi)
            if sel.any():
                idxs = local[sel] - lo
                acc_s[idxs] += contrib[sel]
                seen[idxs] = True
        docs_here = np.flatnonzero(seen)
        if del_local is not None and len(del_local):
            dl_in = del_local[(del_local >= lo) & (del_local < hi)] - lo
            if len(dl_in):
                keep = ~np.isin(docs_here, dl_in)
                docs_here = docs_here[keep]
        if len(docs_here) == 0:
            continue
        # identical adds as _eval_multi (sorted-term order), so these ARE
        # the exact unpruned float64 scores
        scores_here = q.boost * acc_s[docs_here]
        f32 = scores_here.astype(np.float32)
        for i in range(len(docs_here)):
            d = int(docs_here[i]) + lo
            item = (f32[i], -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
                exact[d] = float(scores_here[i])
            elif item > heap[0]:
                _, nd_old = heapq.heapreplace(heap, item)
                exact.pop(-nd_old, None)
                exact[d] = float(scores_here[i])
    out = sorted(((-nd, float(s)) for s, nd in heap), key=lambda t: (-t[1], t[0]))
    docs = [d for d, _ in out]
    return docs, [exact[d] for d in docs]


# ---------------------------------------------------------------------------
# block-max WAND for boolean trees of term-like clauses


def _bool_wandable(q: Query) -> bool:
    """Boolean trees whose clauses are all term-like (Term / MultiTerm /
    ConstantScoreTerms) take the interval block-max path: MUST clauses
    prune intervals they don't cover (leapfrog analog, skip_to
    c/src/index.c:2999-3065), SHOULD clauses contribute upper bounds."""
    if not isinstance(q, BooleanQuery) or not q.clauses:
        return False
    if q.boost <= 0.0:
        # WAND's theta comparison assumes positive scores; zero/negative
        # boosts take the dense exact path (which returns such hits)
        return False
    n_terms = 0
    has_scoring = False
    for c in q.clauses:
        cq = c.query
        if cq.boost <= 0.0:
            return False
        if isinstance(cq, TermQuery):
            n_terms += 1
        elif isinstance(cq, MultiTermQuery):
            if any(tb <= 0.0 for _, tb in cq.terms):
                return False
            n_terms += len(cq.terms)
        elif isinstance(cq, ConstantScoreTerms):
            n_terms += len(cq.terms)
        else:
            return False
        if c.occur != MUST_NOT:
            has_scoring = True
    return has_scoring and 0 < n_terms <= 32


def _clause_terms(cq) -> list[tuple[str, float]]:
    if isinstance(cq, TermQuery):
        return [(cq.term, 1.0)]
    if isinstance(cq, MultiTermQuery):
        return sorted(cq.terms)
    return [(t, 1.0) for t in cq.terms]  # ConstantScoreTerms


def _win_eval_clause(ev: _SegEval, cq, lo: int, hi: int):
    """(mask, score) for one term-like clause restricted to local doc-id
    window [lo, hi). Per-doc float64 ops are IDENTICAL to the full-segment
    _eval_term/_eval_multi/_eval_const (windowing only subsets docs), so
    scores stay bit-equal to the unpruned path."""
    width = hi - lo
    mask = np.zeros(width, dtype=bool)
    score = np.zeros(width, dtype=np.float64)
    avgdl = ev.avgdl[cq.field]
    if isinstance(cq, TermQuery):
        dec = ev.decoded(cq.field, cq.term)
        df = ev.dfs.get((cq.field, cq.term), 0)
        if dec is None or df == 0:
            return mask, score
        local, tfs, _, dls = dec
        a, b = np.searchsorted(local, (lo, hi))
        idx = local[a:b] - lo
        idf = bm25_idf(df, ev.n_docs)
        score[idx] = cq.boost * idf * _bm25_tf_np(tfs[a:b], dls[a:b], avgdl)
        mask[idx] = True
        return mask, score
    if isinstance(cq, MultiTermQuery):
        for term, tboost in sorted(cq.terms):
            df = ev.dfs.get((cq.field, term), 0)
            dec = ev.decoded(cq.field, term)
            if df == 0 or dec is None:
                continue
            local, tfs, _, dls = dec
            a, b = np.searchsorted(local, (lo, hi))
            idx = local[a:b] - lo
            idf = bm25_idf(df, ev.n_docs)
            score[idx] += tboost * idf * _bm25_tf_np(
                tfs[a:b], dls[a:b], avgdl
            )
            mask[idx] = True
        score[mask] *= cq.boost
        score[~mask] = 0.0
        return mask, score
    # ConstantScoreTerms
    for term in cq.terms:
        dec = ev.decoded(cq.field, term)
        if dec is None:
            continue
        local = dec[0]
        a, b = np.searchsorted(local, (lo, hi))
        mask[local[a:b] - lo] = True
    score[mask] = cq.boost * 1.0
    return mask, score


def _clause_block_events(ev: _SegEval, cq):
    """(ub_events, cov_events) piecewise maps over local doc ids: ub_events
    accumulates the clause's block-max BM25 upper bound; cov_events counts
    covering blocks (feasibility for MUST pruning). ConstantScoreTerms has
    a flat bound = boost wherever covered."""
    ub_events: dict[int, float] = {}
    cov_events: dict[int, int] = {}
    const = isinstance(cq, ConstantScoreTerms)
    avgdl = ev.avgdl[cq.field]
    for term, tboost in _clause_terms(cq):
        row = ev.rows.get((cq.field, term))
        df = ev.dfs.get((cq.field, term), 0)
        if row is None or (df == 0 and not const):
            continue
        idf = 0.0 if const else bm25_idf(df, ev.n_docs)
        for bm in row["block_meta"]:
            lo = int(bm["first"]) - ev.base
            hi = int(bm["last"]) - ev.base + 1
            cov_events[lo] = cov_events.get(lo, 0) + 1
            cov_events[hi] = cov_events.get(hi, 0) - 1
            if not const:
                mtf = float(bm["max_tf"])
                mdl = float(max(bm.get("min_dl", 0), 0))
                ub = (
                    tboost
                    * idf
                    * (mtf * (K1 + 1.0))
                    / (mtf + K1 * (1.0 - B + B * mdl / avgdl))
                )
                ub_events[lo] = ub_events.get(lo, 0.0) + ub
                ub_events[hi] = ub_events.get(hi, 0.0) - ub
    return ub_events, cov_events, cq.boost


def _wand_bool_topk(ev: _SegEval, q: BooleanQuery, k: int, del_local=None):
    """Interval block-max WAND over a boolean tree of term-like clauses.
    Intervals where any MUST clause has no block coverage are infeasible
    and skipped outright; remaining intervals are visited in decreasing
    upper-bound order until the bound can't beat the kth score. Exact
    per-interval evaluation mirrors _eval_bool's clause order float64
    arithmetic. Returns (docs, scores, intervals_skipped)."""
    musts = [c.query for c in q.clauses if c.occur == MUST]
    shoulds = [c.query for c in q.clauses if c.occur == SHOULD]
    nots = [c.query for c in q.clauses if c.occur == MUST_NOT]
    scoring = [(cq, True) for cq in musts] + [(cq, False) for cq in shoulds]

    per_clause = []
    for cq, is_must in scoring:
        ub_ev, cov_ev, boost = _clause_block_events(ev, cq)
        if is_must and not cov_ev:
            return [], [], 0  # a MUST clause matches nothing here
        per_clause.append((cq, is_must, ub_ev, cov_ev, boost))

    bounds = sorted(
        {b for _, _, u, c, _ in per_clause for b in (*u, *c)}
    )
    if not bounds:
        return [], [], 0
    # walk elementary intervals accumulating each clause's ub + coverage
    accs = [0.0] * len(per_clause)
    covs = [0] * len(per_clause)
    intervals = []  # (ub_sum, lo, hi)
    for i, pt in enumerate(bounds[:-1]):
        for j, (cq, is_must, ub_ev, cov_ev, boost) in enumerate(per_clause):
            accs[j] += ub_ev.get(pt, 0.0)
            covs[j] += cov_ev.get(pt, 0)
        feasible = all(
            covs[j] > 0
            for j, (_, is_must, _, _, _) in enumerate(per_clause)
            if is_must
        )
        if not feasible:
            continue
        ub = 0.0
        for j, (cq, is_must, ub_ev, cov_ev, boost) in enumerate(per_clause):
            if covs[j] <= 0:
                continue
            if isinstance(cq, ConstantScoreTerms):
                ub += cq.boost
            else:
                # clause bound = (sum of per-term block bounds) * clause
                # boost (Term and MultiTerm both scale by cq.boost)
                ub += accs[j] * cq.boost
        if ub > 0.0:
            intervals.append((ub, pt, bounds[i + 1]))
    intervals.sort(key=lambda t: -t[0])

    heap: list[tuple[np.float32, int]] = []
    exact: dict[int, float] = {}
    skipped = 0
    for n_i, (ub_sum, lo, hi) in enumerate(intervals):
        if len(heap) >= k:
            theta = float(heap[0][0])
            if q.boost * ub_sum < theta * (1.0 - 1e-6):
                skipped += len(intervals) - n_i
                break
        width = hi - lo
        total = np.zeros(width, dtype=np.float64)
        if musts:
            mask = np.ones(width, dtype=bool)
            for m in musts:
                mm, ms = _win_eval_clause(ev, m, lo, hi)
                mask &= mm
                total += ms
            for s in shoulds:
                _sm, ss = _win_eval_clause(ev, s, lo, hi)
                total += ss
        else:
            mask = np.zeros(width, dtype=bool)
            for s in shoulds:
                sm, ss = _win_eval_clause(ev, s, lo, hi)
                mask |= sm
                total += ss
        for n_ in nots:
            nm, _ns = _win_eval_clause(ev, n_, lo, hi)
            mask &= ~nm
        if del_local is not None and len(del_local):
            d_in = del_local[(del_local >= lo) & (del_local < hi)] - lo
            if len(d_in):
                mask[d_in] = False
        docs_here = np.flatnonzero(mask)
        if len(docs_here) == 0:
            continue
        scores_here = q.boost * total[docs_here]
        f32 = scores_here.astype(np.float32)
        for i in range(len(docs_here)):
            d = int(docs_here[i]) + lo
            item = (f32[i], -d)
            if len(heap) < k:
                heapq.heappush(heap, item)
                exact[d] = float(scores_here[i])
            elif item > heap[0]:
                _, nd_old = heapq.heapreplace(heap, item)
                exact.pop(-nd_old, None)
                exact[d] = float(scores_here[i])
    out = sorted(((-nd, float(s)) for s, nd in heap), key=lambda t: (-t[1], t[0]))
    docs = [d for d, _ in out]
    return docs, [exact[d] for d in docs], skipped


# ---------------------------------------------------------------------------
# the distributed search


def _pack_ids(
    ids_df: DataFrame, seg_size: int, seg_schema, field_name: str
) -> DataFrame:
    """doc_ids -> one ``field_name`` row per affected segment whose doc_bin
    is the sorted int64 id array. Rides the same seg_id shuffle as the
    posting rows, so a bulk id set (10^9 ids) never touches the driver and
    each scoring task sees only its own segment's slice."""

    def pack(key, pdf):  # no hints: pyspark warns on partial grouped-map hints
        ids = np.sort(pdf["doc_id"].to_numpy().astype(np.int64))
        return pd.DataFrame(
            [
                (
                    int(key[0]),
                    field_name,
                    "",
                    int(len(ids)),
                    ids.tobytes(),
                    b"",
                    b"",
                    b"",
                    None,
                )
            ],
            columns=[
                "seg_id", "field", "term", "df",
                "doc_bin", "tf_bin", "pos_bin", "dl_bin", "block_meta",
            ],
        )

    rows = ids_df.select(
        (F.col("doc_id") / F.lit(seg_size)).cast("int").alias("seg_id"),
        F.col("doc_id").cast("long").alias("doc_id"),
    )
    return rows.groupBy("seg_id").applyInPandas(pack, seg_schema)


def _pack_deleted(deleted: DataFrame, seg_size: int, seg_schema) -> DataFrame:
    """Deletions as packed per-segment rows (lazy-BitVector analog,
    c/src/index.c:5729-5745)."""
    return _pack_ids(deleted, seg_size, seg_schema, "__del__")


_BALANCED_KEY_CACHE: dict = {}


def _balanced_group_keys(spark) -> list[int]:
    """LONG group keys whose shuffle-hash partitions — pmod(hash(key), P)
    for P = spark.sql.shuffle.partitions — are exactly 0..P-1, one each.
    Grouping by these keys places one group per reduce partition, so a
    ~P-group applyInPandas stage runs perfectly level instead of the
    balls-in-bins layout hash keys give (max 3-4 groups on one partition
    at m ~= P).  Found with one tiny spark.range probe job — the probe
    evaluates the same Murmur3(seed 42) the shuffle's HashPartitioning
    uses, so the mapping is exact by construction and robust to hash
    version changes.  Cached per (application, P)."""
    P = int(spark.conf.get("spark.sql.shuffle.partitions"))
    ck = (spark.sparkContext.applicationId, P)
    keys = _BALANCED_KEY_CACHE.get(ck)
    if keys is None:
        span = max(4096, P * 16)
        rows = (
            spark.range(span)
            .select(
                F.col("id"),
                F.pmod(F.hash(F.col("id")), F.lit(P)).alias("p"),
            )
            .groupBy("p")
            .agg(F.min("id").alias("k"))
            .collect()
        )
        by_p = {int(r["p"]): int(r["k"]) for r in rows}
        # a partition missing from the sample (P(empty) ~ e^-16 at the
        # 16x oversample) just shrinks the usable group count
        keys = [by_p[i] for i in range(P) if i in by_p]
        _BALANCED_KEY_CACHE[ck] = keys
    return keys


def _n_segs_span(index, n_docs: int, seg_size: int) -> int:
    """Segment-id span [0, n_segs): derived from id_ranges' max id, NOT
    from the doc count — incremental adds align each batch to the next
    segment boundary, so doc-id gaps make max_id exceed n_docs."""
    ranges = getattr(index, "id_ranges", None) or [[0, n_docs]]
    max_id = max(hi for _, hi in ranges)
    return max(1, -(-max_id // seg_size))


def _phrase_group_search(
    index, rq, seg_rows, dfs, avgdl_map, seg_size, n_docs,
    local_k, k, offset, deleted_set,
):
    """Cross-segment phrase scoring: group key = seg_id // G, each group
    decodes its segments' posting rows per slot, CONCATENATES the flat
    streams (stored ids are global -> ascending across the group's
    segments), and runs candidate intersection + the batch kernels ONCE
    per group via _phrase_freqs_from_decs.  BM25 needs no per-segment
    state for phrases — global df arrives on the __df__ stub rows, dl
    rides the posting stream — so the per-segment fixed cost amortizes
    over G segments.  G targets ~2 groups per core so the group fan-out
    still saturates the cluster; index.phrase_group_segs overrides (tests
    force multi-segment groups)."""
    field = rq.field
    boost = rq.boost
    avgdl = avgdl_map.get(field, 1.0)
    positions = rq.positions
    n_segs = _n_segs_span(index, n_docs, seg_size)
    g = getattr(index, "phrase_group_segs", None)
    if g:
        # test override: exact seg_id // G group shapes
        grp_expr = F.floor(F.col("seg_id") / F.lit(int(g)))
    else:
        # contiguous seg ranges keyed by ENGINEERED group keys whose
        # shuffle hash lands one group per reduce partition: with ~P
        # hash-keyed groups in P partitions, balls-in-bins collisions put
        # 3-4 groups on one partition while others idle — the reduce
        # stage's critical path triples for nothing
        keys = _balanced_group_keys(index.spark)
        n_groups = max(1, min(n_segs, len(keys)))
        slot = F.floor(
            F.col("seg_id") * F.lit(int(n_groups)) / F.lit(int(n_segs))
        ).cast("int")
        # defensive clamp: an out-of-range element_at yields a NULL key
        # that would silently pool stray segments into one group
        slot = F.least(slot, F.lit(n_groups - 1))
        grp_expr = F.element_at(
            F.array(*[F.lit(int(kk)).cast("long") for kk in keys[:n_groups]]),
            slot + F.lit(1),
        )
    del_static = (
        np.fromiter(sorted(deleted_set), dtype=np.int64, count=len(deleted_set))
        if deleted_set
        else None
    )

    def score_group(key, pdf):  # no hints: pyspark warns on partial grouped-map hints
        empty = pd.DataFrame(
            {"doc_id": np.empty(0, dtype=np.int64), "score": np.empty(0)}
        )
        dfs_local = dict(dfs)
        rows_by_t: dict[str, list] = {}
        del_parts = [] if del_static is None else [del_static]
        for r in pdf.to_dict("records"):
            fld = r["field"]
            if fld.startswith("__df__:"):
                dfs_local[(fld[7:], r["term"])] = int(r["df"])
                continue
            if fld == "__del__":
                del_parts.append(
                    np.frombuffer(bytes(r["doc_bin"]), dtype=np.int64)
                )
                continue
            if fld != field:
                continue
            rows_by_t.setdefault(r["term"], []).append(
                (
                    int(r["seg_id"]),
                    {
                        "doc_bin": bytes(r["doc_bin"]),
                        "tf_bin": bytes(r["tf_bin"]),
                        "pos_bin": bytes(r["pos_bin"]),
                        "dl_bin": bytes(r["dl_bin"]),
                        "block_meta": [
                            bm if isinstance(bm, dict) else bm.asDict()
                            for bm in r["block_meta"]
                        ],
                        "df": int(r["df"]),
                    },
                )
            )
        # idf_sum over GLOBAL dfs in slot/alt order (same float64 add
        # sequence as the per-segment evaluator and the oracle)
        idf_sum = 0.0
        for _, alts in positions:
            for t in alts:
                df_ = dfs_local.get((field, t), 0)
                if df_ > 0:
                    idf_sum += bm25_idf(df_, n_docs)
        decs = []
        for _, alts in positions:
            parts = rows_by_t.get(alts[0])
            if not parts:
                return empty
            parts.sort(key=lambda p: p[0])
            decoded = [
                decode_posting_list(row, with_positions="flat")
                for _, row in parts
            ]
            if len(decoded) == 1:
                ids, tfs, (pflat, bounds), dls = decoded[0]
                decs.append((ids, tfs, (pflat, bounds[: len(tfs)]), dls))
                continue
            ids = np.concatenate([d[0] for d in decoded])
            tfs = np.concatenate([d[1] for d in decoded])
            pflat = np.concatenate([d[2][0] for d in decoded])
            offs = np.cumsum([0] + [len(d[2][0]) for d in decoded[:-1]])
            starts = np.concatenate(
                [d[2][1][: len(d[1])] + o for d, o in zip(decoded, offs)]
            )
            dls = np.concatenate([d[3] for d in decoded])
            decs.append((ids, tfs, (pflat, starts), dls))
        cand, freq, dl = _phrase_freqs_from_decs(rq, decs)
        if cand.size == 0:
            return empty
        if del_parts:
            dead = np.concatenate(del_parts)
            keep = ~np.isin(cand, dead)
            cand, freq, dl = cand[keep], freq[keep], dl[keep]
        nz = freq > 0.0
        f = freq[nz]
        dd = cand[nz]
        # same float64 grouping as _eval_phrase
        s = (
            boost
            * idf_sum
            * (f * (K1 + 1.0))
            / (f + K1 * (1.0 - B + B * dl[nz] / avgdl))
        )
        if local_k is not None and len(dd) > local_k:
            f32 = s.astype(np.float32)
            order = np.lexsort((dd, -f32))[:local_k]
            dd = dd[order]
            s = s[order]
        return pd.DataFrame({"doc_id": dd.astype(np.int64), "score": s})

    scored = seg_rows.groupBy(grp_expr.alias("_grp")).applyInPandas(
        score_group, "doc_id long, score double"
    )
    ranked = scored.select(
        "doc_id", F.col("score").cast("float").alias("score")
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
    if offset:
        ranked = ranked.offset(offset)
    if k is not None:
        ranked = ranked.limit(k)
    return ranked


def segment_search(
    index,
    q: Query,
    k: int | None = 10,
    offset: int = 0,
    prune: bool = True,
    deleted=None,
    similarity: str = "bm25",
    doc_boosts: dict[int, float] | None = None,
    post_filter=None,
    deleted_cache_key=None,
) -> DataFrame:
    """``deleted`` is a DataFrame with a doc_id column (distributed path —
    each segment task receives only ITS deletions as a packed binary row)
    or, legacy, a small driver-side set.

    ``post_filter`` is the reference's user extension hook
    (FrtPostFilter, c/include/search.h:763-769 applied in isea_search_w
    c/src/search.c:1078-1092): callable(doc_id, score) -> factor; falsy
    drops the hit, factor < 1.0 scales the score. It is pickled into the
    scoring closure and runs executor-side BEFORE per-segment top-k, so
    pruned results stay correct. Block-max pruning is disabled under a
    post_filter (the reference's scorer loop likewise visits every hit).
    """
    rq = wand_rewrite(index, q)
    rq, cached_filters = _attach_filter_cache(index, rq)
    pairs = sorted(set(_collect_terms(rq)))
    ranges = _collect_ranges(rq)
    # cache the segments schema on the index — .schema is a py4j
    # round-trip with JSON parsing (~20ms each), and plan construction
    # needs it up to 3x per search
    seg_schema = getattr(index, "_seg_schema_cache", None)
    if seg_schema is None:
        seg_schema = index.segments.schema
        index._seg_schema_cache = seg_schema
    bm_type = seg_schema["block_meta"].dataType
    n_docs = index.n_docs
    avgdl_map = dict(index.stats["avgdl"])
    seg_size = index.seg_size
    needs_all = _query_needs_all_docs(rq)

    if not pairs and not needs_all and not ranges and not cached_filters:
        return index.spark.createDataFrame([], "doc_id long, score float")

    # Global df resolution. BM25 fuses the lookup INTO the scoring job:
    # every matching segment gets one tiny __df__ stub row per query term
    # (global df from a broadcast term_stats scan), so a search is ONE
    # Spark job instead of doc_freqs-collect + scoring. TF-IDF still
    # resolves driver-side (qnorm needs the dfs before the job).
    fuse_dfs = similarity == "bm25" and bool(pairs)
    dfs = {} if fuse_dfs else index.doc_freqs(pairs)

    # scan predicate: exact (field, term) pushdown for the query's terms,
    # OR'd with any uncapped range bounds (predicate stays executor-side —
    # no driver term materialization)
    scan_cond = None
    if pairs:
        scan_cond = _exact_pair_cond(pairs)
    for r in ranges:
        rc = r.spark_cond()
        scan_cond = rc if scan_cond is None else (scan_cond | rc)

    if not needs_all and scan_cond is None:
        # filter-cache-only query: no posting rows needed at all — the
        # packed __filt__ rows below carry the whole answer
        seg_rows = index.segments.where(F.lit(False))
    elif (pairs or ranges) and not needs_all:
        seg_rows = index.segments.where(scan_cond)
    else:
        # MatchAll-bearing queries must visit every segment
        seg_rows = index.segments
        if scan_cond is not None:
            seg_rows = seg_rows.where(scan_cond)
        # union in one stub row per segment so empty segments still appear
        all_segs = index.segments.select("seg_id").distinct()
        stub = all_segs.select(
            "seg_id",
            F.lit("__stub__").alias("field"),
            F.lit("").alias("term"),
            F.lit(0).cast("long").alias("df"),
            F.lit(b"").alias("doc_bin"),
            F.lit(b"").alias("tf_bin"),
            F.lit(b"").alias("pos_bin"),
            F.lit(b"").alias("dl_bin"),
            F.lit(None)
            .cast(bm_type)
            .alias("block_meta"),
        )
        seg_rows = seg_rows.unionByName(stub)

    has_gdf = False
    if fuse_dfs:
        ts_small = index.term_stats.where(
            _exact_pair_cond(pairs)
        ).select("field", "term", "df")
        if _needs_absent_dfs(rq):
            # phrase/span idf sums include terms absent from a given
            # segment -> ship EVERY query term's global df to every
            # segment as __df__ stub rows.  Segment ids are doc_id //
            # seg_size, so the full id range is known DRIVER-SIDE — a
            # spark.range avoids re-scanning the postings parquet (a
            # .distinct() over seg_rows was a second full scan + shuffle
            # per query, ~0.5s at 500k docs).  Stubs landing on segments
            # with no posting rows form groups that return empty
            # immediately (a slot is missing), so over-shipping is
            # harmless.  The range MUST cover id_ranges' max, not
            # ceil(n_docs/seg_size): incremental adds align each batch to
            # the next segment boundary, so doc-id GAPS push the last
            # segments past the count-derived bound — a stub range keyed
            # on n_docs starves those segments of global dfs and their
            # phrase matches silently score idf_sum = 0.
            n_segs = _n_segs_span(index, n_docs, seg_size)
            seg_ids_src = index.spark.range(n_segs).select(
                F.col("id").cast("long").alias("seg_id")
            )
            df_stubs = seg_ids_src.crossJoin(F.broadcast(ts_small)).select(
                "seg_id",
                F.concat(F.lit("__df__:"), F.col("field")).alias("field"),
                "term",
                "df",
                F.lit(b"").alias("doc_bin"),
                F.lit(b"").alias("tf_bin"),
                F.lit(b"").alias("pos_bin"),
                F.lit(b"").alias("dl_bin"),
                F.lit(None)
                .cast(bm_type)
                .alias("block_meta"),
            )
            seg_rows = seg_rows.unionByName(df_stubs)
        else:
            # flat term queries only score terms that are locally present
            # -> a broadcast hash join attaches each row's global df
            # in-task (no extra shuffle, unlike a distinct+crossJoin)
            has_gdf = True
            seg_rows = seg_rows.join(
                F.broadcast(ts_small.withColumnRenamed("df", "gdf")),
                ["field", "term"],
                "left",
            )

    # cached filter doc-id sets ride the same seg_id shuffle as postings
    for tag, cdir in cached_filters.items():
        fdf = index.spark.read.parquet(cdir)
        frows = _pack_ids(fdf, seg_size, seg_schema, f"__filt__:{tag}")
        if has_gdf:
            frows = frows.withColumn("gdf", F.lit(None).cast("long"))
        seg_rows = seg_rows.unionByName(frows)

    if deleted is not None and isinstance(deleted, DataFrame):
        # the pack is a groupBy shuffle of the deletes parquet — cache it
        # per deletes-state so repeated searches on the same index
        # generation reuse the persisted partitions (the caller supplies
        # the state key; FerretIndex keys on the deletes dir listing)
        cached = getattr(index, "_packed_del_cache", None)
        if (
            deleted_cache_key is not None
            and cached is not None
            and cached[0] == deleted_cache_key
        ):
            del_rows = cached[1]
        else:
            del_rows = _pack_deleted(deleted, seg_size, seg_schema)
            if deleted_cache_key is not None:
                del_rows = del_rows.persist()
                if cached is not None:
                    cached[1].unpersist()
                index._packed_del_cache = (deleted_cache_key, del_rows)
        if has_gdf:
            del_rows = del_rows.withColumn("gdf", F.lit(None).cast("long"))
        seg_rows = seg_rows.unionByName(del_rows)
        deleted = None  # handled distributively

    local_k = None if k is None else offset + k
    # interval block-max WAND pays off for small disjunctions; past ~32
    # terms the vectorized dense-accumulator exact path is faster (one
    # np.add.at per term vs per-interval × per-term slicing)
    use_wand = (
        prune
        and similarity == "bm25"
        and post_filter is None
        and local_k is not None
        and isinstance(rq, MultiTermQuery)
        and len(rq.terms) <= 32
        and rq.boost > 0.0
        and all(tb > 0.0 for _, tb in rq.terms)
    )
    use_bool_wand = (
        prune
        and similarity == "bm25"
        and post_filter is None
        and local_k is not None
        and _bool_wandable(rq)
    )
    qnorm = 1.0
    if similarity == "tfidf":
        from ferret_spark import similarity as S

        qnorm = S.query_norm(S.sum_sq_weights(rq, dfs, n_docs, None))
    doc_boosts = doc_boosts or {}
    rq_for_exec = rq

    deleted = deleted or set()
    id_ranges = getattr(index, "id_ranges", None) or [[0, n_docs]]

    # plain phrases take the CROSS-SEGMENT batch path: several segments
    # share one applyInPandas group and their decoded posting streams
    # concatenate (stored doc ids are global, so per-slot streams stay
    # sorted), so the fixed per-segment eval cost — row parsing, decode
    # dispatch, candidate intersect, one kernel invocation — is paid once
    # per GROUP.  At 2M docs / 488 segments this is the difference
    # between 488 and ~70 kernel invocations for the same work.
    if (
        similarity == "bm25"
        and post_filter is None
        and not cached_filters
        and isinstance(rq, PhraseQuery)
        and rq.positions
        and all(len(alts) == 1 for _, alts in rq.positions)
    ):
        return _phrase_group_search(
            index, rq, seg_rows, dfs, avgdl_map, seg_size, n_docs,
            local_k, k, offset, deleted,
        )

    def score_segment(key, pdf):  # no hints: pyspark warns on partial grouped-map hints
        seg_id = int(key[0])
        base = seg_id * seg_size
        seg_n = seg_size
        del_local = (
            np.array(
                sorted(d - base for d in deleted if base <= d < base + seg_n),
                dtype=np.int64,
            )
            if deleted
            else None
        )
        dfs_local = dict(dfs)
        rows_by_ft = {}
        filt_local: dict[str, np.ndarray] = {}
        # records, not iterrows: no per-row Series construction (rows here
        # = query terms x segments, small but on every search's hot path)
        for r in pdf.to_dict("records"):
            fld = r["field"]
            if fld == "__stub__":
                continue
            if fld.startswith("__df__:"):
                dfs_local[(fld[7:], r["term"])] = int(r["df"])
                continue
            if fld.startswith("__filt__:"):
                ids = np.frombuffer(bytes(r["doc_bin"]), dtype=np.int64)
                filt_local[fld[9:]] = ids - base
                continue
            if has_gdf and not pd.isna(r["gdf"]):
                dfs_local[(fld, r["term"])] = int(r["gdf"])
            if fld == "__del__":
                ids = np.frombuffer(bytes(r["doc_bin"]), dtype=np.int64)
                dl2 = ids - base
                del_local = (
                    dl2
                    if del_local is None
                    else np.union1d(del_local, dl2)
                )
                continue
            rows_by_ft[(fld, r["term"])] = {
                "doc_bin": bytes(r["doc_bin"]),
                "tf_bin": bytes(r["tf_bin"]),
                "pos_bin": bytes(r["pos_bin"]),
                "dl_bin": bytes(r["dl_bin"]),
                "block_meta": [
                    bm if isinstance(bm, dict) else bm.asDict()
                    for bm in r["block_meta"]
                ],
                "df": int(r["df"]),
            }
        if similarity == "tfidf":
            ev = _SegEvalTFIDF(
                rows_by_ft,
                dfs_local,
                n_docs,
                avgdl_map,
                base,
                seg_n,
                id_ranges,
                qnorm=qnorm,
                doc_boosts=doc_boosts,
            )
        else:
            ev = _SegEval(
                rows_by_ft, dfs_local, n_docs, avgdl_map, base, seg_n, id_ranges
            )
        ev.cached_filters = filt_local
        if use_wand and isinstance(rq_for_exec, MultiTermQuery):
            docs, scores = _wand_multiterm_topk(
                ev, rq_for_exec, local_k, del_local
            )
            return pd.DataFrame(
                {"doc_id": [d + base for d in docs], "score": scores}
            )
        if use_bool_wand and isinstance(rq_for_exec, BooleanQuery):
            docs, scores, _skipped = _wand_bool_topk(
                ev, rq_for_exec, local_k, del_local
            )
            return pd.DataFrame(
                {"doc_id": [d + base for d in docs], "score": scores}
            )
        mask, score = ev.eval(rq_for_exec)
        if del_local is not None and len(del_local):
            mask[del_local] = False
        if post_filter is not None:
            for d in np.flatnonzero(mask):
                f = post_filter(int(d) + base, float(score[d]))
                if not f:
                    mask[d] = False
                elif f < 1.0:
                    score[d] = score[d] * f
        locs = np.flatnonzero(mask)
        if local_k is not None and len(locs) > local_k:
            s = score[locs]
            f32 = s.astype(np.float32)
            order = np.lexsort((locs, -f32))[:local_k]
            locs = locs[order]
        return pd.DataFrame(
            {
                "doc_id": (locs + base).astype(np.int64),
                "score": score[locs] if len(locs) else np.empty(0),
            }
        )

    scored = seg_rows.groupBy("seg_id").applyInPandas(
        score_segment, "doc_id long, score double"
    )
    ranked = scored.select(
        "doc_id", F.col("score").cast("float").alias("score")
    ).orderBy(F.col("score").desc(), F.col("doc_id").asc())
    if offset:
        ranked = ranked.offset(offset)
    if k is not None:
        ranked = ranked.limit(k)
    return ranked


def _batchable_seg_query(rq) -> bool:
    """Shapes segment_batch_search accepts: TermQuery, MultiTermQuery,
    and flat BooleanQuery whose scoring clauses are TermQuery or
    MatchAllQuery (MUST_NOT clauses TermQuery) — the same surface as
    batch.batch_search, so prefix/wildcard/fuzzy arrive via their capped
    rewrites and pure-NOT booleans via the injected MatchAll."""
    if isinstance(rq, (TermQuery, MultiTermQuery)):
        return True
    if isinstance(rq, BooleanQuery):
        for c in rq.clauses:
            if c.occur == MUST_NOT:
                if not isinstance(c.query, TermQuery):
                    return False
            elif not isinstance(c.query, (TermQuery, MatchAllQuery)):
                return False
        return True
    return False


# Union-term budget per segment_batch_search job: each applyInPandas
# group materializes ONE Arrow batch holding every matched term's posting
# binaries for that segment, so a batch of B hot-term queries puts
# O(union_terms x seg_bytes) in the JVM's direct-memory Arrow pool per
# concurrent task. Measured on this box: ~128 hot terms per job is
# comfortable, ~512 OOMs the default pool at 2M docs x 32 tasks.
# Batches whose term union exceeds the budget split into sub-jobs —
# still ~B/budget jobs instead of B.
SEG_BATCH_TERM_BUDGET = 192


def segment_batch_search(
    index,
    queries: list,
    k: int = 10,
    deleted=None,
    deleted_cache_key=None,
    term_budget: int | None = None,
) -> DataFrame:
    """Top-k for MANY queries over the segmented index in ONE Spark job
    — (query_id, rank, doc_id, score), query_id = position in
    ``queries``, scores float32-identical per query to segment_search.

    The reference answers a query log one searcher call at a time
    (frt_isea_search_w, c/src/search.c:1049-1127) because its per-call
    fixed cost is microseconds; on Spark each call pays job submission +
    a postings scan + a collect (~seconds at 2M docs), so a query log is
    batched instead — the segment-store analog of batch.batch_search:

    - ONE segments scan with the union (field, term) predicate pushed
      (plus one stub row per segment when any query carries a MatchAll);
    - global dfs fused in-task via one broadcast term_stats join;
    - per segment group, ONE _SegEval serves every query: posting rows
      parse once and each term DECODES ONCE into the evaluator's cache
      no matter how many queries reference it — the per-query
      incremental cost is just the numpy mask/score fold;
    - per-(segment, query) top-k cut inside the group, then one global
      per-query ranked window (float32 rank semantics, ties doc asc).

    Shapes: see _batchable_seg_query; anything else raises ValueError —
    route it through segment_search.  ``deleted`` is the packed-deletes
    DataFrame path of segment_search (same per-state cache key).
    """
    rqs = []
    for q in queries:
        rq = wand_rewrite(index, q)
        if not _batchable_seg_query(rq):
            raise ValueError(
                "segment_batch_search: unsupported query shape "
                f"{type(rq).__name__} — use segment_search for this query"
            )
        rqs.append(rq)

    budget = SEG_BATCH_TERM_BUDGET if term_budget is None else term_budget
    union_terms = {p for rq in rqs for p in _collect_terms(rq)}
    if budget and len(union_terms) > budget and len(rqs) > 1:
        # split into sub-jobs whose term unions fit the Arrow pool;
        # query_id stays the caller's position via an offset re-map
        out = None
        chunk, seen = [], set()
        start = 0
        for i, rq in enumerate(rqs):
            ts = set(_collect_terms(rq))
            if chunk and len(seen | ts) > budget:
                part = segment_batch_search(
                    index, queries[start:i], k=k, deleted=deleted,
                    deleted_cache_key=deleted_cache_key, term_budget=0,
                ).withColumn(
                    "query_id", F.col("query_id") + F.lit(start)
                )
                out = part if out is None else out.unionByName(part)
                chunk, seen, start = [], set(), i
            chunk.append(rq)
            seen |= ts
        part = segment_batch_search(
            index, queries[start:], k=k, deleted=deleted,
            deleted_cache_key=deleted_cache_key, term_budget=0,
        ).withColumn("query_id", F.col("query_id") + F.lit(start))
        return part if out is None else out.unionByName(part)

    pairs = sorted(union_terms)
    needs_all = any(_query_needs_all_docs(rq) for rq in rqs)
    seg_schema = getattr(index, "_seg_schema_cache", None)
    if seg_schema is None:
        seg_schema = index.segments.schema
        index._seg_schema_cache = seg_schema
    bm_type = seg_schema["block_meta"].dataType
    n_docs = index.n_docs
    avgdl_map = dict(index.stats["avgdl"])
    seg_size = index.seg_size
    spark = index.spark
    out_schema = "query_id int, rank long, doc_id long, score float"
    if not pairs and not needs_all:
        return spark.createDataFrame([], out_schema)

    scan_cond = None
    if pairs:
        scan_cond = _exact_pair_cond(pairs)
    if needs_all:
        seg_rows = index.segments
        if scan_cond is not None:
            seg_rows = seg_rows.where(scan_cond)
        n_segs = _n_segs_span(index, n_docs, seg_size)
        stub = spark.range(n_segs).select(
            F.col("id").cast("long").alias("seg_id"),
            F.lit("__stub__").alias("field"),
            F.lit("").alias("term"),
            F.lit(0).cast("long").alias("df"),
            F.lit(b"").alias("doc_bin"),
            F.lit(b"").alias("tf_bin"),
            F.lit(b"").alias("pos_bin"),
            F.lit(b"").alias("dl_bin"),
            F.lit(None).cast(bm_type).alias("block_meta"),
        )
        seg_rows = seg_rows.unionByName(stub)
    elif scan_cond is not None:
        seg_rows = index.segments.where(scan_cond)
    else:
        seg_rows = index.segments.where(F.lit(False))

    has_gdf = bool(pairs)
    if has_gdf:
        ts_small = index.term_stats.where(
            _exact_pair_cond(pairs)
        ).select("field", "term", F.col("df").alias("gdf"))
        seg_rows = seg_rows.join(F.broadcast(ts_small), ["field", "term"], "left")

    if deleted is not None and isinstance(deleted, DataFrame):
        cached = getattr(index, "_packed_del_cache", None)
        if (
            deleted_cache_key is not None
            and cached is not None
            and cached[0] == deleted_cache_key
        ):
            del_rows = cached[1]
        else:
            del_rows = _pack_deleted(deleted, seg_size, seg_schema)
            if deleted_cache_key is not None:
                del_rows = del_rows.persist()
                if cached is not None:
                    cached[1].unpersist()
                index._packed_del_cache = (deleted_cache_key, del_rows)
        if has_gdf:
            del_rows = del_rows.withColumn("gdf", F.lit(None).cast("long"))
        seg_rows = seg_rows.unionByName(del_rows)

    id_ranges = getattr(index, "id_ranges", None) or [[0, n_docs]]
    local_k = k

    def score_segment_batch(key, pdf):
        seg_id = int(key[0])
        base = seg_id * seg_size
        del_local = None
        rows_by_ft = {}
        dfs_local = {}
        for r in pdf.to_dict("records"):
            fld = r["field"]
            if fld == "__stub__":
                continue
            if fld == "__del__":
                ids = np.frombuffer(bytes(r["doc_bin"]), dtype=np.int64)
                dl2 = ids - base
                del_local = (
                    dl2 if del_local is None else np.union1d(del_local, dl2)
                )
                continue
            if has_gdf and not pd.isna(r["gdf"]):
                dfs_local[(fld, r["term"])] = int(r["gdf"])
            rows_by_ft[(fld, r["term"])] = {
                "doc_bin": bytes(r["doc_bin"]),
                "tf_bin": bytes(r["tf_bin"]),
                "pos_bin": bytes(r["pos_bin"]),
                "dl_bin": bytes(r["dl_bin"]),
                "block_meta": [
                    bm if isinstance(bm, dict) else bm.asDict()
                    for bm in r["block_meta"]
                ],
                "df": int(r["df"]),
            }
        ev = _SegEval(
            rows_by_ft, dfs_local, n_docs, avgdl_map, base, seg_size, id_ranges
        )
        out_q, out_d, out_s = [], [], []
        for qid, rq in enumerate(rqs):
            mask, score = ev.eval(rq)
            if del_local is not None and len(del_local):
                mask[del_local] = False
            locs = np.flatnonzero(mask)
            if local_k is not None and len(locs) > local_k:
                s32 = score[locs].astype(np.float32)
                order = np.lexsort((locs, -s32))[:local_k]
                locs = locs[order]
            out_q.append(np.full(len(locs), qid, dtype=np.int32))
            out_d.append((locs + base).astype(np.int64))
            out_s.append(score[locs])
        return pd.DataFrame(
            {
                "qid": np.concatenate(out_q) if out_q else [],
                "doc_id": np.concatenate(out_d) if out_d else [],
                "score": np.concatenate(out_s) if out_s else [],
            }
        )

    scored = seg_rows.groupBy("seg_id").applyInPandas(
        score_segment_batch, "qid int, doc_id long, score double"
    )
    rank_score = F.col("score").cast("float")
    w = Window.partitionBy("qid").orderBy(
        rank_score.desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            "rank",
            "doc_id",
            rank_score.alias("score"),
        )
    )
