"""Highlighting + Explain — post-top-k, driver-side (never perf-critical:
runs over <= k fetched documents).

Reference: searcher_highlight c/src/search.c:836-965 (match vectors per
query type :624-655, excerpt selection by sliding window, tag insertion),
Explain trees c/src/search.c:13-79 / tw_explain c/src/q_term.c:155-229.

Divergence note: excerpt boundary/ellipsis placement is simplified (window
chosen to maximize matched positions, trimmed to token boundaries); tag
semantics (every matched token wrapped) follow the reference.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dfield

from ferret_spark.analysis import get_analyzer
from ferret_spark.oracle import bm25_idf, bm25_tf
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


def match_positions(q: Query, tokens: list[tuple[str, int, int, int]]) -> set[int]:
    """Token-stream positions matched by the query (MatchVector analog)."""
    by_term: dict[str, list[int]] = {}
    pos_index: dict[int, int] = {}
    for i, (t, pos, _s, _e) in enumerate(tokens):
        by_term.setdefault(t, []).append(pos)
        pos_index[pos] = i
    out: set[int] = set()
    _collect_matches(q, by_term, out)
    return out


def _collect_matches(q: Query, by_term, out: set[int]):
    if isinstance(q, TermQuery):
        out.update(by_term.get(q.term, ()))
    elif isinstance(q, MultiTermQuery):
        for t, _b in q.terms:
            out.update(by_term.get(t, ()))
    elif isinstance(q, BooleanQuery):
        for c in q.clauses:
            if c.occur != MUST_NOT:
                _collect_matches(c.query, by_term, out)
    elif isinstance(q, PhraseQuery):
        # positions where the full (exact or sloppy window) phrase aligns
        slot_positions = []
        for off, alts in q.positions:
            ps: set[int] = set()
            for t in alts:
                ps.update(by_term.get(t, ()))
            slot_positions.append((off, ps))
        if not slot_positions:
            return
        first_off, first_ps = slot_positions[0]
        for p0 in first_ps:
            spans = [p0]
            ok = True
            for off, ps in slot_positions[1:]:
                target = p0 - first_off + off
                if q.slop == 0:
                    if target not in ps:
                        ok = False
                        break
                    spans.append(target)
                else:
                    cands = [p for p in ps if abs(p - target) <= q.slop]
                    if not cands:
                        ok = False
                        break
                    spans.append(min(cands, key=lambda p: abs(p - target)))
            if ok:
                out.update(spans)


def highlight(
    index_or_analyzer,
    q: Query,
    text: str,
    field: str = "content",
    excerpt_length: int = 40,
    num_excerpts: int = 1,
    pre_tag: str = "<b>",
    post_tag: str = "</b>",
    ellipsis: str = "...",
) -> list[str]:
    """Excerpts of ``text`` with query matches wrapped in tags."""
    if hasattr(index_or_analyzer, "analyze_offsets"):
        # already an Analyzer instance
        analyzer = index_or_analyzer
    elif hasattr(index_or_analyzer, "field_config"):
        aname = index_or_analyzer.field_config.get(field, "standard")
        if hasattr(aname, "analyze_offsets"):
            # field_config may hold runtime Analyzer instances (the pattern
            # the segment builder supports) — use the instance directly
            analyzer = aname
        else:
            analyzer = get_analyzer(aname if aname != "keyword" else "whitespace")
    else:
        analyzer = get_analyzer(index_or_analyzer)
    tokens = analyzer.analyze_offsets(text)
    if not tokens:
        return []
    matched = match_positions(q, tokens)
    # choose windows of tokens whose char span <= excerpt_length maximizing
    # matched count (sliding-window PQ analog)
    spans = []  # (n_matches, tok_start_idx, tok_end_idx)
    n = len(tokens)
    j = 0
    for i in range(n):
        j = max(j, i)
        while (
            j + 1 < n and tokens[j + 1][3] - tokens[i][2] <= excerpt_length
        ):
            j += 1
        n_match = sum(
            1 for k in range(i, j + 1) if tokens[k][1] in matched
        )
        spans.append((n_match, i, j))
    spans.sort(key=lambda t: (-t[0], t[1]))
    excerpts = []
    used: list[tuple[int, int]] = []
    for n_match, i, j in spans:
        if len(excerpts) >= num_excerpts:
            break
        if n_match == 0 and excerpts:
            break
        if any(not (j < a or i > b) for a, b in used):
            continue
        used.append((i, j))
        start_c, end_c = tokens[i][2], tokens[j][3]
        parts = []
        if start_c > 0:
            parts.append(ellipsis)
        cur = start_c
        for k in range(i, j + 1):
            t, pos, s, e = tokens[k]
            parts.append(text[cur:s])
            if pos in matched:
                parts.append(pre_tag + text[s:e] + post_tag)
            else:
                parts.append(text[s:e])
            cur = e
        if end_c < len(text):
            parts.append(ellipsis)
        excerpts.append("".join(parts))
    return excerpts


# ---------------------------------------------------------------------------
# Explain


@dataclass
class Explanation:
    value: float
    description: str
    details: list = dfield(default_factory=list)

    def to_dict(self) -> dict:
        return {
            "value": self.value,
            "description": self.description,
            "details": [d.to_dict() for d in self.details],
        }

    def to_s(self, depth: int = 0) -> str:
        out = "  " * depth + f"{self.value:.6g} = {self.description}\n"
        for d in self.details:
            out += d.to_s(depth + 1)
        return out


def explain(index, q: Query, doc_id: int) -> Explanation:
    """Score decomposition for one doc — recomputes from global stats +
    that doc's postings (searcher.explain analog). Works on SegmentIndex
    and SparkIndex."""
    from ferret_spark.query import query_terms
    from ferret_spark.search import spark_rewrite

    rq = spark_rewrite(index, q)
    pairs = sorted(set(query_terms(rq)))
    dfs = index.doc_freqs(pairs)
    n = index.n_docs
    # per-(field,term) tf/dl/positions for this doc
    doc_info = _doc_postings(index, pairs, doc_id)
    return _explain_node(rq, dfs, n, index, doc_info, doc_id)


def _doc_postings(index, pairs, doc_id):
    from pyspark.sql import functions as F

    info = {}
    if not pairs:
        return info
    fields = sorted({f for f, _ in pairs})
    terms = sorted({t for _, t in pairs})
    if hasattr(index, "segments"):
        from ferret_spark.codec import decode_posting_list

        seg = doc_id // index.seg_size
        rows = index.segments.where(
            (F.col("seg_id") == seg)
            & F.col("field").isin(fields)
            & F.col("term").isin(terms)
        ).collect()
        for r in rows:
            row = {
                "doc_bin": bytes(r["doc_bin"]),
                "tf_bin": bytes(r["tf_bin"]),
                "pos_bin": bytes(r["pos_bin"]),
                "dl_bin": bytes(r["dl_bin"]),
                "block_meta": [bm.asDict() for bm in r["block_meta"]],
                "df": r["df"],
            }
            ids, tfs, pos, dls = decode_posting_list(row)
            import numpy as np

            hit = np.flatnonzero(ids == doc_id)
            if len(hit):
                i = int(hit[0])
                bounds = np.concatenate(([0], np.cumsum(tfs)))
                info[(r["field"], r["term"])] = {
                    "tf": int(tfs[i]),
                    "dl": int(dls[i]) if dls is not None else 1,
                    "positions": list(map(int, pos[i])) if pos else [],
                }
    else:
        rows = (
            index.postings.where(
                F.col("field").isin(fields)
                & F.col("term").isin(terms)
                & (F.col("doc_id") == doc_id)
            )
        ).collect()
        for r in rows:
            info[(r["field"], r["term"])] = {
                "tf": r["tf"],
                "dl": r["doc_len"],
                "positions": list(r["positions"]),
            }
    return info


def _explain_node(q, dfs, n, index, doc_info, doc_id) -> Explanation:
    if isinstance(q, TermQuery):
        key = (q.field, q.term)
        df_ = dfs.get(key, 0)
        hit = doc_info.get(key)
        if df_ == 0 or hit is None:
            return Explanation(0.0, f"no match for {q.field}:{q.term}")
        idf = bm25_idf(df_, n)
        tfp = bm25_tf(hit["tf"], hit["dl"], index.avgdl(q.field))
        val = q.boost * idf * tfp
        return Explanation(
            val,
            f"weight({q.field}:{q.term} in {doc_id}) [BM25]",
            [
                Explanation(q.boost, "boost"),
                Explanation(idf, f"idf(df={df_}, n={n})"),
                Explanation(
                    tfp,
                    f"tfNorm(tf={hit['tf']}, dl={hit['dl']}, "
                    f"avgdl={index.avgdl(q.field):.4g})",
                ),
            ],
        )
    if isinstance(q, MatchAllQuery):
        return Explanation(q.boost, "MatchAllQuery")
    if isinstance(q, MultiTermQuery):
        details = [
            _explain_node(TermQuery(boost=b, field=q.field, term=t), dfs, n,
                          index, doc_info, doc_id)
            for t, b in q.terms
        ]
        details = [d for d in details if d.value > 0]
        val = q.boost * sum(sorted(d.value for d in details))
        return Explanation(val, "sum of matching terms", details)
    if isinstance(q, BooleanQuery):
        details = []
        total = 0.0
        for c in q.clauses:
            if c.occur == MUST_NOT:
                continue
            d = _explain_node(c.query, dfs, n, index, doc_info, doc_id)
            if c.occur == MUST and d.value == 0.0:
                return Explanation(0.0, "failure to match required clause")
            if d.value > 0:
                details.append(d)
                total += d.value
        return Explanation(q.boost * total, "sum of clauses", details)
    if isinstance(q, PhraseQuery):
        # recompute phrase freq from positions
        from ferret_spark.oracle import sloppy_phrase_freq

        idf_sum = 0.0
        adjusted = []
        offsets = []
        dl = None
        for off, alts in q.positions:
            ps = []
            for t in alts:
                df_ = dfs.get((q.field, t), 0)
                if df_:
                    idf_sum += bm25_idf(df_, n)
                hit = doc_info.get((q.field, t))
                if hit:
                    ps.extend(hit["positions"])
                    dl = hit["dl"]
            if not ps:
                return Explanation(0.0, "phrase slot unmatched")
            adjusted.append(sorted(p - off for p in ps))
            offsets.append(off)
        if q.slop == 0:
            freq = float(len(set(adjusted[0]).intersection(*adjusted[1:])))
        else:
            freq = sloppy_phrase_freq(adjusted, offsets, q.slop, False)
        if freq <= 0 or dl is None:
            return Explanation(0.0, "phrase not aligned")
        tfp = bm25_tf(freq, dl, index.avgdl(q.field))
        val = q.boost * idf_sum * tfp
        return Explanation(
            val,
            f"phraseFreq={freq:.4g}",
            [Explanation(idf_sum, "idf sum"), Explanation(tfp, "tfNorm")],
        )
    if isinstance(q, RangeQuery):
        return Explanation(q.boost, "constant score (range)")
    return Explanation(0.0, f"unexplained {type(q).__name__}")
