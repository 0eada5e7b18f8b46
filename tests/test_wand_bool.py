"""Block-max WAND for boolean trees: rank/score parity with the dense
exact evaluator plus a pruning assertion (blocks actually skipped) on a
Zipf-shaped synthetic segment. Reference semantics: conjunction skip_to
(c/src/index.c:2999-3065), boolean scorer composition
(c/src/q_boolean.c:282-299)."""

import numpy as np
import pytest

from ferret_spark.codec import encode_posting_list
from ferret_spark.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    MultiTermQuery,
    TermQuery,
)
from ferret_spark.wand import (
    ConstantScoreTerms,
    _bool_wandable,
    _SegEval,
    _wand_bool_topk,
)

N_DOCS = 5000
AVGDL = 10.0
FIELD = "content"


def _posting(docs, tfs):
    docs = np.asarray(docs, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    dls = np.full(len(docs), int(AVGDL), dtype=np.int64)
    row = encode_posting_list(docs, tfs, None, dls)
    return row


@pytest.fixture(scope="module")
def seg():
    """Zipf-ish segment: 'hot' in every 2nd doc, 'mid' every 7th,
    'rare' every 97th; early docs carry large tfs so the block-max
    surface is spiky (pruning has something to skip)."""
    rows = {}
    dfs = {}
    for term, step in [("hot", 2), ("mid", 7), ("rare", 97)]:
        docs = np.arange(0, N_DOCS, step, dtype=np.int64)
        tfs = np.where(docs < 300, 10, 1).astype(np.int64)
        rows[(FIELD, term)] = _posting(docs, tfs)
        dfs[(FIELD, term)] = len(docs)
    return rows, dfs


def _fresh_ev(seg):
    rows, dfs = seg
    return _SegEval(rows, dfs, N_DOCS, {FIELD: AVGDL}, 0, N_DOCS)


def _dense_topk(ev, q, k):
    mask, score = ev.eval(q)
    locs = np.flatnonzero(mask)
    f32 = score[locs].astype(np.float32)
    order = np.lexsort((locs, -f32))[:k]
    locs = locs[order]
    return [int(d) for d in locs], [float(score[d]) for d in locs]


QUERIES = [
    BooleanQuery.of(
        (TermQuery(field=FIELD, term="mid"), MUST),
        (TermQuery(field=FIELD, term="hot"), MUST),
    ),
    BooleanQuery.of(
        (TermQuery(field=FIELD, term="hot"), SHOULD),
        (TermQuery(field=FIELD, term="mid"), SHOULD),
        (TermQuery(field=FIELD, term="rare"), SHOULD),
    ),
    BooleanQuery.of(
        (TermQuery(field=FIELD, term="mid"), MUST),
        (TermQuery(field=FIELD, term="rare"), SHOULD),
        (TermQuery(field=FIELD, term="hot"), MUST_NOT),
    ),
    BooleanQuery.of(
        (
            MultiTermQuery(
                field=FIELD, terms=(("mid", 1.0), ("rare", 2.0)), boost=1.5
            ),
            SHOULD,
        ),
        (TermQuery(field=FIELD, term="hot", boost=0.5), SHOULD),
    ),
    BooleanQuery.of(
        (ConstantScoreTerms(field=FIELD, terms=("rare",)), MUST),
        (TermQuery(field=FIELD, term="hot"), SHOULD),
    ),
]


@pytest.mark.parametrize("qi", range(len(QUERIES)))
def test_bool_wand_rank_and_score_parity(seg, qi):
    q = QUERIES[qi]
    assert _bool_wandable(q)
    dense_docs, dense_scores = _dense_topk(_fresh_ev(seg), q, 10)
    w_docs, w_scores, _sk = _wand_bool_topk(_fresh_ev(seg), q, 10)
    assert w_docs == dense_docs
    for a, b in zip(w_scores, dense_scores):
        assert a == b  # bit-exact float64 (same op order)


def test_bool_wand_skips_blocks(seg):
    q = QUERIES[0]  # hot AND mid, spiky tf head
    _docs, _scores, skipped = _wand_bool_topk(_fresh_ev(seg), q, 10)
    assert skipped > 0


def test_bool_wand_respects_deletes(seg):
    q = QUERIES[1]
    ev = _fresh_ev(seg)
    full_docs, _, _ = _wand_bool_topk(_fresh_ev(seg), q, 10)
    dele = np.array(sorted(full_docs[:3]), dtype=np.int64)
    del_docs, _, _ = _wand_bool_topk(ev, q, 10, del_local=dele)
    assert not (set(del_docs) & set(dele.tolist()))
    assert len(del_docs) == 10
