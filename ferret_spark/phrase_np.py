"""Vectorized phrase-frequency kernels (numpy, whole-batch).

The reference's sloppy phrase scorer (sphsc_phrase_freq,
c/src/q_phrase.c:454-515) walks a min-heap of per-slot position iterators:
pop the slot with the smallest offset-adjusted position, advance it to its
last position <= the next heap minimum, and score one window per pop with
match_length = last_pos - start (windows with match_length <= slop add
1/(match_length + 1) to freq).

For the dominant TWO-SLOT case (a 2-term phrase, no repeated terms) the
walk reduces to an *alternating event chain* over the two offset-adjusted
sorted lists A and B:

  - event 1 is at value m1 = max(A[0], B[0]), belonging to the list with
    the larger first value (on a tie, the larger-offset slot — the
    smaller-offset iterator pops first under the heap key
    (position, offset) and is consumed through the tie);
  - after an event at value m in list Y, the next event is the first
    element of the OTHER list strictly greater than m (the popped
    iterator's new head); the chain dies when none exists;
  - the event at m contributes one window with
    match_length = max(m, 0) - pred_other(m), where pred_other is the
    largest element of the non-event list <= m (inclusive: the popped
    iterator advances through positions == next_pos).  The max(m, 0)
    mirrors the walk's ``last_pos = 0`` initialisation, reachable when
    leading skip-slots make every adjusted position negative.

Event values strictly increase and the event list strictly alternates, so
the whole batch advances in lock-step rounds: one round = one numpy
searchsorted over doc-biased flat arrays for every still-alive document.
No per-document Python loop; round count = the longest chain in the
batch.  Equivalence with the heap walk is property-tested exhaustively
against oracle.sloppy_phrase_freq (tests/test_phrase_np.py).

The exact (slop == 0) k-slot frequency is the size of the k-way
intersection of offset-adjusted position sets; since positions are
distinct within a slot, an adjusted value matched by all k slots forms a
merged-order group of exactly k equal elements — a flat vectorized count.

All kernels take *sequences of per-row position arrays* and return one
float64 freq per row, so one call scores an entire Arrow batch (the
declarative planner) or an entire segment's candidate set (the fused
evaluator).  Rows where either slot is empty score 0.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "sloppy_freq2_batch",
    "sloppy_freq2_flat",
    "exact_freqk_batch",
    "exact_freqk_flat",
]

_BIG = np.int64(1) << 33  # doc bias: positions are far below 2^33


def _flatten(arrs):
    """list-of-arrays -> (flat int64 values, per-row lengths)."""
    n = len(arrs)
    lens = np.fromiter((len(a) for a in arrs), dtype=np.int64, count=n)
    if n == 0 or int(lens.sum()) == 0:
        return np.empty(0, dtype=np.int64), lens
    flat = np.concatenate([np.asarray(a, dtype=np.int64) for a in arrs])
    return flat, lens


def sloppy_freq2_batch(arrs_a, arrs_b, off_a: int, off_b: int, slop: int):
    """Sloppy phrase freq for a batch of documents, 2 slots, no repeats.

    ``arrs_a[i]`` / ``arrs_b[i]`` are the sorted position arrays of the
    two phrase slots in document i (raw token positions; slot offsets are
    applied here).  Returns float64 per-document freqs, bit-identical to
    oracle.sloppy_phrase_freq run per document: one window contribution
    per chain event, accumulated in the same chronological order, same
    float64 arithmetic."""
    fa, la = _flatten(arrs_a)
    fb, lb = _flatten(arrs_b)
    return sloppy_freq2_flat(fa, la, fb, lb, off_a, off_b, slop)


def sloppy_freq2_flat(fa, la, fb, lb, off_a: int, off_b: int, slop: int):
    """Flat-input form of sloppy_freq2_batch: ``fa``/``fb`` are the two
    slots' position values concatenated across rows, ``la``/``lb`` the
    per-row lengths (same number of rows)."""
    n = len(la)
    out = np.zeros(n, dtype=np.float64)
    if n == 0:
        return out
    fa = np.asarray(fa, dtype=np.int64) - np.int64(off_a)
    fb = np.asarray(fb, dtype=np.int64) - np.int64(off_b)
    la = np.asarray(la, dtype=np.int64)
    lb = np.asarray(lb, dtype=np.int64)
    sa = np.concatenate(([0], np.cumsum(la)))
    sb = np.concatenate(([0], np.cumsum(lb)))
    docs = np.arange(n, dtype=np.int64)
    ka = fa + np.repeat(docs, la) * _BIG  # globally sorted doc-biased keys
    kb = fb + np.repeat(docs, lb) * _BIG

    valid = (la > 0) & (lb > 0)
    d = docs[valid]
    if d.size == 0:
        return out
    a0 = fa[sa[d]]
    b0 = fb[sb[d]]
    # event 1: max of first elements; tie -> larger-offset slot's list
    m = np.maximum(a0, b0)
    tie_list = np.int8(1 if off_b > off_a else 0)
    lst = np.where(a0 > b0, np.int8(0), np.where(b0 > a0, np.int8(1), tie_list))

    def _pred(flat, keys, which_docs, vals):
        """largest element <= vals (inclusive) within each doc's list."""
        i = np.searchsorted(keys, which_docs * _BIG + vals, side="right") - 1
        return flat[i]

    # event-1 window: last_pos = max(m, 0) (the walk's last_pos starts 0)
    pred1 = np.where(
        lst == 0, _pred(fb, kb, d, m), _pred(fa, ka, d, m)
    )
    w = np.maximum(m, 0) - pred1
    contrib = np.where(w <= slop, 1.0 / (w + 1.0), 0.0)
    out[d] += contrib

    while d.size:
        other = np.int8(1) - lst
        key = d * _BIG + m
        # successor (strictly greater) in the other list
        ia = np.searchsorted(ka, key, side="right")
        ib = np.searchsorted(kb, key, side="right")
        idx = np.where(other == 0, ia, ib)
        end = np.where(other == 0, sa[d + 1], sb[d + 1])
        alive = idx < end
        if not alive.any():
            break
        d = d[alive]
        idx = idx[alive]
        oth = other[alive]
        prev_lst = lst[alive]
        m = np.where(oth == 0, fa[np.minimum(idx, len(fa) - 1)],
                     fb[np.minimum(idx, len(fb) - 1)])
        # window: pred (inclusive) in the PREVIOUS event's list
        pred = np.where(
            prev_lst == 0, _pred(fa, ka, d, m), _pred(fb, kb, d, m)
        )
        w = np.maximum(m, 0) - pred
        contrib = np.where(w <= slop, 1.0 / (w + 1.0), 0.0)
        out[d] += contrib
        lst = oth

    return out


def exact_freqk_batch(slot_arrs, offsets):
    """Exact (slop=0) phrase freq for a batch: size of the k-way
    intersection of offset-adjusted position sets per document.

    ``slot_arrs[j][i]`` is slot j's position array for document i.
    Positions are distinct within a slot, so an adjusted value present in
    all k slots is a merged-order group of exactly k equal elements."""
    k = len(slot_arrs)
    n = len(slot_arrs[0]) if k else 0
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    pairs = [_flatten(slot_arrs[j]) for j in range(k)]
    return exact_freqk_flat(
        [p[0] for p in pairs], [p[1] for p in pairs], offsets
    )


def exact_freqk_flat(flats_in, lens_in, offsets):
    """Flat-input form of exact_freqk_batch: per slot j, ``flats_in[j]``
    holds the positions concatenated across rows and ``lens_in[j]`` the
    per-row lengths."""
    k = len(flats_in)
    n = len(lens_in[0]) if k else 0
    if n == 0:
        return np.zeros(0, dtype=np.float64)
    flats, row_parts = [], []
    for j in range(k):
        lens = np.asarray(lens_in[j], dtype=np.int64)
        flats.append(np.asarray(flats_in[j], dtype=np.int64) - np.int64(offsets[j]))
        row_parts.append(np.repeat(np.arange(n, dtype=np.int64), lens))
    vals = np.concatenate(flats)
    rows = np.concatenate(row_parts)
    order = np.lexsort((vals, rows))
    v = vals[order]
    r = rows[order]
    new_grp = np.ones(len(v), dtype=bool)
    if len(v) > 1:
        new_grp[1:] = (r[1:] != r[:-1]) | (v[1:] != v[:-1])
    starts = np.flatnonzero(new_grp)
    sizes = np.diff(np.append(starts, len(v)))
    full = sizes == k
    return np.bincount(r[starts[full]], minlength=n).astype(np.float64)
