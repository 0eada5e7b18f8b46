"""Classic TF-IDF similarity — the reference's default scoring, for
reference-score parity (BM25 remains the engine default per north_rule).

Ported semantics (c/src/similarity.c:48-122):
  tf(freq)        = sqrt(freq)
  idf(df, N)      = log(N / (df + 1)) + 1
  coord(m, max)   = m / max
  query_norm(s)   = 1 / sqrt(s)
  length_norm     = 1 / sqrt(num_terms)
  sloppy_freq(d)  = 1 / (d + 1)

Norm byte codec (c/src/helper.c:28-70): norms are stored as ONE byte per
doc/field — 3-bit mantissa, 5-bit exponent, bias 48 — encoding
field_boost * doc_boost * length_norm; decoding goes through a 256-entry
table. The quantization is part of the scoring contract (two docs whose
norms quantize equally tie exactly), so we port it bit-exactly.

Score composition (w_normalize c/src/search.c:238-249, tsc_score
c/src/q_term.c:32-48, bsc_score coord c/src/q_boolean.c:998-1006):
  leaf weight      qweight = idf * boost_leaf * (prod of ancestor boosts)
  query_norm       qnorm   = 1 / sqrt(sum of qweight^2 over scoring leaves)
  term score(d)    = sqrt(tf) * idf^2 * boost_path * qnorm * norm(d)
  phrase           = sqrt(phrase_freq) * idf_sum^2 * boost_path * qnorm * norm(d)
  boolean          = coord(matching/total scoring clauses) * sum(children)
"""

from __future__ import annotations

import math
import struct

import numpy as np

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


def _float2int(f: float) -> int:
    return struct.unpack("<I", struct.pack("<f", np.float32(f)))[0]


def _int2float(i: int) -> float:
    return struct.unpack("<f", struct.pack("<I", i & 0xFFFFFFFF))[0]


def float2byte(f: float) -> int:
    """c/src/helper.c:42-70 (note the reference's 0xEf0000 mantissa mask —
    ported verbatim, quirk included)."""
    if f <= 0.0:
        return 0
    i = _float2int(f)
    mantissa = (i & 0xEF0000) >> 21
    exponent = (i >> 24) - 48
    if exponent > 0x1F:
        exponent = 0x1F
        mantissa = 0x07
    if exponent < 0:
        exponent = 0
        mantissa = 1
    return ((exponent << 3) | mantissa) & 0xFF


def byte2float(b: int) -> float:
    """c/src/helper.c:28-40."""
    if b == 0:
        return 0.0
    mantissa = b & 0x07
    exponent = (b >> 3) & 0x1F
    return _int2float((mantissa << 21) | ((exponent + 48) << 24))


NORM_TABLE = [byte2float(b) for b in range(256)]


def tf(freq: float) -> float:
    return math.sqrt(freq)


def idf(df: int, n_docs: int) -> float:
    return math.log(n_docs / (df + 1.0)) + 1.0


def length_norm(num_terms: int) -> float:
    return 1.0 / math.sqrt(num_terms) if num_terms > 0 else 0.0


def encode_norm(field_boost: float, doc_boost: float, num_terms: int) -> int:
    return float2byte(field_boost * doc_boost * length_norm(num_terms))


# ---------------------------------------------------------------------------
# weight tree: sum of squared leaf weights -> query_norm


def sum_sq_weights(q: Query, dfs, n_docs: int, field_of, anc_boost: float = 1.0) -> float:
    """Recursive sum of squared scoring-leaf qweights (ancestor boosts
    folded in, matching bw_sum_of_squared_weights * boost^2)."""
    b = anc_boost * q.boost
    if isinstance(q, TermQuery):
        w = idf(dfs.get((q.field, q.term), 0), n_docs) * b
        return w * w
    if isinstance(q, PhraseQuery):
        s = 0.0
        for _, alts in q.positions:
            for t in alts:
                s += idf(dfs.get((q.field, t), 0), n_docs)
        w = s * b
        return w * w
    if isinstance(q, MultiTermQuery):
        s = 0.0
        for t, tb in q.terms:
            w = idf(dfs.get((q.field, t), 0), n_docs) * tb * b
            s += w * w
        return s
    if isinstance(q, BooleanQuery):
        s = 0.0
        for c in q.clauses:
            if c.occur != MUST_NOT:
                s += sum_sq_weights(c.query, dfs, n_docs, field_of, b)
        return s
    if isinstance(q, (MatchAllQuery, RangeQuery)):
        w = 1.0 * b
        return w * w
    return 0.0


def query_norm(sum_sq: float) -> float:
    return 1.0 / math.sqrt(sum_sq) if sum_sq > 0 else 1.0


def norm_dl_ranges(max_dl: int = 1 << 20) -> list[tuple[int, int, float]]:
    """(dl_lo, dl_hi, decoded_norm) ranges for doc_len 1..max_dl at unit
    boosts — the norm-byte quantization expressed as a join table so a SQL
    oracle can reproduce TF-IDF scores exactly. float2byte(1/sqrt(dl)) is
    monotone non-increasing in dl, so each of the <=256 byte values owns a
    contiguous dl range (found by binary search, not enumeration)."""

    def b_of(dl: int) -> int:
        return encode_norm(1.0, 1.0, dl)

    out = []
    lo = 1
    while lo <= max_dl:
        blo = b_of(lo)
        # binary search the last dl with the same byte
        a, z = lo, max_dl
        while a < z:
            mid = (a + z + 1) // 2
            if b_of(mid) == blo:
                a = mid
            else:
                z = mid - 1
        out.append((lo, a, NORM_TABLE[blo]))
        lo = a + 1
    return out
