"""Posting-list compression: delta + variable-byte, numpy-vectorized.

Format semantics from the reference (WHAT):
- vbyte: LSB-first 7-bit groups, high bit = continuation
  (os_write_vint c/src/store.c:545-561, read c/src/store.c:348-360)
- doc ids delta-encoded; positions delta-encoded per doc
  (dw_flush c/src/index.c:5414-5447, .frq/.prx layout c/FileFormat.txt:68-110)
- skip structure replaced by block-max metadata: per BLOCK_SIZE docs store
  (first_doc, last_doc, max_tf, byte offsets) -> parquet-friendly and
  feeds block-max WAND pruning (skip lists c/src/index.c:2999-3065)

Layout per (term) row:
  doc_bin: per block, vbyte stream of [first_doc_delta0=first_doc-block_first
           (always 0 by construction, stored as first_doc absolute? no --
           deltas are relative to block_meta.first_doc, first entry delta 0]
  Actually: block deltas are [doc_i - doc_{i-1}] with doc_{-1} =
  block_meta.first_doc and the first stored doc IS first_doc, so the first
  delta is 0 — blocks are self-contained and concatenation across segments
  needs no re-encoding.
  tf_bin:  vbyte stream of tf per doc (block-aligned offsets)
  pos_bin: per doc, vbyte stream of position deltas (first absolute)
  block_meta: list of dicts/structs
    (first, last, count, max_tf, doc_off, tf_off, pos_off, pos_len)
"""

from __future__ import annotations

import numpy as np

BLOCK_SIZE = 128


# ---------------------------------------------------------------------------
# vectorized vbyte


def vbyte_encode(vals: np.ndarray) -> np.ndarray:
    """uint64 array -> uint8 vbyte stream (LSB-first, 0x80 = more)."""
    vals = np.ascontiguousarray(vals, dtype=np.uint64)
    n = len(vals)
    if n == 0:
        return np.empty(0, dtype=np.uint8)
    nbytes = np.ones(n, dtype=np.int64)
    v = vals >> np.uint64(7)
    while v.any():
        nbytes += (v > 0).astype(np.int64)
        v >>= np.uint64(7)
    ends = np.cumsum(nbytes)
    total = int(ends[-1])
    starts = ends - nbytes
    out = np.zeros(total, dtype=np.uint8)
    max_b = int(nbytes.max())
    for j in range(max_b):
        mask = nbytes > j
        idx = starts[mask] + j
        byte = (vals[mask] >> np.uint64(7 * j)) & np.uint64(0x7F)
        more = (nbytes[mask] - 1) > j
        out[idx] = byte.astype(np.uint8) | (more.astype(np.uint8) << 7)
    return out


def vbyte_decode(buf: np.ndarray) -> np.ndarray:
    """uint8 vbyte stream -> uint64 array."""
    arr = np.frombuffer(buf, dtype=np.uint8) if isinstance(buf, (bytes, bytearray)) else buf
    if len(arr) == 0:
        return np.empty(0, dtype=np.uint64)
    is_last = (arr & 0x80) == 0
    ends = np.flatnonzero(is_last)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    within = np.arange(len(arr), dtype=np.int64) - np.repeat(starts, lengths)
    contrib = (arr & np.uint8(0x7F)).astype(np.uint64) << (
        np.uint64(7) * within.astype(np.uint64)
    )
    return np.add.reduceat(contrib, starts)


# ---------------------------------------------------------------------------
# posting-list rows


def encode_posting_list(
    doc_ids: np.ndarray,
    tfs: np.ndarray,
    positions: list[np.ndarray] | None,
    doc_lens: np.ndarray | None = None,
) -> dict:
    """doc_ids sorted ascending; positions[i] = sorted int positions of doc i
    (or None for position-less fields); doc_lens = per-posting field length
    (inlined so scoring needs no join — the norms-next-to-postings layout)."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    if doc_lens is not None:
        doc_lens = np.asarray(doc_lens, dtype=np.int64)
    n = len(doc_ids)
    assert n > 0
    doc_chunks, tf_chunks, pos_chunks, dl_chunks = [], [], [], []
    block_meta = []
    doc_off = tf_off = pos_off = dl_off = 0
    for b0 in range(0, n, BLOCK_SIZE):
        b1 = min(b0 + BLOCK_SIZE, n)
        ids = doc_ids[b0:b1]
        deltas = np.empty(b1 - b0, dtype=np.uint64)
        deltas[0] = 0  # first doc == block_meta.first
        deltas[1:] = np.diff(ids).astype(np.uint64)
        dbin = vbyte_encode(deltas)
        tbin = vbyte_encode(tfs[b0:b1].astype(np.uint64))
        if positions is not None:
            pp = []
            for i in range(b0, b1):
                ps = np.asarray(positions[i], dtype=np.int64)
                pd = np.empty(len(ps), dtype=np.uint64)
                if len(ps):
                    pd[0] = ps[0]
                    pd[1:] = np.diff(ps).astype(np.uint64)
                pp.append(pd)
            pbin = vbyte_encode(np.concatenate(pp) if pp else np.empty(0, np.uint64))
        else:
            pbin = np.empty(0, dtype=np.uint8)
        if doc_lens is not None:
            lbin = vbyte_encode(doc_lens[b0:b1].astype(np.uint64))
            min_dl = int(doc_lens[b0:b1].min())
        else:
            lbin = np.empty(0, dtype=np.uint8)
            min_dl = 0
        block_meta.append(
            {
                "first": int(ids[0]),
                "last": int(ids[-1]),
                "count": int(b1 - b0),
                "max_tf": int(tfs[b0:b1].max()),
                "min_dl": min_dl,
                "doc_off": doc_off,
                "doc_len": len(dbin),
                "tf_off": tf_off,
                "tf_len": len(tbin),
                "pos_off": pos_off,
                "pos_len": len(pbin),
                "dl_off": dl_off,
                "dl_len": len(lbin),
            }
        )
        doc_chunks.append(dbin)
        tf_chunks.append(tbin)
        pos_chunks.append(pbin)
        dl_chunks.append(lbin)
        doc_off += len(dbin)
        tf_off += len(tbin)
        pos_off += len(pbin)
        dl_off += len(lbin)
    return {
        "doc_bin": np.concatenate(doc_chunks).tobytes(),
        "tf_bin": np.concatenate(tf_chunks).tobytes(),
        "pos_bin": np.concatenate(pos_chunks).tobytes(),
        "dl_bin": np.concatenate(dl_chunks).tobytes(),
        "block_meta": block_meta,
        "df": n,
    }


def decode_posting_list(row: dict, with_positions: bool = True):
    """-> (doc_ids int64, tfs int64, positions list[np.ndarray] | None,
    doc_lens int64 | None)."""
    doc_arr = np.frombuffer(row["doc_bin"], dtype=np.uint8)
    tf_arr = np.frombuffer(row["tf_bin"], dtype=np.uint8)
    pos_arr = np.frombuffer(row["pos_bin"], dtype=np.uint8)
    dl_arr = np.frombuffer(row.get("dl_bin", b""), dtype=np.uint8)
    ids_out, tfs_out, pos_out, dl_out = [], [], [], []
    has_dl = False
    for bm in row["block_meta"]:
        deltas = vbyte_decode(doc_arr[bm["doc_off"] : bm["doc_off"] + bm["doc_len"]])
        ids = np.cumsum(deltas.astype(np.int64)) + bm["first"]
        tfs = vbyte_decode(tf_arr[bm["tf_off"] : bm["tf_off"] + bm["tf_len"]]).astype(
            np.int64
        )
        ids_out.append(ids)
        tfs_out.append(tfs)
        if bm.get("dl_len"):
            has_dl = True
            dl_out.append(
                vbyte_decode(
                    dl_arr[bm["dl_off"] : bm["dl_off"] + bm["dl_len"]]
                ).astype(np.int64)
            )
        if with_positions and bm["pos_len"]:
            flat = vbyte_decode(
                pos_arr[bm["pos_off"] : bm["pos_off"] + bm["pos_len"]]
            ).astype(np.int64)
            bounds = np.concatenate(([0], np.cumsum(tfs)))
            for i in range(len(tfs)):
                seg = flat[bounds[i] : bounds[i + 1]]
                pos_out.append(np.cumsum(seg))
    doc_ids = np.concatenate(ids_out)
    tfs = np.concatenate(tfs_out)
    return (
        doc_ids,
        tfs,
        (pos_out if with_positions else None),
        (np.concatenate(dl_out) if has_dl else None),
    )


def concat_posting_rows(rows: list[dict]) -> dict:
    """Merge same-term rows from doc-range-disjoint segments: pure byte
    concatenation + offset-shifted block_meta (no re-encoding — the merge
    hot path is O(bytes memcpy), sm_append_postings analog
    c/src/index.c:5922-5974)."""
    rows = sorted(rows, key=lambda r: r["block_meta"][0]["first"])
    doc_parts, tf_parts, pos_parts, dl_parts, metas = [], [], [], [], []
    d_off = t_off = p_off = l_off = 0
    df = 0
    last = -1
    for r in rows:
        bm0 = r["block_meta"][0]
        assert bm0["first"] > last, "segments must be doc-range disjoint"
        last = r["block_meta"][-1]["last"]
        doc_parts.append(r["doc_bin"])
        tf_parts.append(r["tf_bin"])
        pos_parts.append(r["pos_bin"])
        dl_parts.append(r.get("dl_bin", b""))
        for bm in r["block_meta"]:
            metas.append(
                dict(
                    bm,
                    doc_off=bm["doc_off"] + d_off,
                    tf_off=bm["tf_off"] + t_off,
                    pos_off=bm["pos_off"] + p_off,
                    dl_off=bm.get("dl_off", 0) + l_off,
                )
            )
        d_off += len(r["doc_bin"])
        t_off += len(r["tf_bin"])
        p_off += len(r["pos_bin"])
        l_off += len(r.get("dl_bin", b""))
        df += r["df"]
    return {
        "doc_bin": b"".join(doc_parts),
        "tf_bin": b"".join(tf_parts),
        "pos_bin": b"".join(pos_parts),
        "dl_bin": b"".join(dl_parts),
        "block_meta": metas,
        "df": df,
    }
