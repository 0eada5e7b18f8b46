"""Segmented compressed index: build + hierarchical merge + resume.

The scale architecture (SURVEY §7):

  corpus --assign doc_id--> docs --seg_id = doc_id // seg_size-->
  B3  groupBy(seg).applyInPandas(invert+encode)  -> segments table
      (seg_id, field, term, df, doc_bin, tf_bin, pos_bin, dl_bin, block_meta)
  B4  two-stage salted merge:
        stage 1: groupBy(field, term, salt)  salt = contiguous seg bucket
                 -> partial concat rows (spreads a hot term's n_segments
                    rows over `salt_buckets` reducers)
        stage 2: groupBy(field, term) -> final rows (global index)
      Both stages are pure byte concatenation (codec blocks are
      self-contained) — reference sm_append_postings analog without
      re-encoding (c/src/index.c:5922-5974).
  B5  term_stats from segment rows; manifest rows per stage/partition.

Layout on disk (<path>/):
  docs/        parquet (doc_id, original cols, doc_len_*, sha256_*)
  segments/    parquet partitioned by seg_id bucket — the SCORING layout:
               a query ships its terms to every segment (doc-range shard),
               scores locally with block-max pruning, then global top-k —
               the MultiSearcher shape (c/src/search.c:1443-1840)
  merged/      parquet hash-partitioned by (field, term), sorted within
               partitions — the global index / term dictionary (term-dict
               ops, merge proof); under FerretIndex incremental adds this
               is generation 0 of the tiered-merge LSM (generations/g*)
  term_stats/  parquet (field, term, df, term_num)
  manifest/    parquet: (stage, part, rows, bytes, status, ts) — lineage +
               metrics; resume skips stages whose manifest says 'done'
  meta.json    stats + field_config + build params

Segments are doc-range partitions, so merge = concat and doc ids never
remap (the reference remaps via doc_map + base, c/src/index.c:6008-6065;
our global doc_id makes that unnecessary).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferret_spark import build as B
from ferret_spark.analysis import get_analyzer
from ferret_spark.codec import (
    concat_posting_rows,
    encode_posting_list_flat,
    encode_segment_terms,
)

BLOCK_META_TYPE = (
    "array<struct<first:long,last:long,count:int,max_tf:int,"
    "min_dl:int,doc_off:long,doc_len:long,tf_off:long,tf_len:long,"
    "pos_off:long,pos_len:long,dl_off:long,dl_len:long>>"
)
SEGMENT_SCHEMA = (
    "seg_id int, field string, term string, df long, "
    "doc_bin binary, tf_bin binary, pos_bin binary, dl_bin binary, "
    f"block_meta {BLOCK_META_TYPE}"
)
MERGED_SCHEMA = SEGMENT_SCHEMA.replace("seg_id int, ", "")

_BM_KEYS = [
    "first", "last", "count", "max_tf", "min_dl",
    "doc_off", "doc_len", "tf_off", "tf_len",
    "pos_off", "pos_len", "dl_off", "dl_len",
]


def _bm_tuples(block_meta: list[dict]) -> list[tuple]:
    return [tuple(int(bm.get(k, 0)) for k in _BM_KEYS) for bm in block_meta]


def _bm_dicts(block_meta) -> list[dict]:
    out = []
    for bm in block_meta:
        if isinstance(bm, dict):
            out.append(bm)
        elif hasattr(bm, "asDict"):
            out.append(bm.asDict())
        else:  # tuple/list in _BM_KEYS order
            out.append(dict(zip(_BM_KEYS, bm)))
    return out


def invert_partition(
    pdf: pd.DataFrame, field_config: dict, seg_id: int
) -> pd.DataFrame:
    """One segment's docs -> encoded posting rows (dw_invert_field analog,
    c/src/index.c:5565-5640). Fully vectorized: tokenize via the pandas
    analyzer surface, flatten to (term_code, doc, pos) numpy arrays, one
    lexsort, run-length boundaries, flat codec encode — no per-token
    Python.

    For every tokenized field one extra MARKER row (term = NULL) carries
    the segment's per-doc BM25 lengths, encoded with the same posting
    codec (ids = sorted doc ids, dls = token counts incl. zeros). The one
    tokenize pass thus serves postings AND corpus stats — no separate
    doc_len job — and optimize()'s delete-expunge rewrite handles markers
    exactly like postings."""
    from ferret_spark.codec import encode_posting_list

    out_rows = []

    def _dl_marker(field: str, doc_ids: np.ndarray, dls_all: np.ndarray):
        if len(doc_ids) == 0:
            return
        o = np.argsort(doc_ids, kind="stable")
        enc = encode_posting_list(
            doc_ids[o].astype(np.int64),
            np.ones(len(doc_ids), dtype=np.int64),
            None,
            dls_all[o].astype(np.int64),
        )
        out_rows.append(
            (
                seg_id,
                field,
                None,
                int(len(doc_ids)),
                enc["doc_bin"],
                enc["tf_bin"],
                enc["pos_bin"],
                enc["dl_bin"],
                _bm_tuples(enc["block_meta"]),
            )
        )

    for field, aname in field_config.items():
        doc_ids = pdf["doc_id"].to_numpy()
        n_rows = len(doc_ids)
        if aname == "keyword":
            terms_flat = pd.Series(pdf[field].astype(str).to_numpy(), dtype=object)
            docs_flat = doc_ids.astype(np.int64)
            pos_flat = np.zeros(n_rows, dtype=np.int64)
            dls_per_doc = np.ones(n_rows, dtype=np.int64)
            valid = terms_flat.notna().to_numpy() & (terms_flat != "").to_numpy()
            terms_v = terms_flat.to_numpy()[valid]
            docs_v = docs_flat[valid]
            pos_v = pos_flat[valid]
            dl_flat_v = dls_per_doc[valid]
        else:
            # aname may be a pre-resolved Analyzer instance (shipped in the
            # closure so runtime-registered analyzers reach executors) or a
            # registry name
            analyzer = aname if hasattr(aname, "tokens_pandas") else get_analyzer(aname)
            tok_lists = analyzer.tokens_pandas(pdf[field].astype(str))
            lens = np.fromiter(
                (len(t) for t in tok_lists), dtype=np.int64, count=n_rows
            )
            total = int(lens.sum())
            if total == 0:
                _dl_marker(field, doc_ids, np.zeros(n_rows, dtype=np.int64))
                continue
            row_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
            pos_flat = np.arange(total, dtype=np.int64) - np.repeat(
                row_starts, lens
            )
            row_idx = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
            docs_flat = doc_ids[row_idx].astype(np.int64)
            # one C-level chain instead of a per-doc object-array
            # concatenate (the per-doc np.asarray calls dominated the
            # flatten cost in profile)
            from itertools import chain

            flat = np.empty(total, dtype=object)
            flat[:] = list(chain.from_iterable(tok_lists))
            terms_flat = pd.Series(flat, dtype=object)
            valid = terms_flat.notna().to_numpy() & (terms_flat != "").to_numpy()
            # per-doc token count after stop-removal = BM25 doc_len
            dls_per_doc = np.bincount(
                row_idx[valid], minlength=n_rows
            ).astype(np.int64)
            _dl_marker(field, doc_ids, dls_per_doc)
            terms_v = terms_flat.to_numpy()[valid]
            docs_v = docs_flat[valid]
            pos_v = pos_flat[valid]
            dl_flat_v = dls_per_doc[row_idx[valid]]
        if len(terms_v) == 0:
            continue
        codes, uniques = pd.factorize(pd.Series(terms_v, dtype=object), sort=True)
        # single stable argsort on a packed (code, local_doc) key; token
        # order within a doc is already position order, so stability gives
        # the (term, doc, pos) order one lexsort would — at ~half the
        # memory traffic
        doc_min = docs_v.min() if len(docs_v) else 0
        packed = (codes.astype(np.int64) << np.int64(32)) | (
            docs_v - doc_min
        )
        order = np.argsort(packed, kind="stable")
        codes_s = codes[order]
        docs_s = docs_v[order]
        pos_s = pos_v[order]
        dls_s = dl_flat_v[order]
        # posting boundaries (term-major token stream -> (term, doc) runs)
        t_change = np.flatnonzero(np.diff(codes_s)) + 1
        t_starts_tok = np.concatenate(([0], t_change))
        d_change = np.flatnonzero(np.diff(docs_s)) + 1
        doc_start_mask = np.zeros(len(docs_s), dtype=bool)
        doc_start_mask[0] = True
        doc_start_mask[d_change] = True
        doc_start_mask[t_starts_tok] = True
        doc_start_idx = np.flatnonzero(doc_start_mask)
        posting_ends = np.concatenate((doc_start_idx[1:], [len(docs_s)]))
        udocs = docs_s[doc_start_idx]
        tfs = (posting_ends - doc_start_idx).astype(np.int64)
        u_dls = dls_s[doc_start_idx]
        term_of_posting = codes_s[doc_start_idx]
        tp_change = np.flatnonzero(np.diff(term_of_posting)) + 1
        term_starts_p = np.concatenate(([0], tp_change))
        with_positions = aname != "keyword"
        encoded = encode_segment_terms(
            udocs,
            tfs,
            u_dls,
            term_starts_p,
            pos_s if with_positions else None,
        )
        term_ids = term_of_posting[term_starts_p]
        for ti, (dbin, tbin, pbin, lbin, metas, df) in enumerate(encoded):
            out_rows.append(
                (
                    seg_id,
                    field,
                    str(uniques[term_ids[ti]]),
                    int(df),
                    dbin,
                    tbin,
                    pbin,
                    lbin,
                    metas,
                )
            )
    return pd.DataFrame(
        out_rows,
        columns=[
            "seg_id", "field", "term", "df",
            "doc_bin", "tf_bin", "pos_bin", "dl_bin", "block_meta",
        ],
    )


def build_segments(
    docs: DataFrame,
    field_config: dict[str, str],
    seg_size: int,
    n_segments: int | None = None,
) -> DataFrame:
    """docs (with doc_id) -> segment posting rows. seg_id = doc_id//seg_size
    (doc-range segments -> merge is pure concat).

    When ``n_segments`` is known, docs are range-partitioned one segment
    per partition first: plain groupBy hash-partitions G segments into P
    shuffle partitions, and for G within ~2x of P the binomial collisions
    leave some tasks with 3-4 segments while others idle — a straggler tax
    that shows up directly as lost scaling efficiency at higher
    parallelism. RangePartitioning satisfies the groupBy's clustered
    distribution, so no second shuffle is added."""
    cols = ["doc_id"] + [f for f in field_config]
    src = docs.select(*cols).withColumn(
        "seg_id", (F.col("doc_id") / F.lit(seg_size)).cast("int")
    )
    if n_segments and n_segments > 1:
        # cap shuffle partitions: one-partition-per-segment is ideal while
        # segments ≈ cores, but at corpus scale (doc_count/seg_size can be
        # millions) it would explode scheduler + shuffle metadata. Past the
        # cap, range partitioning on seg_id still clusters several WHOLE
        # segments per partition (satisfies the groupBy distribution; the
        # sampling job's cost is bounded by the partition count too).
        try:
            par = docs.sparkSession.sparkContext.defaultParallelism
        except Exception:  # pragma: no cover
            par = 32
        n_part = min(n_segments, max(4 * par, 64))
        src = src.repartitionByRange(n_part, "seg_id")

    # resolve analyzer instances DRIVER-side so runtime-registered custom
    # analyzers are pickled into the task closure (executor workers only
    # know the stock registry)
    fc = {
        f: (a if a == "keyword" else get_analyzer(a) if isinstance(a, str) else a)
        for f, a in field_config.items()
    }

    def fn(key, pdf):  # no hints: pyspark warns on partial grouped-map hints
        return invert_partition(pdf, fc, int(key[0]))

    return src.groupBy("seg_id").applyInPandas(fn, SEGMENT_SCHEMA)


def _row_to_codec(r) -> dict:
    return {
        "doc_bin": bytes(r["doc_bin"]),
        "tf_bin": bytes(r["tf_bin"]),
        "pos_bin": bytes(r["pos_bin"]),
        "dl_bin": bytes(r["dl_bin"]),
        "block_meta": _bm_dicts(r["block_meta"]),
        "df": int(r["df"]),
    }


_PARTS_FIELDS = ["df", "doc_bin", "tf_bin", "pos_bin", "dl_bin", "block_meta"]


def _parts_struct():
    # 'first' leads the struct so sort_array orders parts by doc range
    return F.struct(
        F.expr("block_meta[0].first").alias("first"),
        *[F.col(c) for c in _PARTS_FIELDS],
    )


def _concat_stage(df: DataFrame, keys: list[str]) -> DataFrame:
    """groupBy(keys) -> one merged posting row per group. The group's rows
    are gathered with collect_list (map-side combinable, one shuffle of
    compressed bytes) and concatenated in a BATCHED mapInPandas — one
    Python invocation per Arrow batch of terms, not per term."""
    grouped = df.groupBy(*keys).agg(
        F.sort_array(F.collect_list(_parts_struct())).alias("parts")
    )
    out_schema = ", ".join(
        ["field string", "term string"]
        + (["salt int"] if "salt" in keys else [])
        + [
            "df long",
            "doc_bin binary",
            "tf_bin binary",
            "pos_bin binary",
            "dl_bin binary",
            f"block_meta {BLOCK_META_TYPE}",
        ]
    )

    key_cols = list(keys)

    def concat_batches(batches):
        for pdf in batches:
            rows_out = []
            for i in range(len(pdf)):
                parts = pdf["parts"].iloc[i]
                rows = [
                    {
                        "doc_bin": bytes(p["doc_bin"]),
                        "tf_bin": bytes(p["tf_bin"]),
                        "pos_bin": bytes(p["pos_bin"]),
                        "dl_bin": bytes(p["dl_bin"]),
                        "block_meta": _bm_dicts(p["block_meta"]),
                        "df": int(p["df"]),
                    }
                    for p in parts
                ]
                m = concat_posting_rows(rows)
                rows_out.append(
                    tuple(pdf[k].iloc[i] for k in key_cols)
                    + (
                        int(m["df"]),
                        m["doc_bin"],
                        m["tf_bin"],
                        m["pos_bin"],
                        m["dl_bin"],
                        _bm_tuples(m["block_meta"]),
                    )
                )
            yield pd.DataFrame(
                rows_out,
                columns=key_cols
                + ["df", "doc_bin", "tf_bin", "pos_bin", "dl_bin", "block_meta"],
            )

    return grouped.mapInPandas(concat_batches, out_schema)


def merge_segments(
    segments: DataFrame,
    salt_buckets: int = 8,
    seg_per_bucket: int | None = None,
    n_segments: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Hierarchical salted merge -> global (field, term) rows.

    When the segment count is small a single concat stage suffices; past
    ~8x salt_buckets segments, a salted first stage (salt = contiguous
    seg_id bucket, so stage-2 concat stays doc-range monotonic) spreads a
    hot term's rows over salt_buckets reducers first — the Zipf head
    appears in EVERY segment, and without salting its entire posting list
    would funnel through one task (skew handling required by north_rule).
    """
    # doc-length marker rows (term NULL) are per-segment metadata — they
    # never merge into the global (field, term) index
    segments = segments.where(F.col("term").isNotNull())
    if n_segments is None:
        max_seg = segments.agg(F.max("seg_id")).collect()[0][0] or 0
        n_segments = max_seg + 1
    if seg_per_bucket is None:
        seg_per_bucket = max(1, (n_segments + salt_buckets - 1) // salt_buckets)

    if n_segments <= salt_buckets * 8:
        # hash-partition the INPUT by (field, term): the groupBy reuses the
        # partitioning (one shuffle total) and the writer needs no output
        # repartition. NOT repartitionByRange — the RangePartitioner's
        # sampling job reads the entire child (posting binaries included)
        # a second time; and not on the OUTPUT either, which would execute
        # the whole merge twice. Files stay sorted within partitions, so
        # parquet rowgroup min/max stats still prune term lookups.
        spark = segments.sparkSession
        # 4x cores: the Zipf head makes (field, term) buckets skewed, and
        # at 1 task/core the stage wall is the slowest straggler — smaller
        # quanta smooth it (measured at 8 cores: 6.65s @1x -> 4.56s @4x;
        # 8x reverses the gain via per-file commit overhead). When the
        # caller knows the input row count (manifest), cap the fan-out so
        # tiny merges (small corpora / few segments) don't pay 4x-cores
        # tasks for a few thousand rows — ~2k rows per task floor.
        n_part = max(4, 4 * spark.sparkContext.defaultParallelism)
        if n_rows is not None and n_rows > 0:
            n_part = max(4, min(n_part, n_rows // 2000 + 1))
        src = segments.repartition(n_part, "field", "term")
        return _concat_stage(src, ["field", "term"]).select(
            "field", "term", "df",
            "doc_bin", "tf_bin", "pos_bin", "dl_bin", "block_meta",
        )

    salted = segments.withColumn(
        "salt", (F.col("seg_id") / F.lit(seg_per_bucket)).cast("int")
    )
    partial = _concat_stage(salted, ["field", "term", "salt"])
    return _concat_stage(partial.drop("salt"), ["field", "term"]).select(
        "field", "term", "df",
        "doc_bin", "tf_bin", "pos_bin", "dl_bin", "block_meta",
    )


# ---------------------------------------------------------------------------
# manifest / staged build with resume


def shift_posting_rows(
    df: DataFrame, id_shift: int, seg_shift: int | None = None
) -> DataFrame:
    """Shift every absolute doc id in posting rows by ``id_shift`` WITHOUT
    re-encoding: the codec's delta streams are block-relative (each
    block's ids decode as cumsum(deltas) + block_meta.first), so only
    block_meta.first/last move — the compressed doc/tf/pos/dl bytes are
    copied verbatim. This is what makes reader-to-reader index appends
    (iw_add_readers analog, c/src/index.c:6530-6750) O(metadata), not
    O(re-tokenize). Doc-length marker rows shift identically."""
    has_seg = seg_shift is not None
    schema = df.schema

    def fix(batches):
        for pdf in batches:
            if has_seg and len(pdf):
                pdf["seg_id"] = pdf["seg_id"] + seg_shift

            def shift_bms(bms):
                out = []
                for bm in _bm_dicts(bms):
                    bm = dict(bm)
                    bm["first"] = int(bm["first"]) + id_shift
                    bm["last"] = int(bm["last"]) + id_shift
                    out.append(tuple(bm[k] for k in _BM_KEYS))
                return out

            if len(pdf):
                pdf["block_meta"] = pdf["block_meta"].map(shift_bms)
            yield pdf

    return df.mapInPandas(fix, schema)


def _manifest_path(path: str) -> str:
    return os.path.join(path, "manifest")


def read_manifest(spark: SparkSession, path: str) -> dict[str, dict]:
    """Manifest rows (stage -> metrics). Driver-side pyarrow read — the
    manifest is tiny lineage metadata and must not cost Spark jobs (the
    builder consults it between every stage; job-launch latency there is
    pure serial fraction against the scaling gate)."""
    import pyarrow.parquet as pq

    mp = _manifest_path(path)
    if not os.path.exists(mp):
        return {}
    out = {}
    for fn in sorted(os.listdir(mp)):
        if not fn.endswith(".parquet"):
            continue
        for r in pq.read_table(os.path.join(mp, fn)).to_pylist():
            out[r["stage"]] = r
    return out


def append_manifest(spark: SparkSession, path: str, stage: str, metrics: dict):
    import pyarrow as pa
    import pyarrow.parquet as pq

    row = {
        "stage": stage,
        "rows": int(metrics.get("rows", -1)),
        "bytes": int(metrics.get("bytes", -1)),
        "partitions": int(metrics.get("partitions", -1)),
        "status": "done",
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
        "elapsed_sec": float(metrics.get("elapsed_sec", -1.0)),
    }
    mp = _manifest_path(path)
    os.makedirs(mp, exist_ok=True)
    schema = pa.schema(
        [
            ("stage", pa.string()),
            ("rows", pa.int64()),
            ("bytes", pa.int64()),
            ("partitions", pa.int64()),
            ("status", pa.string()),
            ("ts", pa.string()),
            ("elapsed_sec", pa.float64()),
        ]
    )
    table = pa.Table.from_pylist([row], schema=schema)
    fn = f"stage-{stage}-{time.time_ns()}.parquet"
    pq.write_table(table, os.path.join(mp, fn))


def parquet_rows(path: str) -> int:
    """Row count from parquet footers (driver-side, no Spark job)."""
    import pyarrow.parquet as pq

    total = 0
    for root, _d, files in os.walk(path):
        for fn in files:
            if fn.endswith(".parquet"):
                total += pq.ParquetFile(os.path.join(root, fn)).metadata.num_rows
    return total


def corpus_stats_from_marker_files(
    seg_dir: str, field_config: dict, n_docs_fallback: int = 0
) -> dict | None:
    """Driver-side fast path for small indexes: decode the doc-length
    marker rows straight from the parquet foot-filtered files (no Spark
    job — job-launch latency is serial fraction against the scaling
    gate). Returns None if the marker count is too big for the driver
    (the Spark path handles those)."""
    import pyarrow.dataset as ds

    from ferret_spark.codec import decode_posting_list

    dataset = ds.dataset(seg_dir, format="parquet")
    tbl = dataset.to_table(
        columns=["field", "df", "doc_bin", "tf_bin", "pos_bin", "dl_bin",
                 "block_meta"],
        filter=ds.field("term").is_null(),
    )
    if tbl.num_rows > 100_000:
        return None
    agg: dict[str, list] = {}
    for r in tbl.to_pylist():
        _ids, _tfs, _pos, dls = decode_posting_list(
            {
                "doc_bin": r["doc_bin"],
                "tf_bin": r["tf_bin"],
                "pos_bin": r["pos_bin"],
                "dl_bin": r["dl_bin"],
                "block_meta": _bm_dicts(r["block_meta"]),
                "df": r["df"],
            },
            with_positions=False,
        )
        a = agg.setdefault(r["field"], [0, 0, 0, 1 << 62])
        a[0] += len(dls)
        a[1] += int(dls.sum())
        a[2] = max(a[2], int(dls.max()))
        a[3] = min(a[3], int(dls.min()))
    n_docs = max((a[0] for a in agg.values()), default=n_docs_fallback)
    stats = {"n_docs": n_docs, "avgdl": {}, "dl_max": {}, "dl_min": {}}
    for field, aname in field_config.items():
        if aname == "keyword" or field not in agg:
            stats["avgdl"][field] = 1.0
            stats["dl_max"][field] = 1
            stats["dl_min"][field] = 1
            continue
        a = agg[field]
        stats["avgdl"][field] = float(a[1]) / max(a[0], 1)
        stats["dl_max"][field] = a[2]
        stats["dl_min"][field] = a[3]
    return stats


def corpus_stats_from_segments(
    spark: SparkSession,
    segments: DataFrame,
    field_config: dict,
    n_docs_fallback: int = 0,
) -> dict:
    """Exact corpus stats (n_docs, per-field avgdl / dl_max / dl_min) from
    the doc-length marker rows — one small distributed decode over one row
    per (segment, field); no docs-table scan, no extra tokenize pass."""
    from ferret_spark.codec import decode_posting_list

    markers = segments.where(F.col("term").isNull())

    def dec(batches):
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                _ids, _tfs, _pos, dls = decode_posting_list(
                    _row_to_codec(r), with_positions=False
                )
                rows.append(
                    (
                        r["field"],
                        int(len(dls)),
                        int(dls.sum()),
                        int(dls.max()),
                        int(dls.min()),
                    )
                )
            yield pd.DataFrame(
                rows, columns=["field", "n", "s", "mx", "mn"]
            )

    agg = (
        markers.mapInPandas(
            dec, "field string, n long, s long, mx long, mn long"
        )
        .groupBy("field")
        .agg(
            F.sum("n").alias("n"),
            F.sum("s").alias("s"),
            F.max("mx").alias("mx"),
            F.min("mn").alias("mn"),
        )
        .collect()
    )
    by_field = {r["field"]: r for r in agg}
    n_docs = max((int(r["n"]) for r in agg), default=n_docs_fallback)
    stats = {"n_docs": n_docs, "avgdl": {}, "dl_max": {}, "dl_min": {}}
    for field, aname in field_config.items():
        if aname == "keyword" or field not in by_field:
            stats["avgdl"][field] = 1.0
            stats["dl_max"][field] = 1
            stats["dl_min"][field] = 1
            continue
        r = by_field[field]
        stats["avgdl"][field] = float(r["s"]) / max(int(r["n"]), 1)
        stats["dl_max"][field] = int(r["mx"])
        stats["dl_min"][field] = int(r["mn"])
    return stats


def _dir_bytes(p: str) -> int:
    if os.path.isfile(p):
        try:
            return os.path.getsize(p)
        except OSError:
            return 0
    total = 0
    for root, _d, files in os.walk(p):
        for fn in files:
            try:
                total += os.path.getsize(os.path.join(root, fn))
            except OSError:
                pass
    return total


class SegmentIndexBuilder:
    """Staged, resumable build. Each stage writes its parquet output then a
    manifest row; a re-run (after a crash) skips stages already 'done' —
    the segments_N commit-point protocol analog (c/src/index.c:1129-1167)."""

    STAGES = ["docs", "segments", "merged", "term_stats", "meta"]

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        field_config: dict[str, str],
        seg_size: int = 4096,
        salt_buckets: int = 8,
    ):
        self.spark = spark
        self.path = path
        self.field_config = field_config
        self.seg_size = seg_size
        self.salt_buckets = salt_buckets

    def _done(self) -> dict:
        return read_manifest(self.spark, self.path)

    def _finish(self, stage: str, df_count: int | None, t0: float, out_dir: str):
        append_manifest(
            self.spark,
            self.path,
            stage,
            {
                "rows": df_count if df_count is not None else -1,
                "bytes": _dir_bytes(out_dir),
                "elapsed_sec": time.time() - t0,
            },
        )

    def build(
        self,
        corpus: DataFrame | None,
        id_cols=None,
        doc_id_col: str | None = None,
        stop_after: str | None = None,
    ) -> "SegmentIndex | None":
        """Run (or resume) the staged build. ``stop_after`` kills the build
        after the named stage — used by resume tests to simulate a crash."""
        spark, path = self.spark, self.path
        os.makedirs(path, exist_ok=True)
        done = self._done()

        docs_dir = os.path.join(path, "docs")
        if "docs" not in done:
            t0 = time.time()
            # no tokenize here: the segment inverter is the single tokenize
            # pass (doc lengths ride its marker rows) — this stage is just
            # doc_id assignment + content sha256 + write
            docs = B.build_docs(
                corpus, self.field_config, id_cols, doc_id_col,
                keep_tokens=False, doc_lens=False,
            )
            keep = [c for c in docs.columns if not c.startswith("_toks_")]
            docs.select(*keep).write.mode("overwrite").parquet(docs_dir)
            # row count from parquet footers — no extra Spark job
            self._finish("docs", parquet_rows(docs_dir), t0, docs_dir)
        if stop_after == "docs":
            return None

        seg_dir = os.path.join(path, "segments")
        if "segments" not in self._done():
            t0 = time.time()
            docs = spark.read.parquet(docs_dir)
            n_docs_known = int(self._done().get("docs", {}).get("rows", 0))
            n_segs = max(1, (n_docs_known + self.seg_size - 1) // self.seg_size)
            segs = build_segments(
                docs, self.field_config, self.seg_size, n_segments=n_segs
            )
            # sorted-by-term within files -> parquet rowgroup stats prune
            # query-term scans (the .tii tier analog)
            (
                segs.sortWithinPartitions("seg_id", "field", "term")
                .write.mode("overwrite")
                .parquet(seg_dir)
            )
            self._finish("segments", parquet_rows(seg_dir), t0, seg_dir)
        if stop_after == "segments":
            return None

        merged_dir = os.path.join(path, "merged")
        if "merged" not in self._done():
            t0 = time.time()
            segs = spark.read.parquet(seg_dir)
            done_m = self._done()
            n_docs_known = done_m.get("docs", {}).get("rows", -1)
            n_segments = (
                (int(n_docs_known) + self.seg_size - 1) // self.seg_size
                if n_docs_known and n_docs_known > 0
                else None
            )
            seg_rows_known = done_m.get("segments", {}).get("rows", None)
            merged = merge_segments(
                segs, self.salt_buckets, n_segments=n_segments,
                n_rows=int(seg_rows_known) if seg_rows_known else None,
            )
            # merged rows are already partitioned by (field, term) — merge
            # input was range-partitioned — so only a partition-local sort
            # is needed for parquet rowgroup stats (term-dict pruning)
            (
                merged.sortWithinPartitions("field", "term")
                .write.mode("overwrite")
                .parquet(merged_dir)
            )
            self._finish("merged", parquet_rows(merged_dir), t0, merged_dir)
        if stop_after == "merged":
            return None

        ts_dir = os.path.join(path, "term_stats")
        if "term_stats" not in self._done():
            t0 = time.time()
            merged = spark.read.parquet(merged_dir)
            ts = merged.select(
                "field",
                "term",
                "df",
                # numeric shadow of the term: typed RangeQuery rewrites to a
                # PUSHED parquet range predicate instead of collecting the
                # whole term dictionary to the driver
                F.expr("try_cast(term as double)").alias("term_num"),
            )
            ts.write.mode("overwrite").parquet(ts_dir)
            self._finish("term_stats", parquet_rows(ts_dir), t0, ts_dir)
        if stop_after == "term_stats":
            return None

        if "meta" not in self._done():
            t0 = time.time()
            n_docs = int(self._done().get("docs", {}).get("rows", 0))
            stats = corpus_stats_from_marker_files(
                seg_dir, self.field_config, n_docs_fallback=n_docs
            )
            if stats is None:  # marker count too large for the driver
                segs = spark.read.parquet(seg_dir)
                stats = corpus_stats_from_segments(
                    spark, segs, self.field_config, n_docs_fallback=n_docs
                )
            meta = {
                "stats": stats,
                "field_config": self.field_config,
                "seg_size": self.seg_size,
                "salt_buckets": self.salt_buckets,
            }
            with open(os.path.join(path, "meta.json"), "w") as f:
                json.dump(meta, f)
            # size only meta.json — the whole index dir would double-count
            # every prior stage's bytes in the manifest
            self._finish("meta", 1, t0, os.path.join(path, "meta.json"))
        return SegmentIndex.load(spark, path)


class SegmentIndex:
    """Read side of the segmented index."""

    def __init__(self, spark, path, docs, segments, merged, term_stats, meta):
        self.spark = spark
        self.path = path
        self.docs = docs
        self.segments = segments
        self.merged = merged
        self.term_stats = term_stats
        self.stats = meta["stats"]
        self.field_config = meta["field_config"]
        self.seg_size = meta["seg_size"]
        # live doc-id ranges (incremental adds leave boundary gaps)
        self.id_ranges = meta.get(
            "id_ranges", [[0, self.stats["n_docs"]]]
        )
        # per-reader filter cache: filter key -> expanded term tuple
        # (frt_filter_get_bv analog, c/src/filter.c:24-38)
        self.filter_cache: dict = {}
        # generation for the on-disk filter DOC-SET cache (bumped by
        # FerretIndex add/optimize via meta version); True enables the
        # per-generation doc-id parquet cache in wand._attach_filter_cache
        self.generation = meta.get("version", 0)
        self.filter_doc_cache = True

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "SegmentIndex":
        with open(os.path.join(path, "meta.json")) as f:
            meta = json.load(f)
        seg_raw = spark.read.parquet(os.path.join(path, "segments"))
        gens = meta.get("generations")
        if gens and len(gens) > 1:
            # LSM view over merge generations (tiered merge policy,
            # iw_maybe_merge_segments analog c/src/index.c:6280-6309):
            # merged = union of per-generation global indexes (each
            # internally one row per (field, term)); term_stats = lazily
            # aggregated union — a term filter pushes below the union and
            # the aggregate, so df lookups stay cheap
            merged = None
            ts = None
            for g in gens:
                m = spark.read.parquet(os.path.join(path, g["merged"]))
                t = spark.read.parquet(os.path.join(path, g["term_stats"]))
                merged = m if merged is None else merged.unionByName(m)
                ts = t if ts is None else ts.unionByName(
                    t.select(*ts.columns)
                )
            term_stats = (
                ts.groupBy("field", "term")
                .agg(F.sum("df").alias("df"))
                .withColumn("term_num", F.expr("try_cast(term as double)"))
            )
        elif gens:  # exactly one generation — possibly a collapsed tier
            merged = spark.read.parquet(os.path.join(path, gens[0]["merged"]))
            term_stats = spark.read.parquet(
                os.path.join(path, gens[0]["term_stats"])
            )
        else:
            merged = spark.read.parquet(os.path.join(path, "merged"))
            term_stats = spark.read.parquet(os.path.join(path, "term_stats"))
        idx = cls(
            spark,
            path,
            spark.read.parquet(os.path.join(path, "docs")),
            # NULL-term rows are per-segment doc-length markers, not postings
            seg_raw.where(F.col("term").isNotNull()),
            merged,
            term_stats,
            meta,
        )
        idx.seg_markers = seg_raw.where(F.col("term").isNull())
        return idx

    @property
    def n_docs(self) -> int:
        return self.stats["n_docs"]

    def avgdl(self, field: str) -> float:
        return self.stats["avgdl"][field]

    def doc_freqs(self, pairs):
        if not pairs:
            return {}
        fields = sorted({f for f, _ in pairs})
        terms = sorted({t for _, t in pairs})
        rows = (
            self.term_stats.where(
                F.col("field").isin(fields) & F.col("term").isin(terms)
            ).collect()
        )
        got = {(r["field"], r["term"]): r["df"] for r in rows}
        return {p: got.get(p, 0) for p in pairs}

    def search(
        self,
        q,
        k: int = 10,
        offset: int = 0,
        prune: bool = True,
        similarity: str = "bm25",
        doc_boosts: dict[int, float] | None = None,
        post_filter=None,
    ):
        from ferret_spark.wand import segment_search

        return segment_search(
            self,
            q,
            k=k,
            offset=offset,
            prune=prune,
            similarity=similarity,
            doc_boosts=doc_boosts,
            post_filter=post_filter,
        )

    def query(self, fql: str, k: int = 10, offset: int = 0, **parser_kw):
        """Parse an FQL string (Ferret Query Language) and search."""
        from ferret_spark.parser import QueryParser

        tokenized = [
            f for f, a in self.field_config.items() if a != "keyword"
        ]
        default_analyzer = (
            self.field_config.get(tokenized[0], "standard") if tokenized else "standard"
        )
        p = QueryParser(
            default_field=tokenized[0] if tokenized else "content",
            fields=list(self.field_config),
            tokenized_fields=tokenized,
            analyzer=parser_kw.pop("analyzer", default_analyzer),
            **parser_kw,
        )
        q = p.parse(fql)
        if q is None:
            return self.spark.createDataFrame([], "doc_id long, score float")
        return self.search(q, k=k, offset=offset)

    def cache(self) -> "SegmentIndex":
        """Persist the hot query-side tables in executor memory (the warm
        'reader open' state — segment rows + term dictionary)."""
        self.segments = self.segments.persist()
        self.term_stats = self.term_stats.persist()
        self.segments.count()
        self.term_stats.count()
        return self
