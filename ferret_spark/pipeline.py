"""Training-data pipeline operators over the documents/embeddings tables.

Everything here is expressed with JVM-side built-in functions (higher-order
array functions, md5, sha2) — no Python in the hot path — so plans stay
inside whole-stage codegen and scale: the only shuffles are the final
groupBys/joins on explicit keys.

Operators:
- exact dedup            sha256 hash-groupBy
- n-gram Jaccard pairs   shingle -> explode -> pair join -> |A∩B|/|A∪B|
- MinHash + LSH          per-doc signature via array transforms (md5-based
                         permutations, deterministic + SQL-twin-able),
                         banding -> bucket groupBy -> candidate pairs
- SimHash                64-bit sign-aggregate fingerprint (pandas UDF)
- ANN brute-force        cosine top-k via zip_with/aggregate expressions
- ANN LSH                random-hyperplane bucketing (deterministic planes)
- language id            stopword-ratio heuristic
- quality score          length/alpha/stopword mix
- token counts           whitespace + word-regex counts
- fingerprint            md5 over sorted distinct tokens
- multimodal stub        binary column + deterministic fake feature
                         extraction (md5-derived); real decode is stubbed —
                         image/audio libs aren't in this container
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferret_spark.analysis import ENGLISH_STOP_WORDS

MINHASH_PERMS = 32
LSH_BANDS = 8  # rows per band = MINHASH_PERMS // LSH_BANDS = 4
SHINGLE_N = 3


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet")


def _toks_col():
    return F.expr(r"filter(split(lower(text), '\\s+'), t -> t <> '')")


# ---------------------------------------------------------------------------
# dedup


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups by content hash; keeps the min doc_id as the
    canonical representative."""
    d = _docs(spark, sf_dir)
    return (
        d.groupBy(F.sha2(F.col("text"), 256).alias("content_sha"))
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count("*").alias("n_copies"),
        )
        .where(F.col("n_copies") >= 1)
        .orderBy("canonical_doc_id")
    )


def _shingles(n: int = SHINGLE_N):
    return F.expr(
        f"array_distinct(transform(sequence(0, greatest(size(toks) - {n}, 0)),"
        f" i -> concat_ws(' ', slice(toks, i + 1, {n}))))"
    )


def dedup_ngram_jaccard(
    spark: SparkSession, sf_dir: str, threshold: float = 0.4
) -> DataFrame:
    """Near-duplicate pairs by {SHINGLE_N}-gram Jaccard similarity.
    Pair generation via shingle-key join (blocking on shared shingles) —
    the shuffle key is the shingle, skew defused by array_distinct."""
    d = _docs(spark, sf_dir).select("doc_id", _toks_col().alias("toks"))
    sh = d.select(
        "doc_id", _shingles().alias("sh")
    ).where(F.size("sh") > 0)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    ex = sh.select("doc_id", F.explode("sh").alias("s"))
    pairs = (
        ex.alias("a")
        .join(ex.alias("b"), (F.col("a.s") == F.col("b.s"))
              & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.count("*").alias("n_common"))
    )
    out = (
        pairs.join(sizes.withColumnRenamed("doc_id", "doc_a")
                   .withColumnRenamed("n_sh", "n_a"), "doc_a")
        .join(sizes.withColumnRenamed("doc_id", "doc_b")
              .withColumnRenamed("n_sh", "n_b"), "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_common")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    )
    return out


def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc MinHash signature: perm i's hash of shingle s is
    md5(s || ':' || i); signature[i] = min over shingles. Deterministic and
    expressible identically in SQL (the DuckDB twin)."""
    d = _docs(spark, sf_dir).select("doc_id", _toks_col().alias("toks"))
    sh = d.select("doc_id", _shingles().alias("sh")).where(F.size("sh") > 0)
    sig = sh.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, {MINHASH_PERMS - 1}),"
            f" i -> array_min(transform(sh, s -> md5(concat(s, ':', i)))))"
        ).alias("sig"),
    )
    return sig


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: band hash = md5 of the band's signature slice;
    docs sharing any band bucket are candidates."""
    rows_per_band = MINHASH_PERMS // LSH_BANDS
    sig = minhash_signatures(spark, sf_dir)
    bands = sig.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(0, {LSH_BANDS - 1}),"
                f" b -> md5(concat_ws(',', slice(sig, b * {rows_per_band} + 1,"
                f" {rows_per_band}))))"
            )
        ).alias("band", "bhash"),
    )
    pairs = (
        bands.alias("a")
        .join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bhash") == F.col("b.bhash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .distinct()
        .orderBy("doc_a", "doc_b")
    )
    return pairs


def dedup_simhash(spark: SparkSession, sf_dir: str, bits: int = 64) -> DataFrame:
    """64-bit SimHash fingerprints (sign of per-bit weighted sums over token
    hashes). Arrow-batched pandas UDF — the per-token bit loop is numpy."""
    d = _docs(spark, sf_dir).select("doc_id", _toks_col().alias("toks"))

    @F.pandas_udf("long")
    def simhash(toks: pd.Series) -> pd.Series:
        import hashlib

        out = np.zeros(len(toks), dtype=np.int64)
        for i, ts in enumerate(toks):
            if ts is None or len(ts) == 0:
                continue
            acc = np.zeros(bits, dtype=np.int64)
            for t in ts:
                h = int.from_bytes(
                    hashlib.md5(t.encode()).digest()[:8], "big", signed=False
                )
                bitsv = (h >> np.arange(bits, dtype=np.uint64)) & np.uint64(1)
                acc += np.where(bitsv.astype(bool), 1, -1)
            v = np.uint64(0)
            for b in range(bits):
                if acc[b] > 0:
                    v |= np.uint64(1) << np.uint64(b)
            out[i] = np.int64(v.astype(np.int64))
        return pd.Series(out)

    return d.select("doc_id", simhash("toks").alias("simhash")).orderBy("doc_id")


# ---------------------------------------------------------------------------
# similarity search (ANN)


def _cosine_expr(a: str, b: str):
    dot = f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), 0D, (s, x) -> s + x)"
    na = f"sqrt(aggregate({a}, 0D, (s, x) -> s + x * x))"
    nb = f"sqrt(aggregate({b}, 0D, (s, x) -> s + x * x))"
    return F.expr(f"({dot}) / (({na}) * ({nb}))")


def ann_cosine_topk(
    spark: SparkSession, sf_dir: str, query_vec_id: int = 0, k: int = 10
) -> DataFrame:
    """Brute-force cosine top-k against one stored vector — the exactness
    baseline. All arithmetic in JVM higher-order functions (float64)."""
    emb = _emb(spark, sf_dir).select(
        "vec_id",
        # promote to float64 BEFORE any arithmetic (float32 products would
        # diverge from the SQL oracle beyond the rounding guard)
        F.expr("transform(embedding, x -> cast(x as double))").alias("e"),
    )
    qrow = emb.where(F.col("vec_id") == query_vec_id).select(
        F.col("e").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(qrow))
        .where(F.col("vec_id") != query_vec_id)
        .select(
            "vec_id",
            F.round(_cosine_expr("e", "qv"), 6).alias("cosine"),
        )
    )
    from pyspark.sql import Window

    top = scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)
    w = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    return top.select(
        F.row_number().over(w).cast("long").alias("rank"), "vec_id", "cosine"
    )


def _hyperplanes(dim: int, n_planes: int, seed: int = 42) -> np.ndarray:
    rng = np.random.Generator(np.random.Philox(key=seed))
    return rng.standard_normal((n_planes, dim))


def ann_lsh_topk(
    spark: SparkSession,
    sf_dir: str,
    query_vec_id: int = 0,
    k: int = 10,
    n_planes: int = 12,
    probe_hamming: int = 2,
) -> DataFrame:
    """LSH-bucketed ANN (the scale path): random-hyperplane signatures
    bucket vectors; the query probes buckets within `probe_hamming` bits,
    then exact cosine re-ranks the candidates. Deterministic planes
    (Philox seed 42)."""
    emb = _emb(spark, sf_dir)
    dim = len(emb.select("embedding").first()[0])
    planes = _hyperplanes(dim, n_planes)

    @F.pandas_udf("int")
    def bucket_of(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy())
        signs = (m @ planes.T) > 0
        weights = (1 << np.arange(n_planes)).astype(np.int64)
        return pd.Series((signs @ weights).astype(np.int32))

    bucketed = emb.withColumn("bucket", bucket_of("embedding"))
    qrow = bucketed.where(F.col("vec_id") == query_vec_id).first()
    qbucket = int(qrow["bucket"])
    # probe buckets within hamming distance
    probe = [qbucket]
    if probe_hamming >= 1:
        probe += [qbucket ^ (1 << i) for i in range(n_planes)]
    if probe_hamming >= 2:
        probe += [
            qbucket ^ (1 << i) ^ (1 << j)
            for i in range(n_planes)
            for j in range(i + 1, n_planes)
        ]
    cand = bucketed.where(
        F.col("bucket").isin(probe) & (F.col("vec_id") != query_vec_id)
    )
    qv = spark.createDataFrame(
        [(list(map(float, qrow["embedding"])),)], "qv array<double>"
    )
    scored = cand.crossJoin(F.broadcast(qv)).select(
        "vec_id", F.round(_cosine_expr("embedding", "qv"), 6).alias("cosine")
    )
    return scored.orderBy(F.desc("cosine"), F.asc("vec_id")).limit(k)


# ---------------------------------------------------------------------------
# text analysis


def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-ratio English-ness heuristic (n-gram language id stand-in
    for the synthetic corpus)."""
    d = _docs(spark, sf_dir)
    sw = sorted(ENGLISH_STOP_WORDS)
    sw_lit = ", ".join(f"'{w}'" for w in sw)
    return d.select(
        "doc_id",
        F.expr(
            f"round(size(filter(filter(split(lower(text), '\\\\s+'),"
            f" t -> t <> ''), t -> array_contains(array({sw_lit}), t)))"
            f" / greatest(size(filter(split(lower(text), '\\\\s+'),"
            f" t -> t <> '')), 1), 6)"
        ).alias("stopword_ratio"),
    ).withColumn(
        "is_englishlike", (F.col("stopword_ratio") >= 0.1).cast("int")
    ).orderBy("doc_id")


def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality score: mix of mean token length, alpha-token fraction and
    length band — the classic cheap pretraining filters."""
    d = _docs(spark, sf_dir)
    toks = r"filter(split(lower(text), '\\s+'), t -> t <> '')"
    mean_len = f"aggregate({toks}, 0D, (s, t) -> s + length(t)) / greatest(size({toks}), 1)"
    alpha_frac = (
        f"size(filter({toks}, t -> t rlike '^[a-z]+$'))"
        f" / greatest(size({toks}), 1)"
    )
    n_toks = f"size({toks})"
    return d.select(
        "doc_id",
        F.expr(f"round({mean_len}, 6)").alias("mean_token_len"),
        F.expr(f"round({alpha_frac}, 6)").alias("alpha_fraction"),
        F.expr(n_toks).alias("n_tokens"),
        F.expr(
            f"round(least({mean_len} / 10.0, 1.0) * 0.3 + ({alpha_frac}) * 0.4"
            f" + least({n_toks} / 100.0, 1.0) * 0.3, 6)"
        ).alias("quality_score"),
    ).orderBy("doc_id")


def text_token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Whitespace token count + BPE-ish subword count (letter runs, digit
    runs, punct singletons)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.expr(
            r"size(filter(split(text, '\\s+'), t -> t <> ''))"
        ).alias("ws_tokens"),
        F.expr(
            r"size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]', 0))"
        ).alias("subword_tokens"),
        F.length("text").alias("n_chars_actual"),
    ).orderBy("doc_id")


def text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set (word-shuffle-invariant near-dup key)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.expr(
            r"md5(array_join(array_sort(array_distinct("
            r"filter(split(lower(text), '\\s+'), t -> t <> ''))), ' '))"
        ).alias("fingerprint"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# multimodal (binary column plumbing; decode stubbed)


MEDIA_SCHEMA = (
    "doc_id long, media binary, media_type string, width int, height int"
)


def synth_media(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fake media table: binary payload derived from the
    document text (stands in for image bytes; schema and partitioning are
    the real thing)."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "utf-8").alias("media"),
        F.lit("image/fake").alias("media_type"),
        (F.pmod(F.col("doc_id"), F.lit(640)) + 32).cast("int").alias("width"),
        (F.pmod(F.col("doc_id"), F.lit(480)) + 32).cast("int").alias("height"),
    )


def decode_image(payload: bytes):  # pragma: no cover - real decode stubbed
    """Real image decode requires PIL/libvips — not in this container.
    The Spark-side plumbing (binary column, Arrow batching, schema) is real
    and exercised via the deterministic fake featurizer below."""
    raise NotImplementedError("image decode requires PIL; stubbed in sandbox")


def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature extraction over binary media via mapInPandas (Arrow batches).
    The 'decoder' is a deterministic md5-derived 8-dim feature so the
    pipeline shape (binary in -> fixed-dim float out) is fully tested.

    The result serializes the vector as ``feature_csv`` (values are
    integral doubles, rendered as ints) — array columns aren't
    lex-sortable by comparison harnesses; the raw array stays available
    via multimodal_feature_vectors()."""
    vec = multimodal_feature_vectors(spark, sf_dir)
    return vec.select(
        "doc_id",
        F.expr(
            "concat_ws(',', transform(feature, x -> cast(cast(x as int) as string)))"
        ).alias("feature_csv"),
        "n_bytes",
    ).orderBy("doc_id")


def multimodal_feature_vectors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The raw array<double> feature output (binary in -> fixed-dim out)."""
    media = synth_media(spark, sf_dir)

    def extract(batches):
        import hashlib

        for pdf in batches:
            feats = []
            for b in pdf["media"]:
                h = hashlib.md5(bytes(b)).hexdigest()
                # deterministic 8-dim fake feature: char codes of the first
                # 8 md5 hex chars (SQL-twin-able via ascii(substr(md5,..)))
                feats.append([float(ord(h[i])) for i in range(8)])
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "feature": feats,
                    "n_bytes": [len(bytes(b)) for b in pdf["media"]],
                }
            )

    return media.mapInPandas(
        extract, "doc_id long, feature array<double>, n_bytes long"
    )
