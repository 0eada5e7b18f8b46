"""Round-7 Arrow shingle kernel vs the JVM lookahead-regex extraction:
exploded (doc_id, n_sh, shingle) rows must be set-identical."""

from __future__ import annotations

from pyspark.sql import functions as F

import ferret_spark.pipeline as P
from tests.conftest import spark  # noqa: F401


def _jvm_rows(spark, df):
    sh = df.select(
        "doc_id", P._shingles_from_text().alias("sh")
    ).where(F.size("sh") > 0)
    ex = sh.select(
        "doc_id", F.size("sh").alias("n_sh"), F.explode("sh").alias("s")
    )
    return sorted(tuple(r) for r in ex.collect())


def _arrow_rows(spark, df):
    ex = df.select("doc_id", "text").mapInArrow(
        P._shingle_rows_arrow, "doc_id long, n_sh int, s string"
    )
    return sorted(tuple(r) for r in ex.collect())


def test_shingle_kernel_matches_jvm_on_corpus(spark):  # noqa: F811
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    assert _arrow_rows(spark, d) == _jvm_rows(spark, d)


def test_shingle_kernel_matches_jvm_edge_cases(spark):  # noqa: F811
    rows = [
        (0, "one two three four five"),
        (1, "  Leading And   multi  spaces\tmix\nhere  "),
        (2, "two tokens"),
        (3, "one"),
        (4, ""),
        (5, "a b c a b c a b c"),  # heavy duplicate windows
        (6, "UPPER case MiX three words"),
        (7, "x\x0by\fz\rq w"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    assert _arrow_rows(spark, d) == _jvm_rows(spark, d)


def test_shingle_docs_kernel_matches_exploded_rows(spark):  # noqa: F811
    """r7 per-doc cache shape: exploding _shingle_docs_arrow's (doc_id,
    n_sh, shs) rows must reproduce _shingle_rows_arrow's exploded rows
    exactly (same doc_ids, same n_sh, same distinct shingles in order)."""
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    docs = d.select("doc_id", "text").mapInArrow(
        P._shingle_docs_arrow, "doc_id long, n_sh int, shs array<string>"
    )
    ex = docs.select(
        "doc_id", "n_sh", F.explode("shs").alias("s")
    )
    got = sorted(tuple(r) for r in ex.collect())
    assert got == _arrow_rows(spark, d)
    # n_sh always equals the array size and is >= 1 (whole-doc shingle)
    bad = docs.where(
        (F.size("shs") != F.col("n_sh")) | (F.col("n_sh") < 1)
    ).count()
    assert bad == 0
