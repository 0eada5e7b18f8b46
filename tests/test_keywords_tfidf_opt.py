"""keywords_tfidf round-7 rewrite parity: the Arrow per-doc tf counter +
in-row-distinct df branch must reproduce the explode/groupBy/self-join
form exactly (same tokens, same counts, same top-k serialization)."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from ferret_spark.pipeline import keywords_tfidf
from tests.conftest import spark  # noqa: F401


def _reference_keywords(spark, sf_dir, k=3):
    """The pre-r7 shape: explode + groupBy tf, df from the tf lineage."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = d.select(
        "doc_id",
        F.explode(
            F.expr(r"filter(split(lower(text), '\\s+'), t -> t <> '')")
        ).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    n_docs = d.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = (
        tf.join(dfreq, "term")
        .select(
            "doc_id",
            "term",
            F.round(
                F.col("tf").cast("double")
                * F.log(F.lit(float(n_docs)) / F.col("df").cast("double")),
                9,
            ).alias("s"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("term"))
            ),
        )
        .where(F.col("rk") <= k)
    )
    return (
        scored.groupBy("doc_id")
        .agg(
            F.concat_ws(
                ",",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "term"))),
                    lambda x: x["term"],
                ),
            ).alias("keywords")
        )
        .orderBy("doc_id")
    )


def test_keywords_matches_reference_shape(spark):  # noqa: F811
    sf_dir = "/root/testdata/sf0.01"
    got = keywords_tfidf(spark, sf_dir, k=3).collect()
    want = _reference_keywords(spark, sf_dir, k=3).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]


def test_arrow_tokenizer_matches_jvm_split(spark):  # noqa: F811
    # whitespace-edge shapes: Java \s class, empties, case folding
    rows = [
        (0, "A b  c\td\ne"),
        (1, "  leading and trailing  "),
        (2, ""),
        (3, "ONE one OnE"),
        (4, "x\x0by\fz\rw"),
        (5, "solo"),
    ]
    d = spark.createDataFrame(rows, "doc_id long, text string")
    jvm = d.select(
        "doc_id",
        F.explode(
            F.expr(r"filter(split(lower(text), '\\s+'), t -> t <> '')")
        ).alias("term"),
    ).groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    import re
    from collections import Counter

    ws = re.compile("[ \t\n\x0b\f\r]+")
    want = set()
    for i, t in rows:
        for term, tf in Counter(
            tok for tok in ws.split(t.lower()) if tok
        ).items():
            want.add((i, term, tf))
    got = {(r["doc_id"], r["term"], r["tf"]) for r in jvm.collect()}
    assert got == want
