"""JVM tokenize expressions (round-7) vs the pandas analyzer surface:
token arrays must be element-equal (same tokens, same positions) for
every analyzer routed off the Arrow UDF path."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from ferret_spark.analysis import get_analyzer
from ferret_spark.build import jvm_tokens_expr
from tests.conftest import spark  # noqa: F401

EDGE = [
    "plain words here",
    "  leading",
    "trailing   ",
    "a\tb\nc\rd\fe\x0bf",
    "",
    None,
    "MiXeD CaSe TOKENS",
    "digits 123 mix3d x-y_z",
    "   ",
    "one",
    "ünïcode wörds æøå",
    "punct! marks? (kept) [by] whitespace",
]


@pytest.mark.parametrize("aname", ["whitespace", "whitespace_raw", "letter"])
def test_jvm_tokens_match_pandas_surface(spark, aname):  # noqa: F811
    an = get_analyzer(aname)
    want = an.tokens_pandas(pd.Series(EDGE, dtype=object)).tolist()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(EDGE)], "i int, text string"
    )
    got_rows = (
        df.select("i", jvm_tokens_expr(aname, "text").alias("toks"))
        .orderBy("i")
        .collect()
    )
    got = [list(r["toks"]) for r in got_rows]
    assert got == want


def test_jvm_tokens_match_on_corpus(spark):  # noqa: F811
    d = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    an = get_analyzer("whitespace")
    pdf = d.select("doc_id", "text").toPandas().sort_values("doc_id")
    want = an.tokens_pandas(pdf["text"]).tolist()
    got_rows = (
        d.select("doc_id", jvm_tokens_expr("whitespace", "text").alias("t"))
        .orderBy("doc_id")
        .collect()
    )
    got = [list(r["t"]) for r in got_rows]
    assert got == want


def test_unknown_analyzer_falls_back(spark):  # noqa: F811
    assert jvm_tokens_expr("standard", "text") is None
    assert jvm_tokens_expr("standard_nostop", "text") is None
    assert jvm_tokens_expr(get_analyzer("whitespace"), "text") is None
