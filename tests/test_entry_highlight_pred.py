"""ft_highlight predicate rewrite equivalence (round-7 optimization).

The O(len^2) exists(sequence(...)) adjacency predicate was replaced by a
single substring probe over the space-padded text. These tests pin the
exact equivalence of the two predicates on every tricky shape (double
spaces, boundary positions, partial-token prefixes) and that the query
output itself is unchanged at sf0.001.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import spark  # noqa: F401  (session fixture)


CASES = [
    "table hash",
    "x table hash y",
    "table hash at start",
    "ends with table hash",
    "table  hash",  # double space: NOT adjacent tokens
    " table hash",  # leading space -> leading empty token, still adjacent
    "table hash ",  # trailing space
    "tabletable hash",  # prefix noise: token is 'tabletable'
    "table hashhash",  # suffix noise: token is 'hashhash'
    "a table x hash b",  # not adjacent
    "hash table",  # wrong order
    "",  # empty doc
    "table",  # single token
    "xtable hash",  # 'xtable' != 'table'
    "table hash table hash",  # repeated occurrence
    "tab le hash",
]


def _old_pred_rows(spark, df):
    # the pre-r7 predicate; only defined for docs with >= 2 tokens
    # (sequence(0, size-2) DESCENDS for single-token docs and the array
    # index throws), so evaluate it on that domain — the corpus never has
    # shorter docs, and the new predicate is trivially false there (a
    # ' table hash ' occurrence needs two tokens)
    toks = r"split(text, ' ')"
    pred = F.expr(
        f"size({toks}) >= 2 AND exists(sequence(0, size({toks}) - 2),"
        f" i -> {toks}[i] = 'table' AND {toks}[i + 1] = 'hash')"
    )
    return sorted(r["i"] for r in df.where(pred).select("i").collect())


def _new_pred_rows(spark, df):
    pred = (
        F.instr(F.concat(F.lit(" "), F.col("text"), F.lit(" ")), " table hash ")
        > 0
    )
    return sorted(r["i"] for r in df.where(pred).select("i").collect())


def test_substring_predicate_equals_exists_predicate(spark):  # noqa: F811
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CASES)], "i int, text string"
    )
    assert _new_pred_rows(spark, df) == _old_pred_rows(spark, df)


def test_ft_highlight_output_unchanged_smallsf(spark):  # noqa: F811
    import __spark_entry__ as entry

    sf_dir = "/root/testdata/sf0.001"
    rows = entry.queries()["ft_highlight"](spark, sf_dir).collect()
    # recompute the matching doc set with the old predicate and check the
    # query returns exactly those docs (excerpt content is covered by the
    # oracle twin; here we pin the doc-selection equivalence end to end)
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").withColumnRenamed(
        "doc_id", "i"
    )
    want = _old_pred_rows(spark, d)
    assert sorted(r["doc_id"] for r in rows) == want
    assert all("<b>table" in r["excerpt"] for r in rows)
