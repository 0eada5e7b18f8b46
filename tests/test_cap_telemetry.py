"""Cap-drop telemetry: forcing a tiny hot-key cap must (a) report a
nonzero dropped count through cap_drop_stats and (b) keep results
oracle-green against a DuckDB twin carrying the SAME cap — the truncation
is visible, never silent, and never wrong."""

import duckdb
import pytest

import __spark_entry__ as entry
from ferret_spark import pipeline as P

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/documents.parquet')"
    )
    con.sql(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"read_parquet('{SF_DIR}/embeddings.parquet')"
    )
    return con


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_jaccard_forced_cap_reports_and_stays_green(spark, ddb):
    got = P.dedup_ngram_jaccard(spark, SF_DIR, shingle_df_cap=2)
    rows = _rows(got)
    stats = P.cap_drop_stats("dedup_ngram_jaccard")
    assert stats["dropped_keys"] > 0
    assert stats["dropped_members"] >= 3 * stats["dropped_keys"]
    want = sorted(
        tuple(r)
        for r in ddb.sql(entry._sql_ngram_jaccard(shingle_df_cap=2))
        .fetchall()
    )
    # 6-dp float guard on the jaccard column
    assert [(a, b, round(j, 6)) for a, b, j in rows] == [
        (a, b, round(j, 6)) for a, b, j in want
    ]


def test_jaccard_default_cap_drops_nothing(spark):
    P.dedup_ngram_jaccard(spark, SF_DIR).collect()
    stats = P.cap_drop_stats("dedup_ngram_jaccard")
    assert stats == {"dropped_keys": 0, "dropped_members": 0}


def test_minhash_forced_cap_reports_and_stays_green(spark, ddb):
    got = P.dedup_minhash_lsh(spark, SF_DIR, bucket_cap=2)
    rows = _rows(got)
    stats = P.cap_drop_stats("dedup_minhash_lsh")
    assert stats["dropped_keys"] > 0
    want = sorted(
        tuple(r)
        for r in ddb.sql(entry._sql_minhash_lsh(bucket_cap=2)).fetchall()
    )
    assert rows == want


def test_ann_batch_forced_cap_reports(spark):
    P.ann_batch_topk(spark, SF_DIR, bucket_cap=2).collect()
    stats = P.cap_drop_stats("ann_batch_topk")
    assert stats["dropped_keys"] > 0

    P.ann_batch_topk(spark, SF_DIR).collect()
    assert P.cap_drop_stats("ann_batch_topk")["dropped_keys"] == 0


def test_dedup_embedding_forced_cap_reports(spark):
    P.dedup_embedding(spark, SF_DIR, bucket_cap=2).collect()
    stats = P.cap_drop_stats("dedup_embedding")
    assert stats["dropped_keys"] > 0

    P.dedup_embedding(spark, SF_DIR).collect()
    assert P.cap_drop_stats("dedup_embedding")["dropped_keys"] == 0


def test_stats_none_for_unknown_op():
    assert P.cap_drop_stats("never_ran") is None
