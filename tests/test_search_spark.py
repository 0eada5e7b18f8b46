"""Rank-identity: Spark engine top-k == oracle top-k (docIDs AND float32
scores), the north_rule correctness gate. Golden 18-doc corpus + a
synthetic source-code corpus slice."""

import hashlib

import numpy as np
import pytest

from ferret_spark.fixtures import (
    GOLDEN_FIELD_CONFIG,
    golden_rows,
    synth_corpus_pdf,
)
from ferret_spark.index import SparkIndex
from ferret_spark.oracle import OracleIndex
from ferret_spark.query import (
    MUST,
    MUST_NOT,
    SHOULD,
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    PhraseQuery,
    PrefixQuery,
    RangeQuery,
    TermQuery,
    WildcardQuery,
)


def T(t, field="content", boost=1.0):
    return TermQuery(field=field, term=t, boost=boost)


GOLDEN_QUERIES = [
    ("term_word2", T("word2")),
    ("term_word1", T("word1")),
    ("term_quick", T("quick")),
    ("term_missing", T("zzzzz")),
    (
        "bool_and",
        BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST)),
    ),
    (
        "bool_and_should",
        BooleanQuery.of((T("word1"), MUST), (T("word3"), MUST), (T("word2"), SHOULD)),
    ),
    (
        "bool_or",
        BooleanQuery.of((T("word2"), SHOULD), (T("word3"), SHOULD)),
    ),
    (
        "bool_not",
        BooleanQuery.of((T("word3"), MUST), (T("word2"), MUST_NOT)),
    ),
    (
        "bool_pure_not",
        BooleanQuery.of((T("word3"), MUST_NOT)),
    ),
    ("phrase_exact", PhraseQuery.of("content", ["quick", "brown", "fox"])),
    ("phrase_slop1", PhraseQuery.of("content", ["quick", None, "fox"], slop=1)),
    ("phrase_slop4", PhraseQuery.of("content", ["quick", "brown", "fox"], slop=4)),
    (
        "phrase_multi",
        PhraseQuery.of("content", [("quick", "fast"), ("brown", "red", "hairy"), "fox"]),
    ),
    ("prefix", PrefixQuery(field="content", prefix="word")),
    ("wildcard", WildcardQuery(field="content", pattern="w*d2")),
    ("fuzzy", FuzzyQuery(field="content", term="worde", min_sim=0.5)),
    ("range_str", RangeQuery(field="date", lower="20051006", upper="20051010")),
    ("range_typed", RangeQuery(field="number", lower=-1.0, upper=1.0, typed=True)),
    ("match_all", MatchAllQuery()),
    (
        "boosted_bool",
        BooleanQuery.of((T("word3", boost=2.0), MUST), (T("quick", boost=0.5), SHOULD)),
    ),
]


@pytest.fixture(scope="module")
def golden_pair(spark):
    rows = golden_rows()
    oracle = OracleIndex(rows, GOLDEN_FIELD_CONFIG)
    pdf_rows = [dict(r, doc_id=i) for i, r in enumerate(rows)]
    corpus = spark.createDataFrame(pdf_rows)
    sidx = SparkIndex.build(spark, corpus, GOLDEN_FIELD_CONFIG, doc_id_col="doc_id")
    return oracle, sidx


def assert_rank_identical(oracle, sidx, q, k=25):
    expected = oracle.search(q, k=k)
    got = [(r["doc_id"], r["score"]) for r in sidx.search(q, k=k).collect()]
    assert [d for d, _ in got] == [d for d, _ in expected], (
        f"doc order mismatch: {got} vs {expected}"
    )
    for (gd, gs), (ed, es) in zip(got, expected):
        assert np.float32(gs) == np.float32(es), (gd, gs, es)


@pytest.mark.parametrize("name,q", GOLDEN_QUERIES, ids=[n for n, _ in GOLDEN_QUERIES])
def test_golden_rank_identity(golden_pair, name, q):
    oracle, sidx = golden_pair
    assert_rank_identical(oracle, sidx, q)


# ---------------------------------------------------------------------------
# synthetic source-code corpus


@pytest.fixture(scope="module")
def synth_pair(spark):
    pdf = synth_corpus_pdf(120, mu=3.0, sigma=0.8)  # short docs for speed
    fc = {"content": "letter", "lang": "keyword"}
    corpus = spark.createDataFrame(pdf)
    sidx = SparkIndex.build(
        spark, corpus, fc, id_cols=("repo", "path", "commit")
    )
    # oracle rows ordered by the engine's deterministic doc_id assignment
    # (global order is (bucket(xxhash64), repo, path, commit) — what matters
    # for rank identity is that oracle and engine agree on ids)
    id_map = {
        r["commit"]: r["doc_id"]
        for r in sidx.docs.select("commit", "doc_id").collect()
    }
    rows = sorted(pdf.to_dict("records"), key=lambda r: id_map[r["commit"]])
    oracle = OracleIndex(rows, fc)
    return oracle, sidx, rows


def test_synth_doc_ids_and_sha256(synth_pair):
    oracle, sidx, rows = synth_pair
    got = {
        r["doc_id"]: (r["commit"], r["sha256_content"])
        for r in sidx.docs.select("doc_id", "commit", "sha256_content").collect()
    }
    # dense bijection 0..n-1 (per-row content sha256 invariant, input_hint)
    assert sorted(got.keys()) == list(range(len(rows)))
    for i, row in enumerate(rows):
        commit, sha = got[i]
        assert commit == row["commit"], f"doc_id order mismatch at {i}"
        assert sha == hashlib.sha256(row["content"].encode()).hexdigest()


def test_doc_id_assignment_deterministic(spark):
    # same input at different partitioning -> identical doc_ids
    pdf = synth_corpus_pdf(60, mu=2.5, sigma=0.5)
    fc = {"content": "letter"}
    a = SparkIndex.build(
        spark, spark.createDataFrame(pdf).repartition(2), fc,
        id_cols=("repo", "path", "commit"),
    )
    b = SparkIndex.build(
        spark, spark.createDataFrame(pdf).repartition(7), fc,
        id_cols=("repo", "path", "commit"),
    )
    ma = {r["commit"]: r["doc_id"] for r in a.docs.select("commit", "doc_id").collect()}
    mb = {r["commit"]: r["doc_id"] for r in b.docs.select("commit", "doc_id").collect()}
    assert ma == mb


def test_synth_doc_len_matches_oracle(synth_pair):
    oracle, sidx, rows = synth_pair
    got = {
        r["doc_id"]: r["doc_len_content"]
        for r in sidx.docs.select("doc_id", "doc_len_content").collect()
    }
    for i in range(len(rows)):
        assert got[i] == oracle.doc_len["content"][i], i


SYNTH_QUERIES = [
    ("hot_term", T("def")),  # Zipf head — hottest posting list
    ("mid_term", T("return")),
    (
        "bool_and",
        BooleanQuery.of((T("def"), MUST), (T("return"), MUST)),
    ),
    (
        "bool_mix",
        BooleanQuery.of(
            (T("def"), MUST), (T("class"), SHOULD), (T("import"), MUST_NOT)
        ),
    ),
    ("phrase", PhraseQuery.of("content", ["def", "class"], slop=2)),
    ("prefix", PrefixQuery(field="content", prefix="re")),
    ("keyword_field", T("py", field="lang")),
]


@pytest.mark.parametrize("name,q", SYNTH_QUERIES, ids=[n for n, _ in SYNTH_QUERIES])
def test_synth_rank_identity(synth_pair, name, q):
    oracle, sidx, _ = synth_pair
    assert_rank_identical(oracle, sidx, q, k=15)


def test_term_stats_match_oracle(synth_pair):
    oracle, sidx, _ = synth_pair
    got = {
        (r["field"], r["term"]): r["df"]
        for r in sidx.term_stats.collect()
    }
    for field, postings in oracle.postings.items():
        for term, plist in postings.items():
            assert got.get((field, term)) == len(plist), (field, term)
    assert sidx.n_docs == oracle.n_docs
    assert abs(sidx.avgdl("content") - oracle.avgdl["content"]) < 1e-9
