"""Round-7: segment scan predicates list exactly the requested
(field, term) pairs — an OR of per-field term lists, never the
fields x terms cross-product (VERDICT r6 finding #2)."""

from __future__ import annotations

from ferret_spark.wand import _exact_pair_cond
from tests.conftest import spark  # noqa: F401


def test_exact_pair_cond_filters_only_requested_pairs(spark):  # noqa: F811
    rows = [
        ("text", "a"), ("text", "b"), ("lang", "en"),
        ("lang", "a"),  # cross-product trap: 'a' exists in BOTH fields
        ("text", "en"),
    ]
    df = spark.createDataFrame(rows, "field string, term string")
    pairs = [("text", "a"), ("lang", "en")]
    got = sorted(
        (r["field"], r["term"])
        for r in df.where(_exact_pair_cond(pairs)).collect()
    )
    # the cross-product predicate would ALSO match ('lang','a') and
    # ('text','en'); the exact predicate must not
    assert got == sorted(pairs)


def test_exact_pair_cond_plan_pushes_per_field_lists(spark, tmp_path):  # noqa: F811
    rows = [("text", "a", 1), ("lang", "en", 2)]
    p = str(tmp_path / "t.parquet")
    spark.createDataFrame(
        rows, "field string, term string, df long"
    ).write.parquet(p)
    df = spark.read.parquet(p).where(
        _exact_pair_cond([("text", "a"), ("lang", "en")])
    )
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    # pushed as per-field conjunctions, visible in the scan's filters
    assert "PushedFilters" in plan
    assert plan.count("Or(And(") >= 1 or "And(EqualTo(field,text)" in plan
