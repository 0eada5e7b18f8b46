"""Winnowing fingerprint (rolling-hash k-grams, window-min selection):
the SWA guarantee — documents sharing a substring of length >= K + W - 1
share at least one fingerprint hash; a local edit leaves distant windows'
mins intact while changing the fingerprint."""

import pytest

from ferret_spark.pipeline import (
    WINNOW_K,
    WINNOW_W,
    fingerprint_winnow,
)


def _mins(spark, tmp_path, texts):
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    path = str(tmp_path / "docs")
    spark.createDataFrame(rows).write.parquet(path + "/documents.parquet")
    df = fingerprint_winnow(spark, path)
    # re-derive the min sets (pre-md5) for overlap assertions
    from pyspark.sql import functions as F
    from ferret_spark.pipeline import _WINNOW_POW, WINNOW_P

    norm = r"trim(regexp_replace(lower(text), '\\s+', ' '))"
    gram = " + ".join(
        f"ascii(substring(s, i + {j}, 1)) * {_WINNOW_POW[j]}L"
        for j in range(WINNOW_K)
    )
    h = (
        f"transform(sequence(1, greatest(length(s) - {WINNOW_K - 1}, 1)),"
        f" i -> ({gram}) % {WINNOW_P}L)"
    )
    mins = (
        f"transform(sequence(1, greatest(size(h) - {WINNOW_W - 1}, 1)),"
        f" i -> array_min(slice(h, i, {WINNOW_W})))"
    )
    raw = (
        spark.read.parquet(path + "/documents.parquet")
        .selectExpr("doc_id", f"{norm} AS s")
        .selectExpr("doc_id", f"{h} AS h")
        .selectExpr("doc_id", f"array_distinct({mins}) AS mins")
        .collect()
    )
    fps = {r["doc_id"]: r["winnow_fp"] for r in df.collect()}
    return fps, {r["doc_id"]: set(r["mins"]) for r in raw}


def test_shared_substring_shares_hash(spark, tmp_path):
    shared = "the quick brown fox jumps over the lazy dog"
    t0 = "AAAA " + shared + " BBBB"
    t1 = "CCCCCC " + shared + " DDDD"
    t2 = "totally unrelated content zzz qqq www eee rrr ttt yyy"
    fps, mins = _mins(spark, tmp_path, [t0, t1, t2])
    assert len(shared) >= WINNOW_K + WINNOW_W - 1
    # SWA guarantee: the shared run yields at least one common min-hash
    assert mins[0] & mins[1]
    # distinct docs get distinct fingerprints
    assert len({fps[0], fps[1], fps[2]}) == 3


def test_local_edit_preserves_distant_windows(spark, tmp_path):
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    edited = base.replace("delta", "dxlta")
    fps, mins = _mins(spark, tmp_path, [base, edited])
    assert fps[0] != fps[1]
    # windows far from the edit keep their mins -> large overlap remains
    inter = mins[0] & mins[1]
    assert len(inter) >= max(len(mins[0]), len(mins[1])) // 2


def test_short_doc_stable(spark, tmp_path):
    fps, _ = _mins(spark, tmp_path, ["ab", "ab", "cd"])
    assert fps[0] == fps[1] != fps[2]


def test_flat_kernel_matches_per_doc_reference(spark, tmp_path):
    """r7 flat-batch winnow kernel vs the per-doc numpy reference
    (winnow_min_hashes) — identical min sets for empty, shorter-than-K,
    exactly-K, and long docs, including gap isolation between docs."""
    import hashlib

    from ferret_spark.pipeline import winnow_min_hashes
    import re

    texts = [
        "",
        " ",
        "ab",
        "abcdefg",          # K-1 chars
        "abcdefgh",         # exactly K
        "abcdefghi",        # K+1
        "abcdefghijk",      # K+W-1
        "the quick brown fox jumps over the lazy dog",
        "Mixed   WS\tand\nCASE here",
        "zzzz yyyy xxxx wwww vvvv uuuu",
    ]
    rows = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    path = str(tmp_path / "docs2")
    spark.createDataFrame(rows).write.parquet(path + "/documents.parquet")
    got = {
        r["doc_id"]: r["winnow_fp"]
        for r in fingerprint_winnow(spark, path).collect()
    }
    ws = re.compile(r"\s+")
    for i, t in enumerate(texts):
        norm = ws.sub(" ", t.lower()).strip()
        want = hashlib.md5(
            ",".join(str(x) for x in winnow_min_hashes(norm)).encode()
        ).hexdigest()
        assert got[i] == want, (i, norm)
