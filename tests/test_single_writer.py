"""Single-writer protocol: a stale-version meta commit raises instead of
silently dropping a concurrent writer's generations (the reference
serializes writers with a mutex + store lock, c/src/index.c:6337; see
SCALE.md 'Writer concurrency')."""

import json
import os

import pytest

from ferret_spark.ind import ConcurrentWriterError, FerretIndex


def _mk_index(spark, tmp_path):
    rows = [(i, f"alpha beta doc number {i}") for i in range(8)]
    df = spark.createDataFrame(rows, "doc_id long, content string")
    idx = FerretIndex(
        spark, str(tmp_path / "idx"), {"content": "whitespace"}, seg_size=4
    )
    idx.add_documents(df, doc_id_col="doc_id")
    return idx


def test_stale_meta_write_raises(spark, tmp_path):
    idx = _mk_index(spark, tmp_path)
    meta = idx._meta()
    # a second writer commits while this one holds its snapshot
    interloper = dict(meta)
    idx._write_meta(interloper)
    with pytest.raises(ConcurrentWriterError):
        idx._write_meta(meta)
    # the interloper's commit is intact, not clobbered
    assert idx._meta()["version"] == interloper["version"]


def test_interleaved_mutation_raises_not_corrupts(spark, tmp_path):
    idx = _mk_index(spark, tmp_path)
    h2 = FerretIndex(spark, idx.path)
    # h2 commits between h1's final meta read and its write: hook h1's
    # commit point so the interleave is deterministic
    real_write = type(idx)._write_meta
    fired = {}

    def hooked(self, meta):
        if not fired:
            fired["x"] = True
            m2 = h2._meta()
            m2["interloper"] = True
            real_write(h2, m2)
        return real_write(self, meta)

    idx._write_meta = hooked.__get__(idx)
    df = idx.spark.createDataFrame(
        [(100, "gamma delta")], "doc_id long, content string"
    )
    with pytest.raises(ConcurrentWriterError):
        idx.add_documents(df, doc_id_col="doc_id")
    # index still loads and h2's committed state survives
    h3 = FerretIndex(spark, idx.path)
    assert h3.size() > 0
    assert h3._meta().get("interloper") is True


def test_meta_write_is_atomic(spark, tmp_path):
    idx = _mk_index(spark, tmp_path)
    # no .tmp residue and meta parses after a normal commit
    meta = idx._meta()
    idx._write_meta(meta)
    assert not os.path.exists(os.path.join(idx.path, "meta.json.tmp"))
    json.load(open(os.path.join(idx.path, "meta.json")))
