"""Streaming ingestion: micro-batches -> incremental segments, replay
idempotence, search correctness over the accumulated index."""

import pytest

from ferret_spark.query import TermQuery
from ferret_spark.streaming import StreamingIndexSink


@pytest.fixture()
def staged_source(spark, tmp_path):
    """Two parquet files staged into a source dir -> two micro-batches
    (maxFilesPerTrigger=1)."""
    src = tmp_path / "stream_src"
    src.mkdir()
    rows1 = [
        {"repo": "r1", "path": "a.py", "commit": "c1", "content": "alpha beta"},
        {"repo": "r1", "path": "b.py", "commit": "c2", "content": "beta gamma"},
    ]
    rows2 = [
        {"repo": "r2", "path": "c.py", "commit": "c3", "content": "gamma delta"},
        {"repo": "r2", "path": "d.py", "commit": "c4", "content": "alpha delta"},
    ]
    spark.createDataFrame(rows1).coalesce(1).write.parquet(str(src / "f1"))
    spark.createDataFrame(rows2).coalesce(1).write.parquet(str(src / "f2"))
    return src


def test_stream_ingest_and_search(spark, tmp_path, staged_source):
    schema = "repo string, path string, commit string, content string"
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .option("recursiveFileLookup", "true")
        .parquet(str(staged_source))
    )
    sink = StreamingIndexSink(
        spark,
        str(tmp_path / "sidx"),
        {"content": "whitespace"},
        id_cols=("repo", "path", "commit"),
        seg_size=2,
    )
    q = sink.start(stream, checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    assert sink.index.size() == 4
    hits = {
        r["doc_id"]
        for r in sink.index.search(
            TermQuery(field="content", term="alpha"), k=None
        ).collect()
    }
    assert len(hits) == 2
    # global df accumulated across batches
    dfs = sink.index.index.doc_freqs(
        [("content", "alpha"), ("content", "gamma")]
    )
    assert dfs[("content", "alpha")] == 2
    assert dfs[("content", "gamma")] == 2


def test_batch_replay_is_idempotent(spark, tmp_path, staged_source):
    sink = StreamingIndexSink(
        spark,
        str(tmp_path / "sidx2"),
        {"content": "whitespace"},
        id_cols=("repo", "path", "commit"),
        seg_size=2,
    )
    batch = spark.createDataFrame(
        [{"repo": "r", "path": "p", "commit": "c", "content": "solo doc"}]
    )
    sink.process_batch(batch, 0)
    assert sink.index.size() == 1
    sink.process_batch(batch, 0)  # replayed batch id -> skipped
    assert sink.index.size() == 1
    sink.process_batch(batch, 1)  # genuinely new batch -> added
    assert sink.index.size() == 2


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState exact-dedup: duplicates across AND within
    micro-batches are dropped; state persists between batches."""
    import pandas as pd

    from ferret_spark.streaming import streaming_dedup_filter

    src_dir = tmp_path / "stream_src"
    src_dir.mkdir()
    out_dir = str(tmp_path / "stream_out")
    ckpt = str(tmp_path / "ckpt")

    # batch 1: one in-batch duplicate
    spark.createDataFrame(
        [(0, "alpha beta"), (1, "gamma delta"), (2, "alpha beta")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(src_dir / "b1"))

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src_dir / "*"))
    )
    dedup = streaming_dedup_filter(stream, "text")
    q = (
        dedup.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # batch 2: cross-batch duplicate of doc 0 plus one new doc
    spark.createDataFrame(
        [(3, "alpha beta"), (4, "epsilon zeta")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(src_dir / "b2"))
    q = (
        streaming_dedup_filter(stream, "text")
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    got = {
        (r["doc_id"], r["text"])
        for r in spark.read.parquet(out_dir).collect()
    }
    kept_ids = {d for d, _ in got}
    # exactly one doc per distinct text survives
    assert {t for _, t in got} == {"alpha beta", "gamma delta", "epsilon zeta"}
    assert len(got) == 3
    assert 4 in kept_ids and 1 in kept_ids


def test_windowed_event_counts_streaming_watermark(spark, tmp_path):
    """windowed_event_counts through a real readStream: append-mode output
    only FINALIZES windows once the watermark (20 min past max event time)
    passes window end, and a late row arriving in a later run is dropped
    against the checkpointed watermark — the late-data semantics the batch
    backfill (pp_event_windows) shares its plan with."""
    import datetime as dt

    from ferret_spark.streaming import windowed_event_counts

    src = tmp_path / "ev_src"
    src.mkdir()
    ckpt = str(tmp_path / "ev_ckpt")
    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)

    def rows(specs):
        return [
            {"ts": t0 + dt.timedelta(minutes=m), "event_type": e, "value": v}
            for m, e, v in specs
        ]

    schema = "ts timestamp, event_type string, value double"

    def run(qname):
        stream = (
            spark.readStream.schema(schema)
            .option("recursiveFileLookup", "true")
            .parquet(str(src))
        )
        agg = windowed_event_counts(stream, "10 minutes", "20 minutes")
        emitted = []

        def sink(batch_df, _bid):
            emitted.extend(batch_df.collect())

        q = (
            agg.writeStream.foreachBatch(sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r["window_start"].minute, r["event_type"]): (
                r["n"], round(r["sum_value"], 2),
            )
            for r in emitted
        }

    # run 1: two clicks in [00:00, 00:10) plus an event at 00:55 that
    # advances the watermark to 00:35 -> the click window finalizes
    spark.createDataFrame(
        rows([(1, "click", 1.0), (4, "click", 2.0), (55, "view", 5.0)]),
        schema,
    ).coalesce(1).write.parquet(str(src / "f1"))
    got1 = run("evwin1")
    assert got1[(0, "click")] == (2, 3.0)

    # run 2 (same checkpoint): a LATE click at 00:02 — behind the
    # persisted 00:35 watermark — must be dropped, never re-emitting or
    # altering the finalized [00:00, 00:10) window
    spark.createDataFrame(
        rows([(2, "click", 100.0), (85, "view", 7.0)]),
        schema,
    ).coalesce(1).write.parquet(str(src / "f2"))
    got2 = run("evwin2")
    assert (0, "click") not in got2
    assert all(v != (1, 100.0) for v in got2.values())
    # the [00:50, 01:00) view window finalizes once the watermark
    # (01:05 = 01:25 - 20min) passes its end
    assert got2.get((50, "view")) == (1, 5.0)
