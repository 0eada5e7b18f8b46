"""Structured Streaming ingestion -> incremental index maintenance.

The reference has no streaming surface; its closest analog is incremental
``add_document`` + background geometric merging (SURVEY §2.5) — i.e. LSM
maintenance. Spark-first mapping: a streaming source feeds
``foreachBatch``; every micro-batch becomes a fresh set of doc-range
segments via FerretIndex.add_documents (global stats refreshed per batch),
and an optional merge policy compacts once enough batches accumulate
(iw_maybe_merge_segments analog, c/src/index.c:6280-6309).

Exactly-once notes: foreachBatch + the manifest give at-least-once adds;
re-adding a batch after a checkpoint replay would duplicate ids, so the
sink records the last committed batch_id in the index manifest and skips
replays (idempotent per batch_id).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ferret_spark.ind import FerretIndex


def streaming_dedup_filter(
    stream_df: DataFrame, text_col: str = "text", order_col: str | None = None
) -> DataFrame:
    """Streaming EXACT-dedup over an unbounded document stream — the
    custom stateful operator the training-pipeline brief asks for,
    built on applyInPandasWithState: state is keyed by an 8-bit prefix
    of the content sha (bounded key cardinality -> bounded state
    partitions), each key's state holds the set of full hashes seen so
    far, and only first-seen documents are emitted. The prefix width is
    a pure sharding choice — dedup compares FULL hashes inside the
    bucket, so the emitted rows are identical at any width; 2 hex chars
    (256 groups) keeps every state partition busy while avoiding the
    ~50k per-group Python invocations a 4-char prefix cost per batch
    (guide §4: the per-group constant dominates when groups outnumber
    rows-per-group). Exactly the shape a
    100 TB dedup-on-ingest needs: per-key state is the only thing that
    grows, and it shards across executors with the state store.

    ``order_col`` makes the WITHIN-batch survivor deterministic (the
    batch's rows sort by it before first-wins dedup — e.g. min doc_id);
    without it the survivor is arrival order, which depends on shuffle
    read order. Cross-batch the earlier batch always wins (state)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    hashed = stream_df.withColumn(
        "_sha", F.sha2(F.col(text_col).cast("string"), 256)
    ).withColumn("_bucket", F.substring("_sha", 1, 2))

    out_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in hashed.schema.fields
        if f.name != "_bucket"
    )
    state_schema = "seen array<string>"

    def dedup(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        pdf = pd.concat(list(pdfs), ignore_index=True)
        if order_col is not None:
            pdf = pdf.sort_values(order_col, kind="stable")
        kept = pdf[~pdf["_sha"].isin(seen)]
        # within-batch duplicates: keep first occurrence (in order_col
        # order when given, else arrival order)
        kept = kept[~kept["_sha"].duplicated()]
        seen.update(kept["_sha"].tolist())
        state.update((list(seen),))
        if len(kept):
            yield kept.drop(columns=["_bucket"])

    return hashed.groupBy("_bucket").applyInPandasWithState(
        dedup,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class StreamingIndexSink:
    def __init__(
        self,
        spark: SparkSession,
        index_path: str,
        field_config: dict[str, str],
        id_cols=None,
        seg_size: int = 4096,
        optimize_every: int | None = None,
    ):
        self.spark = spark
        self.index = FerretIndex(
            spark, index_path, field_config, seg_size=seg_size
        )
        self.id_cols = id_cols
        self.optimize_every = optimize_every
        self._state_path = os.path.join(index_path, "stream_state.json")

    def _last_batch(self) -> int:
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return json.load(f)["last_batch_id"]
        return -1

    def _commit_batch(self, batch_id: int, n_batches: int):
        with open(self._state_path, "w") as f:
            json.dump({"last_batch_id": batch_id, "n_batches": n_batches}, f)

    def process_batch(self, batch_df: DataFrame, batch_id: int):
        if batch_id <= self._last_batch():
            return  # checkpoint replay — already committed (idempotence)
        if batch_df.isEmpty():
            return
        self.index.add_documents(batch_df, id_cols=self.id_cols)
        n_batches = 1
        if os.path.exists(self._state_path):
            with open(self._state_path) as f:
                n_batches = json.load(f).get("n_batches", 0) + 1
        self._commit_batch(batch_id, n_batches)
        if self.optimize_every and n_batches % self.optimize_every == 0:
            self.index.optimize()

    def start(self, stream_df: DataFrame, checkpoint: str, **trigger_kw):
        """Attach to a streaming DataFrame. Defaults to availableNow (drain
        the source then stop) — pass e.g. processingTime='30 seconds' for a
        continuous run."""
        if not trigger_kw:
            trigger_kw = {"availableNow": True}
        return (
            stream_df.writeStream.foreachBatch(self.process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(**trigger_kw)
            .start()
        )


def windowed_event_counts(
    events: DataFrame,
    window_dur: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Event-time tumbling-window aggregation (count + exact value sum)
    per event_type — the late-data-tolerant rollup of a streaming
    pipeline. On a STREAMING DataFrame the event-time watermark bounds
    state (windows finalize once the watermark passes window end and
    late rows beyond it drop); the same plan runs in batch for backfill,
    where the watermark is a no-op. Sums aggregate as DECIMAL(18, 2) so
    the result is independent of partial-aggregation order (bit-equal
    between engines), then cast to double."""
    src = events.withWatermark("ts", watermark)
    return (
        src.groupBy(
            F.window(F.col("ts"), window_dur).alias("w"),
            "event_type",
        )
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)"))
            .cast("double")
            .alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )
