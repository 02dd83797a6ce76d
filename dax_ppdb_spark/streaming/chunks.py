"""Structured-Streaming-native variants of the replication loop.

The reference's "streaming" is a polling micro-batch loop
(``replicator.py:193-247``); its Spark-native shape is a file-source
stream over the chunk landing area with ``foreachBatch`` +
``Trigger.AvailableNow`` — the checkpoint log replaces the hand-rolled
ledger diff for at-least-once file pickup, and the ledger remains the
idempotency/commit layer (SURVEY §2.9).

``windowed_event_counts`` covers the watermark/windowed-aggregation
surface for late event-time data — the streaming analog of the
reference's wait-based chunk hold-back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StructType


def stream_chunks(
    spark: SparkSession,
    source_path: str,
    schema: StructType,
    checkpoint: str,
    process_batch,
    max_files_per_trigger: int = 64,
) -> None:
    """Process newly landed chunk files exactly once per restart cycle.

    ``process_batch(df, batch_id)`` receives each micro-batch;
    ``Trigger.AvailableNow`` drains everything currently available and
    stops — the driver loop (cron, scheduler) provides the polling
    cadence, exactly like the reference's ``check_interval``.
    ``max_files_per_trigger`` sets the micro-batch granularity (the
    file source batches in modification-time order); 1 makes each
    landed file its own batch — the deterministic-replay shape the
    batch-twin oracle query uses.
    """
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(source_path)
    )
    query = (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def session_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    watermark_delay: str = "15 minutes",
    group_cols: tuple[str, ...] = ("user_id",),
) -> DataFrame:
    """Gap-based session aggregation via Spark's native
    ``session_window`` — the streaming sibling of the batch
    ``sessionize`` query (lag + cumsum windows): a session closes when
    ``gap`` passes with no event, and on a stream the watermark decides
    when a session can no longer grow and its state is emitted/evicted.
    Works on batch DataFrames too (same operator, no state).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return df.groupBy(
        F.session_window(F.col(ts_col), gap).alias("session"), *group_cols
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
    )


def dedup_events_within_watermark(
    events: DataFrame,
    key_cols: tuple[str, ...] = ("event_id",),
    ts_col: str = "ts",
    watermark_delay: str = "15 minutes",
) -> DataFrame:
    """Streaming exactly-once-per-key dedup with bounded state.

    At-least-once sources (the reference's retried chunk copies,
    ``chunk_uploader.py`` retry path) deliver duplicates; this keeps
    the first occurrence of each key and drops re-deliveries arriving
    within ``watermark_delay`` of the watermark.  Spark's
    ``dropDuplicatesWithinWatermark`` expires each key's state once
    the watermark passes it — state stays O(keys per delay window),
    never O(stream) like a plain ``dropDuplicates`` on a stream would
    be.  On a batch DataFrame it degrades to exact dedup on the keys
    (first-in-batch semantics differ only on exact-duplicate rows),
    preserving batch/stream parity for tests.
    """
    if events.isStreaming:
        return events.withWatermark(ts_col, watermark_delay).dropDuplicatesWithinWatermark(
            list(key_cols)
        )
    return events.dropDuplicates(list(key_cols))


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    window_duration: str = "10 minutes",
    watermark_delay: str = "15 minutes",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Watermarked tumbling-window counts over an event-time stream.

    Late rows within ``watermark_delay`` update their window; older
    ones are dropped — the declarative version of the reference's
    min/max-wait chunk gating.  Works on both batch and streaming
    DataFrames (Spark unifies the operator).
    """
    df = events
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark_delay)
    return df.groupBy(
        F.window(F.col(ts_col), window_duration).alias("win"), *group_cols
    ).agg(F.count(F.lit(1)).alias("n_events"))


def stream_curated(
    spark: SparkSession,
    source_path: str,
    schema: StructType,
    checkpoint: str,
    state_root: str,
    sink_path: str,
    max_files_per_trigger: int = 64,
    **curate_kw,
) -> None:
    """Streaming corpus curation: file-source micro-batches through
    :func:`~..llm.curate.curate_batch` (standing dedup state under
    ``state_root``) into a per-batch-partitioned parquet sink —
    exactly-once END TO END despite the sink and the curation state
    committing separately:

    - ``curate_batch`` is idempotent under redelivery (same output
      rows, state appends keyed by doc_id), so replaying a micro-batch
      after a crash between the two commits recomputes the identical
      survivor set;
    - the sink write is a DYNAMIC partition overwrite keyed by
      ``batch_id`` — a replay overwrites its own partition with the
      same rows and touches nothing else.

    Keep rule across batches is first-seen-wins (arrival order); with
    id-ascending batches this is exactly the one-shot min-id chain
    (tests/test_curate_incremental.py).
    """
    from ..llm.curate import curate_batch

    def _process(df: DataFrame, batch_id: int) -> None:
        out = curate_batch(spark, df, state_root, **curate_kw)
        (
            out.withColumn("__batch", F.lit(int(batch_id)))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch")
            .parquet(sink_path)
        )

    stream_chunks(
        spark, source_path, schema, checkpoint, _process,
        max_files_per_trigger=max_files_per_trigger,
    )
