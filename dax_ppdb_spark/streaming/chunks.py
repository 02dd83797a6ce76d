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


def _await_drain(query, stall_timeout: float) -> bool:
    """Wait for an ``AvailableNow`` drain to terminate, polling so a
    wedged py4j callback can never park the caller forever.  Returns
    True on normal termination, False once no micro-batch has
    committed for ``stall_timeout`` seconds (progress is read from
    ``lastProgress`` — a stalled ``foreachBatch`` stops producing it).
    """
    import time

    last_key, last_t = None, time.monotonic()
    while not query.awaitTermination(5.0):
        p = query.lastProgress
        key = (p["batchId"], p["timestamp"]) if p else None
        if key != last_key:
            last_key, last_t = key, time.monotonic()
        elif time.monotonic() - last_t > stall_timeout:
            return False
    return True


def _reset_callback_server(spark: SparkSession) -> None:
    """Force-recover the py4j callback server after a wedged
    ``foreachBatch`` dispatch.

    Observed failure (twice, once on an otherwise idle box): the JVM
    stream-execution thread parks in ``CallbackClient.sendCommand``
    waiting for the Python ``foreachBatch`` reply while the kernel
    shows the JVM's callback CONNECTION SITTING UNACCEPTED in the
    Python ``CallbackServer``'s listen backlog (ESTAB, Recv-Q > 0, no
    owning fd) — py4j's accept loop has stopped accepting, so the call
    can never be served and the drain never terminates.  Closing the
    server socket directly (lock-free — the graceful ``shutdown()``
    path takes the server lock, which may be party to the wedge) RSTs
    the backlog connection, which surfaces in the JVM as an
    IOException on the blocked read -> the micro-batch fails -> the
    query terminates; a fresh callback server on a new port is then
    installed via the same ``resetCallbackClient`` path PySpark uses
    at startup, and the idempotent re-drain replays only uncommitted
    batches.
    """
    import threading

    from pyspark.java_gateway import ensure_callback_server_started

    gw = spark.sparkContext._gateway
    cbs = gw.__dict__.get("_callback_server")
    if cbs is not None:
        try:
            cbs.server_socket.close()
        except Exception:
            pass
        # Graceful close of any surviving per-connection threads; on a
        # daemon thread with a bounded join because shutdown() takes
        # the server lock that may be part of the original deadlock.
        t = threading.Thread(target=cbs.shutdown, daemon=True)
        t.start()
        t.join(10.0)
        gw._callback_server = None
    ensure_callback_server_started(gw)


def stream_chunks(
    spark: SparkSession,
    source_path: str,
    schema: StructType,
    checkpoint: str,
    process_batch,
    max_files_per_trigger: int = 64,
    stall_timeout: float = 300.0,
    max_restarts: int = 2,
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

    The drain is supervised: if no micro-batch commits for
    ``stall_timeout`` seconds (the observed py4j callback wedge — see
    :func:`_reset_callback_server`), the callback server is recovered
    and the query restarted on the same checkpoint, up to
    ``max_restarts`` times.  Restart safety is the operator's existing
    exactly-once contract: committed batches are never redelivered and
    ``process_batch`` is idempotent under redelivery of the one
    in-flight batch.
    """

    def _start():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(source_path)
        )
        return (
            stream.writeStream.foreachBatch(process_batch)
            .option("checkpointLocation", checkpoint)
            .trigger(availableNow=True)
            .start()
        )

    attempts = max_restarts + 1
    for attempt in range(attempts):
        query = _start()
        try:
            if _await_drain(query, stall_timeout):
                return
        except Exception:
            # The query failed — including the failure injected by the
            # callback-server reset of the PREVIOUS attempt racing this
            # one.  The last attempt propagates; earlier ones re-drain.
            if attempt == attempts - 1:
                raise
        _reset_callback_server(spark)
        try:
            query.stop()
        except Exception:
            pass
        # Two active queries on one checkpoint are rejected — wait for
        # the wedged one to actually terminate (the reset makes its
        # blocked read fail promptly) before restarting.
        import time as _time

        for _ in range(120):
            if not query.isActive:
                break
            _time.sleep(0.5)
    raise RuntimeError(
        f"stream_chunks: drain stalled {attempts}x (no batch progress "
        f"for {stall_timeout}s each); py4j callback recovery did not "
        "unstick it"
    )


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
