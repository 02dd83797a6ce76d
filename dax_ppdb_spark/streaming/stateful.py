"""Custom stateful streaming operator via ``applyInPandasWithState``.

The reference's replication state machine is driver-side (ledger rows,
``replicator.py``); its streaming-native analog is keyed state inside
the engine: per-key accumulators that survive micro-batches through
the checkpoint.  ``running_event_totals`` is that operator shape —
cumulative per-key counters emitted every batch — the building block
for chunk-completeness tracking (count rows per chunk until the
watermark closes it) and dedup-by-key-with-memory.

Arrow-batched like all our Python paths: state is one tuple per key,
the per-batch rows arrive as pandas DataFrames.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

STATE_SCHEMA = StructType([StructField("n_total", LongType(), False)])
OUTPUT_SCHEMA = StructType(
    [
        StructField("key", StringType(), False),
        StructField("n_batch", LongType(), False),
        StructField("n_total", LongType(), False),
    ]
)


def running_event_totals(events: DataFrame, key_col: str = "event_type") -> DataFrame:
    """Cumulative per-key counts across micro-batches.

    Each batch emits one row per active key with the batch count and
    the all-time total; the total lives in engine state (restored from
    the checkpoint on restart).  Works on a streaming DataFrame; on a
    batch DataFrame Spark runs it as a single "batch" with empty
    initial state, so batch/stream parity holds.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        n_batch = sum(len(pdf) for pdf in pdfs)
        (n_total,) = state.get if state.exists else (0,)
        n_total += n_batch
        state.update((n_total,))
        yield pd.DataFrame(
            {"key": [key[0]], "n_batch": [n_batch], "n_total": [n_total]}
        )

    return events.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


PARA_STATE_SCHEMA = StructType([StructField("seen", LongType(), False)])
PARA_OUTPUT_SCHEMA = StructType(
    [
        StructField("fp", LongType(), False),
        StructField("doc_id", LongType(), False),
        StructField("pos", LongType(), False),
        StructField("para", StringType(), False),
    ]
)


def streaming_paragraph_dedup(paras: DataFrame) -> DataFrame:
    """Keep the FIRST-ARRIVED copy of each distinct paragraph across
    micro-batches — the streaming ingest twin of
    ``llm.dedup.dedup_paragraphs``.

    Production pipelines (Dolma) run this with a Bloom filter: "seen
    before -> drop", arrival-ordered, with false positives deleting
    innocent paragraphs.  Keyed engine state replaces the Bloom
    filter: exact membership, checkpoint-restored across restarts, no
    false positives; the trade is state size (one entry per distinct
    paragraph fingerprint — RocksDB-backed state at corpus scale,
    which is how Structured Streaming dedup state is sized anyway).
    The batch twin elects a deterministic min-id winner instead; this
    one is arrival-order, which is the semantics a streaming corpus
    feed actually has.

    Input rows: ``(fp, doc_id, pos, para)`` — the paragraph explode
    keyed by its 60-bit fingerprint (``text.md5_wide_long``).  Within
    one batch the (doc_id, pos)-least row wins, so a single-batch
    drain is deterministic; across batches, arrival order decides.
    Output: the surviving rows, same shape.
    """

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            # paragraph already admitted in an earlier batch
            for _ in pdfs:
                pass
            return
        first = None
        for pdf in pdfs:
            if not len(pdf):
                continue
            cand = pdf.sort_values(["doc_id", "pos"]).head(1)
            if first is None:
                first = cand
            else:
                both = pd.concat([first, cand])
                first = both.sort_values(["doc_id", "pos"]).head(1)
        if first is None:
            return
        state.update((1,))
        yield first[["fp", "doc_id", "pos", "para"]]

    return paras.groupBy("fp").applyInPandasWithState(
        update,
        outputStructType=PARA_OUTPUT_SCHEMA,
        stateStructType=PARA_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
