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
