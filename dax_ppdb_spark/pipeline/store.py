"""Chunk store: the ``Ppdb.store`` analog (ingest one replica chunk).

Reference: the BigQuery export path (``bigquery/ppdb_bigquery.py:
403-488``) — per-table parquet + updates + manifest written to a chunk
staging area, then a ledger row inserted *last* with status EXPORTED.

D1 (multi-table transactional store) is relaxed exactly the way the
reference's own BigQuery backend relaxes it: data writes are
idempotent per chunk id (a re-run overwrites the same chunk partition)
and the ledger insert is the commit point — a crash before it leaves
invisible, harmlessly re-writable data (SURVEY §7.4).
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.parquet_io import write_manifest, write_parquet
from ..ledger import Ledger
from ..schema.registry import CHUNK_COLUMN

# Exported columns exclude the sub-chunk id (bigquery/ppdb_bigquery.py:444).
EXPORT_EXCLUDE = ("apdb_replica_subchunk",)


def store_chunk(
    spark: SparkSession,
    root: str,
    chunk_id: int,
    tables: dict[str, DataFrame],
    updates: DataFrame | None = None,
    ledger: Ledger | None = None,
    unique_id: str | None = None,
    compression: str = "snappy",
) -> str:
    """Export one chunk's tables + updates + manifest, then commit to ledger.

    Returns the chunk staging directory.  Empty chunk (no rows in any
    table, no updates) is recorded as SKIPPED, mirroring
    ``bigquery/ppdb_bigquery.py:403-427``.
    """
    from pyspark.sql import Observation

    chunk_dir = os.path.join(root, f"chunk_{chunk_id}")
    total = 0
    update_count = 0
    for name, df in tables.items():
        tagged = df.withColumn(CHUNK_COLUMN, F.lit(chunk_id))
        path = os.path.join(chunk_dir, name)
        # Row count via an Observation riding the write job itself —
        # no recompute of the input lineage AND no footer-count job
        # per table (at one store call per chunk those extra jobs were
        # a measurable slice of the store phase).
        obs = Observation(f"store_{name}_{chunk_id}")
        write_parquet(
            tagged.observe(obs, F.count(F.lit(1)).alias("rows")),
            path,
            exclude=EXPORT_EXCLUDE,
            compression=compression,
        )
        total += int(obs.get["rows"])
    if updates is not None:
        upath = os.path.join(chunk_dir, "updates")
        uobs = Observation(f"store_updates_{chunk_id}")
        write_parquet(
            updates.withColumn(CHUNK_COLUMN, F.lit(chunk_id)).observe(
                uobs, F.count(F.lit(1)).alias("rows")
            ),
            upath,
            compression=compression,
        )
        update_count = int(uobs.get["rows"])
        if not update_count:
            shutil.rmtree(upath, ignore_errors=True)
        total += update_count
    write_manifest(chunk_dir, chunk_id, extra={"tables": sorted(tables)})
    if ledger is not None:
        from ..schema.registry import ChunkStatus

        row = {
            "apdb_replica_chunk": chunk_id,
            "status": ChunkStatus.EXPORTED if total else ChunkStatus.SKIPPED,
            "update_count": update_count,
        }
        if unique_id:
            row["unique_id"] = unique_id
        ledger.insert_chunks([row])
    return chunk_dir
