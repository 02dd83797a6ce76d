"""Replica-chunk ledger: the replication commit log + state machine.

Reference: ``PpdbReplicaChunk`` table (``sql/_ppdb_sql_base.py:460-497``)
with the BigQuery status extension (``bigquery/ppdb_bigquery.py:352-397``,
state machine ``ppdb_replica_chunk_extended.py:42-56``).  Operators:
S2/S3 filtered+ordered scans, S4 existence probe, D5 whitelisted
status update, D6 duplicate-checked insert, O3 contiguous-STAGED-run
selection, and the replication watermark gate (§2.9).

The ledger is tiny (one row per ~10-minute chunk — a few thousand rows
per year) so it always broadcasts; correctness, not throughput, is the
concern here.  All mutations go through ``ParquetTable.overwrite``
(atomic pointer swap) keyed off a full read-modify-write of the small
table — the Spark analog of the reference's single-row transactions.
"""

from __future__ import annotations

import datetime
import uuid as uuid_mod
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .io.table import ParquetTable
from .schema.registry import PPDB_REPLICA_CHUNK, ChunkStatus

# D5 field whitelist (bigquery/ppdb_bigquery.py:70-75).
UPDATABLE_FIELDS = frozenset({"status", "gcs_uri"})


class Ledger:
    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.table = ParquetTable(path)

    # -- reads --------------------------------------------------------------

    def read(self) -> DataFrame:
        if not self.table.exists():
            return self.spark.createDataFrame([], PPDB_REPLICA_CHUNK)
        return self.table.read(self.spark)

    def query_chunks(
        self,
        *where: Column,
        start_chunk_id: int | None = None,
        order_by: str = "last_update_time",
    ) -> DataFrame:
        """S2/S3: conjunctive-predicate scan, ordered.

        Reference: sql/_ppdb_sql.py:97-125, bigquery/ppdb_bigquery.py:501-544.
        """
        df = self.read()
        if start_chunk_id is not None:
            df = df.filter(F.col("apdb_replica_chunk") >= start_chunk_id)
        for cond in where:
            df = df.filter(cond)
        return df.orderBy(order_by, "apdb_replica_chunk")

    def exists(self, chunk_id: int) -> bool:
        """S4: existence probe (sql/_ppdb_sql.py:143-149)."""
        return bool(
            self.read().filter(F.col("apdb_replica_chunk") == chunk_id).limit(1).count()
        )

    def promotable_chunks(self) -> list[int]:
        """O3: longest prefix of STAGED chunks in increasing id order.

        Reference: bigquery/ppdb_bigquery.py:546-576 — stop at the
        first chunk (among non-terminal ones) that is not yet STAGED.
        """
        rows = (
            self.read()
            .filter(~F.col("status").isin(ChunkStatus.SKIPPED, ChunkStatus.PROMOTED))
            .orderBy("apdb_replica_chunk")
            .select("apdb_replica_chunk", "status")
            .collect()
        )
        out: list[int] = []
        for r in rows:
            if r.status != ChunkStatus.STAGED:
                break
            out.append(r.apdb_replica_chunk)
        return out

    # -- writes -------------------------------------------------------------

    def insert_chunks(self, rows: Iterable[dict]) -> None:
        """D6: batch insert; duplicate chunk ids raise (IntegrityError analog)."""
        new = self.spark.createDataFrame(
            [self._complete_row(r) for r in rows], PPDB_REPLICA_CHUNK
        )
        existing = self.read()
        dupes = [
            r.apdb_replica_chunk
            for r in new.join(existing, "apdb_replica_chunk", "left_semi")
            .select("apdb_replica_chunk")
            .collect()
        ]
        if dupes:
            raise ValueError(f"duplicate replica chunk ids: {sorted(dupes)}")
        self.table.overwrite(existing.unionByName(new))

    def upsert_chunk(self, row: dict) -> None:
        """D2: re-replication upsert (sql/_ppdb_sql.py:175-179)."""
        new = self.spark.createDataFrame([self._complete_row(row)], PPDB_REPLICA_CHUNK)
        existing = self.read().filter(
            F.col("apdb_replica_chunk") != row["apdb_replica_chunk"]
        )
        self.table.overwrite(existing.unionByName(new))

    def update_chunk(self, chunk_id: int, **fields) -> None:
        """D5: whitelisted field update; LookupError when the row is absent.

        Reference: bigquery/ppdb_bigquery.py:620-657.
        """
        bad = set(fields) - UPDATABLE_FIELDS
        if bad:
            raise ValueError(f"fields not updatable: {sorted(bad)}")
        if not self.exists(chunk_id):
            raise LookupError(f"no such replica chunk: {chunk_id}")
        df = self.read()
        for name, value in fields.items():
            df = df.withColumn(
                name,
                F.when(
                    F.col("apdb_replica_chunk") == chunk_id,
                    F.lit(value.value if isinstance(value, ChunkStatus) else value),
                ).otherwise(F.col(name)),
            )
        self.table.overwrite(df)

    @staticmethod
    def _complete_row(r: dict) -> dict:
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        out = {
            "last_update_time": now,
            "unique_id": str(uuid_mod.uuid4()),
            "replica_time": now,
            "status": ChunkStatus.EXPORTED.value,
            "gcs_uri": None,
            "update_count": 0,
        }
        out.update(r)
        if isinstance(out.get("status"), ChunkStatus):
            out["status"] = out["status"].value
        return out


def can_replicate(
    chunk_time: datetime.datetime,
    now: datetime.datetime,
    has_newer: bool,
    min_wait_s: float = 300.0,
    max_wait_s: float = 900.0,
) -> bool:
    """§2.9 watermark gate: a chunk is copied once its age exceeds
    ``min_wait`` when newer chunks exist (the bucket can no longer
    grow), else ``max_wait``.

    Reference: replicator.py:130-163, defaults cli/options.py:106-125.
    """
    age = (now - chunk_time).total_seconds()
    return age >= (min_wait_s if has_newer else max_wait_s)


def replication_diff(apdb_chunks: DataFrame, ppdb_chunks: DataFrame) -> DataFrame:
    """J5/O2: chunks present in APDB but not yet replicated, in id order.

    Reference: replicator.py:106-110 (Python set difference + sort).
    """
    return (
        apdb_chunks.join(
            F.broadcast(ppdb_chunks.select("apdb_replica_chunk")),
            "apdb_replica_chunk",
            "left_anti",
        )
        .orderBy("apdb_replica_chunk")
    )


def consistency_mismatches(apdb_chunks: DataFrame, ppdb_chunks: DataFrame) -> DataFrame:
    """J6: replicated chunks whose unique_id differs between sides.

    Reference: replicator.py:230-240.
    """
    a = apdb_chunks.select("apdb_replica_chunk", F.col("unique_id").alias("apdb_uid"))
    p = ppdb_chunks.select("apdb_replica_chunk", F.col("unique_id").alias("ppdb_uid"))
    return a.join(p, "apdb_replica_chunk").filter(F.col("apdb_uid") != F.col("ppdb_uid"))
