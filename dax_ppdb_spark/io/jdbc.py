"""JDBC APDB source: replicate out of a LIVE relational APDB.

The reference's replication loop pulls chunk data straight from the
APDB database — ``ApdbReplica.getReplicaChunks()`` lists pending
chunks and ``Apdb.getTableDataChunks(table, [chunk_id])`` fetches one
chunk's rows per table (``replicator.py:165-181``,
``_replicate_one``).  This module is the Spark-native twin: the chunk
CATALOG is a small single-partition JDBC read collected to the
driver, while chunk DATA reads fan out as one JDBC partition PER
CHUNK — each Spark task opens its own connection and ships its
chunk-id predicate into the remote WHERE clause, so a 1000-executor
cluster pulls 1000 chunks concurrently and the database only ever
scans the requested slices (predicate pushdown is pinned by
``tests/test_jdbc.py``).

Works against any server with a JDBC driver jar on the Spark
classpath; tests run against embedded Apache Derby (shipped with
Spark for the Hive metastore), exercising the REAL
``spark.read.jdbc`` path end to end.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.replicate import SourceChunk

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"


def read_jdbc_chunks(
    spark: SparkSession,
    url: str,
    table: str,
    chunk_ids: list[int],
    chunk_col: str = "apdb_replica_chunk",
    driver: str | None = None,
) -> DataFrame:
    """S1 source side: ``getTableDataChunks`` as a partitioned JDBC
    read — one partition (one connection, one pushed-down WHERE) per
    requested chunk id.

    The ``predicates`` list is Spark's contract for user-defined JDBC
    partitioning: partition i runs ``SELECT ... WHERE {chunk_col} =
    id_i`` on the server, so parallelism equals the chunk count and
    no task ever scans another task's slice.  At scale this is the
    difference between "the database serializes one giant scan" and
    "N executors each stream one chunk".
    """
    if not chunk_ids:
        raise ValueError("read_jdbc_chunks needs at least one chunk id")
    props = {"driver": driver} if driver else {}
    # ANSI-quoted column: servers with case-folding identifier rules
    # (Derby/Postgres fold unquoted names) must resolve the exact
    # column Spark's writer created.
    preds = [f'"{chunk_col}" = {int(c)}' for c in sorted(set(chunk_ids))]
    return spark.read.jdbc(url, table, predicates=preds, properties=props)


def write_jdbc_table(
    df: DataFrame,
    url: str,
    table: str,
    driver: str | None = None,
    mode: str = "append",
) -> None:
    """Multi-row JDBC sink (S7's database twin): executors write
    batched INSERTs over per-partition connections."""
    props = {"driver": driver} if driver else {}
    df.write.jdbc(url, table, mode=mode, properties=props)


class JdbcApdbSource:
    """APDB source over JDBC, drop-in for the ``Replicator``'s source
    protocol (``list_chunks``) plus per-table chunk-data reads.

    Mirrors the reference split between ``ApdbReplica`` (chunk
    catalog; ``replicator.py:83-117``) and ``Apdb.getTableDataChunks``
    (per-table data; ``replicator.py:165-181``):

    - ``chunk_table`` holds (apdb_replica_chunk BIGINT, unique_id
      VARCHAR, created_at DOUBLE epoch-seconds) — the catalog is
      bounded (one row per chunk), read single-partition and collected
      like every other ledger-scale listing in this engine.
    - ``get_table_data_chunks(table, ids)`` returns the distributed
      per-chunk partitioned read of :func:`read_jdbc_chunks`.
    """

    def __init__(
        self,
        spark: SparkSession,
        url: str,
        chunk_table: str = "apdb_replica_chunks",
        chunk_col: str = "apdb_replica_chunk",
        driver: str | None = None,
    ) -> None:
        self.spark = spark
        self.url = url
        self.chunk_table = chunk_table
        self.chunk_col = chunk_col
        self.driver = driver

    def _props(self) -> dict:
        return {"driver": self.driver} if self.driver else {}

    def list_chunks(self) -> list[SourceChunk]:
        """Pending-chunk catalog in strictly increasing id order (the
        ordering contract the Replicator's watermark cut relies on)."""
        rows = (
            self.spark.read.jdbc(self.url, self.chunk_table, properties=self._props())
            .collect()
        )
        out = [
            SourceChunk(
                chunk_id=int(r[self.chunk_col]),
                unique_id=str(r["unique_id"] or ""),
                last_update_time=datetime.datetime.fromtimestamp(
                    float(r["created_at"]), datetime.timezone.utc
                ).replace(tzinfo=None),
                path=f"{self.url}#{self.chunk_table}/{int(r[self.chunk_col])}",
            )
            for r in rows
        ]
        return sorted(out, key=lambda c: c.chunk_id)

    def get_table_data_chunks(self, table: str, chunk_ids: list[int]) -> DataFrame:
        """One chunk's (or several chunks') rows from a data table,
        one JDBC partition per chunk."""
        return read_jdbc_chunks(
            self.spark, self.url, table, chunk_ids, self.chunk_col, self.driver
        )
