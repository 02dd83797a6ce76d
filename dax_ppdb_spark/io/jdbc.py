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
import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from ..pipeline.replicate import SourceChunk

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# A password provider is any zero-arg callable returning the secret —
# the reference's pluggable ``PasswordProvider.get_password()``
# (sql/_ppdb_sql_base.py:53-70) reduced to its one method.  It is
# invoked lazily at connection-property build time, never stored, so
# rotating secrets managers are re-read per read/write and the secret
# lives only inside Spark's JDBC options (which Spark's default
# ``spark.redaction.regex`` masks in plans/UI/logs; pinned by
# tests/test_jdbc.py::test_password_redacted_in_plan).
PasswordProvider = Callable[[], str]


def env_password_provider(var: str) -> PasswordProvider:
    """Provider reading the secret from an environment variable at
    connection time (the reference ships the same convenience for its
    CLI; raises KeyError when unset rather than sending '')."""

    def get_password() -> str:
        return os.environ[var]

    return get_password


def _connection_properties(
    driver: str | None,
    properties: dict | None,
    password_provider: PasswordProvider | None,
) -> dict:
    """Merge driver name, caller properties (user/password/ssl/...)
    and a lazily-invoked password provider into ``spark.read.jdbc``
    connection properties.

    Mirrors the reference's injection contract
    (sql/_ppdb_sql_base.py:183-207): a provider may only be used when
    the properties do not already carry a password — two sources of
    truth for a secret is a misconfiguration, not a merge.
    """
    props = dict(properties or {})
    if driver:
        props.setdefault("driver", driver)
    if password_provider is not None:
        if "password" in props:
            raise ValueError(
                "connection properties must not contain a password when "
                "password_provider is used"
            )
        props["password"] = password_provider()
    return props


def read_jdbc_chunks(
    spark: SparkSession,
    url: str,
    table: str,
    chunk_ids: list[int],
    chunk_col: str = "apdb_replica_chunk",
    driver: str | None = None,
    properties: dict | None = None,
    password_provider: PasswordProvider | None = None,
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
    props = _connection_properties(driver, properties, password_provider)
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
    properties: dict | None = None,
    password_provider: PasswordProvider | None = None,
) -> None:
    """Multi-row JDBC sink (S7's database twin): executors write
    batched INSERTs over per-partition connections."""
    props = _connection_properties(driver, properties, password_provider)
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
        properties: dict | None = None,
        password_provider: PasswordProvider | None = None,
    ) -> None:
        """``properties`` carries JDBC connection options (user, ssl,
        ...); ``password_provider`` is the reference's pluggable
        credential hook (sql/_ppdb_sql_base.py:53-70) — invoked per
        connection-property build, never stored or logged."""
        self.spark = spark
        self.url = url
        self.chunk_table = chunk_table
        self.chunk_col = chunk_col
        self.driver = driver
        self.properties = dict(properties or {})
        self.password_provider = password_provider
        # Fail fast on the two-sources-of-truth misconfiguration
        # instead of at first read.
        _connection_properties(driver, self.properties, password_provider)

    def _props(self) -> dict:
        return _connection_properties(
            self.driver, self.properties, self.password_provider
        )

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
            self.spark,
            self.url,
            table,
            chunk_ids,
            self.chunk_col,
            self.driver,
            properties=self.properties,
            password_provider=self.password_provider,
        )
