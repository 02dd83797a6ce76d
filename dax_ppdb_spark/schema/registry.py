"""StructType registry for the PPDB data model.

The reference declares schemas externally in Felis YAML
(``resources/config/schemas/test_apdb_schema.yaml``) and maps types
three ways (Felis->Arrow at ``_arrow.py:31-41``, Felis->BigQuery at
``bigquery/schema/felis_converter.py:50-64``, SQLAlchemy->PGCOPY at
``sql/pg_dump.py:250-264``).  Here the single source of truth is Spark
``StructType``; the type lattice is the same: long->LongType,
int->IntegerType, short->ShortType, double/float, boolean, string,
binary, timestamp.  Science times are MJD-TAI doubles end-to-end
(SURVEY §1.3) — only ledger timestamps are TimestampType.

Key schemas (reference ``test_apdb_schema.yaml``):
- DiaObject: PK (diaObjectId, validityStartMjdTai), SCD-2 versioned,
  validityEndMjdTai NULL == current version.
- DiaSource: PK diaSourceId; diaObjectId XOR ssObjectId nullable FKs;
  timeWithdrawnMjdTai is the soft-delete marker.
- DiaForcedSource: composite PK (diaObjectId, visit, detector).
- PpdbReplicaChunk ledger: ``sql/_ppdb_sql_base.py:460-497`` plus the
  BigQuery status extension ``bigquery/ppdb_bigquery.py:352-397``.
- updates (raw) / expanded_updates:
  ``bigquery/schema/dataset_builder.py:221-229``,
  ``bigquery/updates/expanded_updates_table.py:109-118``.
"""

from __future__ import annotations

from enum import Enum

from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)


class ChunkStatus(str, Enum):
    """Replica-chunk state machine.

    Reference: ``bigquery/ppdb_replica_chunk_extended.py:42-56``
    (EXPORTED -> UPLOADED -> STAGED -> PROMOTED, terminal SKIPPED /
    FAILED).
    """

    EXPORTED = "EXPORTED"
    UPLOADED = "UPLOADED"
    STAGED = "STAGED"
    PROMOTED = "PROMOTED"
    SKIPPED = "SKIPPED"
    FAILED = "FAILED"


def _f(name: str, dtype, nullable: bool = True) -> StructField:
    return StructField(name, dtype, nullable)


DIA_OBJECT = StructType(
    [
        _f("diaObjectId", LongType(), False),
        _f("validityStartMjdTai", DoubleType(), False),
        _f("validityEndMjdTai", DoubleType(), True),
        _f("ra", DoubleType(), False),
        _f("dec", DoubleType(), False),
        _f("parallax", FloatType(), True),
        _f("nDiaSources", IntegerType(), False),
        _f("firstDiaSourceMjdTai", DoubleType(), True),
    ]
)

DIA_SOURCE = StructType(
    [
        _f("diaSourceId", LongType(), False),
        _f("visit", LongType(), False),
        _f("detector", ShortType(), False),
        _f("diaObjectId", LongType(), True),
        _f("ssObjectId", LongType(), True),
        _f("parentDiaSourceId", LongType(), True),
        _f("ra", DoubleType(), False),
        _f("dec", DoubleType(), False),
        _f("ssObjectReassocTimeMjdTai", DoubleType(), True),
        _f("midpointMjdTai", DoubleType(), False),
        _f("centroid_flag", BooleanType(), True),
        _f("timeProcessedMjdTai", DoubleType(), False),
        _f("timeWithdrawnMjdTai", DoubleType(), True),
    ]
)

DIA_FORCED_SOURCE = StructType(
    [
        _f("diaObjectId", LongType(), False),
        _f("visit", LongType(), False),
        _f("detector", ShortType(), False),
        _f("ra", DoubleType(), False),
        _f("dec", DoubleType(), False),
        _f("midpointMjdTai", DoubleType(), False),
        _f("flags", LongType(), False),
        _f("timeWithdrawnMjdTai", DoubleType(), True),
    ]
)

PPDB_REPLICA_CHUNK = StructType(
    [
        _f("apdb_replica_chunk", LongType(), False),
        _f("last_update_time", TimestampType(), False),
        _f("unique_id", StringType(), False),
        _f("replica_time", TimestampType(), False),
        _f("status", StringType(), True),
        _f("gcs_uri", StringType(), True),
        _f("update_count", LongType(), True),
    ]
)

# Raw retroactive-update events, one JSON payload per event.
# Reference: bigquery/schema/dataset_builder.py:221-229 and
# bigquery/updates/update_records.py:51-58.
UPDATES_RAW = StructType(
    [
        _f("apdb_replica_chunk", LongType(), False),
        _f("update_time_ns", LongType(), False),
        _f("update_order", LongType(), False),
        _f("update_type", StringType(), False),
        _f("json_payload", StringType(), False),
    ]
)

# One row per (record, field) patch, exploded from UPDATES_RAW.
# Reference: bigquery/updates/expanded_updates_table.py:109-118.
EXPANDED_UPDATES = StructType(
    [
        _f("apdb_replica_chunk", LongType(), False),
        _f("table_name", StringType(), False),
        _f("record_id", ArrayType(LongType()), False),
        _f("record_key", StringType(), False),
        _f("field_name", StringType(), False),
        _f("value_json", StringType(), True),
        _f("update_order", LongType(), False),
        _f("update_time_ns", LongType(), False),
    ]
)

# Staging copies of the three DIA tables carry the chunk id column
# (reference: dataset_builder.py:202-218).
CHUNK_COLUMN = "apdb_replica_chunk"

# DiaObject validity-interval column names, per schema generation.
# Pre-rename APDB schemas (before DM-52215) use TIMESTAMP-typed
# validityStart/validityEnd; newer schemas use MJD-TAI doubles.  The
# reference sniffs the DiaObject columns to pick the set
# (``sql/_ppdb_sql.py:86-90`` at connect time, ``:456-471`` at schema
# read, ``:189-195`` per store) — mirror that, never hardcode.
VALIDITY_MJD_TAI = ("validityStartMjdTai", "validityEndMjdTai")
VALIDITY_LEGACY = ("validityStart", "validityEnd")


def validity_columns(dia_object_columns) -> tuple[str, str]:
    """(start, end) validity column names for a DiaObject relation.

    Accepts any iterable of column names (``df.columns``, a
    ``StructType``'s ``fieldNames()``).  MJD-TAI names win when
    present; otherwise the legacy timestamp names — the same
    presence-sniff the reference runs (``sql/_ppdb_sql.py:86-90``).
    A user replicating a pre-rename APDB hits this on day one.
    """
    cols = set(dia_object_columns)
    if VALIDITY_MJD_TAI[0] in cols:
        return VALIDITY_MJD_TAI
    return VALIDITY_LEGACY


# The pre-rename DiaObject shape (timestamp validity interval), for
# pipelines replicating a legacy APDB.
DIA_OBJECT_LEGACY = StructType(
    [
        _f("diaObjectId", LongType(), False),
        _f("validityStart", TimestampType(), False),
        _f("validityEnd", TimestampType(), True),
        _f("ra", DoubleType(), False),
        _f("dec", DoubleType(), False),
        _f("parallax", FloatType(), True),
        _f("nDiaSources", IntegerType(), False),
    ]
)
