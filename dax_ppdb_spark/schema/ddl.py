"""Dataset DDL builder: the four PPDB namespaces in the Spark catalog.

Reference: ``bigquery/schema/dataset_builder.py:195-538`` — four
datasets (staging / internal / promotion / public) built from the Felis
schema, each with its own shape:

- **staging**: the three DIA tables plus a required
  ``apdb_replica_chunk`` column (``:202-218``) and the raw ``updates``
  table (``:221-229``);
- **internal**: DIA tables plus the computed ``geo_point`` column,
  clustered on it (``:240-265``), search index on ``diaObjectId``;
- **promotion**: empty workspace (``:308-315``);
- **public**: DiaObject materialized *without* ``validityEndMjdTai``
  (a view filtering NULL would re-scan; ``:321-349``), DiaSource /
  DiaForcedSource as column-explicit views over internal (``:284-300``).

Spark mapping: datasets -> catalog databases, clustering -> declared
sort/partition metadata (applied at write time by ``Promoter``: range
partition + in-file sort on ``geo_point``), search index -> no direct
analog (parquet row-group min/max stats on the sorted column serve the
same pruning role).
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql.types import LongType, StructField, StructType

from .felis import FelisSchema
from .registry import CHUNK_COLUMN, UPDATES_RAW

DIA_TABLES = ("DiaObject", "DiaSource", "DiaForcedSource")
DATASET_TYPES = ("staging", "internal", "promotion", "public")


def _with_field(struct: StructType, field: StructField) -> StructType:
    return StructType([*struct.fields, field])


def _without_field(struct: StructType, name: str) -> StructType:
    if not any(f.name == name for f in struct.fields):
        raise ValueError(f"expected column {name} not found")
    return StructType([f for f in struct.fields if f.name != name])


class DatasetBuilder:
    """Create the four-namespace catalog layout from a Felis schema."""

    def __init__(self, spark: SparkSession, schema: FelisSchema, prefix: str = "ppdb") -> None:
        self.spark = spark
        self.schema = schema
        self.prefix = prefix

    def database(self, dataset: str) -> str:
        return f"{self.prefix}_{dataset}"

    def build_all(
        self,
        metadata_path: str | None = None,
        configure_authorized_views: bool = False,
    ) -> None:
        for ds in DATASET_TYPES:
            self.spark.sql(f"CREATE DATABASE IF NOT EXISTS `{self.database(ds)}`")
        self._build_staging()
        self._build_internal()
        self._build_public()
        if configure_authorized_views:
            self.configure_authorized_views()
        if metadata_path is not None:
            # Creation-time version bookkeeping (_ppdb_sql_base.py:263-265).
            from .. import __version__ as code_version
            from ..metadata import Metadata

            Metadata(self.spark, metadata_path).set_versions(
                self.schema.version or "unknown", code_version
            )

    def _create_table(self, db: str, name: str, struct: StructType) -> None:
        cols = ", ".join(
            f"`{f.name}` {f.dataType.simpleString()}"
            + ("" if f.nullable else " NOT NULL")
            for f in struct.fields
        )
        self.spark.sql(f"CREATE TABLE IF NOT EXISTS `{db}`.`{name}` ({cols}) USING parquet")

    def _build_staging(self) -> None:
        db = self.database("staging")
        chunk_field = StructField(CHUNK_COLUMN, LongType(), False)
        for t in DIA_TABLES:
            self._create_table(db, t, _with_field(self.schema.struct(t), chunk_field))
        self._create_table(db, "updates", UPDATES_RAW)

    def _build_internal(self) -> None:
        db = self.database("internal")
        geo_field = StructField("geo_point", LongType(), True)
        for t in DIA_TABLES:
            self._create_table(db, t, _with_field(self.schema.struct(t), geo_field))

    def _build_public(self) -> None:
        db = self.database("public")
        internal = self.database("internal")
        dia_object = _with_field(
            _with_field(
                _without_field(self.schema.struct("DiaObject"), "validityEndMjdTai"),
                StructField("geo_point", LongType(), True),
            ),
            # Coarse partition key: see Promoter._create_public_snapshot_full.
            StructField("geo_cell", LongType(), True),
        )
        self._create_table(db, "DiaObject", dia_object)
        for t in ("DiaSource", "DiaForcedSource"):
            cols = ", ".join(f"`{f.name}`" for f in self.schema.struct(t).fields)
            self.spark.sql(
                f"CREATE OR REPLACE VIEW `{db}`.`{t}` AS "
                f"SELECT {cols} FROM `{internal}`.`{t}`"
            )

    def authorized_views(self) -> list[str]:
        """Current ``authorized_views`` grant entries on the internal
        database (empty if never configured)."""
        import re

        rows = self.spark.sql(
            f"DESCRIBE DATABASE EXTENDED `{self.database('internal')}`"
        ).collect()
        props = next(
            (r.info_value for r in rows if r.info_name == "Properties"), ""
        )
        m = re.search(r"\(authorized_views,([^)]*)\)", props)
        return [v for v in (m.group(1).split(";") if m else []) if v]

    def configure_authorized_views(self) -> list[str]:
        """Authorized-view analog: record, on the INTERNAL database,
        which public views are granted to read through it.

        Vanilla Spark has no IAM, so the grant surface is database
        properties that a deployment's ACL layer (Ranger / catalog
        grants) consumes; the bookkeeping mirrors the reference
        (``dataset_builder.py:540-587``): managed entries (this tool's
        public views) are replaced, any entries some other tool added
        are preserved.
        """
        public = self.database("public")
        managed = [f"{public}.{t}" for t in ("DiaSource", "DiaForcedSource")]
        retained = [
            e for e in self.authorized_views() if not e.startswith(public + ".")
        ]
        entries = retained + managed
        joined = ";".join(entries)
        self.spark.sql(
            f"ALTER DATABASE `{self.database('internal')}` "
            f"SET DBPROPERTIES ('authorized_views'='{joined}')"
        )
        return entries

    def drop_all(self) -> None:
        for ds in DATASET_TYPES:
            self.spark.sql(f"DROP DATABASE IF EXISTS `{self.database(ds)}` CASCADE")
