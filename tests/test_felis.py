"""Felis schema loading + dataset DDL.

Mirrors the reference's ``tests/test_felis_converter.py:31-119`` (type
mapping, nullability modes, unsupported-type errors) and
``tests/test_dataset_builder.py`` (staging chunk column, internal
geo_point, public DiaObject without validityEndMjdTai, public views).
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    TimestampType,
)

from dax_ppdb_spark.schema.ddl import DatasetBuilder
from dax_ppdb_spark.schema.felis import FelisSchemaError, load_schema, spark_type

SAMPLE = {
    "name": "TestSchema",
    "version": "1.0.0",
    "tables": [
        {
            "name": "DiaObject",
            "description": "objects",
            "primaryKey": ["#DiaObject.diaObjectId", "#DiaObject.validityStartMjdTai"],
            "columns": [
                {"name": "diaObjectId", "datatype": "long", "nullable": False},
                {"name": "validityStartMjdTai", "datatype": "double", "nullable": False},
                {"name": "validityEndMjdTai", "datatype": "double", "nullable": True},
                {"name": "ra", "datatype": "double", "nullable": False},
                {"name": "dec", "datatype": "double", "nullable": False},
            ],
            "indexes": [{"name": "idx", "columns": ["#DiaObject.ra"]}],
        },
        {
            "name": "DiaSource",
            "columns": [
                {"name": "diaSourceId", "datatype": "long", "nullable": False},
                {"name": "diaObjectId", "datatype": "long"},
                {"name": "flags", "datatype": "string"},
                {"name": "processed", "datatype": "timestamp"},
            ],
        },
        {
            "name": "DiaForcedSource",
            "columns": [
                {"name": "diaObjectId", "datatype": "long", "nullable": False},
                {"name": "visit", "datatype": "long", "nullable": False},
                {"name": "detector", "datatype": "short", "nullable": False},
            ],
        },
    ],
}


def test_type_mapping():
    assert spark_type("long") == LongType()
    assert spark_type("double") == DoubleType()
    for s in ("char", "string", "unicode", "text"):
        assert spark_type(s) == StringType()
    assert spark_type("timestamp") == TimestampType()
    with pytest.raises(FelisSchemaError, match="Unsupported"):
        spark_type("geography")


def test_load_schema_struct_and_keys():
    schema = load_schema(SAMPLE)
    assert schema.name == "TestSchema" and schema.version == "1.0.0"
    obj = schema.tables["DiaObject"]
    assert obj.primary_key == ("diaObjectId", "validityStartMjdTai")
    assert obj.indexes == (("ra",),)
    s = obj.struct
    assert [f.name for f in s.fields][:3] == [
        "diaObjectId", "validityStartMjdTai", "validityEndMjdTai",
    ]
    assert not s["diaObjectId"].nullable
    assert s["validityEndMjdTai"].nullable
    # nullable defaults to True when unspecified
    assert schema.tables["DiaSource"].struct["diaObjectId"].nullable
    with pytest.raises(FelisSchemaError, match="No such table"):
        schema.struct("Nope")


def test_load_schema_yaml_roundtrip(tmp_path):
    import yaml

    p = str(tmp_path / "schema.yaml")
    with open(p, "w") as f:
        yaml.safe_dump(SAMPLE, f)
    schema = load_schema(p)
    assert set(schema.tables) == {"DiaObject", "DiaSource", "DiaForcedSource"}


def test_load_reference_schema_if_present():
    """Parity check against the reference's own Felis file (data, not code)."""
    ref = (
        "/root/reference/python/lsst/dax/ppdb/resources/config/schemas/"
        "test_apdb_schema.yaml"
    )
    if not os.path.exists(ref):
        pytest.skip("reference schema not available")
    schema = load_schema(ref)
    obj = schema.tables["DiaObject"]
    assert obj.struct["diaObjectId"].dataType == LongType()
    assert not obj.struct["diaObjectId"].nullable
    assert obj.struct["validityEndMjdTai"].nullable
    assert {"DiaSource", "DiaForcedSource"} <= set(schema.tables)


def test_dataset_builder_creates_namespaces(spark, tmp_path):
    builder = DatasetBuilder(spark, load_schema(SAMPLE), prefix="t_ppdb")
    try:
        builder.build_all()
        dbs = {d.name for d in spark.catalog.listDatabases()}
        assert {f"t_ppdb_{x}" for x in ("staging", "internal", "promotion", "public")} <= dbs
        staging_cols = [f.name for f in spark.table("t_ppdb_staging.DiaObject").schema]
        assert "apdb_replica_chunk" in staging_cols
        assert "apdb_replica_chunk" in [
            f.name for f in spark.table("t_ppdb_staging.updates").schema
        ]
        internal_cols = [f.name for f in spark.table("t_ppdb_internal.DiaObject").schema]
        assert "geo_point" in internal_cols
        public_cols = [f.name for f in spark.table("t_ppdb_public.DiaObject").schema]
        assert "validityEndMjdTai" not in public_cols
        assert "geo_point" in public_cols and "geo_cell" in public_cols
        # public DiaSource is a view over internal
        spark.sql(
            "INSERT INTO t_ppdb_internal.DiaSource "
            "VALUES (1, 10, 'f', TIMESTAMP '2026-01-01 00:00:00', NULL)"
        )
        assert spark.table("t_ppdb_public.DiaSource").count() == 1
    finally:
        builder.drop_all()


def test_build_all_records_versions(spark, tmp_path):
    from dax_ppdb_spark.metadata import Metadata

    builder = DatasetBuilder(spark, load_schema(SAMPLE), prefix="t_meta")
    try:
        builder.build_all(metadata_path=str(tmp_path / "metadata"))
        m = Metadata(spark, str(tmp_path / "metadata"))
        assert m.get("version:schema") == "1.0.0"
        assert m.get("version:code")
    finally:
        builder.drop_all()


def test_authorized_views_configured_and_preserved(spark):
    """Grant bookkeeping mirrors dataset_builder.py:540-587: managed
    public-view entries are (re)written on the internal database,
    entries from other tools are preserved."""
    builder = DatasetBuilder(spark, load_schema(SAMPLE), prefix="t_av")
    try:
        builder.build_all(configure_authorized_views=True)
        assert builder.authorized_views() == [
            "t_av_public.DiaSource",
            "t_av_public.DiaForcedSource",
        ]
        # another tool adds its own grant + a stale managed-looking one
        spark.sql(
            "ALTER DATABASE t_av_internal SET DBPROPERTIES ('authorized_views'="
            "'other_db.custom_view;t_av_public.Old')"
        )
        entries = builder.configure_authorized_views()
        assert entries == [
            "other_db.custom_view",
            "t_av_public.DiaSource",
            "t_av_public.DiaForcedSource",
        ]
    finally:
        builder.drop_all()
