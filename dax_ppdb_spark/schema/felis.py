"""Felis-YAML schema loader: external table declarations -> StructType.

Reference: schemas are declared in Felis YAML
(``resources/config/schemas/test_apdb_schema.yaml``) and converted per
backend — Felis->Arrow (``_arrow.py:31-41``), Felis->BigQuery
(``bigquery/schema/felis_converter.py:50-64``, nullability -> mode at
``:176-190``), with unsupported datatypes raising
(``felis_converter.py:155-158``).  This is the Spark leg of that type
lattice: one ``StructType`` per table, preserving nullability, plus the
primary-key and index metadata the DDL builder consumes
(``bigquery/schema/dataset_builder.py:409-538``).

Felis ``timestamp`` maps to ``TimestampType`` (UTC, microseconds);
science times in the LSST schemas are MJD-TAI ``double`` columns so no
conversion logic is needed (SURVEY §1.3).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
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

__all__ = ["FelisSchemaError", "FelisTable", "FelisSchema", "load_schema", "spark_type"]

# Felis datatype -> Spark type. Mirrors felis_converter.py:50-64 but
# keeps the narrower integer/float widths Spark supports natively
# (BigQuery widens byte/short/int to INT64; Parquet + Spark do not
# need to).
_TYPE_MAP: dict[str, DataType] = {
    "boolean": BooleanType(),
    "byte": ByteType(),
    "short": ShortType(),
    "int": IntegerType(),
    "long": LongType(),
    "float": FloatType(),
    "double": DoubleType(),
    "char": StringType(),
    "string": StringType(),
    "unicode": StringType(),
    "text": StringType(),
    "binary": BinaryType(),
    "timestamp": TimestampType(),
}


class FelisSchemaError(ValueError):
    """Unsupported or malformed Felis declaration."""


def spark_type(felis_datatype: str) -> DataType:
    try:
        return _TYPE_MAP[felis_datatype]
    except KeyError:
        raise FelisSchemaError(f"Unsupported Felis type {felis_datatype!r}") from None


def _ref_to_column(ref: str) -> str:
    # "#Table.column" -> "column"
    return ref.split(".")[-1].lstrip("#")


@dataclass(frozen=True)
class FelisTable:
    name: str
    struct: StructType
    primary_key: tuple[str, ...] = ()
    indexes: tuple[tuple[str, ...], ...] = ()
    description: str | None = None


@dataclass(frozen=True)
class FelisSchema:
    name: str
    version: str | None
    tables: dict[str, FelisTable] = field(default_factory=dict)

    def struct(self, table: str) -> StructType:
        try:
            return self.tables[table].struct
        except KeyError:
            raise FelisSchemaError(f"No such table {table!r}") from None


def _parse_table(t: dict) -> FelisTable:
    fields = []
    for c in t.get("columns", ()):
        if "name" not in c or "datatype" not in c:
            raise FelisSchemaError(f"column missing name/datatype in table {t.get('name')}")
        fields.append(
            StructField(c["name"], spark_type(c["datatype"]), bool(c.get("nullable", True)))
        )
    pk = t.get("primaryKey", ())
    if isinstance(pk, str):
        pk = (pk,)
    indexes = tuple(
        tuple(_ref_to_column(col) for col in ix.get("columns", ()))
        for ix in t.get("indexes", ())
    )
    return FelisTable(
        name=t["name"],
        struct=StructType(fields),
        primary_key=tuple(_ref_to_column(p) for p in pk),
        indexes=indexes,
        description=t.get("description"),
    )


def load_schema(source: str | dict) -> FelisSchema:
    """Load a Felis schema from a YAML file path or a parsed dict."""
    if isinstance(source, str):
        import yaml

        with open(source) as f:
            data = yaml.safe_load(f)
    else:
        data = source
    if not isinstance(data, dict) or "tables" not in data:
        raise FelisSchemaError("not a Felis schema: missing 'tables'")
    tables = {t["name"]: _parse_table(t) for t in data["tables"]}
    return FelisSchema(
        name=data.get("name", ""), version=data.get("version"), tables=tables
    )
