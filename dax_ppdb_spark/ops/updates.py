"""Retroactive-update pipeline: expand -> dedup -> pivot -> merge.

Reference flow (SURVEY §2.10, §3.3):
- raw update events (one JSON payload each) are exploded into one row
  per updated field (``bigquery/updates/expanded_update_record.py:82-113``),
- deduped last-writer-wins on ``(table_name, record_key, field_name)``
  by ``(apdb_replica_chunk, update_time_ns, update_order) DESC``
  (``bigquery/updates/expanded_updates_table.py:185-201``),
- pivoted into one patch row per record with ``<field>_value`` +
  ``<field>_present`` columns (``merge_diaobject_updates.sql:3-25``),
- merged into the target tables
  (``bigquery/updates/updates_merger.py:51-83``).

The six concrete record types and their patch semantics come from the
SQL backend's dispatcher (``sql/_ppdb_sql.py:291-448``):

=============================== =============== ========================
update_type                     target table    patched fields
=============================== =============== ========================
close_diaobject_validity        DiaObject       validityEndMjdTai,
                                                nDiaSources (optional)
update_ndiasources              DiaObject       nDiaSources
reassign_diasource_to_diaobject DiaSource       diaObjectId
reassign_diasource_to_ssobject  DiaSource       ssObjectId,
                                                ssObjectReassocTimeMjdTai,
                                                diaObjectId := NULL
withdraw_diasource              DiaSource       timeWithdrawnMjdTai
withdraw_diaforcedsource        DiaForcedSource timeWithdrawnMjdTai
                                                (key diaObjectId,visit,
                                                detector)
=============================== =============== ========================

Everything below is built-in-function only (no Python UDFs): JSON
parse, higher-order array ops, window, conditional aggregation, and a
broadcast merge — the whole pipeline stays in whole-stage codegen and
shuffles once per stage on its natural key.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .latest import latest_only
from .merge import merge_patch


@dataclass(frozen=True)
class UpdateSpec:
    table_name: str
    id_fields: tuple[str, ...]
    # (field_name, always_emit): always_emit=True emits the field even
    # when absent from the payload (used for forced NULLs and required
    # fields); otherwise the field row is emitted only when present.
    fields: tuple[tuple[str, bool], ...]


TYPE_SPECS: dict[str, UpdateSpec] = {
    "close_diaobject_validity": UpdateSpec(
        "DiaObject", ("diaObjectId",), (("validityEndMjdTai", True), ("nDiaSources", False))
    ),
    "update_ndiasources": UpdateSpec("DiaObject", ("diaObjectId",), (("nDiaSources", True),)),
    "reassign_diasource_to_diaobject": UpdateSpec(
        "DiaSource", ("diaSourceId",), (("diaObjectId", True),)
    ),
    # Reassigning to an SSObject clears the object association
    # (sql/_ppdb_sql.py:401-410: ``diaObjectId=None``) — emitted as an
    # always-present field row with a NULL value.
    "reassign_diasource_to_ssobject": UpdateSpec(
        "DiaSource",
        ("diaSourceId",),
        (("ssObjectId", True), ("ssObjectReassocTimeMjdTai", True), ("diaObjectId", True)),
    ),
    "withdraw_diasource": UpdateSpec(
        "DiaSource", ("diaSourceId",), (("timeWithdrawnMjdTai", True),)
    ),
    "withdraw_diaforcedsource": UpdateSpec(
        "DiaForcedSource",
        ("diaObjectId", "visit", "detector"),
        (("timeWithdrawnMjdTai", True),),
    ),
}

# Per-table patch layout used by the merge step: target key columns
# (from record_id positions) and field -> Spark cast type.
TABLE_PATCHES: dict[str, tuple[tuple[str, ...], dict[str, str]]] = {
    "DiaObject": (
        ("diaObjectId",),
        {"validityEndMjdTai": "double", "nDiaSources": "int"},
    ),
    "DiaSource": (
        ("diaSourceId",),
        {
            "diaObjectId": "long",
            "ssObjectId": "long",
            "ssObjectReassocTimeMjdTai": "double",
            "timeWithdrawnMjdTai": "double",
        },
    ),
    "DiaForcedSource": (
        ("diaObjectId", "visit", "detector"),
        {"timeWithdrawnMjdTai": "double"},
    ),
}


def expand_updates(raw: DataFrame) -> DataFrame:
    """Explode raw update events into field-level patch rows.

    ``raw`` has the UPDATES_RAW schema (chunk, time_ns, order,
    update_type, json_payload).  Output has the EXPANDED_UPDATES
    schema; one input row yields one row per patched field.
    """
    m = F.from_json(F.col("json_payload"), "map<string,string>")
    per_type = []
    for utype, spec in TYPE_SPECS.items():
        src = raw.filter(F.col("update_type") == utype).withColumn("__m", m)
        record_id = F.array(
            *[F.element_at(F.col("__m"), f).cast("long") for f in spec.id_fields]
        )
        field_structs = []
        for fname, always in spec.fields:
            keep = F.lit(True) if always else F.map_contains_key(F.col("__m"), fname)
            field_structs.append(
                F.struct(
                    F.lit(fname).alias("field_name"),
                    F.element_at(F.col("__m"), fname).alias("value_json"),
                    keep.alias("__keep"),
                )
            )
        fields = F.filter(F.array(*field_structs), lambda s: s["__keep"])
        exploded = src.select(
            "apdb_replica_chunk",
            F.lit(spec.table_name).alias("table_name"),
            record_id.alias("record_id"),
            F.concat_ws("-", *[F.element_at(F.col("__m"), f) for f in spec.id_fields]).alias(
                "record_key"
            ),
            F.explode(fields).alias("__f"),
            "update_order",
            "update_time_ns",
        ).select(
            "apdb_replica_chunk",
            "table_name",
            "record_id",
            "record_key",
            F.col("__f.field_name").alias("field_name"),
            F.col("__f.value_json").alias("value_json"),
            "update_order",
            "update_time_ns",
        )
        per_type.append(exploded)
    out = per_type[0]
    for df in per_type[1:]:
        out = out.unionByName(df)
    return out


def latest_updates(expanded: DataFrame) -> DataFrame:
    """W3: keep only the newest patch per (table, record, field)."""
    return latest_only(
        expanded,
        ["table_name", "record_key", "field_name"],
        ["apdb_replica_chunk", "update_time_ns", "update_order"],
    )


def build_patch(latest: DataFrame, table_name: str) -> DataFrame:
    """A1: pivot field-level rows into one patch row per record.

    Output: key columns + ``<field>`` (typed value) +
    ``<field>__present`` per patchable field — the shape consumed by
    ``ops.merge.merge_patch``.  MAX replaces the reference's ANY_VALUE
    (each (record, field) is unique after ``latest_updates``, so the
    value is identical; MAX is deterministic).
    """
    key_cols, fields = TABLE_PATCHES[table_name]
    src = latest.filter(
        (F.col("table_name") == table_name) & F.col("field_name").isin(*fields.keys())
    )
    keys = [
        F.element_at(F.col("record_id"), i + 1).alias(k) for i, k in enumerate(key_cols)
    ]
    aggs = []
    for fname, ftype in fields.items():
        cond = F.col("field_name") == fname
        aggs.append(F.max(F.when(cond, F.col("value_json"))).cast(ftype).alias(fname))
        aggs.append((F.count(F.when(cond, F.lit(1))) > 0).alias(f"{fname}__present"))
    return src.groupBy(*keys).agg(*aggs)


def table_patch(latest: DataFrame, table_name: str) -> DataFrame:
    """The merge-ready patch for one table, with the reference's
    special case applied: a present-but-NULL ``nDiaSources`` keeps the
    target value (``merge_diaobject_updates.sql:32``), reproduced here
    by clearing the present flag."""
    patch = build_patch(latest, table_name)
    if table_name == "DiaObject":
        patch = patch.withColumn(
            "nDiaSources__present",
            F.col("nDiaSources__present") & F.col("nDiaSources").isNotNull(),
        )
    return patch


def apply_update_patches(targets: dict[str, DataFrame], latest: DataFrame) -> dict[str, DataFrame]:
    """J2/J3: merge the latest patches into each target table.

    Returns new snapshots for the tables that have patches; untouched
    tables pass through unchanged.  NULL patch values overwrite only
    via their ``__present`` flag (see :func:`table_patch`).
    """
    out = dict(targets)
    for table_name, (key_cols, _fields) in TABLE_PATCHES.items():
        if table_name not in targets:
            continue
        out[table_name] = merge_patch(
            targets[table_name], table_patch(latest, table_name), key_cols
        )
    return out


def validate_update_targets(
    target: DataFrame, patch_keys: DataFrame, key_cols: tuple[str, ...]
) -> DataFrame:
    """D4 rowcount==1 semantics: every patch key must exist in the target.

    Returns the missing keys (empty when valid); callers raise on
    non-empty, mirroring ``sql/_ppdb_sql.py:312-314,387-389``.
    Distributed form: broadcast anti-join, no driver collect.
    """
    return F.broadcast(patch_keys.select(*key_cols).distinct()).join(
        target.select(*key_cols).distinct(), list(key_cols), "left_anti"
    )


def assert_update_targets(
    target: DataFrame,
    patch_keys: DataFrame,
    key_cols: tuple[str, ...],
    sample: int = 10,
) -> None:
    """Hard-error form of :func:`validate_update_targets`: raise if any
    patch key has no target row, echoing the reference's ``rowcount !=
    1`` ValueError (``sql/_ppdb_sql.py:347-350``).  The error message
    carries up to ``sample`` offending keys; the check itself is one
    distributed anti-join + ``take`` — never a full collect.
    """
    missing = validate_update_targets(target, patch_keys, key_cols).take(sample + 1)
    if missing:
        shown = ", ".join(str(tuple(r)) for r in missing[:sample])
        more = " (and more)" if len(missing) > sample else ""
        raise ValueError(
            f"update targets missing for keys {key_cols}: {shown}{more}"
        )
