"""Delta-log export: the promoted-table interop path.

Verifies the emitted ``_delta_log`` against the PUBLIC Delta protocol
semantics by replaying it exactly as an external reader does (apply
add/remove in commit order), then reading the surviving files with a
plain parquet reader and comparing to the table's own view.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F
from pyspark.sql.types import StructType

from dax_ppdb_spark.io.delta_export import delta_live_files, export_delta_log
from dax_ppdb_spark.io.table import ParquetTable


def _df(spark, n0, n1):
    return spark.range(n0, n1).select(
        F.col("id").alias("k"),
        (F.col("id") % 3).alias("chunk"),
        (F.col("id") * 2.0).alias("val"),
    )


def _read_live(spark, root, live):
    # partition columns come from the directory names — the same
    # values a Delta reader reconstructs from each add action's
    # partitionValues; basePath makes Spark's parquet reader keep them
    vdirs = {p.split("/")[0] for p in live}
    assert len(vdirs) == 1, "live files must come from one committed version"
    base = os.path.join(root, vdirs.pop())
    paths = [os.path.join(root, p) for p in live]
    return spark.read.option("basePath", base).parquet(*paths)


def test_export_and_replay_matches_table(spark, tmp_path):
    root = str(tmp_path / "pub")
    t = ParquetTable(root)
    t.overwrite(_df(spark, 0, 30), partition_by=("chunk",))
    commit = export_delta_log(t, spark)
    assert commit == 0
    assert os.path.exists(os.path.join(root, "_delta_log", f"{0:020d}.json"))

    live = delta_live_files(root)
    assert live, "no add actions survived replay"
    # every live path exists and is table-root relative
    for p, add in live.items():
        assert os.path.exists(os.path.join(root, p))
        assert add["partitionValues"].keys() == {"chunk"}
    got = _read_live(spark, root, live)
    assert got.count() == 30
    assert set(got.columns) >= {"k", "val"}

    # metaData carries a parseable Spark schema + partition columns
    with open(os.path.join(root, "_delta_log", f"{0:020d}.json")) as f:
        actions = [json.loads(l) for l in f if l.strip()]
    meta = next(a["metaData"] for a in actions if "metaData" in a)
    schema = StructType.fromJson(json.loads(meta["schemaString"]))
    assert {f.name for f in schema.fields} == {"k", "chunk", "val"}
    assert meta["partitionColumns"] == ["chunk"]
    proto = next(a["protocol"] for a in actions if "protocol" in a)
    assert proto["minReaderVersion"] == 1


def test_second_overwrite_removes_old_files(spark, tmp_path):
    root = str(tmp_path / "pub")
    t = ParquetTable(root)
    t.overwrite(_df(spark, 0, 30), partition_by=("chunk",))
    export_delta_log(t, spark)
    first_live = set(delta_live_files(root))

    t.overwrite(_df(spark, 100, 110), partition_by=("chunk",))
    commit = export_delta_log(t, spark)
    assert commit == 1
    live = delta_live_files(root)
    assert not (set(live) & first_live), "old version files still live"
    assert _read_live(spark, root, live).count() == 10

    # the log recorded explicit removes for every replaced file
    with open(os.path.join(root, "_delta_log", f"{1:020d}.json")) as f:
        actions = [json.loads(l) for l in f if l.strip()]
    removed = {a["remove"]["path"] for a in actions if "remove" in a}
    assert removed == first_live


def test_reexport_is_idempotent(spark, tmp_path):
    root = str(tmp_path / "pub")
    t = ParquetTable(root)
    t.overwrite(_df(spark, 0, 12), partition_by=("chunk",))
    export_delta_log(t, spark)
    live1 = delta_live_files(root)
    export_delta_log(t, spark)  # no pointer flip in between
    live2 = delta_live_files(root)
    assert set(live1) == set(live2)


def test_replace_partitions_export_tracks_slice(spark, tmp_path):
    root = str(tmp_path / "pub")
    t = ParquetTable(root)
    t.overwrite(_df(spark, 0, 30), partition_by=("chunk",))
    export_delta_log(t, spark)
    patch = _df(spark, 0, 30).filter(F.col("chunk") == 1).withColumn(
        "val", F.col("val") + 1000.0
    )
    t.replace_partitions(patch, "chunk", [1])
    export_delta_log(t, spark)
    live = delta_live_files(root)
    got = _read_live(spark, root, live)
    assert got.count() == 30
    assert got.filter((F.col("chunk") == 1) & (F.col("val") >= 1000.0)).count() == 10
    assert got.filter((F.col("chunk") != 1) & (F.col("val") >= 1000.0)).count() == 0
