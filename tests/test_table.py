"""ParquetTable version/partition plumbing, especially the
touched-partition commit (``replace_partitions``) that keeps promotion
IO O(batch): untouched partitions must be hardlinked (zero bytes
copied), touched ones rewritten, and the swap atomic."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dax_ppdb_spark.io.table import ParquetTable


def _mk(spark, tmp_path, rows):
    t = ParquetTable(str(tmp_path / "t"))
    df = spark.createDataFrame(rows, "k INT, v STRING")
    t.overwrite(df, partition_by=("k",))
    return t


def _content(spark, t):
    return {(r.k, r.v) for r in t.read(spark).collect()}


def test_replace_partitions_rewrites_only_named(spark, tmp_path):
    t = _mk(spark, tmp_path, [(0, "a"), (1, "b"), (2, "c")])
    patch = spark.createDataFrame([(1, "B"), (1, "B2")], "k INT, v STRING")
    t.replace_partitions(patch, "k", [1])
    assert _content(spark, t) == {(0, "a"), (1, "B"), (1, "B2"), (2, "c")}


def test_replace_partitions_untouched_are_hardlinks(spark, tmp_path):
    t = _mk(spark, tmp_path, [(0, "a"), (1, "b")])
    old_dir = t.data_dir()
    old_inodes = {
        f: os.stat(os.path.join(old_dir, "k=0", f)).st_ino
        for f in os.listdir(os.path.join(old_dir, "k=0"))
        if f.endswith(".parquet")
    }
    patch = spark.createDataFrame([(1, "B")], "k INT, v STRING")
    t.replace_partitions(patch, "k", [1])
    new_dir = t.data_dir()
    assert new_dir != old_dir
    new_inodes = {
        f: os.stat(os.path.join(new_dir, "k=0", f)).st_ino
        for f in os.listdir(os.path.join(new_dir, "k=0"))
        if f.endswith(".parquet")
    }
    # same inodes: the untouched partition was linked, not copied
    assert new_inodes == old_inodes


def test_replace_partitions_can_empty_a_partition(spark, tmp_path):
    t = _mk(spark, tmp_path, [(0, "a"), (1, "b")])
    empty = spark.createDataFrame([], "k INT, v STRING")
    t.replace_partitions(empty, "k", [1])
    assert _content(spark, t) == {(0, "a")}
    assert not os.path.exists(os.path.join(t.data_dir(), "k=1"))


def test_replace_partitions_on_missing_table_is_overwrite(spark, tmp_path):
    t = ParquetTable(str(tmp_path / "t"))
    df = spark.createDataFrame([(0, "a")], "k INT, v STRING")
    t.replace_partitions(df, "k", [0])
    assert _content(spark, t) == {(0, "a")}


def test_replace_partitions_filter_prunes_partitions(spark, tmp_path):
    """Reading back with a bucket filter must show PartitionFilters —
    the read half of the touched-partition contract."""
    t = _mk(spark, tmp_path, [(0, "a"), (1, "b"), (2, "c")])
    q = t.read(spark).filter(F.col("k") == 1)
    plan = q._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters" in plan
    assert "k" in plan.split("PartitionFilters", 1)[1].split("\n")[0]


def test_interleaved_promoters_loser_raises(spark, tmp_path):
    """Two promoters racing one table: the writer whose pointer
    snapshot went stale must fail LOUDLY (ConcurrentWriteError), its
    orphan version must be cleaned up, and the winner's commit must
    survive untouched."""
    import pytest

    from dax_ppdb_spark.io.table import ConcurrentWriteError

    t_a = _mk(spark, tmp_path, [(0, "base")])
    t_b = ParquetTable(t_a.path)

    df_a = spark.createDataFrame([(1, "from_a")], "k INT, v STRING")
    df_b = spark.createDataFrame([(2, "from_b")], "k INT, v STRING")

    # Interleave: while A is writing its new version (after snapshotting
    # the pointer), B completes a full overwrite and wins the commit.
    orig_write = ParquetTable._write_version

    def write_with_intruder(self, df, partition_by=()):
        version = orig_write(self, df, partition_by)
        if self is t_a:  # the intruder (t_b) writes un-intruded
            t_b.overwrite(df_b)
        return version

    ParquetTable._write_version = write_with_intruder
    try:
        with pytest.raises(ConcurrentWriteError, match="concurrent promoter"):
            t_a.overwrite(df_a)
    finally:
        ParquetTable._write_version = orig_write

    # B's commit survives; A's orphan version directory was removed.
    assert _content(spark, t_a) == {(2, "from_b")}
    versions = [d for d in os.listdir(t_a.path) if d.startswith("_v")]
    assert versions == [t_a.current_version()]


def test_compact_rewrites_only_fragmented_partitions(spark, tmp_path):
    """Micro-batch appends fragment a partition; compact() must
    rewrite only partitions over the file threshold (hardlinking the
    rest), preserve every row, and leave few files behind."""
    t = ParquetTable(str(tmp_path / "t"))
    base = spark.createDataFrame([(0, "a0"), (1, "b0")], "k INT, v STRING")
    t.overwrite(base.repartition(1), partition_by=("k",))
    # five tiny appends into partition k=1 only
    for i in range(1, 6):
        t.append(
            spark.createDataFrame([(1, f"b{i}")], "k INT, v STRING").repartition(1),
            partition_by=("k",),
        )

    def files_in(part):
        d = os.path.join(t.data_dir(), f"k={part}")
        return [f for f in os.listdir(d) if f.endswith(".parquet")]

    assert len(files_in(1)) == 6 and len(files_in(0)) == 1
    inode_k0 = os.stat(os.path.join(t.data_dir(), "k=0", files_in(0)[0])).st_ino

    compacted = t.compact(spark, "k", max_files_per_partition=4)
    assert compacted == ["1"]
    assert len(files_in(1)) == 1
    # untouched partition carried over as a hardlink (same inode)
    assert os.stat(os.path.join(t.data_dir(), "k=0", files_in(0)[0])).st_ino == inode_k0
    assert _content(spark, t) == {(0, "a0")} | {(1, f"b{i}") for i in range(6)}

    # idempotent: nothing left over the threshold
    assert t.compact(spark, "k", max_files_per_partition=4) == []


def test_version_retention_and_time_travel(spark, tmp_path):
    """keep_versions retains superseded snapshots: versions() lists
    them oldest-first, read_version time-travels, vacuum prunes and
    never touches the current version."""
    from dax_ppdb_spark.io.table import ParquetTable

    t = ParquetTable(str(tmp_path / "t"), keep_versions=2)
    t.overwrite(spark.range(0, 10).withColumnRenamed("id", "k"))
    v1 = t.current_version()
    t.overwrite(spark.range(100, 105).withColumnRenamed("id", "k"))
    v2 = t.current_version()
    t.overwrite(spark.range(200, 203).withColumnRenamed("id", "k"))
    v3 = t.current_version()
    assert t.versions() == [v1, v2, v3]
    assert t.read_version(spark, v1).count() == 10
    assert t.read_version(spark, v2).count() == 5
    # fourth commit: v1 falls outside keep_versions=2
    t.overwrite(spark.range(300, 302).withColumnRenamed("id", "k"))
    assert t.versions() == [v2, v3, t.current_version()]
    import pytest as _pytest

    with _pytest.raises(FileNotFoundError):
        t.read_version(spark, v1)
    # explicit vacuum to zero superseded versions keeps only current
    dropped = t.vacuum(keep=0)
    assert set(dropped) == {v2, v3}
    assert t.read(spark).count() == 2


def test_keep_versions_zero_is_classic_truncate(spark, tmp_path):
    from dax_ppdb_spark.io.table import ParquetTable

    t = ParquetTable(str(tmp_path / "t"))
    t.overwrite(spark.range(3).withColumnRenamed("id", "k"))
    v1 = t.current_version()
    t.overwrite(spark.range(4).withColumnRenamed("id", "k"))
    assert t.versions() == [t.current_version()]
    assert not (tmp_path / "t" / v1).exists()


def test_delta_time_travel_over_retained_versions(spark, tmp_path):
    from dax_ppdb_spark.io.delta_export import delta_live_files, export_delta_log
    from dax_ppdb_spark.io.table import ParquetTable

    import os

    root = str(tmp_path / "t")
    t = ParquetTable(root, keep_versions=2)
    t.overwrite(spark.range(0, 7).withColumnRenamed("id", "k"))
    export_delta_log(t, spark)
    t.overwrite(spark.range(0, 3).withColumnRenamed("id", "k"))
    export_delta_log(t, spark)
    # commit 0's snapshot is still materialized (retention) and the
    # log replay at=0 reads exactly it
    live0 = delta_live_files(root, at=0)
    paths = [os.path.join(root, p) for p in live0]
    assert spark.read.parquet(*paths).count() == 7
    assert spark.read.parquet(
        *[os.path.join(root, p) for p in delta_live_files(root)]
    ).count() == 3


def test_sidecar_commits_under_one_pointer(spark, tmp_path):
    """A sidecar relation lives inside the SAME version directory as
    the main relation: one CAS pointer flip publishes both, the main
    read never sees sidecar rows, and a rebuild swaps them together —
    no window where new codes pair with old centroids."""
    import pytest

    t = ParquetTable(str(tmp_path / "t"))
    main1 = spark.createDataFrame([(0, "a"), (1, "b")], "k INT, v STRING")
    side1 = spark.createDataFrame([(0, 10.0)], "k INT, c DOUBLE")
    t.overwrite(main1, partition_by=("k",), sidecars={"_meta": side1})
    assert _content(spark, t) == {(0, "a"), (1, "b")}
    assert [(r.k, r.c) for r in t.read_sidecar(spark, "_meta").collect()] == [
        (0, 10.0)
    ]
    v1 = t.current_version()
    # rebuild: both relations flip in one commit
    main2 = spark.createDataFrame([(2, "c")], "k INT, v STRING")
    side2 = spark.createDataFrame([(1, 20.0)], "k INT, c DOUBLE")
    t.overwrite(main2, partition_by=("k",), sidecars={"_meta": side2})
    assert t.current_version() != v1
    assert _content(spark, t) == {(2, "c")}
    assert [(r.k, r.c) for r in t.read_sidecar(spark, "_meta").collect()] == [
        (1, 20.0)
    ]
    # non-underscore names would be scanned as main-relation data
    with pytest.raises(ValueError):
        t.overwrite(main2, sidecars={"meta": side2})


def test_append_commit_is_versioned_and_keeps_sidecars(spark, tmp_path):
    """append_commit publishes old+batch under a NEW version via
    hardlink copy-on-write: the pointer flips (readers never see a
    partial batch), pre-existing files are linked not copied, and
    sidecars ride into the new generation."""
    t = ParquetTable(str(tmp_path / "t"))
    main = spark.createDataFrame([(0, "a")], "k INT, v STRING")
    side = spark.createDataFrame([(0, 10.0)], "k INT, c DOUBLE")
    t.overwrite(main, partition_by=("k",), sidecars={"_meta": side})
    v1 = t.current_version()
    d1 = t.data_dir()
    inodes1 = {
        os.stat(os.path.join(d1, "k=0", f)).st_ino
        for f in os.listdir(os.path.join(d1, "k=0"))
        if f.endswith(".parquet")
    }
    batch = spark.createDataFrame([(0, "a2"), (1, "b")], "k INT, v STRING")
    t.append_commit(batch, partition_by=("k",))
    assert t.current_version() != v1
    assert _content(spark, t) == {(0, "a"), (0, "a2"), (1, "b")}
    d2 = t.data_dir()
    inodes2 = {
        os.stat(os.path.join(d2, "k=0", f)).st_ino
        for f in os.listdir(os.path.join(d2, "k=0"))
        if f.endswith(".parquet")
    }
    assert inodes1 <= inodes2  # old files linked into the new version
    assert [(r.k, r.c) for r in t.read_sidecar(spark, "_meta").collect()] == [
        (0, 10.0)
    ]


def test_delta_export_skips_sidecars(spark, tmp_path):
    from dax_ppdb_spark.io.delta_export import delta_live_files, export_delta_log

    root = str(tmp_path / "t")
    t = ParquetTable(root)
    main = spark.createDataFrame([(0, "a")], "k INT, v STRING")
    side = spark.createDataFrame([(0, 10.0)], "k INT, c DOUBLE")
    t.overwrite(main, partition_by=("k",), sidecars={"_meta": side})
    export_delta_log(t, spark)
    assert all("_meta" not in p for p in delta_live_files(root))
