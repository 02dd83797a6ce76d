"""Managed parquet tables with atomic-swap and clone semantics.

The reference relies on BigQuery primitives we must rebuild on a
filesystem: zero-copy CLONE (``bigquery/chunk_promoter.py:199-203``),
atomic WRITE_TRUNCATE swap (``:261-284``), DROP IF EXISTS (``:336-342``)
and DELETE-by-chunk (``:306-329``).

Design for scale: a table is a directory; every rewrite lands in a
fresh ``_v<uuid>`` subdirectory and a single ``_CURRENT`` pointer file
names the live version — readers resolve the pointer then read one
immutable directory, so swap is one small-file replace (the same
pointer-commit idea as Delta's ``_delta_log``, minus the log).  On a
real object store the pointer write is the only operation that needs
read-after-write consistency.  Chunk-partitioned tables write with
``partitionBy`` so DELETE-by-chunk is partition pruning, not a rewrite.
"""

from __future__ import annotations

import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession


class ConcurrentWriteError(RuntimeError):
    """A second writer committed between this writer's snapshot of the
    pointer and its own commit; the losing write was discarded."""


class ParquetTable:
    """A versioned parquet table rooted at ``path``.

    Writer model: the pointer commit is a compare-and-swap — each
    mutating operation snapshots the current version BEFORE writing
    its new version directory and commits only if the pointer is still
    that snapshot (checked under an exclusive file lock).  A second
    promoter racing the same table therefore fails LOUDLY with
    :class:`ConcurrentWriteError` (its orphan version directory is
    removed) instead of silently overwriting the winner's commit.
    The lock is ``flock`` on a sibling file — right for the local/
    POSIX filesystems this runs on; an object-store deployment swaps
    the CAS for a conditional PUT (same contract, the pointer write is
    the only operation needing it).  ``append`` writes into the
    current version in place and remains single-writer by contract.
    """

    CURRENT = "_CURRENT"
    LOCK = "_COMMIT_LOCK"
    JOURNAL = "_VERSIONS"

    def __init__(self, path: str, keep_versions: int = 0) -> None:
        """``keep_versions``: how many SUPERSEDED version directories
        to retain after a commit (0 = delete immediately, the
        classic truncate-swap).  With retention, earlier snapshots
        stay readable — :meth:`versions` lists them oldest-first from
        the commit journal, :meth:`read_version` opens one, and a
        ``_delta_log`` exported per commit gives external engines
        time travel over the same files (``io/delta_export.py``).
        :meth:`vacuum` prunes beyond the retention window."""
        self.path = path
        self.keep_versions = keep_versions

    # -- version plumbing ---------------------------------------------------

    def _pointer(self) -> str:
        return os.path.join(self.path, self.CURRENT)

    def _journal(self) -> str:
        return os.path.join(self.path, self.JOURNAL)

    def versions(self) -> list[str]:
        """Committed version names, oldest first (from the journal
        appended under the commit lock; versions whose directories
        were vacuumed are excluded)."""
        try:
            with open(self._journal()) as f:
                names = [line.strip() for line in f if line.strip()]
        except FileNotFoundError:
            return []
        return [
            v for v in names if os.path.isdir(os.path.join(self.path, v))
        ]

    def read_version(self, spark: SparkSession, version: str) -> DataFrame:
        """Time-travel read of a RETAINED version (see
        ``keep_versions``)."""
        d = os.path.join(self.path, version)
        if not os.path.isdir(d):
            raise FileNotFoundError(
                f"version {version!r} is not retained in {self.path}"
            )
        return spark.read.parquet(d)

    def _retire(self, old: str | None) -> None:
        """Post-commit handling of the superseded version: delete it
        (keep_versions=0) or retain it and prune the tail beyond the
        retention window."""
        if old is None:
            return
        if self.keep_versions <= 0:
            shutil.rmtree(os.path.join(self.path, old), ignore_errors=True)
            return
        self.vacuum(self.keep_versions)

    def vacuum(self, keep: int | None = None) -> list[str]:
        """Drop superseded version directories beyond the newest
        ``keep`` (defaults to ``keep_versions``); the CURRENT version
        is never dropped.  Returns the removed names.  External
        readers of an exported ``_delta_log`` lose time travel into
        vacuumed commits — same contract as Delta's VACUUM."""
        keep = self.keep_versions if keep is None else keep
        current = self.current_version()
        superseded = [v for v in self.versions() if v != current]
        drop = superseded[: max(len(superseded) - keep, 0)]
        for v in drop:
            shutil.rmtree(os.path.join(self.path, v), ignore_errors=True)
        return drop

    def current_version(self) -> str | None:
        try:
            with open(self._pointer()) as f:
                return f.read().strip()
        except FileNotFoundError:
            return None

    def data_dir(self) -> str | None:
        v = self.current_version()
        return os.path.join(self.path, v) if v else None

    def exists(self) -> bool:
        return self.current_version() is not None

    def _commit(self, version: str, expected: str | None) -> None:
        """CAS pointer flip: commit ``version`` iff the pointer still
        names ``expected``; on a lost race, drop the orphan version
        and raise."""
        import fcntl

        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, self.LOCK), "w") as lock:
            fcntl.flock(lock, fcntl.LOCK_EX)
            current = self.current_version()
            if current != expected:
                shutil.rmtree(os.path.join(self.path, version), ignore_errors=True)
                raise ConcurrentWriteError(
                    f"{self.path}: pointer moved {expected!r} -> {current!r} "
                    "during this write; a concurrent promoter committed first"
                )
            tmp = self._pointer() + f".tmp-{uuid.uuid4().hex}"
            with open(tmp, "w") as f:
                f.write(version)
            os.replace(tmp, self._pointer())  # atomic on POSIX
            # ordered commit history (still under the lock): the
            # retention/vacuum/time-travel machinery needs version
            # ORDER, which uuid names don't carry
            with open(self._journal(), "a") as j:
                j.write(version + "\n")

    # -- operations ---------------------------------------------------------

    def read(self, spark: SparkSession) -> DataFrame:
        d = self.data_dir()
        if d is None:
            raise FileNotFoundError(f"table has no committed version: {self.path}")
        return spark.read.parquet(d)

    def _write_version(
        self, df: DataFrame, partition_by: tuple[str, ...] = ()
    ) -> str:
        os.makedirs(self.path, exist_ok=True)
        version = f"_v{uuid.uuid4().hex}"
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(os.path.join(self.path, version))
        return version

    def overwrite(
        self,
        df: DataFrame,
        partition_by: tuple[str, ...] = (),
        sidecars: dict[str, DataFrame] | None = None,
    ) -> None:
        """D9: atomic truncate-swap — write new version, CAS the pointer.

        ``sidecars`` commits auxiliary relations UNDER THE SAME
        POINTER: each is written to ``<version>/<name>/`` before the
        CAS flip, so readers can never pair the main relation of one
        generation with a sidecar of another (the two-table-commit
        race an IVF index's codes+centroids would otherwise have).
        Sidecar names must start with ``_`` — Spark's reader ignores
        underscore-prefixed paths, so ``read()`` of the main relation
        is unaffected; fetch one with :meth:`read_sidecar`.  A sidecar
        value may be a Spark DataFrame or a ``pyarrow.Table`` — the
        latter writes driver-locally with ZERO Spark jobs, the right
        lane for model-sized metadata the driver already holds
        (centroids, codebooks).
        """
        old = self.current_version()
        version = self._write_version(df, partition_by)
        for name, sdf in (sidecars or {}).items():
            if not name.startswith("_"):
                raise ValueError(
                    f"sidecar name must start with '_' (got {name!r}) so the "
                    "main relation's parquet reader ignores it"
                )
            dest = os.path.join(self.path, version, name)
            if hasattr(sdf, "write"):
                sdf.write.mode("overwrite").parquet(dest)
            else:
                import pyarrow.parquet as pq

                os.makedirs(dest, exist_ok=True)
                pq.write_table(sdf, os.path.join(dest, "part-00000.parquet"))
        self._commit(version, expected=old)
        self._retire(old)

    def read_sidecar(self, spark: SparkSession, name: str) -> DataFrame:
        """Read a sidecar relation committed with the current version."""
        d = self.data_dir()
        if d is None:
            raise FileNotFoundError(f"table has no committed version: {self.path}")
        return spark.read.parquet(os.path.join(d, name))

    def append(self, df: DataFrame, partition_by: tuple[str, ...] = ()) -> None:
        """S7-style append into the current version directory.

        NOT atomic for readers: files land in the live version dir, so
        a concurrent scan can list a partial batch.  Right for the
        single-writer staging tables it serves; use
        :meth:`append_commit` when readers need batch atomicity.
        """
        d = self.data_dir()
        if d is None:
            self.overwrite(df, partition_by)
            return
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(d)

    def append_commit(self, df: DataFrame, partition_by: tuple[str, ...] = ()) -> None:
        """Atomic append: copy-on-write the current version (hardlinks
        — O(file count), zero bytes copied; sidecars ride along), write
        the new batch into the NEW version dir, CAS the pointer.
        Readers see the old generation or old+batch, never a partial
        batch; a racing writer loses the CAS loudly."""
        old = self.current_version()
        if old is None:
            self.overwrite(df, partition_by)
            return
        src = os.path.join(self.path, old)
        version = f"_v{uuid.uuid4().hex}"
        dst = os.path.join(self.path, version)
        shutil.copytree(src, dst, copy_function=os.link)
        writer = df.write.mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(dst)
        self._commit(version, expected=old)
        self._retire(old)

    def clone_from(self, other: ParquetTable) -> None:
        """D7: zero-copy CLONE via hardlinks into a new version."""
        src = other.data_dir()
        if src is None:
            raise FileNotFoundError(f"clone source empty: {other.path}")
        os.makedirs(self.path, exist_ok=True)
        old = self.current_version()
        version = f"_v{uuid.uuid4().hex}"
        dst = os.path.join(self.path, version)
        shutil.copytree(src, dst, copy_function=os.link)
        self._commit(version, expected=old)
        self._retire(old)

    def replace_partitions(
        self, df: DataFrame, partition_col: str, values: list
    ) -> None:
        """Touched-partition MERGE commit: atomically publish a new
        version where only the named partitions are rewritten.

        The reference's MERGE touches matched rows in place
        (``resources/config/sql/fill_diaobject_validity_end.sql:25-40``);
        without a transactional format the closest scale-equivalent is
        partition-level copy-on-write: every *untouched* partition is
        hardlinked from the current version (O(number of files), zero
        bytes copied) and only the partitions named in ``values`` are
        written from ``df`` — so commit IO is proportional to the
        touched slice, never the table.  ``df`` must contain only rows
        whose ``partition_col`` falls in ``values``.
        """
        old = self.current_version()
        d = os.path.join(self.path, old) if old else None
        if d is None:
            self.overwrite(df, (partition_col,))
            return
        os.makedirs(self.path, exist_ok=True)
        version = f"_v{uuid.uuid4().hex}"
        dst = os.path.join(self.path, version)
        tmp = os.path.join(self.path, f"_tmp{uuid.uuid4().hex}")
        df.write.mode("overwrite").partitionBy(partition_col).parquet(tmp)
        written = {
            name for name in os.listdir(tmp) if name.startswith(f"{partition_col}=")
        }
        skip = written | {f"{partition_col}={v}" for v in values}
        os.makedirs(dst)
        try:
            for name in os.listdir(d):
                src = os.path.join(d, name)
                if name in skip:
                    continue
                if os.path.isdir(src):
                    shutil.copytree(src, os.path.join(dst, name), copy_function=os.link)
                else:
                    os.link(src, os.path.join(dst, name))
        except OSError as e:
            shutil.rmtree(dst, ignore_errors=True)
            shutil.rmtree(tmp, ignore_errors=True)
            if isinstance(e, FileNotFoundError):
                # The snapshot version vanished mid-copy: a concurrent
                # writer committed and removed it.  Surface the
                # documented loser contract (cleaned up, loud) instead
                # of a raw FileNotFoundError with orphans left behind.
                raise ConcurrentWriteError(
                    f"{self.path}: version {old!r} disappeared during "
                    "replace_partitions; a concurrent promoter committed first"
                ) from e
            # Persistent local faults (ENOSPC, EACCES, EMLINK, ...) are
            # NOT a lost race — re-raise as-is (cleaned up) so callers
            # treating ConcurrentWriteError as retryable don't loop on
            # a permissions error.
            raise
        for name in written:
            shutil.move(os.path.join(tmp, name), os.path.join(dst, name))
        shutil.rmtree(tmp, ignore_errors=True)
        self._commit(version, expected=old)
        self._retire(old)

    def compact(
        self,
        spark: SparkSession,
        partition_col: str,
        max_files_per_partition: int = 4,
        target_files: int = 1,
    ) -> list:
        """Small-file compaction (the OPTIMIZE analog a streaming
        ingest table needs): partitions whose data-file count exceeds
        ``max_files_per_partition`` are read back and rewritten as
        ``target_files`` files each; untouched partitions hardlink
        through :meth:`replace_partitions`' copy-on-write commit, so
        compaction IO — like every other commit here — is proportional
        to the fragmented slice, never the table.  Returns the list of
        compacted partition values.

        Micro-batch appenders (the replication loop writes one file
        set per chunk poll) fragment partitions over time; at 100 TB
        fragmented partitions mean task-per-tiny-file scan overhead
        and row-group stats too small to prune well.  Run this from a
        housekeeping schedule; a racing promoter makes the loser raise
        :class:`ConcurrentWriteError`, never corrupt the table.
        """
        d = self.data_dir()
        if d is None:
            return []
        prefix = f"{partition_col}="
        fragmented = []
        for name in sorted(os.listdir(d)):
            if not name.startswith(prefix):
                continue
            pdir = os.path.join(d, name)
            n_files = sum(
                1 for f in os.listdir(pdir)
                if f.endswith(".parquet") and not f.startswith((".", "_"))
            )
            if n_files > max_files_per_partition:
                fragmented.append(name[len(prefix):])
        if not fragmented:
            return []
        from pyspark.sql import functions as F

        df = spark.read.parquet(d)
        # Cast the directory-name VALUES to the column's inferred type
        # (never the column to string — a cast on the partition column
        # would defeat partition pruning and scan the whole table to
        # compact one slice).
        dt = df.schema[partition_col].dataType
        lits = [F.lit(v).cast(dt) for v in fragmented]
        sub = df.filter(F.col(partition_col).isin(*lits)).repartition(
            target_files * len(fragmented), partition_col
        )
        self.replace_partitions(sub, partition_col, fragmented)
        return fragmented

    def drop(self) -> None:
        """D8: DROP TABLE IF EXISTS."""
        shutil.rmtree(self.path, ignore_errors=True)

    def delete_partitions(self, partition_col: str, values: list) -> None:
        """D11: DELETE WHERE partition_col IN (...) as partition drops.

        Only valid for tables written with ``partition_by=(partition_col,)``;
        removes whole partition directories, no data rewrite.
        """
        d = self.data_dir()
        if d is None:
            return
        for v in values:
            shutil.rmtree(os.path.join(d, f"{partition_col}={v}"), ignore_errors=True)


def save_bucketed_table(
    df: DataFrame,
    name: str,
    key: str,
    buckets: int = 32,
    single_file_buckets: bool = True,
) -> None:
    """Persist a catalog table hash-bucketed (and in-bucket sorted) on
    its join key.

    Bucketing is the co-located-join primitive for the big fact-to-fact
    joins that broadcast can't cover: two tables bucketed the same way
    on the same key join with NO exchange on either side — the shuffle
    happened once, at write time, instead of on every query.  (The
    range-bucketed internal tables in ``pipeline.promote`` serve point
    MERGEs; this serves repeated large equi-joins, e.g. a permanent
    sources-to-objects attribution table.)  Plan behavior is pinned by
    ``tests/test_plans.py::test_bucketed_join_has_no_exchange``.

    Thin single-key wrapper over :func:`dax_ppdb_spark.io.bucketed.
    write_bucketed` — the full layout toolkit (multi-key, external
    path, catalog introspection, bucket-pruned point lookup) lives
    there.  ``single_file_buckets`` passes through: keep the default
    unless one bucket exceeds a single write task's disk/memory.
    """
    from .bucketed import write_bucketed

    write_bucketed(df, name, key, buckets, single_file_buckets=single_file_buckets)
