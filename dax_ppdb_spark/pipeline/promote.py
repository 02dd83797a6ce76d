"""Chunk promotion: staging -> promotion -> internal -> public.

Reference orchestration (``bigquery/chunk_promoter.py:117-177``), seven
ordered steps with cleanup in ``finally``:

1. copy staging rows for the chunk ids into promotion workspace tables
   cloned from internal, computing ``geo_point`` (S10/P10),
2. fill DiaObject validity ends, semi-join-pruned to staged objects
   (W2/P8/J4),
3. apply retroactive updates (expand -> latest-only -> per-table MERGE,
   ``bigquery/updates/updates_manager.py:106-150``),
4. atomically swap promotion into internal (D9),
5. re-materialize the public latest snapshot, clustered by geo_point
   (D10),
6. delete the staged chunk partitions (D11 — partition drops, no
   rewrite),
7. mark ledger rows PROMOTED (D5).

Ordering invariant (SURVEY §3.3): updates apply after inserts within a
batch; last-writer-wins resolves by (chunk, time_ns, order) DESC.

Scale notes: staging tables are partitioned by ``apdb_replica_chunk``
so step 1 reads only the promoted chunks (partition pruning) and step
6 is a metadata-only partition drop.  The update patch sets are one
batch's worth — broadcast merges, no target-side shuffle.  The public
snapshot is range-partitioned + sorted on ``geo_point`` so row-group
min/max stats prune sky-region queries (the BigQuery clustering
analog).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..io.table import ParquetTable
from ..ledger import Ledger
from ..metrics import timer
from ..ops.spatial import with_geo_point
from ..ops.updates import apply_update_patches, expand_updates, latest_updates
from ..ops.validity import fill_validity_end
from ..schema.registry import CHUNK_COLUMN, ChunkStatus

DIA_TABLES = ("DiaObject", "DiaSource", "DiaForcedSource")


class Promoter:
    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        self.staging = {t: ParquetTable(os.path.join(root, "staging", t)) for t in DIA_TABLES}
        self.staging_updates = ParquetTable(os.path.join(root, "staging", "updates"))
        self.internal = {t: ParquetTable(os.path.join(root, "internal", t)) for t in DIA_TABLES}
        self.promotion = {t: ParquetTable(os.path.join(root, "promotion", t)) for t in DIA_TABLES}
        self.public_diaobject = ParquetTable(os.path.join(root, "public", "DiaObject"))
        self.ledger = Ledger(spark, os.path.join(root, "ledger"))

    # -- staging (the external-Dataflow-job analog) -------------------------

    def stage_chunk_dir(self, chunk_dir: str, chunk_id: int) -> None:
        """Land an exported chunk into the staging tables (status STAGED).

        Stands in for the reference's external Dataflow staging job
        whose contract is the staging schemas
        (``dataset_builder.py:202-232``).
        """
        for t in DIA_TABLES:
            path = os.path.join(chunk_dir, t)
            if os.path.exists(path):
                self.staging[t].append(
                    self.spark.read.parquet(path), partition_by=(CHUNK_COLUMN,)
                )
        upd = os.path.join(chunk_dir, "updates")
        if os.path.exists(upd):
            self.staging_updates.append(
                self.spark.read.parquet(upd), partition_by=(CHUNK_COLUMN,)
            )
        self.ledger.update_chunk(chunk_id, status=ChunkStatus.STAGED)

    def _staged(self, table: str, chunk_ids: list[int]) -> DataFrame | None:
        t = self.staging[table]
        if not t.exists():
            return None
        try:
            df = t.read(self.spark)
        except Exception:
            # All partitions dropped -> empty directory, nothing staged.
            return None
        return df.filter(F.col(CHUNK_COLUMN).isin(chunk_ids))

    # -- promotion ----------------------------------------------------------

    def promote(self, chunk_ids: list[int] | None = None) -> list[int]:
        """Run the 7-step promotion for the given (default: promotable)
        chunks; returns the promoted ids."""
        if chunk_ids is None:
            chunk_ids = self.ledger.promotable_chunks()
        if not chunk_ids:
            return []
        try:
            steps = (
                ("copy_staging_to_promotion", self._copy_staging_to_promotion),
                ("fill_validity_end", self._fill_validity_end),
                ("apply_updates", self._apply_updates),
            )
            for name, step in steps:
                with timer(name, chunks=chunk_ids):
                    step(chunk_ids)
            with timer("swap_promotion_to_internal", chunks=chunk_ids):
                self._swap_promotion_to_internal()
            with timer("create_public_snapshot", chunks=chunk_ids):
                self._create_public_snapshot()
            with timer("delete_staged", chunks=chunk_ids):
                self._delete_staged(chunk_ids)
            for cid in chunk_ids:
                self.ledger.update_chunk(cid, status=ChunkStatus.PROMOTED)
            return chunk_ids
        finally:
            self._cleanup()

    def _copy_staging_to_promotion(self, chunk_ids: list[int]) -> None:
        """Step 1: promo := clone(internal) + staged rows with geo_point."""
        for t in DIA_TABLES:
            staged = self._staged(t, chunk_ids)
            if self.internal[t].exists():
                base = self.internal[t].read(self.spark)
            else:
                base = None
            if staged is not None:
                add = with_geo_point(staged.drop(CHUNK_COLUMN))
                combined = base.unionByName(add, allowMissingColumns=True) if base is not None else add
            else:
                combined = base
            if combined is not None:
                self.promotion[t].overwrite(combined)

    def _fill_validity_end(self, chunk_ids: list[int]) -> None:
        """Step 2: close open DiaObject intervals, pruned to staged ids."""
        staged = self._staged("DiaObject", chunk_ids)
        if staged is None or not self.promotion["DiaObject"].exists():
            return
        target = self.promotion["DiaObject"].read(self.spark)
        filled = fill_validity_end(target, staged.select("diaObjectId"))
        self.promotion["DiaObject"].overwrite(filled)

    def _apply_updates(self, chunk_ids: list[int]) -> None:
        """Step 3: expand -> latest-only -> per-table merge."""
        if not self.staging_updates.exists():
            return
        raw = self.staging_updates.read(self.spark).filter(
            F.col(CHUNK_COLUMN).isin(chunk_ids)
        )
        if not raw.limit(1).count():
            return
        latest = latest_updates(expand_updates(raw))
        targets = {
            t: self.promotion[t].read(self.spark)
            for t in DIA_TABLES
            if self.promotion[t].exists()
        }
        patched = apply_update_patches(targets, latest)
        for t, df in patched.items():
            self.promotion[t].overwrite(df)

    def _swap_promotion_to_internal(self) -> None:
        """Step 4: atomic truncate-swap (zero-copy clone + pointer flip)."""
        for t in DIA_TABLES:
            if self.promotion[t].exists():
                self.internal[t].clone_from(self.promotion[t])

    def _create_public_snapshot(self) -> None:
        """Step 5: public DiaObject = current rows only, without
        validityEndMjdTai, clustered by geo_point (D10/P3/P4).

        Two-level clustering: partitioned by the coarse Z-order cell
        (``geo_cell``, level 4 => at most 256 directories) so sky
        queries prune whole partitions at the metadata level, and
        sorted by the full ``geo_point`` within files so row-group
        min/max stats prune inside each partition — together the
        BigQuery ``CLUSTER BY geo_point`` access path.
        """
        if not self.internal["DiaObject"].exists():
            return
        from ..ops.spatial import zorder_cell

        cur = (
            self.internal["DiaObject"]
            .read(self.spark)
            .filter(F.col("validityEndMjdTai").isNull())
            .drop("validityEndMjdTai")
            .withColumn("geo_cell", zorder_cell(F.col("geo_point"), level=4))
        )
        clustered = cur.repartitionByRange(F.col("geo_point")).sortWithinPartitions(
            "geo_point"
        )
        self.public_diaobject.overwrite(clustered, partition_by=("geo_cell",))

    def _delete_staged(self, chunk_ids: list[int]) -> None:
        """Step 6: partition drops on staging tables (D11)."""
        for t in DIA_TABLES:
            self.staging[t].delete_partitions(CHUNK_COLUMN, chunk_ids)
        self.staging_updates.delete_partitions(CHUNK_COLUMN, chunk_ids)

    def _cleanup(self) -> None:
        """Finally: drop promotion workspace (chunk_promoter.py:336-348)."""
        for t in DIA_TABLES:
            self.promotion[t].drop()
