"""Replica-chunk ledger: the replication commit log + state machine.

Reference: ``PpdbReplicaChunk`` table (``sql/_ppdb_sql_base.py:460-497``)
with the BigQuery status extension (``bigquery/ppdb_bigquery.py:352-397``,
state machine ``ppdb_replica_chunk_extended.py:42-56``).  Operators:
S2/S3 filtered+ordered scans, S4 existence probe, D5 whitelisted
status update, D6 duplicate-checked insert, O3 contiguous-STAGED-run
selection, and the replication watermark gate (§2.9).

The ledger is tiny (one row per ~10-minute chunk — a few thousand rows
per year) so it always broadcasts, but it is mutated on EVERY chunk
transition, so mutation cost compounds over the deployment's lifetime.
It is therefore an **append-only status-event log**: each insert /
upsert / update appends O(batch) event rows stamped with a monotonic
``__event_seq``; the logical table is the last event per chunk id,
compacted through the already-built last-writer-wins view
(``ops/latest.py::latest_only``).  Cumulative write IO is O(events),
not the O(N²-in-chunks) a full read-modify-write per transition would
cost — the Spark analog of the reference's indexed single-row UPDATE
(``bigquery/ppdb_bigquery.py:620-657``).  Appends commit through
``ParquetTable.append_commit`` (copy-on-write hardlinks + CAS pointer
flip), so readers see whole batches atomically and racing writers lose
loudly; ``compact_log`` is the explicit housekeeping rewrite.
"""

from __future__ import annotations

import datetime
import uuid as uuid_mod
from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType

from .io.table import ParquetTable
from .ops.latest import latest_only
from .schema.registry import PPDB_REPLICA_CHUNK, ChunkStatus

# D5 field whitelist (bigquery/ppdb_bigquery.py:70-75).
UPDATABLE_FIELDS = frozenset({"status", "gcs_uri"})

# Event-log ordering column: strictly increasing across commits (each
# commit reads max(seq)+1 under the single-writer/CAS contract), shared
# within a commit (one batch touches distinct chunk ids, so the
# last-writer-wins key (chunk, seq) stays unique).
EVENT_SEQ = "__event_seq"

LEDGER_LOG_SCHEMA = StructType(
    list(PPDB_REPLICA_CHUNK.fields) + [StructField(EVENT_SEQ, LongType(), False)]
)

# States that never transition again under the reference's state
# machine (bigquery/ppdb_replica_chunk_extended.py:42-56): their
# winning rows are frozen into archive runs at compaction and carried
# forward by hardlink instead of being rewritten every compaction.
# (A later event for an archived chunk — e.g. a re-replication upsert
# — still wins at read time: archive is a storage layout, not logic;
# the stale archived row lingers harmlessly until a run merge.)
TERMINAL_STATUSES = (ChunkStatus.PROMOTED.value, ChunkStatus.SKIPPED.value)

# Archive run file prefix inside the version dir (plain parquet —
# read_log's directory scan picks runs up like any data file).
_ARCHIVE_PREFIX = "archive-"


class Ledger:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        auto_compact_files: int = 64,
        archive_merge_runs: int = 12,
    ) -> None:
        """``auto_compact_files``: when a commit finds more than this
        many data files in the log, it folds a compaction into ITSELF
        (one rewrite of ACTIVE winning rows + the new batch, terminal
        winners frozen into archive runs) instead of appending.  This
        bounds the per-commit hardlink fan-out of ``append_commit`` —
        without it, commit k links O(k) files and lifetime commit cost
        is O(N²) in transitions, the same disease the event log cured
        for bytes.  Amortized: one O(active-rows) rewrite every
        ``auto_compact_files`` appends — O(active), not O(all chunks
        ever), because rows in TERMINAL_STATUSES are written once to
        an archive run and hardlinked forward by every later
        compaction.  ``archive_merge_runs`` bounds the archive run
        count: past it, a compaction folds the smaller half of the
        runs into one (size-tiered — each archived row is rewritten
        O(log runs) times over the table's lifetime, never once per
        compaction)."""
        self.spark = spark
        self.table = ParquetTable(path)
        self.auto_compact_files = auto_compact_files
        self.archive_merge_runs = archive_merge_runs

    # -- reads --------------------------------------------------------------

    def read_log(self) -> DataFrame:
        """The raw status-event log, one row per transition, ordered by
        ``__event_seq`` within each chunk id."""
        if not self.table.exists():
            return self.spark.createDataFrame([], LEDGER_LOG_SCHEMA)
        return self.table.read(self.spark)

    def read(self) -> DataFrame:
        """The logical ledger: last event per chunk id (W3 compaction
        via ``ops/latest.py::latest_only``)."""
        return latest_only(
            self.read_log(), ["apdb_replica_chunk"], [EVENT_SEQ]
        ).select(*[f.name for f in PPDB_REPLICA_CHUNK.fields])

    def query_chunks(
        self,
        *where: Column,
        start_chunk_id: int | None = None,
        order_by: str = "last_update_time",
    ) -> DataFrame:
        """S2/S3: conjunctive-predicate scan, ordered.

        Reference: sql/_ppdb_sql.py:97-125, bigquery/ppdb_bigquery.py:501-544.
        """
        df = self.read()
        if start_chunk_id is not None:
            df = df.filter(F.col("apdb_replica_chunk") >= start_chunk_id)
        for cond in where:
            df = df.filter(cond)
        return df.orderBy(order_by, "apdb_replica_chunk")

    def exists(self, chunk_id: int) -> bool:
        """S4: existence probe (sql/_ppdb_sql.py:143-149)."""
        return bool(
            self.read().filter(F.col("apdb_replica_chunk") == chunk_id).limit(1).count()
        )

    def promotable_chunks(self) -> list[int]:
        """O3: longest prefix of STAGED chunks in increasing id order.

        Reference: bigquery/ppdb_bigquery.py:546-576 — stop at the
        first chunk (among non-terminal ones) that is not yet STAGED.
        """
        rows = (
            self.read()
            .filter(~F.col("status").isin(ChunkStatus.SKIPPED, ChunkStatus.PROMOTED))
            .orderBy("apdb_replica_chunk")
            .select("apdb_replica_chunk", "status")
            .collect()
        )
        out: list[int] = []
        for r in rows:
            if r.status != ChunkStatus.STAGED:
                break
            out.append(r.apdb_replica_chunk)
        return out

    # -- writes (append-only events; IO is O(batch), never O(table)) ---------

    def _next_seq(self) -> int:
        """max(seq)+1 over the (tiny) log — one scalar aggregate; the
        single-writer / CAS-append contract makes it race-safe."""
        if not self.table.exists():
            return 0
        top = self.read_log().agg(F.max(EVENT_SEQ)).first()[0]
        return 0 if top is None else int(top) + 1

    def _data_file_count(self) -> int:
        import os

        d = self.table.data_dir()
        if d is None:
            return 0
        return sum(
            1
            for n in os.listdir(d)
            if n.endswith(".parquet") and not n.startswith((".", "_"))
        )

    def _append_events(self, rows: list[dict], seq: int) -> None:
        self._commit_events(
            self.spark.createDataFrame(
                [dict(r, **{EVENT_SEQ: seq}) for r in rows], LEDGER_LOG_SCHEMA
            )
        )

    def _commit_events(self, events: DataFrame) -> None:
        """One atomic commit of a batch of event rows: an
        ``append_commit`` normally, or — when the log's file count
        crosses ``auto_compact_files`` — a compaction folded into this
        same commit (dropped events were already losers of the
        per-chunk last-writer-wins, and the new batch's seq is the
        maximum)."""
        if self._data_file_count() > self.auto_compact_files:
            self._compact_commit(events)
        else:
            self.table.append_commit(events)

    def _archive_files(self) -> list[str]:
        import os

        d = self.table.data_dir()
        if d is None:
            return []
        return sorted(
            os.path.join(d, n)
            for n in os.listdir(d)
            if n.startswith(_ARCHIVE_PREFIX) and n.endswith(".parquet")
        )

    @staticmethod
    def _write_archive_run(df: DataFrame, dst: str) -> None:
        """Materialize ``df`` as ONE parquet file named as an archive
        run inside the assembled version dir ``dst`` (dropped again if
        it turns out empty — no zero-row runs accumulate)."""
        import os
        import shutil

        import pyarrow.parquet as pq

        tmp = f"{dst}.archtmp-{uuid_mod.uuid4().hex}"
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = next(
            n
            for n in os.listdir(tmp)
            if n.endswith(".parquet") and not n.startswith((".", "_"))
        )
        run = os.path.join(dst, f"{_ARCHIVE_PREFIX}{uuid_mod.uuid4().hex}.parquet")
        if pq.ParquetFile(os.path.join(tmp, part)).metadata.num_rows > 0:
            os.rename(os.path.join(tmp, part), run)
        shutil.rmtree(tmp, ignore_errors=True)

    def _compact_commit(self, events: DataFrame) -> None:
        """Compaction folded into a commit, terminal-aware: ACTIVE
        winning rows + the new batch are rewritten as the log's data
        files; winners in TERMINAL_STATUSES move (once) into a frozen
        archive run; existing runs are HARDLINKED into the new version
        untouched.  Past ``archive_merge_runs`` runs, the smaller half
        folds into one (size-tiered).  Per-compaction write bytes are
        therefore O(active rows + batch + newly-terminal rows), flat
        over the deployment's lifetime — not O(every chunk ever seen),
        which is what rewriting terminal history each compaction would
        cost (measured: tools/ledger_lifetime.py)."""
        import os

        cols = [f.name for f in LEDGER_LOG_SCHEMA.fields]
        tbl = self.table
        old = tbl.current_version()
        arch_files = self._archive_files()
        winners = latest_only(
            self.read_log(), ["apdb_replica_chunk"], [EVENT_SEQ]
        ).select(*cols)
        term = F.col("status").isin(*TERMINAL_STATUSES)
        new_arch = winners.filter(term)
        if arch_files:
            # already-archived winners stay where they are; only the
            # newly-terminal delta is written
            new_arch = new_arch.join(
                self.spark.read.parquet(*arch_files).select(
                    "apdb_replica_chunk", EVENT_SEQ
                ),
                ["apdb_replica_chunk", EVENT_SEQ],
                "left_anti",
            )
        payload = winners.filter(~term).unionByName(events.select(*cols))
        version = f"_v{uuid_mod.uuid4().hex}"
        dst = os.path.join(tbl.path, version)
        payload.write.mode("overwrite").parquet(dst)
        link = arch_files
        if len(arch_files) >= self.archive_merge_runs:
            by_size = sorted(arch_files, key=os.path.getsize)
            merge = by_size[: len(by_size) // 2 + 1]
            link = [f for f in arch_files if f not in merge]
            self._write_archive_run(
                self.spark.read.parquet(*merge).select(*cols), dst
            )
        for f in link:
            os.link(f, os.path.join(dst, os.path.basename(f)))
        self._write_archive_run(new_arch, dst)
        tbl._commit(version, expected=old)
        tbl._retire(old)

    def insert_chunks(self, rows: Iterable[dict]) -> None:
        """D6: batch insert; duplicate chunk ids raise (IntegrityError
        analog, ``bigquery/ppdb_bigquery.py:598-618``).  Appends
        O(batch) event rows in one commit; the dup probe is a bounded
        ``limit`` (a few offending ids as the error sample), never a
        full-result collect."""
        completed = [self._complete_row(r) for r in rows]
        ids = [r["apdb_replica_chunk"] for r in completed]
        if len(set(ids)) != len(ids):
            dup = sorted({i for i in ids if ids.count(i) > 1})
            raise ValueError(f"duplicate replica chunk ids: {dup}")
        dupes = [
            r.apdb_replica_chunk
            for r in self.read()
            .filter(F.col("apdb_replica_chunk").isin(ids))
            .select("apdb_replica_chunk")
            .limit(8)
            .collect()
        ]
        if dupes:
            raise ValueError(f"duplicate replica chunk ids: {sorted(dupes)}")
        self._append_events(completed, self._next_seq())

    def upsert_chunk(self, row: dict) -> None:
        """D2: re-replication upsert (sql/_ppdb_sql.py:175-179) — one
        appended event; last-writer-wins compaction IS the upsert."""
        self._append_events([self._complete_row(row)], self._next_seq())

    def update_chunk(self, chunk_id: int, **fields) -> None:
        """D5: whitelisted field update; LookupError when the row is absent.

        Reference: bigquery/ppdb_bigquery.py:620-657 (indexed point
        UPDATE + LookupError on rowcount 0).
        """
        self.update_chunks([chunk_id], **fields)

    def update_chunks(self, chunk_ids: Iterable[int], **fields) -> None:
        """Batched D5: one ledger commit for a whole chunk batch — the
        promotion of k chunks costs ONE append of k event rows, not k
        table writes.  The new events are the current winning rows with
        the whitelisted fields replaced, built distributed (no collect
        of ledger rows)."""
        ids = sorted(set(chunk_ids))
        if not ids:
            return
        bad = set(fields) - UPDATABLE_FIELDS
        if bad:
            raise ValueError(f"fields not updatable: {sorted(bad)}")
        current = self.read().filter(F.col("apdb_replica_chunk").isin(ids))
        present = {
            r.apdb_replica_chunk
            for r in current.select("apdb_replica_chunk").collect()
        }  # bounded by the batch size, never the ledger
        missing = [i for i in ids if i not in present]
        if missing:
            raise LookupError(f"no such replica chunk: {missing}")
        seq = self._next_seq()
        events = current
        for name, value in fields.items():
            events = events.withColumn(
                name,
                F.lit(value.value if isinstance(value, ChunkStatus) else value),
            )
        events = events.withColumn(EVENT_SEQ, F.lit(seq).cast("long")).select(
            *[f.name for f in LEDGER_LOG_SCHEMA.fields]
        )
        self._commit_events(events)

    def compact_log(self) -> None:
        """Housekeeping: fold the event log down to the winning row per
        chunk (terminal winners into frozen archive runs, active ones
        rewritten — O(active rows), see ``_compact_commit``); the
        logical table is unchanged.  Run on a schedule, not per
        transition."""
        if not self.table.exists():
            return
        self._compact_commit(self.spark.createDataFrame([], LEDGER_LOG_SCHEMA))

    @staticmethod
    def _complete_row(r: dict) -> dict:
        now = datetime.datetime.now(datetime.timezone.utc).replace(tzinfo=None)
        out = {
            "last_update_time": now,
            "unique_id": str(uuid_mod.uuid4()),
            "replica_time": now,
            "status": ChunkStatus.EXPORTED.value,
            "gcs_uri": None,
            "update_count": 0,
        }
        out.update(r)
        if isinstance(out.get("status"), ChunkStatus):
            out["status"] = out["status"].value
        return out


def can_replicate(
    chunk_time: datetime.datetime,
    now: datetime.datetime,
    has_newer: bool,
    min_wait_s: float = 300.0,
    max_wait_s: float = 900.0,
) -> bool:
    """§2.9 watermark gate: a chunk is copied once its age exceeds
    ``min_wait`` when newer chunks exist (the bucket can no longer
    grow), else ``max_wait``.

    Reference: replicator.py:130-163, defaults cli/options.py:106-125.
    """
    age = (now - chunk_time).total_seconds()
    return age >= (min_wait_s if has_newer else max_wait_s)


def replication_diff(apdb_chunks: DataFrame, ppdb_chunks: DataFrame) -> DataFrame:
    """J5/O2: chunks present in APDB but not yet replicated, in id order.

    Reference: replicator.py:106-110 (Python set difference + sort).
    """
    return (
        apdb_chunks.join(
            F.broadcast(ppdb_chunks.select("apdb_replica_chunk")),
            "apdb_replica_chunk",
            "left_anti",
        )
        .orderBy("apdb_replica_chunk")
    )


def consistency_mismatches(apdb_chunks: DataFrame, ppdb_chunks: DataFrame) -> DataFrame:
    """J6: replicated chunks whose unique_id differs between sides.

    Reference: replicator.py:230-240.
    """
    a = apdb_chunks.select("apdb_replica_chunk", F.col("unique_id").alias("apdb_uid"))
    p = ppdb_chunks.select("apdb_replica_chunk", F.col("unique_id").alias("ppdb_uid"))
    return a.join(p, "apdb_replica_chunk").filter(F.col("apdb_uid") != F.col("ppdb_uid"))
