"""``ppdb-replication``-style command line interface.

Reference: ``cli/ppdb_replication.py:37-71`` dispatching to
``scripts/replication_run.py`` (the replication daemon),
``scripts/upload_chunks_run.py`` (the uploader daemon),
``scripts/replication_list_chunks_ppdb.py`` (S12 ledger report), and
``scripts/create_datasets.py`` (D13 DDL).  Promotion is exposed as its
own subcommand (the reference triggers it programmatically via
``ChunkPromoter``, ``bigquery/chunk_promoter.py:117-177``).

Each subcommand is a single poll iteration by default (``--loop`` turns
on the daemon behavior with the reference's default intervals,
``cli/options.py:106-125``) so the commands compose under external
schedulers, mirroring ``Trigger.AvailableNow`` semantics.
"""

from __future__ import annotations

import argparse
import time

from .ledger import Ledger
from .pipeline.promote import Promoter
from .pipeline.replicate import DirectoryApdbSource, Replicator
from .pipeline.upload import ChunkUploader
from .session import get_spark


def _cmd_list_chunks(args: argparse.Namespace) -> int:
    spark = get_spark("ppdb-list-chunks")
    ledger = Ledger(spark, args.ledger)
    rows = ledger.query_chunks(order_by="apdb_replica_chunk").collect()
    print("chunk_id\tstatus\tlast_update_time\tunique_id")
    for r in rows:
        print(f"{r.apdb_replica_chunk}\t{r.status}\t{r.last_update_time}\t{r.unique_id}")
    print(f"total: {len(rows)}")
    return 0


def _cmd_run(args: argparse.Namespace) -> int:
    spark = get_spark("ppdb-replication-run")
    promoter = Promoter(spark, args.root)
    rep = Replicator(
        spark,
        DirectoryApdbSource(args.source),
        promoter.ledger,
        min_wait_s=args.min_wait_time,
        max_wait_s=args.max_wait_time,
        update=args.update,
    )

    # The replicator inserts the EXPORTED ledger row after stage_fn
    # returns; staging (which flips the row to STAGED) must therefore
    # run after the poll. Collect the copied chunks' paths during the
    # poll and stage them once their ledger rows exist.
    while True:
        copied_chunks: list = []
        rep.replicate_once(copied_chunks.append)
        for chunk in copied_chunks:
            promoter.stage_chunk_dir(chunk.path, chunk.chunk_id)
        print(f"replicated: {[c.chunk_id for c in copied_chunks]}")
        if not args.loop:
            return 0
        time.sleep(args.check_interval)


def _cmd_upload(args: argparse.Namespace) -> int:
    spark = get_spark("ppdb-upload-chunks")
    ledger = Ledger(spark, args.ledger)
    uploader = ChunkUploader(
        ledger, args.export_root, args.bucket, exit_on_error=args.exit_on_error
    )
    while True:
        done = uploader.run_once()
        print(f"uploaded: {done}")
        if not args.loop:
            return 0
        time.sleep(args.wait_interval)


def _cmd_promote(args: argparse.Namespace) -> int:
    spark = get_spark("ppdb-promote")
    promoter = Promoter(spark, args.root)
    promoted = promoter.promote()
    print(f"promoted: {promoted}")
    return 0


def _cmd_create_datasets(args: argparse.Namespace) -> int:
    from .schema.ddl import DatasetBuilder
    from .schema.felis import load_schema

    spark = get_spark("ppdb-create-datasets")
    DatasetBuilder(spark, load_schema(args.schema), prefix=args.prefix).build_all()
    print(f"created datasets with prefix {args.prefix!r}")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="ppdb-replication", description="PPDB replication tools (Spark)"
    )
    sub = parser.add_subparsers(title="subcommands", required=True, dest="cmd")

    p = sub.add_parser("list-chunks", help="ordered ledger report (S12)")
    p.add_argument("ledger", help="ledger table path")
    p.set_defaults(func=_cmd_list_chunks)

    p = sub.add_parser("run", help="replicate new chunks from an APDB export area")
    p.add_argument("--source", required=True, help="APDB chunk export directory")
    p.add_argument("--root", required=True, help="PPDB warehouse root")
    p.add_argument("--min-wait-time", type=float, default=300.0)
    p.add_argument("--max-wait-time", type=float, default=900.0)
    p.add_argument("--check-interval", type=float, default=360.0)
    p.add_argument("--update", action="store_true",
                   help="allow re-replication of chunks whose uuid changed")
    p.add_argument("--loop", action="store_true", help="poll continuously")
    p.set_defaults(func=_cmd_run)

    p = sub.add_parser("upload-chunks", help="upload EXPORTED chunks to the bucket")
    p.add_argument("--ledger", required=True)
    p.add_argument("--export-root", required=True)
    p.add_argument("--bucket", required=True)
    p.add_argument("--wait-interval", type=float, default=30.0)
    p.add_argument("--exit-on-error", action="store_true")
    p.add_argument("--loop", action="store_true")
    p.set_defaults(func=_cmd_upload)

    p = sub.add_parser("promote", help="promote contiguous STAGED chunks")
    p.add_argument("--root", required=True, help="PPDB warehouse root")
    p.set_defaults(func=_cmd_promote)

    p = sub.add_parser("create-datasets", help="build the 4-namespace catalog (D13)")
    p.add_argument("--schema", required=True, help="Felis YAML path")
    p.add_argument("--prefix", default="ppdb")
    p.set_defaults(func=_cmd_create_datasets)

    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
