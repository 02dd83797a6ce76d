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
import dataclasses
import os
import sys
import time

from .config import PpdbConfig, SparkPipelineConfig, pipeline_from_config
from .ledger import Ledger
from .pipeline.upload import ChunkUploader
from .session import get_spark


def _resolve_config(args: argparse.Namespace) -> SparkPipelineConfig:
    """Merge a ``--config`` YAML file with explicit flags.

    Flags the user actually passed (anything non-None on the
    namespace) override the file, so a config can hold the durable
    settings and a flag can tweak one run — the reference's
    config-first CLI shape (``ppdb_config.py:40-65``).
    """
    if getattr(args, "config", None):
        cfg = PpdbConfig.from_uri(args.config)
        if not isinstance(cfg, SparkPipelineConfig):
            raise TypeError(f"Unknown type of config object: {type(cfg)}")
    else:
        cfg = SparkPipelineConfig()
    for f in dataclasses.fields(SparkPipelineConfig):
        v = getattr(args, f.name, None)
        if v is not None:
            setattr(cfg, f.name, v)
    return cfg


def _cmd_list_chunks(args: argparse.Namespace) -> int:
    cfg = _resolve_config(args)
    if not cfg.ledger:
        raise SystemExit("list-chunks needs a ledger path (arg or config)")
    spark = get_spark("ppdb-list-chunks")
    ledger = Ledger(spark, cfg.ledger)
    rows = ledger.query_chunks(order_by="apdb_replica_chunk").collect()
    print("chunk_id\tstatus\tlast_update_time\tunique_id")
    for r in rows:
        print(f"{r.apdb_replica_chunk}\t{r.status}\t{r.last_update_time}\t{r.unique_id}")
    print(f"total: {len(rows)}")
    return 0


def _cmd_list_chunks_apdb(args: argparse.Namespace) -> int:
    """APDB-side listing (S12's twin): every chunk the source export
    area offers, in id order — no Spark session, no ledger.

    Reference: ``scripts/replication_list_chunks_apdb.py:29-52``.
    """
    from .pipeline.replicate import DirectoryApdbSource

    cfg = _resolve_config(args)
    if not cfg.source:
        raise SystemExit("list-chunks-apdb needs a source dir (arg or config)")
    chunks = DirectoryApdbSource(cfg.source).list_chunks()
    print("chunk_id\tlast_update_time\tunique_id")
    for c in chunks:
        print(f"{c.chunk_id}\t{c.last_update_time.isoformat()}\t{c.unique_id}")
    print(f"total: {len(chunks)}")
    return 0


def _cmd_run(args: argparse.Namespace) -> int:
    cfg = _resolve_config(args)
    if not cfg.root or not cfg.source:
        raise SystemExit("run needs --root and --source (flags or config)")
    spark = get_spark("ppdb-replication-run")
    pipe = pipeline_from_config(spark, cfg)
    promoter = pipe.promoter()
    source = pipe.apdb_source()
    rep = pipe.replicator(ledger=promoter.ledger)

    # A directory source's chunks are already exported parquet (the
    # copy is the reference's external landing job); a live JDBC
    # source is EXPORTED here — each table pulled as a per-chunk
    # partitioned read and stored with the standard chunk layout +
    # manifest (store_chunk), i.e. the reference's _replicate_one
    # (replicator.py:165-181) with Spark doing the data movement.
    # Note: a JDBC source replicates the DATA tables (cfg.jdbc_tables)
    # only — retroactive-update streams are a directory-source feature
    # (the reference's update records arrive as exported files, not
    # APDB tables); `root` is guaranteed non-None by the check above.
    is_jdbc = hasattr(source, "get_table_data_chunks")
    export_dir = cfg.export_root or os.path.join(cfg.root, "export")

    def _export(chunk) -> str:
        if not is_jdbc:
            return chunk.path
        from .pipeline.store import store_chunk

        tables = {
            t: source.get_table_data_chunks(t, [chunk.chunk_id])
            for t in cfg.jdbc_tables
        }
        return store_chunk(
            spark,
            export_dir,
            chunk.chunk_id,
            tables,
            unique_id=chunk.unique_id,
            compression=cfg.parq_compression,
        )

    # The replicator inserts the EXPORTED ledger row after stage_fn
    # returns; staging (which flips the row to STAGED) must therefore
    # run after the poll. Collect the copied chunks' dirs during the
    # poll and stage them once their ledger rows exist.
    while True:
        copied_chunks: list = []
        rep.replicate_once(
            lambda chunk: copied_chunks.append((chunk, _export(chunk)))
        )
        promoter.stage_chunk_dirs(
            [(chunk_dir, chunk.chunk_id) for chunk, chunk_dir in copied_chunks]
        )
        print(f"replicated: {[c.chunk_id for c, _ in copied_chunks]}")
        if not args.loop:
            return 0
        time.sleep(cfg.check_interval)


def _cmd_upload(args: argparse.Namespace) -> int:
    cfg = _resolve_config(args)
    if not cfg.ledger or not cfg.export_root or not cfg.bucket:
        raise SystemExit("upload-chunks needs --ledger, --export-root, --bucket")
    spark = get_spark("ppdb-upload-chunks")
    ledger = Ledger(spark, cfg.ledger)
    uploader = ChunkUploader(
        ledger, cfg.export_root, cfg.bucket, exit_on_error=cfg.exit_on_error
    )
    while True:
        done = uploader.run_once()
        print(f"uploaded: {done}")
        if not args.loop:
            return 0
        time.sleep(cfg.wait_interval)


def _cmd_promote(args: argparse.Namespace) -> int:
    cfg = _resolve_config(args)
    if not cfg.root:
        raise SystemExit("promote needs --root (flag or config)")
    spark = get_spark("ppdb-promote")
    promoted = pipeline_from_config(spark, cfg).promoter().promote()
    print(f"promoted: {promoted}")
    return 0


def _cmd_export_pgcopy(args: argparse.Namespace) -> int:
    """S8: dump a parquet table (or any table directory) as PGCOPY
    binary part files for parallel ``COPY ... WITH (FORMAT binary)``
    ingest — the reference's ``pg_dump`` bulk path, distributed
    (``sql/pg_dump.py:53-109``)."""
    from .io.pg_copy import write_pg_copy
    from .io.table import ParquetTable

    spark = get_spark("ppdb-export-pgcopy")
    # Managed warehouse tables keep their data behind a _CURRENT
    # pointer in _v<hex> subdirectories (underscore paths are invisible
    # to Spark's reader) — resolve the committed version; plain parquet
    # directories pass through untouched.
    managed = ParquetTable(args.table)
    path = managed.data_dir() if managed.exists() else args.table
    df = spark.read.parquet(path)
    if args.columns:
        df = df.select(*[c.strip() for c in args.columns.split(",")])
    n = write_pg_copy(df, args.out)
    print(f"wrote {n} PGCOPY part files to {args.out}")
    return 0


def _cmd_audit(args: argparse.Namespace) -> int:
    """Data-quality gate: audit a parquet table against a JSON rule
    spec (``ops.constraints``).  Prints one line per rule; exit 1 if
    any rule fails.  ``--violations OUT`` additionally writes the
    row-level quarantine feed (requires ``--id-cols``)."""
    import json as _json

    from .ops.constraints import (
        constraint_audit,
        constraint_violations,
        constraints_from_spec,
    )

    spark = get_spark("ppdb-audit")
    with open(args.rules) as fh:
        spec = _json.load(fh)
    rules = constraints_from_spec(spark, spec)
    df = spark.read.parquet(args.table)
    rows = constraint_audit(df, rules).collect()
    ok = True
    for r in rows:
        mark = "PASS" if r["passed"] else "FAIL"
        ok = ok and r["passed"]
        print(f"{mark}  {r['rule']}: {r['n_violations']}/{r['n_checked']} violations")
    if args.violations:
        if not args.id_cols:
            print("--violations requires --id-cols", file=sys.stderr)
            return 2
        ids = [c.strip() for c in args.id_cols.split(",")]
        constraint_violations(df, rules, ids).write.mode("overwrite").parquet(
            args.violations
        )
        print(f"wrote row-level violations to {args.violations}")
    return 0 if ok else 1


def _cmd_compact(args: argparse.Namespace) -> int:
    """Housekeeping: rewrite fragmented partitions of a managed table
    (micro-batch appends accumulate small files; see
    ``ParquetTable.compact``)."""
    from .io.table import ParquetTable

    spark = get_spark("ppdb-compact")
    done = ParquetTable(args.table).compact(
        spark, args.partition_col, max_files_per_partition=args.max_files
    )
    print(f"compacted partitions: {done}")
    return 0


def _cmd_compact_ledger(args: argparse.Namespace) -> int:
    """Housekeeping: fold the ledger's status-event log down to its
    winning row per chunk (``Ledger.compact_log``) — transitions
    append O(batch) events, so the log grows a few rows per chunk
    lifetime; run this on the same schedule as ``compact``."""
    from .ledger import Ledger

    spark = get_spark("ppdb-compact-ledger")
    ledger = Ledger(spark, args.ledger)
    before = ledger.read_log().count()
    ledger.compact_log()
    after = ledger.read_log().count()
    print(f"compacted ledger events: {before} -> {after}")
    return 0


def _cmd_curate(args: argparse.Namespace) -> int:
    """Run the corpus-curation funnel end-to-end and WRITE the result:
    quality filter -> exact dedup (min-id representative) -> optional
    PII redaction -> deterministic split assignment -> parquet
    partitioned by split.

    The operational form of the ``corpus_curate`` query: one shuffle
    (the dedup window), everything else map-side, output partitioned
    so downstream training readers prune by split.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from .llm.sampling import hash_split
    from .llm.text import quality_metrics, redact_pii

    spark = get_spark("ppdb-curate")
    docs = spark.read.parquet(args.input)
    scored = docs.withColumn(
        "quality_score", quality_metrics(F.col("text"))["quality_score"]
    ).filter(F.col("quality_score") >= args.min_quality)
    w = Window.partitionBy(F.md5("text"))
    deduped = (
        scored.withColumn("__keep", F.min("doc_id").over(w) == F.col("doc_id"))
        .filter(F.col("__keep"))
        .drop("__keep")
    )
    if args.redact_pii:
        red, n_red = redact_pii(F.col("text"))
        # count BEFORE replacing text — both expressions reference the
        # "text" column, and withColumn resolves against the frame it
        # is applied to, so the opposite order would count zero.
        deduped = deduped.withColumn("n_redacted", n_red).withColumn("text", red)
    out = hash_split(deduped)
    # Row count via an Observation riding the write job itself — a
    # post-write count() would re-scan the entire output dataset just
    # to print one number.
    from pyspark.sql import Observation

    obs = Observation("curate")
    out = out.observe(obs, F.count(F.lit(1)).alias("rows"))
    out.write.mode("overwrite").partitionBy("split").parquet(args.out)
    kept = obs.get["rows"]
    print(f"curated {kept} docs -> {args.out} (partitioned by split)")
    return 0


def _cmd_create_datasets(args: argparse.Namespace) -> int:
    from .schema.ddl import DatasetBuilder
    from .schema.felis import load_schema

    cfg = _resolve_config(args)
    if not cfg.schema:
        raise SystemExit("create-datasets needs --schema (flag or config)")
    spark = get_spark("ppdb-create-datasets")
    DatasetBuilder(spark, load_schema(cfg.schema), prefix=cfg.prefix).build_all()
    print(f"created datasets with prefix {cfg.prefix!r}")
    return 0


def _cmd_export_delta(args: argparse.Namespace) -> int:
    """Publish (or refresh) the Delta transaction log for a managed
    table so external Delta readers can query the committed snapshot
    (io/delta_export.py; the BigQuery public-dataset analog)."""
    from .io.delta_export import export_delta_log
    from .io.table import ParquetTable

    spark = get_spark("ppdb-export-delta")
    commit = export_delta_log(ParquetTable(args.table), spark)
    print(f"published _delta_log commit {commit} for {args.table}")
    return 0


def _cmd_ann_build(args: argparse.Namespace) -> int:
    """Build (or atomically rebuild) a persisted ANN index over an
    embeddings parquet table — the build-once/query-many serving path.
    ``--kind sq8`` stores int8 scalar-quantized vectors
    (build_ivf_sq8_index); ``--kind pq`` stores m-code residual-PQ
    payloads (build_ivf_pq_index, the RAM tier)."""
    from .llm.similarity import build_ivf_pq_index, build_ivf_sq8_index

    spark = get_spark("ppdb-ann-build")
    emb = spark.read.parquet(args.embeddings)
    if args.kind == "pq":
        build_ivf_pq_index(
            emb,
            args.index,
            n_clusters=args.clusters,
            m=args.pq_m,
            k_cb=args.pq_codebook,
            sample_mod=args.sample_mod,
            vec_col=args.vec_col,
            id_col=args.id_col,
        )
    else:
        build_ivf_sq8_index(
            emb,
            args.index,
            n_clusters=args.clusters,
            sample_mod=args.sample_mod,
            vec_col=args.vec_col,
            id_col=args.id_col,
        )
    print(f"built IVF-{args.kind.upper()} index ({args.clusters} cells) at {args.index}")
    return 0


def _cmd_ann_query(args: argparse.Namespace) -> int:
    """Answer a top-k batch from a persisted index: probes read only
    the probed cells' partitions (partition-pruned)."""
    from .llm.similarity import topk_ivf_pq_index, topk_ivf_sq8_index

    spark = get_spark("ppdb-ann-query")
    queries = spark.read.parquet(args.queries)
    probe = topk_ivf_pq_index if args.kind == "pq" else topk_ivf_sq8_index
    out = probe(
        spark, args.index, queries, k=args.k,
        vec_col=args.vec_col, id_col=args.id_col, probes=args.probes,
    )
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
        print(f"wrote top-{args.k} results to {args.out}")
    else:
        for r in out.orderBy("query_id", "rank").collect():
            print(f"{r.query_id}\t{r.rank}\t{r.neighbor_id}\t{r.cosine}")
    return 0


def _cmd_bucket_table(args: argparse.Namespace) -> int:
    """Lay out a parquet table as an external bucketed directory
    (write-once shuffle; io/bucketed.py), then audit the layout.

    The bucketing metadata lives in the catalog, so a later session
    re-attaches it with register_bucketed (the printed spec is what it
    must declare)."""
    from .io.bucketed import validate_bucketing, write_bucketed

    spark = get_spark("ppdb-bucket-table")
    df = spark.read.parquet(args.input)
    keys = [k.strip() for k in args.key.split(",") if k.strip()]
    write_bucketed(df, args.table, keys, args.buckets, path=args.path)
    n = validate_bucketing(spark, args.table)
    print(
        f"bucketed {n} rows into {args.buckets} buckets on ({', '.join(keys)})"
        f" at {args.path}; re-register in a new session with this exact spec"
    )
    return 0


def _cmd_bucket_validate(args: argparse.Namespace) -> int:
    """Audit an external bucketed directory against a declared spec
    (register + validate in one session): a wrong key or bucket count
    fails loudly instead of silently mis-routing co-located joins."""
    from .io.bucketed import register_bucketed, validate_bucketing

    spark = get_spark("ppdb-bucket-validate")
    keys = [k.strip() for k in args.key.split(",") if k.strip()]
    register_bucketed(
        spark, "bucket_validate_probe", args.path, keys, args.buckets
    )
    n = validate_bucketing(spark, "bucket_validate_probe")
    print(f"layout ok: {n} rows, {args.buckets} buckets on ({', '.join(keys)})")
    return 0


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="ppdb-replication", description="PPDB replication tools (Spark)"
    )
    sub = parser.add_subparsers(title="subcommands", required=True, dest="cmd")

    def add(name: str, help: str, func) -> argparse.ArgumentParser:
        p = sub.add_parser(name, help=help)
        # Flags default to None so a --config file's values win unless
        # the flag is explicitly passed (store_true flags included).
        p.add_argument("-c", "--config", help="YAML config (implementation_type: spark)")
        p.set_defaults(func=func)
        return p

    p = add("list-chunks", "ordered ledger report (S12)", _cmd_list_chunks)
    p.add_argument("ledger", nargs="?", help="ledger table path")

    p = add(
        "list-chunks-apdb",
        "chunks available on the APDB/source side",
        _cmd_list_chunks_apdb,
    )
    p.add_argument("--source", help="APDB chunk export directory")

    p = add("run", "replicate new chunks from an APDB export area", _cmd_run)
    p.add_argument("--source", help="APDB chunk export directory")
    p.add_argument("--root", help="PPDB warehouse root")
    p.add_argument("--min-wait-time", type=float, default=None)
    p.add_argument("--max-wait-time", type=float, default=None)
    p.add_argument("--check-interval", type=float, default=None)
    p.add_argument("--update", action="store_true", default=None,
                   help="allow re-replication of chunks whose uuid changed")
    p.add_argument("--loop", action="store_true", help="poll continuously")
    from .io.parquet_io import COMPRESSION_CHOICES

    p.add_argument("--parq-compression", default=None,
                   choices=sorted(COMPRESSION_CHOICES),
                   help="parquet codec for exported chunks "
                        "(zstd_lvl8/zstd_lvl15 set the zstd level; "
                        "reference cli/options.py:205-213)")

    p = add("upload-chunks", "upload EXPORTED chunks to the bucket", _cmd_upload)
    p.add_argument("--ledger")
    p.add_argument("--export-root")
    p.add_argument("--bucket")
    p.add_argument("--wait-interval", type=float, default=None)
    p.add_argument("--exit-on-error", action="store_true", default=None)
    p.add_argument("--loop", action="store_true")

    p = add("promote", "promote contiguous STAGED chunks", _cmd_promote)
    p.add_argument("--root", help="PPDB warehouse root")

    p = add("audit", "data-quality gate: audit a table against a JSON rule spec",
            _cmd_audit)
    p.add_argument("table", help="parquet table path")
    p.add_argument("--rules", required=True,
                   help="JSON rule spec (see ops.constraints.constraints_from_spec)")
    p.add_argument("--violations", help="write row-level violations parquet here")
    p.add_argument("--id-cols", help="comma-separated id columns for --violations")

    p = add("compact", "rewrite fragmented partitions of a managed table", _cmd_compact)
    p.add_argument("table", help="ParquetTable directory")
    p.add_argument("--partition-col", required=True)
    p.add_argument("--max-files", type=int, default=4,
                   help="rewrite partitions with more parquet files than this")

    p = add("compact-ledger", "fold the ledger event log to its live rows", _cmd_compact_ledger)
    p.add_argument("ledger", help="ledger table path")

    p = add("export-pgcopy", "dump a table as PGCOPY binary part files (S8)", _cmd_export_pgcopy)
    p.add_argument("table", help="parquet table path")
    p.add_argument("out", help="output directory for part-*.pgcopy")
    p.add_argument("--columns", help="comma-separated column subset", default=None)

    p = add("curate", "quality-filter, dedup, split and write a document corpus", _cmd_curate)
    p.add_argument("input", help="documents parquet path (doc_id, text, ...)")
    p.add_argument("out", help="output directory (partitioned by split)")
    p.add_argument("--min-quality", type=float, default=0.4)
    p.add_argument("--redact-pii", action="store_true", default=False)

    p = add("create-datasets", "build the 4-namespace catalog (D13)", _cmd_create_datasets)
    p.add_argument("--schema", help="Felis YAML path")
    p.add_argument("--prefix", default=None)

    p = add(
        "export-delta",
        "publish a Delta-protocol _delta_log over a managed table",
        _cmd_export_delta,
    )
    p.add_argument("table", help="ParquetTable directory")

    p = add("ann-build", "build/rebuild a persisted ANN index (IVF-SQ8 or IVFPQ)", _cmd_ann_build)
    p.add_argument("embeddings", help="embeddings parquet path")
    p.add_argument("index", help="index root directory")
    p.add_argument("--kind", choices=("sq8", "pq"), default="sq8")
    p.add_argument("--clusters", type=int, default=64)
    p.add_argument("--pq-m", type=int, default=4,
                   help="PQ subspaces (kind=pq)")
    p.add_argument("--pq-codebook", type=int, default=8,
                   help="centroids per PQ codebook (kind=pq)")
    p.add_argument("--sample-mod", type=int, default=None,
                   help="train the quantizer on a 1/N md5 hash sample")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--id-col", default="vec_id")

    p = add("bucket-table", "lay out a parquet table as a bucketed directory", _cmd_bucket_table)
    p.add_argument("input", help="source parquet path")
    p.add_argument("path", help="external bucketed table directory")
    p.add_argument("--table", default="bucketed_out", help="catalog name for this session")
    p.add_argument("--key", required=True, help="bucket key column(s), comma-separated")
    p.add_argument("--buckets", type=int, default=32)

    p = add("bucket-validate", "audit a bucketed directory against a declared spec", _cmd_bucket_validate)
    p.add_argument("path", help="bucketed table directory")
    p.add_argument("--key", required=True, help="declared bucket key column(s)")
    p.add_argument("--buckets", type=int, required=True, help="declared bucket count")

    p = add("ann-query", "top-k batch against a persisted ANN index", _cmd_ann_query)
    p.add_argument("index", help="index root directory")
    p.add_argument("queries", help="query vectors parquet path")
    p.add_argument("--kind", choices=("sq8", "pq"), default="sq8")
    p.add_argument("-k", type=int, default=5)
    p.add_argument("--probes", type=int, default=1,
                   help="probe the N nearest cells per query (recall lever)")
    p.add_argument("--out", default=None, help="write results parquet here instead of stdout")
    p.add_argument("--vec-col", default="embedding")
    p.add_argument("--id-col", default="vec_id")

    return parser


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    return args.func(args)


if __name__ == "__main__":
    raise SystemExit(main())
