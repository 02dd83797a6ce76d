"""Bucketed corpus layout: pay the shuffle ONCE at write time.

A dedup/join-heavy training-data pipeline keeps re-shuffling the same
corpus on the same key — ``doc_id`` for span/paragraph joins, the
cluster id for keep-best, the chunk id for replication diffs.  At
100 TB that recurring exchange dominates every job.  Spark's bucketed
tables (``bucketBy`` + ``sortBy`` + ``saveAsTable``) persist the hash
partitioning in the catalog so the optimizer can PROVE the
distribution at read time:

- a join of two tables bucketed on the same key with the same bucket
  count runs with **zero Exchange on either side** (and with matching
  ``sortBy`` no Sort either — the sort-merge join reads both sides
  pre-sorted);
- a ``groupBy`` on the bucket key aggregates in place — no exchange
  before the final HashAggregate;
- an equality filter on the bucket key prunes to a single bucket
  (``SelectedBucketsCount: 1 out of N`` in the scan), the catalog
  analogue of the IVF index's partition-pruned probe
  (``llm/similarity.py``).

This is the catalog-backed twin of the two layout levers the package
already uses: the promotion store's RANGE-bucketed directories
(``pipeline/promote.py`` — pruned by directory name, mirroring the
reference's clustered internal tables, cf.
``/root/reference/python/lsst/dax/ppdb/bigquery/_ppdb.py`` clustering
fields) and the persisted IVF index's cell-partitioned parquet.  Use
THIS layout for tables consumed repeatedly by key-equi joins and
aggregations; bucket count is a layout-time decision — size it so one
bucket of the biggest table fits an executor core's working set
(~128-512 MB of parquet per bucket at 100 TB scale).

Plan properties are pinned by ``tests/test_bucketed.py``.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import DataFrame, SparkSession, functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    keys: list[str] | str,
    buckets: int,
    sort: list[str] | str | None = None,
    path: str | None = None,
    single_file_buckets: bool = True,
) -> None:
    """Persist ``df`` as a bucketed catalog table (overwriting).

    ``keys`` drive the bucket hash; ``sort`` (defaults to ``keys``)
    orders rows inside each bucket file so downstream sort-merge joins
    can skip their Sort (see :func:`enable_sorted_bucket_scan`).
    ``path`` makes it an external table — the data lands there instead
    of the session warehouse.

    ``single_file_buckets`` (default on) repartitions by the bucket
    keys to ``buckets`` partitions before the write.  Without it every
    write task emits its own file into every bucket it touches — a
    tasks-x-buckets small-file explosion — and multi-file buckets are
    not provably sorted, so the read side must re-Sort before every
    merge join.  ``repartition(n, keys)`` uses the same
    ``pmod(murmur3, n)`` placement as the bucket-id function, so each
    task holds exactly one bucket and writes exactly one file.  Turn
    it off only when one bucket exceeds a single task's disk/memory —
    at that point the bucket count is too low for the data anyway.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sort = keys if sort is None else ([sort] if isinstance(sort, str) else list(sort))
    if single_file_buckets:
        df = df.repartition(buckets, *[F.col(k) for k in keys])
    writer = (
        df.write.format("parquet")
        .mode("overwrite")
        .bucketBy(buckets, *keys)
        .sortBy(*sort)
    )
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def enable_sorted_bucket_scan(spark: SparkSession) -> None:
    """Let merge joins trust the bucket files' sort order: co-located
    joins of single-file-bucket tables become pure merge joins — no
    Exchange AND no Sort on either side (sorting a 50 TB side is the
    second-biggest cost after shuffling it).

    Spark stopped reporting bucketed-scan output ordering by default
    in 3.0 (``spark.sql.legacy.bucketedTableScan.outputOrdering``)
    because a bucket spread over several files is only sorted within
    each file.  The planner still proves the single-file condition
    per scan before using the ordering — a multi-file bucketed table
    keeps its Sort even with this flag on (pinned by
    ``tests/test_bucketed.py``) — so enabling it is safe; it simply
    restores the payoff of :func:`write_bucketed`'s
    ``single_file_buckets`` layout.
    """
    spark.conf.set(
        "spark.sql.legacy.bucketedTableScan.outputOrdering", "true"
    )


def register_bucketed(
    spark: SparkSession,
    table: str,
    path: str,
    keys: list[str] | str,
    buckets: int,
    sort: list[str] | str | None = None,
) -> DataFrame:
    """Re-attach bucketing metadata to an existing data directory.

    Bucket layout lives in the CATALOG, not the files: a session that
    merely ``spark.read.parquet(path)``s a directory written by
    :func:`write_bucketed` gets correct rows but a layout-blind plan —
    every join shuffles again, defeating the write-time investment.
    On a cluster the metastore persists the metadata; with this
    package's session-local in-memory catalog (and for any directory
    handed over between deployments), call this once per session to
    restore it.  ``keys``/``buckets``/``sort`` must match what the
    directory was WRITTEN with — bucket ids are baked into the file
    contents and names, and a wrong declaration silently mis-routes
    co-located joins; :func:`bucket_spec` on the original table is the
    source of truth.

    The column list comes from the parquet footer (CREATE TABLE with
    bucketing requires an explicit schema).  Returns the registered
    table's DataFrame.
    """
    keys = [keys] if isinstance(keys, str) else list(keys)
    sort = keys if sort is None else ([sort] if isinstance(sort, str) else list(sort))
    schema = spark.read.parquet(path).schema
    if "`" in table or any("`" in f.name for f in schema):
        raise ValueError("backticks in table/column names are not supported")
    cols = ", ".join(f"`{f.name}` {f.dataType.simpleString()}" for f in schema)
    key_list = ", ".join(f"`{k}`" for k in keys)
    sort_list = ", ".join(f"`{s}`" for s in sort)
    loc = path.replace("'", "''")  # SQL string-literal escape
    spark.sql(
        f"CREATE TABLE `{table}` ({cols}) USING parquet "
        f"CLUSTERED BY ({key_list}) SORTED BY ({sort_list}) "
        f"INTO {buckets} BUCKETS LOCATION '{loc}'"
    )
    return spark.table(table)


def validate_bucketing(spark: SparkSession, table: str) -> int:
    """Audit that ``table``'s rows actually live in the bucket files
    its catalog spec claims — the check that catches a wrong
    :func:`register_bucketed` declaration BEFORE a co-located join
    silently drops matches.

    Spark's bucket id is ``pmod(murmur3(keys), n)`` — the same hash
    ``F.hash`` exposes (seed 42, columns chained in order) — and each
    file name carries its bucket id (``..._00003.c000...``).  One
    distributed scan recomputes the id per row and compares it to the
    id parsed from ``input_file_name``.  Raises ``ValueError`` with
    the mismatch count on a bad layout; returns the validated row
    count on a good one.
    """
    n, keys = bucket_spec(spark, table)
    if n <= 0:
        raise ValueError(f"{table} is not bucketed")
    df = spark.table(table)
    # a file with no _NNNNN. marker (e.g. a plain-parquet directory
    # registered as bucketed) must COUNT AS A MISMATCH, not crash the
    # ANSI cast on '' or silently null out of the comparison.  The
    # extraction anchors to the BASENAME: matching the full path would
    # let a directory component like 'run_00001.v2' mis-parse every
    # row's bucket id and fail a perfectly valid layout.
    basename = F.element_at(F.split(F.input_file_name(), "/"), -1)
    fid_str = F.regexp_extract(basename, r"_(\d{5})\.", 1)
    fid = F.when(F.length(fid_str) > 0, fid_str.cast("int"))
    expected = F.pmod(F.hash(*[F.col(k) for k in keys]), F.lit(n))
    bad = F.when(fid.isNull() | (fid != expected), F.lit(1)).otherwise(F.lit(0))
    counts = df.select(bad.alias("bad")).agg(
        F.sum("bad").alias("bad"), F.count(F.lit(1)).alias("total")
    ).head()
    if counts["bad"]:
        raise ValueError(
            f"{table}: {counts['bad']} of {counts['total']} rows are in "
            f"the wrong bucket for spec ({n} buckets on {keys}) — the "
            "registered layout does not match the files"
        )
    return int(counts["total"])


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    """Read a bucketed table back with its distribution metadata (a
    plain ``spark.table`` — named for call-site symmetry)."""
    return spark.table(table)


def drop_bucketed(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")


@contextmanager
def bucket_pruned_scan(spark: SparkSession):
    """Scope in which filter-only scans of bucketed tables keep their
    bucket metadata (and therefore bucket PRUNING).

    Spark's auto-bucketed-scan rule (on by default) disables the
    bucketed read when no join/aggregation needs the distribution —
    which also forfeits pruning, so a bare ``table.filter(key = v)``
    scans every bucket.  Physical planning happens at ACTION time, so
    the action must run inside this scope; a DataFrame built here but
    collected outside replans under the restored conf and loses the
    pruning.  Mutates a session conf — not safe under concurrent
    planning from other threads of the same session.
    """
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    prev = spark.conf.get(conf)
    spark.conf.set(conf, "false")
    try:
        yield
    finally:
        spark.conf.set(conf, prev)


def point_lookup(spark: SparkSession, table: str, key: str, value) -> list:
    """Equality or IN-list probe on the bucket key, bucket-pruned,
    EAGER: returns the matching ``Row``s.

    Runs the collect inside :func:`bucket_pruned_scan` so the actual
    read prunes to ``SelectedBucketsCount: 1 out of N`` (one bucket
    per probed key; a list/tuple/set ``value`` becomes an IN probe
    over at most ``len(value)`` buckets — the replication pipeline's
    chunk-batch shape).  Eager by design: a point lookup is an
    action, and a lazily returned DataFrame would silently lose the
    pruning when collected outside the conf scope.
    """
    with bucket_pruned_scan(spark):
        if isinstance(value, (list, tuple, set, frozenset)):
            cond = F.col(key).isin(*value)
        else:
            cond = F.col(key) == F.lit(value)
        return spark.table(table).filter(cond).collect()


def bucket_spec(spark: SparkSession, table: str) -> tuple[int, list[str]]:
    """(num_buckets, bucket_columns) from the catalog, for asserting
    two tables are co-located before relying on an exchange-free plan."""
    rows = spark.sql(f"DESCRIBE TABLE EXTENDED {table}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    n = int(info.get("Num Buckets", "0"))
    cols_raw = info.get("Bucket Columns", "")
    cols = [c.strip(" `") for c in cols_raw.strip("[]").split(",") if c.strip(" `")]
    return n, cols


def colocated(spark: SparkSession, left: str, right: str) -> bool:
    """True when ``left`` and ``right`` bucket on the same columns with
    the same bucket count — the precondition for an exchange-free join."""
    ln, lc = bucket_spec(spark, left)
    rn, rc = bucket_spec(spark, right)
    return ln > 0 and ln == rn and lc == rc
