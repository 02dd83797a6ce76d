"""JDBC APDB source against embedded Apache Derby — the REAL
``spark.read.jdbc`` path (Derby ships with Spark), pinning:

- per-chunk partitioned reads (one JDBC partition per chunk id),
- predicate pushdown into the remote scan,
- the Replicator loop running end-to-end against a live database
  source instead of a directory of exports (reference
  ``replicator.py:165-181``).
"""

from __future__ import annotations

import datetime
import os

import pytest

from dax_ppdb_spark.io.jdbc import (
    DERBY_DRIVER,
    JdbcApdbSource,
    read_jdbc_chunks,
    write_jdbc_table,
)
from dax_ppdb_spark.ledger import Ledger
from dax_ppdb_spark.pipeline.replicate import Replicator

UTC = datetime.timezone.utc


@pytest.fixture(scope="module")
def derby_url(spark, tmp_path_factory):
    home = tmp_path_factory.mktemp("derby_home")
    # Route derby.log (and any other Derby system files) into the tmp
    # dir; must happen before the embedded driver first boots.
    spark._jvm.java.lang.System.setProperty("derby.system.home", str(home))
    return f"jdbc:derby:{home}/apdb;create=true"


@pytest.fixture(scope="module")
def apdb_tables(spark, derby_url):
    """A 4-chunk APDB: a chunk catalog plus a DiaObject-ish data
    table (the same fixture shape as the reference's tests/_ppdb.py
    chunk generator)."""
    base = datetime.datetime(2026, 1, 1, 12, 0, 0, tzinfo=UTC).timestamp()
    catalog = spark.createDataFrame(
        [(c, f"uuid-{c}", base - 3600.0 * (5 - c)) for c in (1, 2, 3, 4)],
        "apdb_replica_chunk LONG, unique_id STRING, created_at DOUBLE",
    )
    write_jdbc_table(catalog, derby_url, "apdb_replica_chunks", DERBY_DRIVER)
    data = spark.createDataFrame(
        [
            (c, 100 * c + i, 10.0 * c + i, -5.0 + i)
            for c in (1, 2, 3, 4)
            for i in range(5)
        ],
        "apdb_replica_chunk LONG, diaObjectId LONG, ra DOUBLE, dec DOUBLE",
    )
    write_jdbc_table(data, derby_url, "diaobject", DERBY_DRIVER)
    return derby_url


def test_read_jdbc_chunks_one_partition_per_chunk(spark, apdb_tables):
    out = read_jdbc_chunks(
        spark, apdb_tables, "diaobject", [1, 3], driver=DERBY_DRIVER
    )
    # one JDBC partition (connection + pushed WHERE) per chunk id
    assert out.rdd.getNumPartitions() == 2
    rows = out.collect()
    assert len(rows) == 10
    assert {r.apdb_replica_chunk for r in rows} == {1, 3}
    # duplicate ids collapse; order does not matter
    again = read_jdbc_chunks(
        spark, apdb_tables, "diaobject", [3, 1, 3], driver=DERBY_DRIVER
    )
    assert again.count() == 10


def test_jdbc_filter_pushes_into_remote_scan(spark, apdb_tables):
    from pyspark.sql import functions as F

    df = (
        spark.read.jdbc(
            apdb_tables, "diaobject", properties={"driver": DERBY_DRIVER}
        )
        .filter(F.col("apdb_replica_chunk") >= 3)
        .select("diaObjectId")
    )
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("simple")
    )
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(apdb_replica_chunk,3)" in plan
    assert df.count() == 10


def test_jdbc_source_lists_chunks_in_id_order(spark, apdb_tables):
    src = JdbcApdbSource(spark, apdb_tables, driver=DERBY_DRIVER)
    chunks = src.list_chunks()
    assert [c.chunk_id for c in chunks] == [1, 2, 3, 4]
    assert chunks[0].unique_id == "uuid-1"
    assert chunks[0].last_update_time < chunks[3].last_update_time


def test_replicator_runs_against_live_jdbc_source(spark, apdb_tables, tmp_path):
    src = JdbcApdbSource(spark, apdb_tables, driver=DERBY_DRIVER)
    ledger = Ledger(spark, str(tmp_path / "ledger"))
    staged = str(tmp_path / "staged")
    copied_rows = {}

    def stage_fn(chunk):
        df = src.get_table_data_chunks("diaobject", [chunk.chunk_id])
        df.write.mode("overwrite").parquet(
            os.path.join(staged, f"chunk={chunk.chunk_id}")
        )
        copied_rows[chunk.chunk_id] = df.count()

    now = datetime.datetime(2026, 1, 1, 13, 0, 0)
    rep = Replicator(spark, src, ledger, min_wait_s=300, max_wait_s=900)
    copied = rep.replicate_once(stage_fn, now=now)
    assert copied == [1, 2, 3, 4]
    assert all(copied_rows[c] == 5 for c in copied)
    led = {r.apdb_replica_chunk for r in ledger.read().collect()}
    assert led == {1, 2, 3, 4}
    # idempotent: a second poll finds nothing to copy
    assert rep.replicate_once(stage_fn, now=now) == []
