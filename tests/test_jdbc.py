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


# ---------------------------------------------------------------------------
# S1 credentials: the PasswordProvider analog (sql/_ppdb_sql_base.py:53-70)
# against a Derby database with BUILTIN authentication REQUIRED.
# ---------------------------------------------------------------------------

AUTH_USER, AUTH_PASSWORD = "alice", "s3kretpw"


@pytest.fixture(scope="module")
def auth_db(spark, derby_url):
    """A separate Derby database that REQUIRES authentication: created
    open, loaded, then locked down via database-level properties and
    rebooted so the requirement takes effect."""
    jvm = spark._jvm
    jvm.java.lang.Class.forName(DERBY_DRIVER)
    home = jvm.java.lang.System.getProperty("derby.system.home")
    url = f"jdbc:derby:{home}/authdb"
    dm = jvm.java.sql.DriverManager
    conn = dm.getConnection(url + ";create=true")
    try:
        cs = conn.prepareCall("CALL SYSCS_UTIL.SYSCS_SET_DATABASE_PROPERTY(?, ?)")
        for k, v in [
            ("derby.connection.requireAuthentication", "true"),
            ("derby.authentication.provider", "BUILTIN"),
            (f"derby.user.{AUTH_USER}", AUTH_PASSWORD),
        ]:
            cs.setString(1, k)
            cs.setString(2, v)
            cs.execute()
        cs.close()
    finally:
        conn.close()
    # Derby applies requireAuthentication on database boot; a clean
    # shutdown always signals via SQLException (state 08006).
    try:
        dm.getConnection(url + ";shutdown=true")
    except Exception:
        pass
    # Authenticated load through the Spark JDBC write path.
    data = spark.createDataFrame(
        [(c, 100 * c + i) for c in (1, 2) for i in range(5)],
        "apdb_replica_chunk LONG, diaObjectId LONG",
    )
    write_jdbc_table(
        data,
        url,
        "diaobject",
        DERBY_DRIVER,
        properties={"user": AUTH_USER, "password": AUTH_PASSWORD},
    )
    return url


def test_authenticated_read_requires_credentials(spark, auth_db):
    with pytest.raises(Exception, match="(?i)auth|connect"):
        read_jdbc_chunks(
            spark, auth_db, "diaobject", [1], driver=DERBY_DRIVER
        ).count()


def test_authenticated_read_with_properties(spark, auth_db):
    out = read_jdbc_chunks(
        spark,
        auth_db,
        "diaobject",
        [1, 2],
        driver=DERBY_DRIVER,
        properties={"user": AUTH_USER, "password": AUTH_PASSWORD},
    )
    assert out.count() == 10
    assert out.rdd.getNumPartitions() == 2


def test_password_provider_is_lazy_and_exclusive(spark, auth_db):
    calls = []

    def provider():
        calls.append(1)
        return AUTH_PASSWORD

    src = JdbcApdbSource(
        spark,
        auth_db,
        driver=DERBY_DRIVER,
        properties={"user": AUTH_USER},
        password_provider=provider,
    )
    n_construct = len(calls)
    df = src.get_table_data_chunks("diaobject", [2])
    assert df.count() == 5
    assert len(calls) > n_construct  # re-invoked per read, never cached
    assert "password" not in src.properties  # secret never stored
    # provider + explicit password is a misconfiguration, not a merge
    with pytest.raises(ValueError, match="must not contain a password"):
        JdbcApdbSource(
            spark,
            auth_db,
            driver=DERBY_DRIVER,
            properties={"user": AUTH_USER, "password": "x"},
            password_provider=provider,
        )


def test_env_password_provider(spark, auth_db, monkeypatch):
    from dax_ppdb_spark.io.jdbc import env_password_provider

    provider = env_password_provider("TEST_APDB_PASSWORD")
    with pytest.raises(KeyError):
        provider()
    monkeypatch.setenv("TEST_APDB_PASSWORD", AUTH_PASSWORD)
    out = read_jdbc_chunks(
        spark,
        auth_db,
        "diaobject",
        [1],
        driver=DERBY_DRIVER,
        properties={"user": AUTH_USER},
        password_provider=provider,
    )
    assert out.count() == 5


def test_password_redacted_in_plan(spark, auth_db):
    """The secret must never surface in plans/explain/UI strings —
    Spark's default spark.redaction.regex masks JDBC options named
    password; pin that our pass-through keeps it in options (not the
    URL), where the redaction applies."""
    df = read_jdbc_chunks(
        spark,
        auth_db,
        "diaobject",
        [1],
        driver=DERBY_DRIVER,
        properties={"user": AUTH_USER, "password": AUTH_PASSWORD},
    )
    qe = df._jdf.queryExecution()
    full = qe.toString()
    simple = qe.explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("extended")
    )
    assert AUTH_PASSWORD not in full
    assert AUTH_PASSWORD not in simple
