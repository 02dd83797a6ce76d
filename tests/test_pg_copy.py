"""S8 PGCOPY sink: wire-format goldens, NULLs, round-trip, per-
partition stream validity.

Reference behavior: /root/reference/python/lsst/dax/ppdb/sql/
pg_dump.py:53-109 (tuple framing, NULL=-1, epoch-2000 timestamps).
"""

from __future__ import annotations

import os
import struct

from pyspark.sql import functions as F

from dax_ppdb_spark.io.pg_copy import (
    PGCOPY_HEADER,
    PGCOPY_TRAILER,
    pg_copy_tuples,
    read_pg_copy,
    write_pg_copy,
)


def test_tuple_golden_bytes(spark):
    """Known values encode to the exact documented wire bytes."""
    df = spark.createDataFrame([(1, 2.5, "ab", True)], "i INT, d DOUBLE, s STRING, b BOOLEAN")
    (row,) = pg_copy_tuples(df).collect()
    expect = (
        struct.pack(">h", 4)
        + struct.pack(">i", 4) + struct.pack(">i", 1)
        + struct.pack(">i", 8) + struct.pack(">d", 2.5)
        + struct.pack(">i", 2) + b"ab"
        + struct.pack(">i", 1) + b"\x01"
    )
    assert bytes(row.pg_tuple) == expect


def test_null_encodes_minus_one(spark):
    df = spark.createDataFrame([(None, 7)], "s STRING, i INT")
    (row,) = pg_copy_tuples(df).collect()
    assert bytes(row.pg_tuple) == (
        struct.pack(">h", 2)
        + struct.pack(">i", -1)
        + struct.pack(">i", 4) + struct.pack(">i", 7)
    )


def test_write_and_roundtrip_all_types(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (1, 100, 10_000_000_000, 1.5, 2.25, "héllo", b"\x00\xff", True),
            (2, None, None, None, None, None, None, None),
        ],
        "id INT, si INT, bi LONG, fl DOUBLE, db DOUBLE, s STRING, by BINARY, bo BOOLEAN",
    ).withColumn(
        "ts",
        F.when(F.col("id") == 1, F.timestamp_micros(F.lit(1_700_000_000_000_000))),
    )
    out = str(tmp_path / "pgcopy")
    n_files = write_pg_copy(df.repartition(1), out)
    assert n_files == 1
    (path,) = [os.path.join(out, f) for f in os.listdir(out)]
    rows = sorted(read_pg_copy(path, df.schema), key=lambda r: r[0])
    assert rows[0][0] == 1 and rows[0][5] == "héllo" and rows[0][6] == b"\x00\xff"
    assert rows[0][8] == 1_700_000_000_000_000  # decoded back to unix µs
    assert rows[1] == (2, None, None, None, None, None, None, None, None)


def test_each_partition_is_standalone_stream(spark, tmp_path):
    """Every part file must carry its own header and trailer (one COPY
    per file), and empty partitions must write nothing."""
    df = spark.range(0, 100).selectExpr("id", "CAST(id AS STRING) AS s")
    out = str(tmp_path / "parts")
    n_files = write_pg_copy(df.repartition(4), out)
    files = sorted(os.listdir(out))
    assert n_files == len(files) and 1 <= n_files <= 4
    total = []
    for f in files:
        raw = open(os.path.join(out, f), "rb").read()
        assert raw.startswith(PGCOPY_HEADER) and raw.endswith(PGCOPY_TRAILER)
        total.extend(read_pg_copy(os.path.join(out, f), df.schema))
    assert sorted(r[0] for r in total) == list(range(100))


def test_full_range_int64_with_nulls_exact(spark, tmp_path):
    """The encoder must keep full-range 64-bit values exact even when
    the column is nullable — the pandas path silently converted such a
    column to float64 and rounded everything past 2^53 (this repo's
    ids are xxhash64 outputs, i.e. full-range)."""
    big = (1 << 53) + 1  # not representable in float64
    df = spark.createDataFrame(
        [(1, big), (2, None), (3, -(1 << 62) - 7)], "id INT, v LONG"
    )
    out = str(tmp_path / "big")
    write_pg_copy(df.repartition(1), out)
    (path,) = [os.path.join(out, f) for f in os.listdir(out)]
    rows = sorted(read_pg_copy(path, df.schema))
    assert rows == [(1, big), (2, None), (3, -(1 << 62) - 7)]


# ---------------------------------------------------------------------------
# Live-Postgres integration: the exported part files must ingest through a
# REAL `COPY ... FROM STDIN WITH (FORMAT binary)` — the wire goldens above
# pin the bytes, this pins the contract with the actual consumer.  Gated:
# skipped wherever the postgres server binaries aren't installed.  The
# server runs as `nobody` (initdb refuses root) on a private unix socket
# under tmp_path_factory — no TCP, no shared state, torn down after.
# ---------------------------------------------------------------------------

import glob
import shutil
import subprocess

import pytest


def _have_live_pg() -> bool:
    return all(
        shutil.which(b) for b in ("initdb", "pg_ctl", "postgres", "psql")
    ) and (os.geteuid() != 0 or shutil.which("setpriv"))


def _as_pg_user(cmd: list[str]) -> list[str]:
    if os.geteuid() == 0:
        return [
            "setpriv", "--reuid=nobody", "--regid=nogroup", "--clear-groups",
        ] + cmd
    return cmd


@pytest.fixture(scope="module")
def live_pg(tmp_path_factory):
    if not _have_live_pg():
        pytest.skip("postgres server binaries not available")
    # NOT tmp_path_factory: its parents are 0700, unreachable for the
    # `nobody` uid the server must run as.  A world-writable mkdtemp
    # directly under /tmp keeps the whole path traversable; cwd="/"
    # likewise (the server user cannot read the test runner's cwd).
    import tempfile

    base_s = tempfile.mkdtemp(prefix="dax_ppdb_livepg_")
    os.chmod(base_s, 0o777)
    dd, sock = os.path.join(base_s, "dd"), os.path.join(base_s, "sock")
    os.makedirs(sock)
    os.chmod(sock, 0o777)
    r = subprocess.run(
        _as_pg_user([
            shutil.which("initdb"), "-D", dd, "-U", "postgres",
            "--no-sync", "-A", "trust",
        ]),
        capture_output=True, text=True, cwd="/",
    )
    if r.returncode != 0:
        pytest.skip(f"initdb failed: {r.stderr[-200:]}")
    subprocess.run(
        _as_pg_user([
            shutil.which("pg_ctl"), "-D", dd, "-l", os.path.join(base_s, "log"),
            "-o", f"-k {sock} -c listen_addresses=''", "-w", "start",
        ]),
        check=True, capture_output=True, cwd="/",
    )
    psql = [
        shutil.which("psql"), "-h", sock, "-U", "postgres", "-d", "postgres",
        "-v", "ON_ERROR_STOP=1",
    ]
    try:
        yield psql
    finally:
        subprocess.run(
            _as_pg_user([shutil.which("pg_ctl"), "-D", dd, "-m", "immediate", "stop"]),
            capture_output=True, cwd="/",
        )
        shutil.rmtree(base_s, ignore_errors=True)


def test_live_copy_binary_roundtrip(spark, tmp_path, live_pg):
    """Every part file COPYies into a real server and every value —
    NULLs, unicode, epoch-2000 timestamps, full-range int64 — reads
    back exactly."""
    big = (1 << 53) + 1
    df = spark.createDataFrame(
        [
            (1, "alpha", 3.5, True, big, "2024-03-01 12:30:45.123456"),
            (2, None, -0.25, False, -(1 << 62) - 7, None),
            (3, "βψ", None, None, None, "1969-12-31 23:59:59.000001"),
        ],
        "id INT, s STRING, d DOUBLE, b BOOLEAN, v LONG, ts_str STRING",
    ).select(
        "id", "s", "d", "b", "v",
        F.to_timestamp("ts_str").alias("ts"),
    )
    out = str(tmp_path / "parts")
    n_files = write_pg_copy(df.repartition(2), out)
    assert n_files >= 1
    subprocess.run(
        live_pg + ["-c",
            "DROP TABLE IF EXISTS t_live;"
            "CREATE TABLE t_live (id INT, s TEXT, d DOUBLE PRECISION,"
            " b BOOLEAN, v BIGINT, ts TIMESTAMP);"],
        check=True, capture_output=True,
    )
    for f in sorted(glob.glob(os.path.join(out, "*.pgcopy"))):
        with open(f, "rb") as fh:
            subprocess.run(
                live_pg + ["-c", "COPY t_live FROM STDIN WITH (FORMAT binary)"],
                stdin=fh, check=True, capture_output=True,
            )
    r = subprocess.run(
        live_pg + ["-At", "-c",
            "SET TimeZone='UTC';"
            "SELECT id, coalesce(s,'<N>'), coalesce(d::text,'<N>'),"
            " coalesce(b::text,'<N>'), coalesce(v::text,'<N>'),"
            " coalesce(to_char(ts,'YYYY-MM-DD HH24:MI:SS.US'),'<N>')"
            " FROM t_live ORDER BY id"],
        capture_output=True, text=True, check=True,
    )
    assert r.stdout.splitlines() == [
        "SET",  # psql's command tag for the SET TimeZone
        f"1|alpha|3.5|true|{big}|2024-03-01 12:30:45.123456",
        f"2|<N>|-0.25|false|{-(1 << 62) - 7}|<N>",
        "3|βψ|<N>|<N>|<N>|1969-12-31 23:59:59.000001",
    ]
