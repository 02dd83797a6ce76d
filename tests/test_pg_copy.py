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
