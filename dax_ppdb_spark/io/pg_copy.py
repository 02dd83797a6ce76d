"""S8: Postgres binary COPY sink (PGCOPY format), Spark-first.

The reference serializes rows to PostgreSQL's binary COPY format and
feeds ``COPY ... FROM STDIN WITH BINARY``
(``/root/reference/python/lsst/dax/ppdb/sql/pg_dump.py:53-109,250-264``,
``sql/bulk_insert.py:97-139``) — its fast path for bulk RDBMS ingest.
The Spark analog keeps the same wire contract but distributes the
encoding: every partition becomes ONE standalone, self-delimiting
PGCOPY stream (header + tuples + trailer), so a 1000-executor job
yields 1000 files that ingest in parallel with one ``COPY`` each — the
encode (the CPU-heavy half) runs where the data is, Arrow-batched via
``mapInPandas``; no driver funnel.

Format (public, PostgreSQL docs "COPY ... WITH BINARY"): 19-byte
signature ``PGCOPY\\n\\377\\r\\n\\0`` + int32 flags + int32 header
extension, then per tuple an int16 field count and per field an int32
byte length (-1 = NULL) + big-endian payload; trailer int16 -1.
Timestamps are int64 microseconds since 2000-01-01 (epoch-2000), the
PG convention the reference also implements.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BinaryType,
    BooleanType,
    ByteType,
    DataType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    ShortType,
    StringType,
    StructType,
    TimestampType,
)

PGCOPY_SIGNATURE = b"PGCOPY\n\xff\r\n\x00"
PGCOPY_HEADER = PGCOPY_SIGNATURE + struct.pack(">ii", 0, 0)
PGCOPY_TRAILER = struct.pack(">h", -1)
# PG timestamps count µs from 2000-01-01; unix epoch is 946684800s earlier.
_PG_EPOCH_US = 946_684_800_000_000


def _encoder(dtype: DataType):
    """bytes-encoder for one non-null field value (big-endian)."""
    if isinstance(dtype, (ByteType, ShortType)):
        return lambda v: struct.pack(">h", int(v))
    if isinstance(dtype, IntegerType):
        return lambda v: struct.pack(">i", int(v))
    if isinstance(dtype, LongType):
        return lambda v: struct.pack(">q", int(v))
    if isinstance(dtype, FloatType):
        return lambda v: struct.pack(">f", float(v))
    if isinstance(dtype, DoubleType):
        return lambda v: struct.pack(">d", float(v))
    if isinstance(dtype, BooleanType):
        return lambda v: b"\x01" if v else b"\x00"
    if isinstance(dtype, StringType):
        return lambda v: str(v).encode("utf-8")
    if isinstance(dtype, BinaryType):
        return lambda v: bytes(v)
    if isinstance(dtype, TimestampType):
        # pre-viewed to int64 ns in the batch loop; PG wants epoch-2000 µs
        return lambda v: struct.pack(">q", int(v) // 1000 - _PG_EPOCH_US)
    raise TypeError(f"PGCOPY sink does not support column type {dtype}")


def pg_copy_tuples(df: DataFrame) -> DataFrame:
    """Encode every row as one PGCOPY binary tuple (column
    ``pg_tuple``) — the distributed half of the sink, usable on its
    own to feed any transport (files below, or a JDBC/psycopg COPY
    writer on a cluster with DB access).

    Arrow-batched ``mapInPandas``: null masks and the fixed per-column
    encoders are resolved once per batch; only the final per-row
    concatenation is a Python loop (the same per-tuple work a
    single-node encoder pays, here spread across executors).
    """
    import pandas as pd

    schema: StructType = df.schema
    cols = [f.name for f in schema.fields]
    encs = [_encoder(f.dataType) for f in schema.fields]
    nfields = struct.pack(">h", len(cols))
    null_field = struct.pack(">i", -1)

    is_ts = [isinstance(f.dataType, TimestampType) for f in schema.fields]

    def encode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            series = [pdf[c] for c in cols]
            masks = [s.isna().to_numpy() for s in series]
            # timestamps view as int64 ns (vectorized); NaT slots are
            # masked before the encoder ever sees them
            values = [
                s.to_numpy(dtype="datetime64[ns]").view("int64") if ts else s.to_numpy()
                for s, ts in zip(series, is_ts)
            ]
            out = []
            for i in range(len(pdf)):
                parts = [nfields]
                for mask, vals, enc in zip(masks, values, encs):
                    if mask[i]:
                        parts.append(null_field)
                    else:
                        payload = enc(vals[i])
                        parts.append(struct.pack(">i", len(payload)) + payload)
                out.append(b"".join(parts))
            yield pd.DataFrame({"pg_tuple": out})

    return df.mapInPandas(encode, "pg_tuple binary")


def write_pg_copy(df: DataFrame, out_dir: str) -> int:
    """Write ``df`` as PGCOPY part files, one complete COPY stream per
    partition; returns the number of files written.

    Each ``part-NNNNN.pgcopy`` carries its own header and trailer, so
    ingest is ``for f in parts: COPY t FROM f WITH (FORMAT binary)`` —
    embarrassingly parallel, matching how the reference splits bulk
    loads per chunk.  Executors write directly to ``out_dir`` (shared
    filesystem or mount; an object-store deployment swaps the file
    open for a multipart upload).  Empty partitions write no file.
    """
    os.makedirs(out_dir, exist_ok=True)
    encoded = pg_copy_tuples(df)

    def dump(index: int, it):
        path = os.path.join(out_dir, f"part-{index:05d}.pgcopy")
        n = 0
        f = None
        try:
            for row in it:
                if f is None:
                    f = open(path, "wb")
                    f.write(PGCOPY_HEADER)
                f.write(row.pg_tuple)
                n += 1
            if f is not None:
                f.write(PGCOPY_TRAILER)
        finally:
            if f is not None:
                f.close()
        return iter([n] if n else [])

    counts = encoded.rdd.mapPartitionsWithIndex(dump).collect()
    return len(counts)


def read_pg_copy(path: str, schema: StructType) -> list[tuple]:
    """Decode one PGCOPY file back to Python tuples — the test/audit
    twin of the encoder (driver-side; not a data path)."""
    decs = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, (ByteType, ShortType)):
            decs.append(lambda b: struct.unpack(">h", b)[0])
        elif isinstance(dt, IntegerType):
            decs.append(lambda b: struct.unpack(">i", b)[0])
        elif isinstance(dt, LongType):
            decs.append(lambda b: struct.unpack(">q", b)[0])
        elif isinstance(dt, FloatType):
            decs.append(lambda b: struct.unpack(">f", b)[0])
        elif isinstance(dt, DoubleType):
            decs.append(lambda b: struct.unpack(">d", b)[0])
        elif isinstance(dt, BooleanType):
            decs.append(lambda b: b == b"\x01")
        elif isinstance(dt, StringType):
            decs.append(lambda b: b.decode("utf-8"))
        elif isinstance(dt, BinaryType):
            decs.append(lambda b: b)
        elif isinstance(dt, TimestampType):
            decs.append(lambda b: struct.unpack(">q", b)[0] + _PG_EPOCH_US)
        else:
            raise TypeError(f"unsupported {dt}")
    rows = []
    with open(path, "rb") as f:
        data = f.read()
    assert data[: len(PGCOPY_SIGNATURE)] == PGCOPY_SIGNATURE, "bad signature"
    pos = len(PGCOPY_HEADER)
    while True:
        (nf,) = struct.unpack_from(">h", data, pos)
        pos += 2
        if nf == -1:
            break
        vals = []
        for d in decs[:nf]:
            (ln,) = struct.unpack_from(">i", data, pos)
            pos += 4
            if ln == -1:
                vals.append(None)
            else:
                vals.append(d(data[pos : pos + ln]))
                pos += ln
        rows.append(tuple(vals))
    return rows
