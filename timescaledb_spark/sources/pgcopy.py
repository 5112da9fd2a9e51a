"""PostgreSQL COPY BINARY format reader/writer (``src/copy.c`` parity;
format spec: PostgreSQL docs "COPY ... WITH (FORMAT binary)" — the
``PGCOPY\\n\\377\\r\\n\\0`` signature, 4-byte flags, 4-byte header
extension, then per-tuple ``int16`` field count and per-field
``int32`` length (-1 = NULL) + network-order field bytes, terminated
by a ``-1`` field-count trailer).

A binary dump is a single non-splittable byte stream (unlike text/csv
there is no row delimiter a splitter could scan for), so the Spark
plan reads each FILE as one unit — ``binaryFile`` source — and decodes
it inside ``mapInPandas``, emitting bounded Arrow batches so a large
dump never materializes as one driver- or executor-side object.
Parallelism comes from the file axis: a glob of N dump files decodes
as N tasks, which is also how the reference parallelizes restores
(one COPY stream per table/chunk file). At 100 TB one would split the
dump into many files; within one file the format itself is inherently
sequential.

Field bytes are interpreted by the TARGET column type (the format
carries no type metadata — PG trusts the table definition; so do we):

==============  ======================================================
Spark type      PG wire form
==============  ======================================================
short/int/long  2/4/8-byte big-endian signed int (width may also be
                narrower than the column: int4 data into a long column
                widens losslessly, matching PG's binary-compat rules)
float/double    4/8-byte IEEE big-endian
boolean         1 byte (0/1)
string          raw UTF-8 bytes
binary          raw bytes (bytea)
timestamp       int64 µs since 2000-01-01 (the PG epoch)
date            int32 days since 2000-01-01
==============  ======================================================
"""

from __future__ import annotations

import io
import struct
from datetime import date, datetime, timedelta
from typing import Iterator, Optional, Union

from pyspark.sql import DataFrame, SparkSession, types as T

PGCOPY_SIGNATURE = b"PGCOPY\n\xff\r\n\x00"
# µs / days from the unix epoch to the PG epoch (2000-01-01)
_PG_EPOCH_US = 946_684_800_000_000
_PG_EPOCH_DAYS = 10_957
_PG_EPOCH_DT = datetime(2000, 1, 1)
_PG_EPOCH_DATE = date(2000, 1, 1)

_BATCH_ROWS = 16_384


def _decoders(schema: T.StructType):
    """One bytes->python decoder per schema field."""
    out = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(
            dt, (T.ShortType, T.IntegerType, T.LongType, T.ByteType)
        ):
            def d(b, _w={1: ">b", 2: ">h", 4: ">i", 8: ">q"}):
                return struct.unpack(_w[len(b)], b)[0]
        elif isinstance(dt, (T.FloatType, T.DoubleType)):
            def d(b):
                return struct.unpack(">f" if len(b) == 4 else ">d", b)[0]
        elif isinstance(dt, T.BooleanType):
            def d(b):
                return b != b"\x00"
        elif isinstance(dt, T.StringType):
            def d(b):
                return b.decode("utf-8")
        elif isinstance(dt, T.BinaryType):
            def d(b):
                return bytes(b)
        elif isinstance(dt, T.TimestampType):
            def d(b):
                return _PG_EPOCH_DT + timedelta(
                    microseconds=struct.unpack(">q", b)[0]
                )
        elif isinstance(dt, T.DateType):
            def d(b):
                return _PG_EPOCH_DATE + timedelta(
                    days=struct.unpack(">i", b)[0]
                )
        else:
            raise ValueError(
                f"COPY BINARY: unsupported target type {dt.simpleString()}"
                f" for column {f.name!r}"
            )
        out.append(d)
    return out


def iter_pgcopy_tuples(
    blob: bytes, schema: T.StructType
) -> Iterator[tuple]:
    """Decode one COPY BINARY stream into row tuples (strict: bad
    signature, field-count mismatch, or truncation raise)."""
    if not blob.startswith(PGCOPY_SIGNATURE):
        raise ValueError("COPY BINARY: bad signature (not a PGCOPY dump)")
    dec = _decoders(schema)
    ncols = len(dec)
    buf = io.BytesIO(blob)
    buf.seek(len(PGCOPY_SIGNATURE))
    flags, ext_len = struct.unpack(">II", buf.read(8))
    if flags & (1 << 16):
        # bit 16 is the pre-PG12 OID flag: it adds a hidden per-tuple
        # field we cannot decode — its own message, like PG's reader
        raise ValueError(
            "COPY BINARY: OID flag bit set (pre-PG12 dump with "
            "per-tuple OIDs is not supported)"
        )
    if flags & 0xFFFF0000:
        # bits 16-31 are reserved for CRITICAL format issues — a reader
        # must abort on any unexpected one (PG COPY BINARY spec;
        # src/backend/commands/copyfromparse.c header check)
        raise ValueError(f"COPY BINARY: unsupported flag bits {flags:#x}")
    # bits 0-15 signal backwards-COMPATIBLE format issues — the spec
    # says a reader should simply ignore any bit set in this range
    buf.seek(ext_len, io.SEEK_CUR)  # header extension: skip, per spec
    while True:
        head = buf.read(2)
        if len(head) < 2:
            raise ValueError("COPY BINARY: truncated stream (no trailer)")
        (nf,) = struct.unpack(">h", head)
        if nf == -1:
            return  # trailer
        if nf != ncols:
            raise ValueError(
                f"COPY BINARY: tuple has {nf} fields, table has {ncols}"
            )
        row = []
        for i in range(ncols):
            (ln,) = struct.unpack(">i", buf.read(4))
            if ln == -1:
                row.append(None)
                continue
            b = buf.read(ln)
            if len(b) != ln:
                raise ValueError("COPY BINARY: truncated field")
            row.append(dec[i](b))
        yield tuple(row)


def read_pgcopy(
    spark: SparkSession,
    path: str,
    schema: Union[str, T.StructType],
) -> DataFrame:
    """Distributed COPY BINARY reader: ``binaryFile`` source (one task
    per dump file) + ``mapInPandas`` decode in bounded batches."""
    import pandas as pd

    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    names = [f.name for f in schema.fields]
    # closure captures only the schema json (picklable, small)
    schema_json = schema.json()

    def decode(batches):
        tgt = T.StructType.fromJson(__import__("json").loads(schema_json))
        for pdf in batches:
            for blob in pdf["content"]:
                rows: list = []
                for tup in iter_pgcopy_tuples(bytes(blob), tgt):
                    rows.append(tup)
                    if len(rows) >= _BATCH_ROWS:
                        yield pd.DataFrame(rows, columns=names)
                        rows = []
                if rows:
                    yield pd.DataFrame(rows, columns=names)

    files = spark.read.format("binaryFile").load(path).select("content")
    return files.mapInPandas(decode, schema)


def write_pgcopy(
    rows,
    schema: Union[str, T.StructType],
    path: Optional[str] = None,
) -> bytes:
    """Encode rows (iterable of tuples/Rows) as one COPY BINARY stream
    — the ``COPY TO`` direction, driver-side (export/test sizes;
    restores are the scale path and go through :func:`read_pgcopy`)."""
    if isinstance(schema, str):
        schema = T.StructType.fromDDL(schema)
    enc = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, (T.ShortType, T.IntegerType, T.LongType)):
            w = {T.ShortType: ">h", T.IntegerType: ">i"}.get(type(dt), ">q")
            def e(v, _w=w):
                return struct.pack(_w, int(v))
        elif isinstance(dt, T.FloatType):
            def e(v):
                return struct.pack(">f", float(v))
        elif isinstance(dt, T.DoubleType):
            def e(v):
                return struct.pack(">d", float(v))
        elif isinstance(dt, T.BooleanType):
            def e(v):
                return b"\x01" if v else b"\x00"
        elif isinstance(dt, T.StringType):
            def e(v):
                return str(v).encode("utf-8")
        elif isinstance(dt, T.BinaryType):
            def e(v):
                return bytes(v)
        elif isinstance(dt, T.TimestampType):
            def e(v):
                return struct.pack(
                    ">q",
                    (v - _PG_EPOCH_DT) // timedelta(microseconds=1),
                )
        elif isinstance(dt, T.DateType):
            def e(v):
                return struct.pack(">i", (v - _PG_EPOCH_DATE).days)
        else:
            raise ValueError(
                f"COPY BINARY: unsupported type {dt.simpleString()}"
            )
        enc.append(e)
    out = io.BytesIO()
    out.write(PGCOPY_SIGNATURE)
    out.write(struct.pack(">iI", 0, 0))
    n = len(enc)
    for r in rows:
        out.write(struct.pack(">h", n))
        for i in range(n):
            v = r[i]
            if v is None:
                out.write(struct.pack(">i", -1))
            else:
                b = enc[i](v)
                out.write(struct.pack(">i", len(b)))
                out.write(b)
    out.write(struct.pack(">h", -1))
    blob = out.getvalue()
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob
