"""COPY ... WITH (FORMAT binary) — PG binary dump decode
(sources/pgcopy.py; reference src/copy.c binary path)."""

import datetime
import os
import struct
import tempfile

import pytest
from pyspark.sql import types as T

from timescaledb_spark.sources.pgcopy import (
    PGCOPY_SIGNATURE,
    iter_pgcopy_tuples,
    read_pgcopy,
    write_pgcopy,
)

SCHEMA = (
    "ts timestamp, eid bigint, cnt int, ok boolean, v double, "
    "name string, d date, payload binary"
)

ROWS = [
    (
        datetime.datetime(2024, 1, 5, 12, 30, 15, 123456),
        7,
        42,
        True,
        3.5,
        "héllo",
        datetime.date(2024, 2, 29),
        b"\x00\x01\xff",
    ),
    (
        datetime.datetime(1999, 12, 31, 23, 59, 59),  # pre-PG-epoch
        -1,
        None,
        False,
        None,
        "",
        None,
        None,
    ),
]


def test_roundtrip_all_types(spark):
    blob = write_pgcopy(ROWS, SCHEMA)
    assert blob.startswith(PGCOPY_SIGNATURE)
    got = list(iter_pgcopy_tuples(blob, T.StructType.fromDDL(SCHEMA)))
    assert got == ROWS


def test_int_widening(spark):
    # int4 wire data into a BIGINT column widens (PG binary-compat)
    blob = bytearray(write_pgcopy([(5,)], "x int"))
    got = list(iter_pgcopy_tuples(bytes(blob), T.StructType.fromDDL("x bigint")))
    assert got == [(5,)]


def test_bad_signature_rejected(spark):
    with pytest.raises(ValueError, match="signature"):
        list(iter_pgcopy_tuples(b"NOTPGCOPY" + b"\x00" * 32,
                                T.StructType.fromDDL("x int")))


def test_truncation_rejected(spark):
    blob = write_pgcopy([(1,), (2,)], "x int")
    with pytest.raises(ValueError, match="truncated"):
        list(iter_pgcopy_tuples(blob[:-3], T.StructType.fromDDL("x int")))


def test_field_count_mismatch_rejected(spark):
    blob = write_pgcopy([(1, 2)], "x int, y int")
    with pytest.raises(ValueError, match="fields"):
        list(iter_pgcopy_tuples(blob, T.StructType.fromDDL("x int")))


def test_oid_flag_rejected(spark):
    blob = bytearray(write_pgcopy([(1,)], "x int"))
    struct.pack_into(">i", blob, len(PGCOPY_SIGNATURE), 1 << 16)
    with pytest.raises(ValueError, match="flag"):
        list(iter_pgcopy_tuples(bytes(blob), T.StructType.fromDDL("x int")))


def test_header_extension_skipped(spark):
    blob = write_pgcopy(ROWS, SCHEMA)
    head = len(PGCOPY_SIGNATURE)
    ext = b"futurestuff"
    patched = (
        blob[:head]
        + struct.pack(">iI", 0, len(ext))
        + ext
        + blob[head + 8:]
    )
    got = list(iter_pgcopy_tuples(patched, T.StructType.fromDDL(SCHEMA)))
    assert got == ROWS


def test_read_pgcopy_distributed(spark):
    d = tempfile.mkdtemp(prefix="ts_pgc_")
    # two dump files -> two input tasks
    write_pgcopy(ROWS[:1], SCHEMA, os.path.join(d, "a.bin"))
    write_pgcopy(ROWS[1:], SCHEMA, os.path.join(d, "b.bin"))
    df = read_pgcopy(spark, d, SCHEMA)
    got = sorted([tuple(r) for r in df.collect()], key=lambda r: r[1])
    want = sorted(ROWS, key=lambda r: r[1])
    assert [tuple(map(_norm, g)) for g in got] == [
        tuple(map(_norm, w)) for w in want
    ]


def _norm(v):
    if isinstance(v, bytearray):
        return bytes(v)
    return v


def test_copy_sql_binary_into_hypertable(spark):
    from timescaledb_spark.session import TSSession

    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_cpsql_"))
    ts.sql(
        "CREATE TABLE cb (ts TIMESTAMPTZ NOT NULL, eid BIGINT, "
        "v DOUBLE PRECISION) WITH (tsdb.hypertable, "
        "tsdb.partition_column='ts', tsdb.chunk_interval='7 days')"
    )
    rows = [
        (datetime.datetime(2024, 1, 1 + i // 4, i % 4), i, float(i) / 2)
        for i in range(40)
    ]
    rows.append((datetime.datetime(2024, 1, 20), 99, None))
    path = os.path.join(tempfile.mkdtemp(prefix="ts_cpb_"), "dump.bin")
    write_pgcopy(rows, "ts timestamp, eid bigint, v double", path)
    out = ts.sql(f"COPY cb FROM '{path}' WITH (FORMAT binary)").collect()
    assert out[0]["rows_copied"] == 41
    ht = ts.get_hypertable("cb")
    assert ht.df().count() == 41
    # routed through normal chunking: multiple week chunks
    assert len(ht.chunks()) >= 2
    got = {r["eid"]: r["v"] for r in ht.df().collect()}
    assert got[99] is None and got[7] == 3.5


def test_copy_where_filters_rows(spark):
    import csv

    from timescaledb_spark.session import TSSession

    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_cpw_"))
    ts.sql(
        "CREATE TABLE cw (ts TIMESTAMPTZ NOT NULL, eid BIGINT, "
        "v DOUBLE PRECISION) WITH (tsdb.hypertable, "
        "tsdb.partition_column='ts', tsdb.chunk_interval='7 days')"
    )
    d = tempfile.mkdtemp(prefix="ts_cpwf_")
    p = os.path.join(d, "rows.csv")
    with open(p, "w", newline="") as f:
        w = csv.writer(f)
        for i in range(20):
            w.writerow([f"2024-01-{1 + i % 5:02d} 00:00:00", i, i / 2])
    out = ts.sql(
        f"COPY cw FROM '{p}' WITH (FORMAT csv) WHERE eid % 2 = 0"
    ).collect()
    assert out[0]["rows_copied"] == 10
    got = sorted(r["eid"] for r in ts.get_hypertable("cw").df().collect())
    assert got == list(range(0, 20, 2))

    # binary format + WHERE compose
    from timescaledb_spark.sources.pgcopy import write_pgcopy

    pb = os.path.join(d, "rows.bin")
    write_pgcopy(
        [(datetime.datetime(2024, 2, 1), 100 + i, float(i)) for i in range(6)],
        "ts timestamp, eid bigint, v double",
        pb,
    )
    out = ts.sql(
        f"COPY cw FROM '{pb}' WITH (FORMAT binary) WHERE v >= 3"
    ).collect()
    assert out[0]["rows_copied"] == 3
