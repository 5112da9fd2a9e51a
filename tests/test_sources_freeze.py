"""COPY-style loaders, frozen-chunk enforcement, attach/detach, cagg WHERE."""

import os

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.chunkops import (
    attach_chunk,
    detach_chunk,
    freeze_chunk,
    unfreeze_chunk,
)
from timescaledb_spark.session import TSSession
from timescaledb_spark.sources import copy_into, read_csv, read_json

T0_US = 1704067200000000
DAY_US = 86400 * 1_000_000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _seed(ts, spark, name="ev", days=3):
    ht = ts.create_hypertable(name, "ts", chunk_interval="1 day")
    df = spark.range(days * 24).select(
        F.timestamp_micros(
            (F.lit(T0_US) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 4).cast("int").alias("device"),
        F.col("id").cast("double").alias("value"),
    )
    ht.insert(df)
    return ht


def test_copy_csv(ts, spark, tmp_path):
    p = str(tmp_path / "in.csv")
    with open(p, "w") as f:
        f.write("ts,device,value\n")
        for h in range(48):
            f.write(f"2024-01-01 {h % 24:02d}:00:00,{h % 3},{float(h)}\n")
    ht = ts.create_hypertable("csvt", "ts", chunk_interval="1 day")
    df = read_csv(spark, p, schema="ts timestamp, device int, value double")
    r = copy_into(ht, df)
    assert r["rows"] == 48
    assert ht.df().count() == 48


def test_copy_json(ts, spark, tmp_path):
    p = str(tmp_path / "in.jsonl")
    with open(p, "w") as f:
        for h in range(24):
            f.write(
                f'{{"ts": "2024-01-01T{h:02d}:00:00", "device": {h % 2}, "value": {h}.5}}\n'
            )
    ht = ts.create_hypertable("jsont", "ts", chunk_interval="1 day")
    df = read_json(spark, p, schema="ts timestamp, device int, value double")
    r = copy_into(ht, df)
    assert r["rows"] == 24 and ht.df().count() == 24


def test_freeze_blocks_writes(ts, spark):
    ht = _seed(ts, spark)
    first = ht.chunks()[0]
    freeze_chunk(ht, first)
    row = spark.createDataFrame(
        [("2024-01-01 02:30:00", 1, 9.0)], "ts string, device int, value double"
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    with pytest.raises(PermissionError, match="frozen"):
        ht.insert(row)
    with pytest.raises(PermissionError, match="frozen"):
        ht.upsert(row, keys=["ts", "device"])
    with pytest.raises(PermissionError, match="frozen"):
        ht.delete_range(None, first["range_end"])
    with pytest.raises(PermissionError, match="frozen"):
        ht.drop_chunks(older_than=first["range_end"])
    # writes to other chunks still fine
    other = spark.createDataFrame(
        [("2024-01-03 02:30:00", 1, 9.0)], "ts string, device int, value double"
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    ht.insert(other)
    unfreeze_chunk(ht, first)
    ht.insert(row)
    assert ht.df().count() == 3 * 24 + 2


def test_detach_attach_chunk(ts, spark):
    ht = _seed(ts, spark)
    first = ht.chunks()[0]
    c = detach_chunk(ht, first)
    assert len(ht.chunks()) == 2
    assert ht.df().count() == 48  # detached data invisible
    # dir still on disk → re-attach restores it
    assert os.path.isdir(os.path.join(ht.data_dir, f"_chunk={c['range_start']}"))
    attach_chunk(ht, c["range_start"], c["range_end"])
    assert len(ht.chunks()) == 3
    assert ht.df().count() == 72
    with pytest.raises(ValueError, match="overlaps"):
        attach_chunk(ht, c["range_start"], c["range_end"])


def test_cagg_with_where(ts, spark):
    ht = _seed(ts, spark, name="evw", days=2)
    cagg = ts.create_cagg(
        "evens", "evw", bucket_width="1 day",
        aggs={"n": "count(1)"}, where="device IN (0, 2)",
    )
    cagg.refresh()
    rows = cagg.read(realtime=False).collect()
    assert all(r["n"] == 12 for r in rows)  # 24 h/day, half the devices
    assert len(rows) == 2
    _ = ht
