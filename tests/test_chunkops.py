"""Chunk surgery (merge/split) and hypertable DML (upsert/update)."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.chunkops import merge_chunks, split_chunk
from timescaledb_spark.session import TSSession

T0_US = 1704067200000000  # 2024-01-01T00:00Z
DAY_US = 86400 * 1_000_000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _seed(ts, spark, name="ev", days=6):
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


def test_merge_chunks(ts, spark):
    ht = _seed(ts, spark)
    starts = [c["range_start"] for c in ht.chunks()]
    merged = merge_chunks(ht, starts[:3])
    assert merged["range_start"] == starts[0]
    assert merged["range_end"] == starts[0] + 3 * DAY_US
    assert len(ht.chunks()) == 4
    assert ht.df().count() == 6 * 24
    # pruned read across the merged boundary still correct
    assert ht.read(start="2024-01-02", end="2024-01-04").count() == 48


def test_merge_rejects_non_adjacent(ts, spark):
    ht = _seed(ts, spark)
    starts = [c["range_start"] for c in ht.chunks()]
    with pytest.raises(ValueError, match="not adjacent"):
        merge_chunks(ht, [starts[0], starts[2]])


def test_insert_routes_into_merged_chunk(ts, spark):
    ht = _seed(ts, spark)
    starts = [c["range_start"] for c in ht.chunks()]
    merge_chunks(ht, starts[:3])
    # new row falls inside day 2 — must land in the merged chunk, not a
    # fresh grid chunk
    late = spark.createDataFrame(
        [("2024-01-02 12:30:00", 9, 999.0)], "ts string, device int, value double"
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    ht.insert(late)
    assert len(ht.chunks()) == 4  # no new chunk
    assert ht.df().count() == 6 * 24 + 1
    assert ht.read(start="2024-01-02", end="2024-01-03").count() == 25


def test_split_chunk(ts, spark):
    ht = _seed(ts, spark, name="evs", days=2)
    first = ht.chunks()[0]
    halves = split_chunk(ht, first, at=first["range_start"] + DAY_US // 2)
    assert len(halves) == 2 and len(ht.chunks()) == 3
    assert ht.df().count() == 48
    # each half holds 12 of the original 24 hourly rows
    assert ht.read(end="2024-01-01T12:00").count() == 12
    # routing into the split halves stays correct
    row = spark.createDataFrame(
        [("2024-01-01 13:00:00", 1, 1.0)], "ts string, device int, value double"
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    ht.insert(row)
    assert len(ht.chunks()) == 3
    assert ht.df().count() == 49


def test_upsert_replaces_and_appends(ts, spark):
    ht = _seed(ts, spark, name="evu", days=3)
    # replace hour 0 value, add an hour beyond the end
    up = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 0, -1.0),
            ("2024-01-04 00:00:00", 1, 100.0),
        ],
        "ts string, device int, value double",
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    r = ht.upsert(up, keys=["ts", "device"])
    assert r["rows"] == 2
    assert ht.df().count() == 3 * 24 + 1  # one replaced, one appended
    got = ht.df().filter(F.col("ts") == "2024-01-01 00:00:00").collect()
    assert len(got) == 1 and got[0]["value"] == -1.0
    assert len(ht.chunks()) == 4


def test_upsert_on_columnstore_chunk(ts, spark):
    from timescaledb_spark.compression import compress_chunks, enable_columnstore

    ht = _seed(ts, spark, name="evc", days=2)
    enable_columnstore(ht, segmentby=["device"], orderby=["ts"])
    compress_chunks(ht)
    assert all(c["status"] == "columnstore" for c in ht.chunks())
    up = spark.createDataFrame(
        [("2024-01-01 05:00:00", 1, 55.5)], "ts string, device int, value double"
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    ht.upsert(up, keys=["ts", "device"])
    statuses = [c["status"] for c in ht.chunks()]
    assert statuses == ["rowstore", "columnstore"]  # only touched chunk reverts
    assert ht.df().count() == 48
    assert ht.df().filter("value = 55.5").count() == 1


def test_update_where(ts, spark):
    ht = _seed(ts, spark, name="evw", days=3)
    n = ht.update_where(
        {"value": "value * 10"},
        where="device = 2",
        start="2024-01-02",
        end="2024-01-03",
    )
    assert n == 6  # 24 hours / 4 devices per day
    day2 = ht.read(start="2024-01-02", end="2024-01-03")
    assert day2.filter("device = 2 AND value < 240").count() == 0
    # other days untouched
    assert ht.read(end="2024-01-02").filter("device = 2 AND value >= 240").count() == 0
    assert ht.df().count() == 3 * 24


def test_merge_split_preserve_space_layout(spark, tmp_path):
    """Review fix: merge/split on a space-partitioned hypertable must
    keep the _space= layout (recomputed at the current modulus) — a flat
    rewrite made space-pruned reads silently skip the rewritten chunk —
    and record space_n on the new chunk rows."""
    import os

    from pyspark.sql import functions as F

    from timescaledb_spark.chunkops import merge_chunks, split_chunk
    from timescaledb_spark.session import TSSession

    ts = TSSession(spark, str(tmp_path / "sp"))
    ht = ts.create_hypertable(
        "sp", "ts", chunk_interval="1 day", space_column="dev",
        num_partitions=4,
    )
    df = spark.range(96).select(
        F.timestamp_micros(
            (F.lit(1704067200000000) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 8).cast("int").alias("dev"),
        F.col("id").cast("double").alias("v"),
    )
    ht.insert(df)
    chunks = ht.chunks()
    assert len(chunks) == 4
    total = ht.read().count()
    # pruned read baseline for one device
    dev_rows = ht.read(space_key=3).filter(F.col("dev") == 3).count()
    assert dev_rows == 12

    merged = merge_chunks(ht, [c["range_start"] for c in chunks[:2]])
    assert merged.get("space_n") == 4
    mdir = os.path.join(ht.data_dir, f"_chunk={merged['range_start']}")
    assert any(s.startswith("_space=") for s in os.listdir(mdir))
    assert ht.read().count() == total
    assert ht.read(space_key=3).filter(F.col("dev") == 3).count() == dev_rows

    halves = split_chunk(
        ht, merged["range_start"], merged["range_start"] + 86_400_000_000
    )
    assert all(r.get("space_n") == 4 for r in halves)
    assert ht.read().count() == total
    assert ht.read(space_key=3).filter(F.col("dev") == 3).count() == dev_rows
    # no stray _chunk=*.tmp_* dirs poisoning the scan
    assert not [
        d for d in os.listdir(ht.data_dir) if ".tmp" in d and d.startswith("_chunk=")
    ]


def test_split_refuses_frozen(spark, tmp_path):
    from pyspark.sql import functions as F

    import pytest as _pt

    from timescaledb_spark.chunkops import freeze_chunk, split_chunk
    from timescaledb_spark.session import TSSession

    ts = TSSession(spark, str(tmp_path / "fz"))
    ht = ts.create_hypertable("fz", "ts", chunk_interval="1 day")
    df = spark.range(24).select(
        F.timestamp_micros(
            (F.lit(1704067200000000) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    ht.insert(df)
    c = ht.chunks()[0]
    freeze_chunk(ht, c)
    with _pt.raises(PermissionError, match="frozen"):
        split_chunk(ht, c["range_start"], c["range_start"] + 3600_000_000)
