"""Hypertable lifecycle: create, insert (chunk routing), pruned reads,
show_chunks/drop_chunks, size utils."""

import os
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _events(spark, sf="/root/testdata/sf0.001"):
    from timescaledb_spark.sources import load_table

    return load_table(spark, sf, "events")


def test_create_insert_read_roundtrip(ts, spark):
    ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
    src = _events(spark)
    res = ht.insert(src)
    assert res["rows"] == src.count()
    assert len(res["chunks"]) >= 2  # data spans weeks
    got = ht.read()
    assert got.count() == src.count()
    assert set(got.columns) == set(src.columns)
    # value-level roundtrip
    a = sorted(r["event_id"] for r in got.select("event_id").collect())
    b = sorted(r["event_id"] for r in src.select("event_id").collect())
    assert a == b


def test_chunk_bounds_and_pruning(ts, spark):
    ht = ts.create_hypertable("events", "ts", chunk_interval="1 day")
    src = _events(spark)
    ht.insert(src)
    chunks = ht.chunks()
    assert all(c["range_end"] - c["range_start"] == 86_400_000_000 for c in chunks)
    # every row lands inside its chunk bounds
    lo = min(c["range_start"] for c in chunks)
    hi = max(c["range_end"] for c in chunks)
    us = src.select(F.unix_micros("ts").alias("u")).agg(
        F.min("u").alias("lo"), F.max("u").alias("hi")
    ).collect()[0]
    assert lo <= us["lo"] and us["hi"] < hi

    start, end = datetime(2024, 1, 10), datetime(2024, 1, 20)
    pruned = ht.read(start=start, end=end)
    expect = src.filter((F.col("ts") >= start) & (F.col("ts") < end)).count()
    assert pruned.count() == expect
    # the scan must list only surviving chunk dirs (partition pruning analog)
    n_overlap = len(
        [
            c
            for c in chunks
            if c["range_start"] < 1705708800000000 and c["range_end"] > 1704844800000000
        ]
    )
    assert n_overlap < len(chunks)


def test_show_and_drop_chunks(ts, spark):
    ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.insert(_events(spark))
    total = ht.read().count()
    cutoff = datetime(2024, 2, 1)
    old = ht.show_chunks(older_than=cutoff)
    assert all(c["range_end"] <= 1706745600000000 for c in old)
    dropped = ht.drop_chunks(older_than=cutoff)
    assert dropped and len(dropped) == len(old)
    left = ht.read()
    # only rows at/after the last dropped chunk's end remain
    assert left.count() < total
    assert left.filter(F.col("ts") < datetime(2024, 1, 22)).count() == 0
    # dirs actually gone
    for c in old:
        assert not os.path.isdir(
            os.path.join(ht.data_dir, f"_chunk={c['range_start']}")
        )


def test_space_dimension(ts, spark):
    ht = ts.create_hypertable(
        "events", "ts", chunk_interval="7 days", space_column="user_id", num_partitions=4
    )
    src = _events(spark)
    ht.insert(src)
    assert ht.read().count() == src.count()
    # space dirs exist under chunk dirs
    chunk0 = ht.chunks()[0]
    sub = os.listdir(os.path.join(ht.data_dir, f"_chunk={chunk0['range_start']}"))
    assert any(p.startswith("_space=") for p in sub)


def test_integer_time_column(ts, spark):
    df = spark.range(0, 1_000_000, 10).select(
        F.col("id").alias("time"), (F.col("id") % 20).alias("device")
    )
    ht = ts.create_hypertable("devices_int", "time", chunk_interval=100_000)
    ht.insert(df)
    assert len(ht.chunks()) == 10
    assert ht.read(start=250_000, end=310_000).count() == 6_000
    assert ht.approximate_row_count() == 100_000


def test_size_utils(ts, spark):
    ht = ts.create_hypertable("events", "ts")
    ht.insert(_events(spark))
    assert ht.approximate_row_count() == 1000
    assert ht.hypertable_size() > 0


def test_triggers_fire_per_batch(ts, spark):
    """Batch-level trigger hooks (test/sql/triggers.sql analog): BEFORE
    transforms the batch, AFTER observes rows + touched chunks — and both
    fire per streaming micro-batch routed through StreamIngest."""
    import tempfile

    from pyspark.sql import functions as F

    from timescaledb_spark.streaming import StreamIngest

    ht = ts.create_hypertable("trig", "ts", chunk_interval="1 day")
    fired = []
    ht.create_trigger(
        "clamp", lambda df: df.withColumn("value", F.least("value", F.lit(10.0))),
        when="before",
    )
    ht.create_trigger("audit", lambda h, stats: fired.append(stats), when="after")

    df = spark.range(48).select(
        F.timestamp_micros(
            (F.lit(1704067200000000) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") * 1.0).alias("value"),
    )
    ht.insert(df)
    assert len(fired) == 1 and fired[0]["rows"] == 48
    assert ht.df().agg(F.max("value")).collect()[0][0] == 10.0  # BEFORE clamped

    ingest = StreamIngest(ht, checkpoint_dir=tempfile.mkdtemp())
    ingest.process_batch(df, 1)
    ingest.process_batch(df, 1)  # replay skipped -> no trigger
    assert len(fired) == 2

    with pytest.raises(ValueError):
        ht.create_trigger("audit", lambda h, s: None)
    ht.drop_trigger("audit")
    ht.insert(df)
    assert len(fired) == 2  # dropped trigger no longer fires
    with pytest.raises(KeyError):
        ht.drop_trigger("audit")


def test_null_time_rejected_on_all_write_paths(ts, spark):
    """Reference parity: the open dimension is NOT NULL (src/dimension.c)
    — inserting a NULL time value must fail with a clean constraint
    error on every write path, leave no Hive default-partition junk
    behind, and not poison subsequent good writes."""
    ht = ts.create_hypertable("nn", "ts", chunk_interval="1 day")
    bad = spark.createDataFrame(
        [(1704067200000000, 1.0), (None, 2.0)], "us long, v double"
    ).select(F.timestamp_micros("us").alias("ts"), "v")
    for attempt in (
        lambda: ht.insert(bad),
        lambda: ht.upsert(bad, keys=["ts"]),
        lambda: ht.merge_into(bad, ["ts"]),
    ):
        with pytest.raises(ValueError, match="NOT NULL"):
            attempt()
    assert not any(
        "__HIVE_DEFAULT_PARTITION__" in d
        for d in (os.listdir(ht.data_dir) if os.path.isdir(ht.data_dir) else [])
    )
    st = ht.insert(bad.filter("ts is not null"))
    assert st["rows"] == 1 and ht.read().count() == 1


def test_invalid_time_column_type_rejected(ts, spark):
    """create_hypertable rejects non-time dimension types
    (src/dimension.c): the first insert types the table and must raise
    a clean error for a string time column rather than a cast failure
    mid-write."""
    ht = ts.create_hypertable("bad_t", "t", chunk_interval=100)
    with pytest.raises(ValueError, match="invalid type"):
        ht.insert(spark.createDataFrame([("a", 1)], "t string, v int"))


def test_pre_epoch_timestamps(ts, spark):
    """Negative internal time (pre-1970): chunk routing must floor
    toward -inf (not truncate toward zero), pruned reads stay exact,
    and negative range_start directory names round-trip the catalog."""
    ht = ts.create_hypertable("p70", "ts", chunk_interval="7 days")
    base = -315_619_200_000_000  # 1960-01-01 UTC µs
    df = spark.range(31 * 24).select(
        F.timestamp_micros(
            (F.lit(base) + F.col("id") * 3_600_000_000).cast("long")
        ).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    st = ht.insert(df)
    assert st["rows"] == 744
    assert all(c["range_start"] < 0 for c in ht.chunks())
    assert ht.read(start="1960-01-10", end="1960-01-17").count() == 7 * 24
    # chunk grid is aligned: every start is a multiple of the interval
    iv = 7 * 86_400_000_000
    assert all(c["range_start"] % iv == 0 for c in ht.chunks())
