"""add_dimension, enable_chunk_skipping, and hierarchical caggs."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0_US = 1704067200000000
DAY_US = 86400 * 1_000_000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _seed(ts, spark, name="ev", days=4):
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


def test_add_dimension_rewrites_and_routes(ts, spark):
    ht = _seed(ts, spark)
    ht.add_dimension("device", num_partitions=2)
    assert ht.row["space_column"] == "device"
    # existing rows intact and readable
    assert ht.df().count() == 96
    # dimension catalog updated
    dims = ts.catalog.dimension.find(hypertable_id=ht.id)
    assert [d["type"] for d in dims] == ["open", "closed"]
    # new inserts route into _space subdirs without error
    extra = spark.createDataFrame(
        [("2024-01-05 00:00:00", 7, 1.0)], "ts string, device int, value double"
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    ht.insert(extra)
    assert ht.df().count() == 97
    # space partition dirs exist on disk
    import glob, os
    sub = glob.glob(os.path.join(ht.data_dir, "_chunk=*", "_space=*"))
    assert sub
    with pytest.raises(ValueError, match="already has"):
        ht.add_dimension("device", 2)


def test_enable_chunk_skipping(ts, spark):
    ht = _seed(ts, spark)
    n = ht.enable_chunk_skipping("value")
    assert n == 4
    stats = ts.catalog.chunk_column_stats.find(hypertable_id=ht.id, column="value")
    assert len(stats) == 4
    # value is monotone with time: day-0 chunk covers [0, 23]
    first = min(stats, key=lambda s: s["min"])
    assert first["min"] == 0.0 and first["max"] == 23.0
    # read with where_stats prunes chunks that cannot contain the range
    df = ht.read(where_stats={"value": (70.0, 80.0)})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "96 paths" not in plan  # pruned below full table
    got = df.filter("value BETWEEN 70 AND 80")
    assert got.count() == 11


def test_cagg_on_cagg(ts, spark):
    """Hierarchical caggs (tsl/test/sql/cagg_on_cagg.sql): hourly → daily;
    the child's source is the parent's materialization hypertable, and
    parent refreshes feed the child's invalidation log through the
    ordinary insert path."""
    ht = _seed(ts, spark, name="evh", days=6)
    hourly = ts.create_cagg(
        "hourly", "evh", bucket_width="1 hour",
        aggs={"n": "count(1)", "sum_v": "sum(value)"},
    )
    hourly.refresh()
    daily = ts.create_cagg(
        "daily2", "_mat_hourly", bucket_width="1 day",
        aggs={"n_hours": "count(1)", "sum_v": "sum(sum_v)"},
    )
    daily.refresh()
    rows = {r["bucket"].isoformat(): r for r in daily.read(realtime=False).collect()}
    assert len(rows) == 6
    assert all(r["n_hours"] == 24 for r in rows.values())
    # late data lands in the base table → parent refresh → child refresh
    late = spark.createDataFrame(
        [("2024-01-01 05:30:00", 9, 1000.0)], "ts string, device int, value double"
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    ht.insert(late)
    hourly.refresh()
    daily.refresh()
    day0 = daily.read(realtime=False).filter(
        F.col("bucket") == "2024-01-01 00:00:00"
    ).collect()[0]
    expect = sum(range(24)) + 1000.0
    assert day0["sum_v"] == expect
