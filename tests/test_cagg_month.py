"""Month-width (variable-bucket) continuous aggregates."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0_US = 1704067200000000  # 2024-01-01, a leap year: Feb has 29 days


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def test_monthly_cagg_refresh_and_late_data(ts, spark):
    ht = ts.create_hypertable("mv", "ts", chunk_interval="7 days")
    # 100 days of daily rows: spans Jan(31) Feb(29) Mar(31) Apr(9)
    df = spark.range(100).select(
        F.timestamp_micros(
            (F.lit(T0_US) + F.col("id") * 86_400_000_000).cast("long")
        ).alias("ts"),
        F.col("id").cast("double").alias("v"),
    )
    ht.insert(df)
    cagg = ts.create_cagg(
        "monthly", "mv", bucket_width="1 month",
        aggs={"n": "count(1)", "sum_v": "sum(v)"},
    )
    cagg.refresh()
    rows = {
        r["bucket"].strftime("%Y-%m"): r["n"]
        for r in cagg.read(realtime=False).collect()
    }
    assert rows == {"2024-01": 31, "2024-02": 29, "2024-03": 31, "2024-04": 9}
    # late row into February → only that bucket repaired on next refresh
    late = spark.createDataFrame([("2024-02-15 12:00:00", 1000.0)], "ts string, v double")
    ht.insert(late.select(F.col("ts").cast("timestamp"), F.col("v")))
    ranges = cagg.refresh()
    assert len(ranges) == 1
    a, b = ranges[0]
    assert a == 1706745600000000  # 2024-02-01
    assert b == 1709251200000000  # 2024-03-01 (leap February)
    rows = {
        r["bucket"].strftime("%Y-%m"): r["n"]
        for r in cagg.read(realtime=False).collect()
    }
    assert rows["2024-02"] == 30
    # full re-aggregation equivalence
    expect = {
        r["b"].strftime("%Y-%m"): r["n"]
        for r in ht.df()
        .groupBy(F.date_trunc("month", "ts").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert rows == expect


def test_three_month_bucket_alignment(ts, spark):
    """Widths > 1 month align to the origin month (Jan 2000), so 3-month
    buckets are calendar quarters."""
    ht = ts.create_hypertable("qv", "ts", chunk_interval="31 days")
    df = spark.range(200).select(
        F.timestamp_micros(
            (F.lit(T0_US) + F.col("id") * 86_400_000_000).cast("long")
        ).alias("ts"),
        F.lit(1.0).alias("v"),
    )
    ht.insert(df)
    cagg = ts.create_cagg("q", "qv", bucket_width="3 months", aggs={"n": "count(1)"})
    cagg.refresh()
    rows = {
        r["bucket"].strftime("%Y-%m"): r["n"]
        for r in cagg.read(realtime=False).collect()
    }
    # 2024-01-01 + 199 days = 2024-07-18 → Q1(91), Q2(91), Q3(18)
    assert rows == {"2024-01": 91, "2024-04": 91, "2024-07": 18}
