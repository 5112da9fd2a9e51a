"""time_bucket exactness vs the reference formula, oracle-checked in DuckDB.

Oracle encodes the reference formula directly (FIXTURES.md §Oracle
protocol): bucket = ts - pmod(ts - origin, width) in unix µs, origin
Mon 2000-01-03 (946857600000000 µs)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.functions import (
    DEFAULT_ORIGIN_US,
    time_bucket,
    time_bucket_int,
)
from .oracle import assert_match

ORIGIN = DEFAULT_ORIGIN_US


def duck_bucket(width_us: int, expr: str = "epoch_us(ts)", origin: int = ORIGIN) -> str:
    return (
        f"make_timestamp({expr} - ((({expr} - {origin}) % {width_us}"
        f" + {width_us}) % {width_us}))"
    )


@pytest.mark.parametrize(
    "width,us",
    [
        ("1 hour", 3_600_000_000),
        ("5 minutes", 300_000_000),
        ("1 day", 86_400_000_000),
        ("1 week", 7 * 86_400_000_000),
        ("90 seconds", 90_000_000),
    ],
)
def test_fixed_width_vs_oracle(tsdata, duck, width, us):
    df = (
        tsdata.table("events")
        .groupBy(time_bucket(width, "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sv"))
    )
    sql = f"""
        SELECT {duck_bucket(us)} AS bucket, count(*) AS n, sum(value) AS sv
        FROM events GROUP BY 1
    """
    assert_match(df, duck, sql)


def test_origin_variant(tsdata, duck):
    origin = datetime(2021, 6, 1, 7, 30)
    origin_us = 1622532600 * 1_000_000
    df = (
        tsdata.table("events")
        .groupBy(time_bucket("1 day", "ts", origin=origin).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sql = f"""
        SELECT {duck_bucket(86_400_000_000, origin=origin_us)} AS bucket,
               count(*) AS n
        FROM events GROUP BY 1
    """
    assert_match(df, duck, sql)


def test_offset_variant(tsdata, duck):
    # offset '30 minutes': bucket(ts - off) + off
    off = 1_800_000_000
    w = 3_600_000_000
    inner = f"(epoch_us(ts) - {off})"
    df = (
        tsdata.table("events")
        .groupBy(time_bucket("1 hour", "ts", offset="30 minutes").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sql = f"""
        SELECT make_timestamp({inner} - ((({inner} - {ORIGIN}) % {w} + {w}) % {w})
                              + {off}) AS bucket,
               count(*) AS n
        FROM events GROUP BY 1
    """
    assert_match(df, duck, sql)


def test_month_bucket(tsdata, duck):
    df = (
        tsdata.table("events")
        .groupBy(time_bucket("1 month", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # month index arithmetic, origin Jan 2000 (midx 24000)
    sql = """
        WITH m AS (
          SELECT (year(ts)*12 + month(ts) - 1) AS midx, * FROM events
        ), b AS (
          SELECT midx - (((midx - 24000) % 1 + 1) % 1) AS bidx, * FROM m
        )
        SELECT CAST(make_date(CAST(bidx // 12 AS INT),
                              CAST(bidx % 12 + 1 AS INT), 1) AS TIMESTAMP) AS bucket,
               count(*) AS n
        FROM b GROUP BY 1
    """
    assert_match(df, duck, sql)


def test_three_month_bucket(tsdata, duck):
    df = (
        tsdata.table("events")
        .groupBy(time_bucket("3 months", "ts").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sql = """
        WITH m AS (
          SELECT (year(ts)*12 + month(ts) - 1) AS midx, * FROM events
        ), b AS (
          SELECT midx - (((midx - 24000) % 3 + 3) % 3) AS bidx, * FROM m
        )
        SELECT CAST(make_date(CAST(bidx // 12 AS INT),
                              CAST(bidx % 12 + 1 AS INT), 1) AS TIMESTAMP) AS bucket,
               count(*) AS n
        FROM b GROUP BY 1
    """
    assert_match(df, duck, sql)


def test_int_bucket_with_offset(tsdata, duck):
    df = (
        tsdata.table("events")
        .groupBy(time_bucket_int(7, "user_id", offset=3).alias("bucket"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    sql = """
        SELECT user_id - (((user_id - 3) % 7 + 7) % 7) AS bucket, count(*) AS n
        FROM events GROUP BY 1
    """
    assert_match(df, duck, sql)


def test_negative_timestamps_floor(spark):
    """Pre-origin timestamps must floor, not truncate toward zero."""
    df = spark.createDataFrame(
        [(datetime(1999, 12, 31, 23, 59, 0),), (datetime(1969, 12, 31, 23, 0, 1),)],
        "ts timestamp",
    )
    out = df.select(time_bucket("1 hour", "ts").alias("b")).collect()
    assert out[0]["b"] == datetime(1999, 12, 31, 23, 0)
    assert out[1]["b"] == datetime(1969, 12, 31, 23, 0)
