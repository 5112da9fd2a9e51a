"""Property tests (SURVEY §5 port strategy): time_bucket vs the DuckDB
oracle on randomized inputs. DuckDB's time_bucket documents TimescaleDB
compatibility (same default origin 2000-01-03, same month semantics), so
agreement on random widths/origins/timestamps is a strong exactness
check beyond the fixed-case unit tests.

Each hypothesis example is a BATCH of timestamps evaluated in one Spark
job, keeping runtime bounded.
"""

from datetime import datetime, timezone

import duckdb
import pytest
from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from timescaledb_spark.functions import time_bucket

# timestamps across 1950..2038: pre/post the 2000-01-03 origin AND
# pre/post the 1970 epoch (negative internal µs must floor, not truncate)
TS_US = st.integers(
    min_value=int(datetime(1950, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000),
    max_value=int(datetime(2038, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000),
)
WIDTHS = st.sampled_from(
    ["37 seconds", "5 minutes", "90 minutes", "1 hour", "7 hours", "1 day",
     "3 days", "1 week", "13 days"]
)
MONTH_WIDTHS = st.sampled_from(["1 month", "2 months", "3 months", "7 months", "1 year"])


def _spark_buckets(spark, ts_list, width, origin=None):
    df = spark.createDataFrame([(t,) for t in ts_list], "us long").select(
        F.timestamp_micros("us").alias("ts")
    )
    out = df.select(time_bucket(width, "ts", origin=origin).alias("b")).collect()
    return [r["b"].replace(tzinfo=timezone.utc) for r in out]


def _duck_buckets(ts_list, width, origin=None):
    con = duckdb.connect()
    con.execute("SET TimeZone='UTC'")
    org = f", TIMESTAMP '{origin}'" if origin else ""
    rows = con.execute(
        f"""
        SELECT time_bucket(INTERVAL '{width}', make_timestamp(us){org}) AS b
        FROM (SELECT unnest(?) AS us)
        """,
        [ts_list],
    ).fetchall()
    con.close()
    return [r[0].replace(tzinfo=timezone.utc) for r in rows]


@settings(max_examples=12, deadline=None)
@given(ts_batch=st.lists(TS_US, min_size=1, max_size=40), width=WIDTHS)
def test_fixed_width_matches_duckdb(spark, ts_batch, width):
    assert _spark_buckets(spark, ts_batch, width) == _duck_buckets(ts_batch, width)


@settings(max_examples=8, deadline=None)
@given(ts_batch=st.lists(TS_US, min_size=1, max_size=40), width=MONTH_WIDTHS)
def test_month_width_matches_duckdb(spark, ts_batch, width):
    assert _spark_buckets(spark, ts_batch, width) == _duck_buckets(ts_batch, width)


@settings(max_examples=8, deadline=None)
@given(
    ts_batch=st.lists(TS_US, min_size=1, max_size=40),
    width=WIDTHS,
    origin_day=st.integers(min_value=0, max_value=3000),
)
def test_custom_origin_matches_duckdb(spark, ts_batch, width, origin_day):
    origin = datetime.fromtimestamp(origin_day * 86_400 + 915_148_800, tz=timezone.utc)
    o = origin.strftime("%Y-%m-%d %H:%M:%S")
    assert _spark_buckets(spark, ts_batch, width, origin=o) == _duck_buckets(
        ts_batch, width, origin=o
    )


@settings(max_examples=15, deadline=None)
@given(ts_batch=st.lists(TS_US, min_size=1, max_size=60), width=WIDTHS)
def test_bucket_invariants(spark, ts_batch, width):
    """bucket <= ts < bucket + width, and bucket is origin-aligned —
    checked in pure integer math on the Spark output."""
    from timescaledb_spark.functions.time import DEFAULT_ORIGIN_US, parse_interval

    w = parse_interval(width).us
    buckets = _spark_buckets(spark, ts_batch, width)
    for t_us, b in zip(ts_batch, buckets):
        b_us = int(b.timestamp() * 1_000_000)
        assert b_us <= t_us < b_us + w
        assert (b_us - DEFAULT_ORIGIN_US) % w == 0
