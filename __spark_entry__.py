"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual inventory lives in ``timescaledb_spark.queries``; this file is
the thin driver-facing shim.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: hourly time_bucket rollup
    with vectorized-agg set + bookends over the events hypertable."""
    from pyspark.sql import functions as F

    from timescaledb_spark.functions import (
        first,
        last,
        time_bucket,
        to_unix_microseconds,
    )
    from timescaledb_spark.sources import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    key = to_unix_microseconds("ts")
    return (
        ev.groupBy(time_bucket("1 hour", "ts").alias("bucket"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("value").alias("avg_v"),
            first("value", key).alias("first_v"),
            last("value", key).alias("last_v"),
        )
        .orderBy("bucket", "event_type")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from timescaledb_spark.queries import queries as _q

    return _q()


def oracle_sql() -> dict[str, str]:
    from timescaledb_spark.queries import oracle_sql as _o

    return _o()
