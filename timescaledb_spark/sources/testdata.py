"""Readers for the driver-provided parquet testdata (TESTDATA.md).

The ``events`` table stores nanosecond-precision timestamps, which Spark's
vectorized parquet reader rejects; we read them as int64 nanoseconds
(``spark.sql.legacy.parquet.nanosAsLong``) and convert to µs TimestampType
— the engine's internal time unit, matching the reference where all open
dimensions normalize to int64 microseconds (``sql/util_time.sql:49``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = os.path.join(sf_dir, f"{name}.parquet")
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(path)
        dtype = dict(df.dtypes).get("ts", "")
        if dtype == "bigint":
            # integer division: double division loses precision at ns scale
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif dtype.startswith("timestamp"):
            # parquet may surface TIMESTAMP_NTZ; the engine's internal unit
            # is session-zoned TimestampType (int64 µs, sql/util_time.sql:49)
            df = df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
        return df
    return spark.read.parquet(path)


def register_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{t}.parquet")):
            load_table(spark, sf_dir, t).createOrReplaceTempView(t)
