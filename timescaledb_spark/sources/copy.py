"""COPY-style bulk loaders (``src/copy.c`` analog).

The reference's COPY path parses text/csv/binary and routes tuples
through the hypertable chunk router; ours parses with Spark's native
csv/json readers (distributed, codegen) and hands the DataFrame to
``Hypertable.insert`` — same routing, invalidation capture, and chunk
creation as any other write.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import DataFrame, SparkSession, types as T


def read_csv(
    spark: SparkSession,
    path: str,
    schema: Union[str, T.StructType, None] = None,
    header: bool = True,
    delimiter: str = ",",
    timestamp_format: Optional[str] = None,
    null_value: str = "",
) -> DataFrame:
    """CSV reader with COPY-ish defaults (header, explicit schema
    recommended — inference costs an extra pass over the data)."""
    r = (
        spark.read.option("header", header)
        .option("sep", delimiter)
        .option("nullValue", null_value)
        .option("mode", "FAILFAST")
    )
    if timestamp_format:
        r = r.option("timestampFormat", timestamp_format)
    if schema is not None:
        r = r.schema(schema)
    else:
        r = r.option("inferSchema", "true")
    return r.csv(path)


def read_json(
    spark: SparkSession,
    path: str,
    schema: Union[str, T.StructType, None] = None,
    multiline: bool = False,
) -> DataFrame:
    """JSON-lines reader (jsonb-ingest analog)."""
    r = spark.read.option("mode", "FAILFAST").option("multiLine", multiline)
    if schema is not None:
        r = r.schema(schema)
    return r.json(path)


def copy_into(ht, df: DataFrame, cluster: bool = True) -> dict:
    """``COPY <hypertable> FROM ...`` tail end: route a parsed DataFrame
    into the hypertable (chunk routing + invalidation, `copy.c:877`)."""
    return ht.insert(df, cluster=cluster)
