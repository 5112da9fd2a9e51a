"""Deterministic streaming replay of a parquet table with watermark
heartbeats.

Append-mode streaming aggregates emit a window/session only when the
watermark passes its end — and a watermark only advances on a LATER
micro-batch, so a finite replay would leave the final windows unemitted
forever. The fix mirrors an idle-source watermark tick: append
``n_heartbeats`` far-future sentinel rows, one file each, so under
``maxFilesPerTrigger=1`` every heartbeat is its own micro-batch. Two
ticks flush everything: tick 1 closes all but the last real window,
tick 2 closes the rest. Sentinel rows carry ``event_type='_sentinel'``
and their own windows never close, so filtering them out of the sink
yields exactly the batch answer.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from datetime import datetime, timedelta

from pyspark.sql import DataFrame, SparkSession, functions as F, types as T

SENTINEL = "_sentinel"
_SENT_NS = 4102444800 * 1_000_000_000  # 2100-01-01
_DAY_NS = 86_400 * 1_000_000_000


def heartbeat_stream(
    spark: SparkSession,
    sf_dir: str,
    table: str = "events",
    n_heartbeats: int = 2,
) -> DataFrame:
    """readStream over ``<sf_dir>/<table>.parquet`` plus heartbeat files,
    one micro-batch per file (data first, then each heartbeat). Returns
    the stream with ``ts`` converted to µs TimestampType, sentinel rows
    included (filter ``event_type != SENTINEL`` after aggregating)."""
    src = os.path.join(sf_dir, f"{table}.parquet")
    tmp = tempfile.mkdtemp(prefix="ts_replay_")
    shutil.copy(src, os.path.join(tmp, "part-000.parquet"))
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    schema = spark.read.parquet(os.path.join(tmp, "part-000.parquet")).schema
    ts_is_ns = {
        f.name: f.dataType.simpleString() for f in schema.fields
    }.get("ts") == "bigint"

    def sentinel_row(ts_ns_val):
        vals = []
        for f in schema.fields:
            if f.name == "ts":
                if ts_is_ns:
                    vals.append(ts_ns_val)
                else:  # parquet surfaced TIMESTAMP(_NTZ) directly
                    vals.append(
                        datetime(1970, 1, 1)
                        + timedelta(microseconds=ts_ns_val // 1000)
                    )
            elif f.name == "event_type":
                vals.append(SENTINEL)
            elif f.dataType.simpleString() == "bigint":
                vals.append(-1)
            elif f.dataType.simpleString() == "double":
                vals.append(0.0)
            else:
                vals.append("")
        return tuple(vals)

    for i in range(1, n_heartbeats + 1):
        stage = tempfile.mkdtemp(prefix="ts_replay_hb_")
        spark.createDataFrame(
            [sentinel_row(_SENT_NS + (i - 1) * _DAY_NS)], schema
        ).coalesce(1).write.mode("overwrite").parquet(stage)
        part = next(p for p in os.listdir(stage) if p.endswith(".parquet"))
        dst = os.path.join(tmp, f"part-{i:03d}.parquet")
        shutil.move(os.path.join(stage, part), dst)
        shutil.rmtree(stage, ignore_errors=True)
        # FileStreamSource orders batches by mtime: data, then heartbeats
        os.utime(dst, (1_000_000_000 + i * 100, 1_000_000_000 + i * 100))
    os.utime(
        os.path.join(tmp, "part-000.parquet"),
        (1_000_000_000, 1_000_000_000),
    )

    sdf = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp)
    )
    if ts_is_ns:
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        sdf = sdf.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return sdf.select(*[f.name for f in schema.fields])


def run_to_memory_sink(agg: DataFrame, sink_name: str) -> None:
    """Drive an append-mode streaming frame to a memory sink under
    availableNow and wait for completion."""
    q = (
        agg.writeStream.format("memory")
        .queryName(sink_name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
