"""Streaming ingest: file-source micro-batches routed into a hypertable,
idempotent replay, late-data invalidation repair via cagg refresh."""

import os

import pytest
from pyspark.sql import functions as F, types as T

from timescaledb_spark.session import TSSession
from timescaledb_spark.streaming import StreamIngest

SCHEMA = T.StructType(
    [
        T.StructField("ts", T.TimestampType()),
        T.StructField("device", T.IntegerType()),
        T.StructField("value", T.DoubleType()),
    ]
)

T0_US = 1704067200000000  # 2024-01-01T00:00Z


def _mk_rows(spark, start_hour, n_hours):
    return spark.range(n_hours).select(
        F.timestamp_micros(
            (F.lit(T0_US) + (F.col("id") + start_hour) * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 3).cast("int").alias("device"),
        (F.col("id") + start_hour).cast("double").alias("value"),
    )


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _run_stream(spark, ts, ht, indir, ckpt, **kw):
    stream = spark.readStream.schema(SCHEMA).parquet(indir)
    q = StreamIngest(ht, ckpt, **kw).start(stream, trigger={"availableNow": True})
    q.awaitTermination(120)
    return q


def test_stream_routes_and_registers_chunks(spark, ts, tmp_path):
    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(indir)
    ht = ts.create_hypertable("sev", "ts", chunk_interval="1 day")
    _mk_rows(spark, 0, 48).coalesce(1).write.mode("append").parquet(indir)
    _run_stream(spark, ts, ht, indir, ckpt)
    assert ht.df().count() == 48
    assert len(ht.chunks()) == 2  # two day-chunks created on demand
    # second batch of files → incremental processing, no reprocessing
    _mk_rows(spark, 48, 24).coalesce(1).write.mode("append").parquet(indir)
    _run_stream(spark, ts, ht, indir, ckpt)
    assert ht.df().count() == 72
    assert len(ht.chunks()) == 3


def test_stream_replay_is_idempotent(spark, ts, tmp_path):
    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(indir)
    ht = ts.create_hypertable("sev2", "ts", chunk_interval="1 day")
    _mk_rows(spark, 0, 24).coalesce(1).write.mode("append").parquet(indir)
    _run_stream(spark, ts, ht, indir, ckpt)
    ingest = StreamIngest(ht, ckpt)
    # simulate a foreachBatch replay of batch 0 after failure
    replay = ingest.process_batch(_mk_rows(spark, 0, 24), 0)
    assert replay.get("replayed") is True
    assert ht.df().count() == 24


def test_stream_late_data_repairs_cagg(spark, ts, tmp_path):
    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(indir)
    ht = ts.create_hypertable("sev3", "ts", chunk_interval="1 day")
    cagg = ts.create_cagg(
        "sdaily", "sev3", bucket_width="1 day",
        aggs={"n": "count(1)", "sum_v": "sum(value)"},
    )
    # day 0 arrives, refresh inline
    _mk_rows(spark, 0, 24).coalesce(1).write.mode("append").parquet(indir)
    _run_stream(spark, ts, ht, indir, ckpt, refresh_caggs=True)
    mat = {r["bucket"]: r["n"] for r in cagg.read(realtime=False).collect()}
    assert list(mat.values()) == [24]
    # LATE rows for day 0 plus day 1 arrive in one batch
    late = _mk_rows(spark, 0, 24).union(_mk_rows(spark, 24, 24))
    late.coalesce(1).write.mode("append").parquet(indir)
    _run_stream(spark, ts, ht, indir, ckpt, refresh_caggs=True)
    rows = {
        r["bucket"].isoformat(): (r["n"], r["sum_v"])
        for r in cagg.read(realtime=False).collect()
    }
    # day0 bucket repaired to 48 rows (24 original + 24 late), not dropped
    assert rows["2024-01-01T00:00:00"][0] == 48
    assert rows["2024-01-02T00:00:00"][0] == 24
    # cagg equals full re-aggregation
    expect = (
        ht.df()
        .groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert {r["b"].isoformat(): r["n"] for r in expect} == {
        k: v[0] for k, v in rows.items()
    }


def test_stream_direct_compress(spark, ts, tmp_path):
    from timescaledb_spark.compression import enable_columnstore

    indir, ckpt = str(tmp_path / "in"), str(tmp_path / "ckpt")
    os.makedirs(indir)
    ht = ts.create_hypertable("sev4", "ts", chunk_interval="1 day")
    enable_columnstore(ht, segmentby=["device"], orderby=["ts"])
    _mk_rows(spark, 0, 96).coalesce(1).write.mode("append").parquet(indir)
    _run_stream(spark, ts, ht, indir, ckpt, compress_after="1 day")
    statuses = [c["status"] for c in ht.chunks()]
    # chunks ending more than 1 day before max(ts) are columnstore
    assert statuses.count("columnstore") >= 2
    assert statuses[-1] == "rowstore"  # hot head chunk stays row-form
    assert ht.df().count() == 96
