"""Columnstore compression-ratio check (BASELINE.md: reference claims
"90%+ compression typical"). Our parquet files are already zstd-encoded
at insert, so compress_chunk's gain comes from segmentby clustering +
orderby sorting turning shuffled rows into runs the encodings exploit.
The test uses deliberately shuffled repetitive telemetry and asserts a
material size reduction plus recorded stats."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.compression import (
    chunk_compression_stats,
    compress_chunks,
    enable_columnstore,
)
from timescaledb_spark.session import TSSession

T0_US = 1704067200000000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def test_compression_ratio(ts, spark):
    ht = ts.create_hypertable("telemetry", "ts", chunk_interval="1 day")
    n = 200_000
    # 20 devices sampling every second, slowly-varying values — classic
    # telemetry — but arriving SHUFFLED (worst case for encodings):
    # device d's k-th sample at T0 + k seconds.
    df = (
        spark.range(n)
        .select(
            F.col("id"),
            F.pmod("id", F.lit(20)).cast("int").alias("device"),
            F.floor(F.col("id") / 20).alias("seq"),
        )
        .select(
            F.timestamp_micros(
                (F.lit(T0_US) + F.col("seq") * 1_000_000).cast("long")
            ).alias("ts"),
            "device",
            (F.col("device") * 100 + F.floor(F.col("seq") / 100)).cast("double").alias(
                "value"
            ),
            F.concat(F.lit("state_"), F.pmod("id", F.lit(3))).alias("status"),
            F.xxhash64("id").alias("_shuf"),
        )
        .orderBy("_shuf")
        .drop("_shuf")
    )
    ht.insert(df, cluster=False)
    before = ht.hypertable_size()
    enable_columnstore(ht, segmentby=["device"], orderby=[("ts", "asc")])
    results = compress_chunks(ht)
    assert results
    after = ht.hypertable_size()
    ratio = before / after
    assert ratio > 1.5, f"clustering gained only {ratio:.2f}x ({before}->{after})"
    # stats recorded per chunk with before/after byte sizes
    stats = chunk_compression_stats(ht)
    assert stats and all(s.get("before", 0) > s.get("after", 0) > 0 for s in stats)
    # data intact after the rewrite
    assert ht.df().count() == n
