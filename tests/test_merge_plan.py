"""Chunk-locality guarantees of merge_into: a MERGE whose source touches
two chunks must not read-rewrite any other chunk's files (the analog of
the reference's per-chunk DML rewrites, tsl/src/compression/
compression_dml.c), and a fully-no-op MERGE must rewrite nothing."""

import os

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0_US = 1704067200000000
HOUR_US = 3_600_000_000


@pytest.fixture()
def ht(spark, tmp_path):
    ts = TSSession(spark, str(tmp_path / "ts"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    df = spark.range(10 * 24).select(
        F.timestamp_micros(
            (F.lit(T0_US) + F.col("id") * HOUR_US).cast("long")
        ).alias("ts"),
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("v"),
    )
    ht.insert(df)
    assert len(ht.chunks()) == 10
    return ht


def _snapshot(ht):
    out = {}
    for dirpath, _dirs, files in os.walk(ht.data_dir):
        for f in files:
            p = os.path.join(dirpath, f)
            out[p] = (os.path.getmtime(p), os.path.getsize(p))
    return out


def _src(spark, hours, val=1.0):
    return spark.createDataFrame(
        [(T0_US + h * HOUR_US, h, val) for h in hours], "us long, k long, v double"
    ).select(F.timestamp_micros("us").alias("ts"), "k", "v")


def test_merge_rewrites_only_hit_chunks(ht, spark):
    before = _snapshot(ht)
    # source rows land in day 2 and day 3 only
    ht.merge_into(
        _src(spark, [2 * 24 + 1, 3 * 24 + 5]),
        ["ts", "k"],
        matched_update={"v": "excluded.v"},
    )
    after = _snapshot(ht)
    d2 = os.path.join(ht.data_dir, f"_chunk={T0_US + 2 * 86_400_000_000}")
    d3 = os.path.join(ht.data_dir, f"_chunk={T0_US + 3 * 86_400_000_000}")
    changed_dirs = {
        os.path.dirname(p)
        for p in (set(before) ^ set(after))
        | {p for p in before if p in after and before[p] != after[p]}
        if "_chunk=" in p
    }
    assert changed_dirs, "hit chunks must be rewritten"
    assert all(
        d.startswith(d2) or d.startswith(d3) for d in changed_dirs
    ), f"untouched chunks rewritten: {sorted(changed_dirs)}"


def test_noop_merge_rewrites_nothing(ht, spark):
    before = _snapshot(ht)
    # keys overlap chunk 0 but DO NOTHING + no inserts -> zero writes
    st = ht.merge_into(
        _src(spark, [0, 1]), ["ts", "k"], insert_not_matched=False
    )
    assert st == {
        "rows_inserted": 0,
        "rows_updated": 0,
        "rows_deleted": 0,
        "chunks": [],
    }
    assert _snapshot(ht) == before
