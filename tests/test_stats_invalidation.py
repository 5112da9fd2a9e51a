"""Chunk-skipping stats must go stale on DML into a chunk — the analog of
``ts_chunk_column_stats_set_invalid`` (src/chunk.c:3571): after
``enable_chunk_skipping``, an INSERT that appends into a pre-existing
chunk and widens a tracked column's range must invalidate that chunk's
recorded min/max, or stat-pruned reads silently drop the new rows."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0_US = 1704067200000000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _batch(spark, n=48, value_mul=1.0, t0=T0_US):
    return spark.range(n).select(
        F.timestamp_micros(
            (F.lit(t0) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        F.col("id").alias("k"),
        (F.col("id") * value_mul).alias("value"),
    )


def test_insert_invalidates_stats_for_existing_chunks(ts, spark):
    ht = ts.create_hypertable("t_inv", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark))  # values 0..47
    ht.enable_chunk_skipping("value")
    assert ts.catalog.chunk_column_stats.find(hypertable_id=ht.id)

    # append into the SAME chunks with values far above the recorded max
    ht.insert(_batch(spark, value_mul=100.0))  # values up to 4700

    # the lying min/max must be gone: a stat-pruned read for the new
    # range must still see every appended row
    got = ht.read(where_stats={"value": (1000.0, 5000.0)}).filter(
        F.col("value") >= 1000.0
    )
    assert got.count() == _batch(spark, value_mul=100.0).filter(
        F.col("value") >= 1000.0
    ).count()
    # and the stats rows for the touched chunks were dropped
    assert not ts.catalog.chunk_column_stats.find(hypertable_id=ht.id)

    # ANALYZE restores them, and the restored ranges are truthful
    ht.analyze()
    rows = ts.catalog.chunk_column_stats.find(hypertable_id=ht.id)
    assert rows
    assert max(float(r["max"]) for r in rows) == 4700.0


def test_insert_outside_range_keeps_stats(ts, spark):
    """An insert that only creates NEW chunks must not drop stats on
    untouched ones."""
    ht = ts.create_hypertable("t_keep", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=24))  # exactly one day
    ht.enable_chunk_skipping("value")
    before = ts.catalog.chunk_column_stats.find(hypertable_id=ht.id)
    assert before
    # land entirely in a later, brand-new chunk
    ht.insert(_batch(spark, n=24, t0=T0_US + 10 * 24 * 3600 * 1_000_000))
    after = ts.catalog.chunk_column_stats.find(hypertable_id=ht.id)
    assert len(after) == len(before)


def test_sql_path_sees_rows_after_append(ts, spark):
    """End-to-end via ts.sql: the auto-wired stats pruning must not
    exclude a chunk whose range was widened by a later insert."""
    ht = ts.create_hypertable("t_sql_inv", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark))
    ht.enable_chunk_skipping("value")
    ht.insert(_batch(spark, value_mul=100.0))
    n = ts.sql(
        "SELECT count(*) AS n FROM t_sql_inv WHERE value >= 1000"
    ).collect()[0]["n"]
    assert n == 38  # k in 10..47 at 100x


def test_update_invalidates_stats_on_rowstore(ts, spark):
    """_mark_rewritten must drop stats for ROWSTORE chunks too — an
    UPDATE can widen a tracked column's range without any columnstore
    involvement."""
    ht = ts.create_hypertable("t_upd_inv", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark))
    ht.enable_chunk_skipping("value")
    assert ts.catalog.chunk_column_stats.find(hypertable_id=ht.id)
    ht.update_where({"value": F.lit(9999.0)}, "k = 3")
    got = ht.read(where_stats={"value": (9000.0, 10000.0)}).filter(
        F.col("value") >= 9000.0
    )
    assert got.count() == 1
