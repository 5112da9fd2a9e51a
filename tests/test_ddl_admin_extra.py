"""Remaining ddl_api surface: set_number_partitions (per-chunk space
modulus, sql/ddl_api.sql), set_partitioning_interval, restore mode
(timescaledb_pre/post_restore) and get_telemetry_report."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0 = 1704067200000000
DAY = 86_400_000_000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _rows(spark, day, n_dev):
    return spark.range(n_dev * 4).select(
        F.timestamp_micros(
            (F.lit(T0 + day * DAY) + F.col("id") * 60_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % n_dev).alias("dev"),
        F.lit(1.0).alias("v"),
    )


def test_set_number_partitions_new_chunks_only(ts, spark):
    ht = ts.create_hypertable(
        "s", "ts", chunk_interval="1 day", space_column="dev", num_partitions=2
    )
    ht.insert(_rows(spark, 0, 8))       # chunk day0 written with n=2
    ht.set_number_partitions(8)
    ht.insert(_rows(spark, 1, 8))       # chunk day1 written with n=8
    by_start = {c["range_start"]: c for c in ht.chunks()}
    assert by_start[T0]["space_n"] == 2
    assert by_start[T0 + DAY]["space_n"] == 8
    # space-pruned reads hash each chunk with ITS modulus -> exact rows
    for dev in range(8):
        got = ht.read(space_key=dev).count()
        exp = ht.df().filter(F.col("dev") == dev).count()
        assert got == exp, f"dev {dev}: pruned {got} != full {exp}"


def test_set_number_partitions_validation(ts, spark):
    ht = ts.create_hypertable("p", "ts", chunk_interval="1 day")
    with pytest.raises(ValueError, match="space dimension"):
        ht.set_number_partitions(4)


def test_set_partitioning_interval_alias(ts, spark):
    ht = ts.create_hypertable("i", "ts", chunk_interval="1 day")
    ht.set_partitioning_interval("12 hours")
    assert int(ht.row["chunk_interval"]) == 12 * 3_600_000_000


def test_restore_mode_pauses_scheduler(ts, spark):
    ht = ts.create_hypertable("r", "ts", chunk_interval="1 day")
    ht.insert(_rows(spark, 0, 2))
    ts.jobs.add_retention_policy("r", drop_after="100 days")
    ts.pre_restore()
    assert ts.jobs.run_pending(now=ts.jobs.now() + 10_000_000) == []
    assert ts.get_telemetry_report()["restoring"] is True
    ts.post_restore()
    assert ts.get_telemetry_report()["restoring"] is False
    # scheduler live again (job may or may not be due; call must not
    # be short-circuited by the restoring flag)
    ts.jobs.run_pending()


def test_telemetry_report_counts(ts, spark):
    ht = ts.create_hypertable("t", "ts", chunk_interval="1 day")
    ht.insert(_rows(spark, 0, 2))
    ts.create_cagg("td", "t", bucket_width="1 day", aggs={"n": "count(1)"})
    rep = ts.get_telemetry_report()
    assert rep["num_hypertables"] >= 2  # t + cagg mat table
    assert rep["num_chunks"] >= 1
    assert rep["num_continuous_aggs"] == 1


def test_analyze_restores_stats_after_rewrite(ts, spark):
    """ANALYZE refreshes chunk-skipping stats that in-place rewrites
    deliberately invalidate (_mark_rewritten drops them so pruning can
    never use a lying range)."""
    ht = ts.create_hypertable("an", "ts", chunk_interval="1 day")
    ht.insert(_rows(spark, 0, 4))
    ht.insert(_rows(spark, 1, 4))
    ht.enable_chunk_skipping("v")
    cat = ts.catalog
    assert len(cat.chunk_column_stats.find(hypertable_id=ht.id)) == 2
    # compress then rewrite day 0 -> its stats rows are dropped
    from timescaledb_spark.compression import compress_chunks, enable_columnstore

    enable_columnstore(ht)
    compress_chunks(ht)
    ht.update_where({"v": "v + 1"}, "dev = 0", start=1704067200000000,
                    end=1704067200000000 + 86_400_000_000)
    remaining = {
        r["chunk_id"] for r in cat.chunk_column_stats.find(
            hypertable_id=ht.id, column="v"
        )
    }
    all_chunks = {c["id"] for c in ht.chunks()}
    assert remaining < all_chunks  # at least one chunk lost its stats
    n = ht.analyze()
    assert n == 2
    assert {
        r["chunk_id"] for r in cat.chunk_column_stats.find(
            hypertable_id=ht.id, column="v"
        )
    } == all_chunks


def test_sql_analyze_and_vacuum(ts, spark):
    ht = ts.create_hypertable("va", "ts", chunk_interval="1 day")
    ht.insert(_rows(spark, 0, 2))
    ht.enable_chunk_skipping("v")
    r = ts.sql("ANALYZE va").collect()[0]
    assert r["stats_rows"] == 1
    r = ts.sql("VACUUM ANALYZE va").collect()[0]
    assert r["stats_rows"] == 1
    r = ts.sql("VACUUM va").collect()[0]  # stats refresh; parquet needs no vacuum
    assert r["stats_rows"] == 1


def test_clear_hypertable_cache(ts, spark):
    ht = ts.create_hypertable("cc", "ts", chunk_interval="1 day")
    ht.insert(_rows(spark, 0, 2))
    before = ht.df().count()
    # warm the JsonlTable row caches
    assert ts.catalog.hypertable.find_one(name="cc") is not None
    out = ts.sql("SELECT clear_hypertable_cache()").collect()
    assert out[0]["ok"] is True
    for t in ts.catalog._tables.values():
        assert t._cache_key is None
    # catalog still serves correct state after the cache drop
    assert ts.get_hypertable("cc").df().count() == before > 0
