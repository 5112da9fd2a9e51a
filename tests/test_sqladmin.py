"""Admin-SQL surface: DDL, chunk ops, policies, cagg DDL — parity with
the reference's SQL management API (sql/ddl_api.sql, sql/policy_api.sql)."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession
from timescaledb_spark.sources import load_table

from .oracle import assert_match


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "adm"))


@pytest.fixture()
def ts_events(ts, spark, sf_dir):
    ts.create_table("events", load_table(spark, sf_dir, "events"))
    ts.sql(
        "SELECT create_hypertable('events', 'ts', "
        "chunk_time_interval => INTERVAL '7 days')"
    ).collect()
    return ts


def test_create_hypertable_migrates_plain_table(ts_events, spark, sf_dir):
    n = ts_events.sql("SELECT count(*) AS n FROM events").first()["n"]
    assert n == load_table(spark, sf_dir, "events").count()
    # plain table entry consumed by the migration
    assert ts_events.catalog.plain_table.find_one(name="events") is None


def test_show_chunks_reference_naming(ts_events):
    rows = ts_events.sql("SELECT show_chunks('events')").collect()
    assert len(rows) > 3
    assert rows[0]["chunk"].startswith("_timescaledb_internal._hyper_1_")
    # older_than filters on range_end (ddl_api.sql:101)
    some = ts_events.sql(
        "SELECT show_chunks('events', older_than => TIMESTAMP '2024-01-18')"
    ).collect()
    assert 0 < len(some) < len(rows)


def test_compress_decompress_chunk_by_name(ts_events):
    ts_events.sql(
        "ALTER TABLE events SET (timescaledb.compress, "
        "timescaledb.compress_segmentby = 'event_type', "
        "timescaledb.compress_orderby = 'ts DESC')"
    ).collect()
    chunk = ts_events.sql("SELECT show_chunks('events')").first()["chunk"]
    ts_events.sql(f"SELECT compress_chunk('{chunk}')").collect()
    st = ts_events.sql("SELECT show_chunks('events')").first()
    assert st["is_compressed"]
    ts_events.sql(f"SELECT decompress_chunk('{chunk}')").collect()
    assert not ts_events.sql("SELECT show_chunks('events')").first()["is_compressed"]


def test_drop_chunks_retention(ts_events):
    before = ts_events.sql("SELECT show_chunks('events')").count()
    dropped = ts_events.sql(
        "SELECT drop_chunks('events', older_than => TIMESTAMP '2024-01-18')"
    ).count()
    after = ts_events.sql("SELECT show_chunks('events')").count()
    assert dropped > 0 and after == before - dropped


def test_policies_roundtrip(ts_events):
    j1 = ts_events.sql(
        "SELECT add_retention_policy('events', INTERVAL '90 days')"
    ).first()["job_id"]
    assert j1 >= 1
    jobs = {j["id"]: j for j in ts_events.catalog.bgw_job.read()}
    assert jobs[j1]["proc"] == "policy_retention"
    ts_events.sql("SELECT remove_retention_policy('events')").collect()
    assert j1 not in {j["id"] for j in ts_events.catalog.bgw_job.read()}

    ts_events.sql(
        "ALTER TABLE events SET (timescaledb.compress)"
    ).collect()
    j2 = ts_events.sql(
        "SELECT add_columnstore_policy('events', INTERVAL '7 days')"
    ).first()["job_id"]
    res = ts_events.sql(f"SELECT run_job({j2})").first()
    assert res["job_id"] == j2
    ts_events.sql(f"SELECT delete_job({j2})").collect()


def test_cagg_ddl_end_to_end(ts_events, duck):
    ts_events.sql(
        """
        CREATE MATERIALIZED VIEW daily WITH (timescaledb.continuous) AS
        SELECT time_bucket(INTERVAL '1 day', ts) AS bucket, event_type,
               count(*) AS n, sum(value) AS sum_v,
               last(value, event_id) AS last_v
        FROM events
        GROUP BY bucket, event_type
        """
    ).collect()
    df = ts_events.sql("SELECT * FROM daily")
    assert_match(df, duck, """
        SELECT make_timestamp(epoch_us(ts) - ((epoch_us(ts) - 946857600000000) % 86400000000 + 86400000000) % 86400000000) AS bucket,
               event_type, count(*) AS n, sum(value) AS sum_v,
               arg_max(value, event_id) AS last_v
        FROM events GROUP BY 1, 2
    """)


def test_cagg_ddl_with_no_data_then_refresh(ts_events):
    ts_events.sql(
        """
        CREATE MATERIALIZED VIEW lazy WITH (timescaledb.continuous,
                                            timescaledb.materialized_only = 'true') AS
        SELECT time_bucket('1 day', ts) AS bucket, count(*) AS n
        FROM events GROUP BY bucket
        WITH NO DATA
        """
    ).collect()
    # PG: "materialized view has not been populated" until first refresh
    with pytest.raises(ValueError, match="never refreshed"):
        ts_events.sql("SELECT * FROM lazy").collect()
    ts_events.sql(
        "CALL refresh_continuous_aggregate('lazy', NULL, NULL)"
    ).collect()
    assert ts_events.sql("SELECT * FROM lazy").count() > 0


def test_cagg_ddl_with_join(ts_events, spark, sf_dir):
    ts_events.create_table("customer", load_table(spark, sf_dir, "customer"))
    ts_events.sql(
        """
        CREATE MATERIALIZED VIEW seg_daily WITH (timescaledb.continuous) AS
        SELECT time_bucket('1 day', e.ts) AS bucket, c.c_mktsegment,
               count(*) AS n, sum(e.value) AS sum_v
        FROM events e JOIN customer c ON e.user_id = c.c_custkey
        GROUP BY bucket, c_mktsegment
        """
    ).collect()
    got = ts_events.sql("SELECT * FROM seg_daily")
    ev = load_table(spark, sf_dir, "events")
    cu = load_table(spark, sf_dir, "customer")
    from timescaledb_spark.functions import time_bucket

    want = (
        ev.join(cu, ev.user_id == cu.c_custkey)
        .groupBy(time_bucket("1 day", "ts").alias("bucket"), "c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("sum_v"))
    )
    assert got.count() == want.count()
    assert got.exceptAll(want).count() == 0


def test_set_chunk_interval_and_size(ts_events):
    ts_events.sql(
        "SELECT set_chunk_time_interval('events', INTERVAL '14 days')"
    ).collect()
    assert ts_events.get_hypertable("events").row["chunk_interval"] == 14 * 86_400_000_000
    assert ts_events.sql("SELECT hypertable_size('events')").first()[0] > 0


def test_info_views_via_sql(ts_events):
    rows = ts_events.sql(
        "SELECT hypertable_name, num_chunks, compression_enabled "
        "FROM timescaledb_information.hypertables"
    ).collect()
    assert rows[0]["hypertable_name"] == "events" and rows[0]["num_chunks"] > 3
    n = ts_events.sql(
        "SELECT count(*) AS n FROM timescaledb_information.chunks "
        "WHERE hypertable_name = 'events'"
    ).first()["n"]
    assert n == rows[0]["num_chunks"]
    ts_events.sql("SELECT add_retention_policy('events', INTERVAL '90 days')").collect()
    jobs = ts_events.sql(
        "SELECT * FROM timescaledb_information.jobs"
    ).collect()
    assert any("retention" in (j["proc_name"] or "") for j in jobs)


def test_hierarchical_cagg_ddl(ts_events):
    ts_events.sql(
        """
        CREATE MATERIALIZED VIEW hourly_h WITH (timescaledb.continuous) AS
        SELECT time_bucket('1 hour', ts) AS bucket, count(*) AS n,
               sum(value) AS sum_v
        FROM events GROUP BY bucket
        """
    ).collect()
    ts_events.sql(
        """
        CREATE MATERIALIZED VIEW daily_h WITH (timescaledb.continuous) AS
        SELECT time_bucket('1 day', bucket) AS bucket, sum(n) AS n,
               sum(sum_v) AS sum_v
        FROM hourly_h GROUP BY bucket
        """
    ).collect()
    total = ts_events.sql("SELECT sum(n) AS t FROM daily_h").first()["t"]
    raw = ts_events.sql("SELECT count(*) AS t FROM events").first()["t"]
    assert total == raw


def test_alter_mv_and_detailed_size(ts_events):
    ts_events.sql(
        """
        CREATE MATERIALIZED VIEW rt WITH (timescaledb.continuous) AS
        SELECT time_bucket('1 day', ts) AS bucket, count(*) AS n
        FROM events GROUP BY bucket
        """
    ).collect()
    # flip realtime off: reads return only materialized rows
    ts_events.sql(
        "ALTER MATERIALIZED VIEW rt SET (timescaledb.materialized_only = true)"
    ).collect()
    assert ts_events.get_cagg("rt").row["materialized_only"] is True
    ts_events.sql(
        "ALTER MATERIALIZED VIEW rt SET (timescaledb.materialized_only = false)"
    ).collect()
    assert ts_events.get_cagg("rt").row["materialized_only"] is False

    sizes = ts_events.sql("SELECT chunks_detailed_size('events')").collect()
    assert len(sizes) > 3 and all(r["total_bytes"] > 0 for r in sizes)
    tot = ts_events.sql("SELECT hypertable_detailed_size('events')").first()
    assert tot["table_bytes"] == sum(r["total_bytes"] for r in sizes)
    assert tot["num_chunks"] == len(sizes)


def test_created_filters_and_attach_detach(ts_events):
    n = ts_events.sql("SELECT show_chunks('events')").count()
    # everything was created just now → created_after an hour ago = all
    recent = ts_events.sql(
        "SELECT show_chunks('events', created_after => INTERVAL '1 hour')"
    ).count()
    assert recent == n
    old = ts_events.sql(
        "SELECT show_chunks('events', created_before => INTERVAL '1 hour')"
    ).count()
    assert old == 0

    chunk = ts_events.sql("SELECT show_chunks('events')").first()
    ts_events.sql(f"SELECT detach_chunk('{chunk['chunk']}')").collect()
    assert ts_events.sql("SELECT show_chunks('events')").count() == n - 1
    from timescaledb_spark.hypertable import _to_internal

    lo = _to_internal(chunk["range_start"])
    hi = _to_internal(chunk["range_end"])
    ts_events.sql(f"SELECT attach_chunk('events', {lo}, {hi})").collect()
    assert ts_events.sql("SELECT show_chunks('events')").count() == n


def test_update_delete_sql(ts_events):
    total = ts_events.sql("SELECT count(*) AS n FROM events").first()["n"]
    upd = ts_events.sql(
        "UPDATE events SET value = value * 2 "
        "WHERE event_type = 'click' AND ts >= '2024-01-10' AND ts < '2024-01-20'"
    ).first()["rows_updated"]
    assert upd > 0
    # deleting those same rows prunes to the same chunk range
    dele = ts_events.sql(
        "DELETE FROM events WHERE event_type = 'click' "
        "AND ts >= '2024-01-10' AND ts < '2024-01-20'"
    ).first()["rows_deleted"]
    assert dele == upd
    after = ts_events.sql("SELECT count(*) AS n FROM events").first()["n"]
    assert after == total - dele
    # full-table DELETE empties and drops every chunk
    ts_events.sql("DELETE FROM events").collect()
    assert ts_events.sql("SELECT show_chunks('events')").count() == 0


def test_maintenance_aliases(ts_events):
    """compact_chunk / rebuild_columnstore / rebuild_sparse_index
    (sql/maintenance_utils.sql:58-113)."""
    ts_events.sql(
        "ALTER TABLE events SET (timescaledb.compress, "
        "timescaledb.compress_segmentby = 'event_type')"
    ).collect()
    chunk = ts_events.sql("SELECT show_chunks('events')").first()["chunk"]
    # rebuild_columnstore before compression errors (unlike compress_chunk)
    with pytest.raises(ValueError, match="not a columnstore"):
        ts_events.sql(f"SELECT rebuild_columnstore('{chunk}')").collect()
    ts_events.sql(f"SELECT compress_chunk('{chunk}')").collect()
    ts_events.sql(f"SELECT rebuild_columnstore('{chunk}')").collect()
    ts_events.sql(f"SELECT compact_chunk('{chunk}')").collect()
    assert ts_events.sql("SELECT show_chunks('events')").first()["is_compressed"]

    # rebuild_sparse_index: per-chunk ANALYZE of the skip stats
    ht = ts_events.get_hypertable("events")
    ht.enable_chunk_skipping("user_id")
    cid = ht.chunks()[0]["id"]
    before = ts_events.catalog.chunk_column_stats.find(
        chunk_id=cid, column="user_id"
    )
    assert before
    # fresh stats + force=false -> no-op
    assert (
        ts_events.sql(f"SELECT rebuild_sparse_index('{chunk}')").collect()
        is not None
    )
    # drop the chunk's stats (simulating a rewrite), then rebuild
    ts_events.catalog.chunk_column_stats.delete(
        {"chunk_id": cid, "column": "user_id"}
    )
    ts_events.sql(f"SELECT rebuild_sparse_index('{chunk}')").collect()
    after = ts_events.catalog.chunk_column_stats.find(
        chunk_id=cid, column="user_id"
    )
    assert after and after[0]["min"] == before[0]["min"]
    # force=true recomputes unconditionally (still correct values)
    ts_events.sql(
        f"SELECT rebuild_sparse_index('{chunk}', force => true)"
    ).collect()
    assert ts_events.catalog.chunk_column_stats.find(
        chunk_id=cid, column="user_id"
    )


def test_maintenance_aliases_python_api(ts_events):
    from timescaledb_spark import compression

    ht = ts_events.get_hypertable("events")
    compression.enable_columnstore(ht, segmentby="event_type")
    c0 = ht.chunks()[0]
    compression.compress_chunk(ht, c0)
    r = compression.compact_chunk(ht, c0["range_start"])
    assert r["chunk"] == c0["range_start"]
    r = compression.rebuild_columnstore(ht, c0["range_start"])
    assert r["chunk"] == c0["range_start"]
    # no skip columns -> rebuild_sparse_index is a 0-row no-op
    assert compression.rebuild_sparse_index(ht, c0["range_start"]) == 0


def test_sql_surface_parity_names(ts_events):
    """Round-8 SQL-name parity: every remaining public @extschema@
    function that is in scope (tablespaces/move_chunk/OSM excluded by
    design) resolves through ts.sql."""
    ts = ts_events
    # set_number_partitions needs a space dimension? no — it validates in
    # the hypertable layer; use set_partitioning_interval + restore +
    # telemetry + remove_columnstore_policy round-trip
    ts.sql(
        "SELECT set_partitioning_interval('events', INTERVAL '14 days')"
    ).collect()
    assert (
        ts.get_hypertable("events").row["chunk_interval"]
        == 14 * 86_400_000_000
    )
    ts.sql("SELECT add_columnstore_policy('events', INTERVAL '30 days')").collect()
    ts.sql("SELECT remove_columnstore_policy('events')").collect()
    ts.sql("SELECT timescaledb_pre_restore()").collect()
    assert ts.catalog.metadata.find_one(key="restoring")["value"] is True
    ts.sql("SELECT timescaledb_post_restore()").collect()
    assert ts.catalog.metadata.find_one(key="restoring")["value"] is False
    import json

    rep = json.loads(
        ts.sql("SELECT get_telemetry_report()").first()["report"]
    )
    assert rep["num_hypertables"] >= 1


def test_set_number_partitions_sql(ts, spark):
    ts.create_hypertable(
        "spaced", "ts", chunk_interval="7 days",
        space_column="dev", num_partitions=4,
    )
    ts.sql("SELECT set_number_partitions('spaced', 8)").collect()
    assert ts.get_hypertable("spaced").row["num_partitions"] == 8
