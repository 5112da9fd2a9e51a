"""CREATE TABLE — the reference workflow's first statement (plain PG
DDL), followed by create_hypertable adoption and positional INSERT
VALUES, exactly as a TimescaleDB user would run it."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def test_reference_first_session_flow(ts):
    ts.sql(
        "CREATE TABLE metrics (ts TIMESTAMPTZ NOT NULL, device INT, "
        "value DOUBLE PRECISION, note TEXT)"
    )
    ts.sql(
        "SELECT create_hypertable('metrics', 'ts', "
        "chunk_time_interval => INTERVAL '7 days')"
    )
    ts.sql("INSERT INTO metrics VALUES (TIMESTAMP '2024-01-01', 1, 2.5, 'a')")
    ts.sql(
        "INSERT INTO metrics VALUES "
        "(TIMESTAMP '2024-01-09', 2, 3.5, 'b'), "
        "(TIMESTAMP '2024-01-16', 3, 4.5, NULL)"
    )
    rows = ts.sql(
        "SELECT device, value FROM metrics WHERE ts >= '2024-01-05' "
        "ORDER BY ts"
    ).collect()
    assert [(r["device"], r["value"]) for r in rows] == [(2, 3.5), (3, 4.5)]
    ht = ts.get_hypertable("metrics")
    assert len(ht.chunks()) == 3
    assert ht.row["time_type"] == "timestamp"


def test_pg_type_mapping(ts):
    ts.sql(
        "CREATE TABLE dims (id BIGSERIAL, name VARCHAR(50), w NUMERIC(10,2), "
        "ok BOOLEAN, blob BYTEA, tag UUID, PRIMARY KEY (id))"
    )
    assert ts.read_table("dims").schema.simpleString() == (
        "struct<id:bigint,name:string,w:decimal(10,2),ok:boolean,"
        "blob:binary,tag:string>"
    )
    # schema-only declared table reads as empty with the right columns
    assert ts.read_table("dims").count() == 0


def test_if_not_exists_and_duplicate(ts):
    ts.sql("CREATE TABLE t1 (ts TIMESTAMP, v DOUBLE)")
    ts.sql("CREATE TABLE IF NOT EXISTS t1 (other INT)")  # no-op
    with pytest.raises(ValueError, match="already exists"):
        ts.sql("CREATE TABLE t1 (other INT)")


def test_create_hypertable_validates_declared_columns(ts):
    ts.sql("CREATE TABLE t2 (ts TIMESTAMP, v DOUBLE)")
    with pytest.raises(ValueError, match="not in declared columns"):
        ts.create_hypertable("t2", "nope")
    ts.sql("CREATE TABLE t3 (label TEXT, v DOUBLE)")
    with pytest.raises(ValueError, match="invalid type"):
        ts.create_hypertable("t3", "label")


def test_integer_time_dimension_declared(ts):
    ts.sql("CREATE TABLE counters (tick BIGINT, v DOUBLE)")
    ht = ts.create_hypertable("counters", "tick", chunk_interval=100)
    ts.sql("INSERT INTO counters VALUES (5, 1.0), (150, 2.0)")
    assert ht.row["time_type"] == "int"
    assert len(ht.chunks()) == 2
    assert ts.sql(
        "SELECT sum(v) AS s FROM counters WHERE tick >= 100"
    ).collect()[0]["s"] == 2.0


def test_drop_table_restrict_and_cascade(ts, spark):
    ts.sql("CREATE TABLE m (ts TIMESTAMP, v DOUBLE)")
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    ts.sql("INSERT INTO m VALUES (TIMESTAMP '2024-01-01', 1.0)")
    cagg = ts.create_cagg("m_daily", "m", bucket_width="1 day",
                          aggs={"n": "count(1)"})
    with pytest.raises(ValueError, match="depend on it"):
        ht.drop()
    ts.sql("DROP TABLE m CASCADE")
    assert ts.catalog.hypertable.find_one(name="m") is None
    assert ts.catalog.continuous_agg.find_one(name="m_daily") is None
    assert ts.catalog.chunk.find(hypertable_id=ht.id) == []
    import os
    assert not os.path.isdir(ht.data_dir)
    # name is reusable
    ts.sql("CREATE TABLE m (ts TIMESTAMP, v DOUBLE)")
    ts.create_hypertable("m", "ts", chunk_interval="1 day")
    ts.sql("INSERT INTO m VALUES (TIMESTAMP '2024-02-01', 9.0)")
    assert ts.sql("SELECT count(*) n FROM m").collect()[0]["n"] == 1


def test_drop_table_cleans_policies(ts, spark):
    ts.sql("CREATE TABLE p (ts TIMESTAMP, v DOUBLE)")
    ts.create_hypertable("p", "ts", chunk_interval="1 day")
    ts.sql("INSERT INTO p VALUES (TIMESTAMP '2024-01-01', 1.0)")
    ts.jobs.add_retention_policy("p", drop_after="30 days")
    ts.sql("DROP TABLE p")
    assert not [
        j for j in ts.catalog.bgw_job.read()
        if (j.get("config") or {}).get("hypertable") == "p"
    ]


def test_drop_if_exists_and_mv(ts, spark):
    ts.sql("DROP TABLE IF EXISTS ghost")  # no error
    with pytest.raises(ValueError, match="no table"):
        ts.sql("DROP TABLE ghost")
    ts.sql("CREATE TABLE d (ts TIMESTAMP, v DOUBLE)")
    ts.create_hypertable("d", "ts", chunk_interval="1 day")
    ts.sql("INSERT INTO d VALUES (TIMESTAMP '2024-01-01', 1.0)")
    ts.create_cagg("d_daily", "d", bucket_width="1 day", aggs={"n": "count(1)"})
    ts.sql("DROP MATERIALIZED VIEW d_daily")
    assert ts.catalog.continuous_agg.find_one(name="d_daily") is None
    ts.sql("DROP TABLE d")  # now unblocked


def test_create_index_maps_to_skip_stats(ts, spark):
    """CREATE INDEX on a hypertable = the chunk-skipping sparse index;
    indexing the time dimension is a no-op (range pruning covers it)."""
    ts.sql("CREATE TABLE ix (ts TIMESTAMP, device INT, v DOUBLE)")
    ht = ts.create_hypertable("ix", "ts", chunk_interval="1 day")
    ts.sql(
        "INSERT INTO ix VALUES (TIMESTAMP '2024-01-01', 1, 1.0), "
        "(TIMESTAMP '2024-01-02', 2, 2.0)"
    )
    ts.sql("CREATE INDEX ix_dev ON ix (device)")
    assert ht.row.get("skip_columns") is None  # stale local row
    ht._refresh()
    assert ht.row["skip_columns"] == ["device"]
    assert ts.catalog.chunk_column_stats.find(hypertable_id=ht.id)
    # time index: accepted, no stats added
    ts.sql("CREATE UNIQUE INDEX ON ix (ts DESC)")
    ht._refresh()
    assert ht.row["skip_columns"] == ["device"]
