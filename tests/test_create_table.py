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
