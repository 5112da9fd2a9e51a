"""MERGE ... WHEN NOT MATCHED BY SOURCE (PG17; reference
``test/sql/merge_not_matched_by_source.sql``): target rows with no
source match can be deleted or updated, with in-order conditional
clause evaluation; by-source actions reach every chunk."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0 = 1704067200000000  # 2024-01-01
DAY = 86_400_000_000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _ht(ts, spark, rows):
    ht = ts.create_hypertable("t", "ts", chunk_interval="1 day")
    ht.insert(
        ts.spark.createDataFrame(rows, "us long, loc int, temp int").select(
            F.timestamp_micros("us").alias("ts"), "loc", "temp"
        )
    )
    return ht


def _src(spark, rows):
    return spark.createDataFrame(rows, "us long, loc int, temp int").select(
        F.timestamp_micros("us").alias("ts"), "loc", "temp"
    )


def test_by_source_delete(ts, spark):
    """Reference case: insert missing, delete unmatched targets."""
    ht = _ht(ts, spark, [(T0, 1, 14), (T0, 2, 14), (T0, 3, 14)])
    src = _src(spark, [(T0, 2, 80), (T0, 9, 80)])
    st = ht.merge_into(
        src, ["loc"],
        insert_not_matched=True,
        not_matched_by_source=[{"action": "delete"}],
    )
    assert (st["rows_inserted"], st["rows_deleted"]) == (1, 2)
    got = {(r["loc"], r["temp"]) for r in ht.df().collect()}
    assert got == {(2, 14), (9, 80)}


def test_by_source_conditional_chain(ts, spark):
    """The reference's 4-clause shape: MATCHED update + BY TARGET insert
    + conditional BY SOURCE delete + catch-all BY SOURCE update, rows
    spanning multiple chunks."""
    rows = [
        (T0 + d * DAY, loc, 14) for d in range(4) for loc in (1, 2, 3, 4)
    ]
    ht = _ht(ts, spark, rows)
    src = _src(spark, [(T0, 1, 80), (T0, 2, 80), (T0, 5, 80)])
    st = ht.merge_into(
        src, ["ts", "loc"],
        matched_update={"temp": "CAST((target.temp + excluded.temp) / 2 AS INT)"},
        insert_not_matched=True,
        not_matched_by_source=[
            {"condition": "target.loc = 3", "action": "delete"},
            {"action": {"temp": "99"}},
        ],
    )
    # matched: (T0,1),(T0,2); inserted: (T0,5); by-source: every other
    # row — loc 3 rows deleted (4 chunks), the rest set to 99
    assert st["rows_inserted"] == 1
    assert st["rows_updated"] == 2 + (16 - 2 - 4)
    assert st["rows_deleted"] == 4
    got = {(int(r["ts"].timestamp() * 1e6), r["loc"], r["temp"])
           for r in ht.df().collect()}
    assert (T0, 1, 47) in got and (T0, 2, 47) in got      # averaged
    assert (T0, 5, 80) in got                             # inserted
    assert not any(loc == 3 for _, loc, _t in got)        # deleted
    assert (T0 + DAY, 1, 99) in got                       # catch-all
    assert len(got) == 16 - 4 + 1


def test_by_source_clause_order_first_wins(ts, spark):
    ht = _ht(ts, spark, [(T0, 7, 14)])
    src = _src(spark, [(T0, 1, 80)])
    ht.merge_into(
        src, ["loc"], insert_not_matched=False,
        not_matched_by_source=[
            {"condition": "target.loc = 7", "action": {"temp": "1"}},
            {"action": "delete"},  # would also match; must NOT run
        ],
    )
    assert [(r["loc"], r["temp"]) for r in ht.df().collect()] == [(7, 1)]


def test_by_source_sql_surface(ts, spark):
    ts.sql(
        "SELECT create_hypertable('m', 'ts', chunk_time_interval => INTERVAL '1 day')"
    )
    ts.sql(
        "INSERT INTO m (ts, loc, temp) SELECT timestamp '2024-01-01', id, 14 "
        "FROM range(1, 5)"
    )
    r = ts.sql(
        "MERGE INTO m t USING (SELECT timestamp '2024-01-01' AS ts, "
        "1 AS loc, 80 AS temp UNION ALL SELECT timestamp '2024-01-01', 9, 80) s "
        "ON t.loc = s.loc "
        "WHEN MATCHED THEN UPDATE SET temp = CAST((t.temp + s.temp) / 2 AS INT) "
        "WHEN NOT MATCHED BY TARGET THEN INSERT (ts, loc, temp) VALUES (s.ts, s.loc, s.temp) "
        "WHEN NOT MATCHED BY SOURCE AND t.loc = 3 THEN DELETE "
        "WHEN NOT MATCHED BY SOURCE THEN UPDATE SET temp = 99"
    ).collect()[0]
    assert (r["rows_inserted"], r["rows_updated"], r["rows_deleted"]) == (1, 3, 1)
    got = {(r["loc"], r["temp"]) for r in ts.sql("SELECT loc, temp FROM m").collect()}
    assert got == {(1, 47), (2, 99), (4, 99), (9, 80)}


def test_by_source_validation(ts, spark):
    ht = _ht(ts, spark, [(T0, 1, 14)])
    with pytest.raises(ValueError, match="delete"):
        ht.merge_into(
            _src(spark, []), ["loc"],
            not_matched_by_source=[{"action": "nuke"}],
        )
    with pytest.raises(ValueError, match="partition column"):
        ht.merge_into(
            _src(spark, [(T0, 1, 1)]), ["loc"],
            not_matched_by_source=[{"action": {"ts": "ts"}}],
        )
