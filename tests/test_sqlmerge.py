"""SQL MERGE / INSERT..ON CONFLICT / COPY over hypertables, mirroring the
reference's upsert cases (``test/sql/upsert.sql``) and MERGE usage
(``tsl/test/sql/cagg_query_using_merge.sql``); COPY chunk routing mirrors
``src/copy.c``."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _seed(ts, n=10):
    ts.sql(
        "SELECT create_hypertable('m', 'ts', chunk_time_interval => INTERVAL '1 day')"
    )
    ts.sql(
        "INSERT INTO m (ts, k, v) SELECT timestamp '2024-01-01' + "
        "make_interval(0,0,0,0,CAST(id AS INT),0,0), id, CAST(id AS DOUBLE) "
        f"FROM range({n})"
    )


def _src_sql(lo, hi, v="CAST(id*100 AS DOUBLE)"):
    return (
        "SELECT timestamp '2024-01-01' + "
        f"make_interval(0,0,0,0,CAST(id AS INT),0,0) AS ts, id AS k, {v} AS v "
        f"FROM range({lo}, {hi})"
    )


def test_on_conflict_do_nothing(ts):
    _seed(ts)
    r = ts.sql(
        f"INSERT INTO m (ts, k, v) {_src_sql(5, 12)} "
        "ON CONFLICT (ts, k) DO NOTHING"
    ).collect()[0]
    assert (r["rows_inserted"], r["rows_updated"]) == (2, 0)
    # upsert.sql: conflicting rows keep their original values
    assert ts.sql("SELECT v FROM m WHERE k = 5").collect()[0][0] == 5.0
    assert ts.sql("SELECT count(*) AS n FROM m").collect()[0][0] == 12


def test_on_conflict_do_update_excluded_and_target(ts):
    _seed(ts)
    r = ts.sql(
        f"INSERT INTO m (ts, k, v) {_src_sql(5, 7)} "
        "ON CONFLICT (ts, k) DO UPDATE SET v = v + excluded.v"
    ).collect()[0]
    assert (r["rows_inserted"], r["rows_updated"]) == (0, 2)
    # bare v resolves to the target row (PG ON CONFLICT scope)
    assert ts.sql("SELECT v FROM m WHERE k = 5").collect()[0][0] == 505.0


def test_merge_update_insert_delete(ts):
    _seed(ts)
    r = ts.sql(
        f"MERGE INTO m t USING ({_src_sql(6, 14, 'CAST(1 AS DOUBLE)')}) s "
        "ON t.ts = s.ts AND t.k = s.k "
        "WHEN MATCHED THEN UPDATE SET v = t.v + s.v "
        "WHEN NOT MATCHED THEN INSERT *"
    ).collect()[0]
    assert (r["rows_inserted"], r["rows_updated"], r["rows_deleted"]) == (4, 4, 0)
    assert ts.sql("SELECT v FROM m WHERE k = 6").collect()[0][0] == 7.0
    assert ts.sql("SELECT v FROM m WHERE k = 13").collect()[0][0] == 1.0

    r = ts.sql(
        f"MERGE INTO m t USING ({_src_sql(0, 3)}) s "
        "ON t.ts = s.ts AND t.k = s.k "
        "WHEN MATCHED THEN DELETE"
    ).collect()[0]
    assert r["rows_deleted"] == 3
    assert ts.sql("SELECT count(*) AS n FROM m").collect()[0][0] == 11


def test_merge_insert_column_list_values(ts):
    _seed(ts, n=2)
    r = ts.sql(
        f"MERGE INTO m t USING ({_src_sql(2, 4)}) s "
        "ON t.ts = s.ts AND t.k = s.k "
        "WHEN NOT MATCHED THEN INSERT (ts, k, v) VALUES (s.ts, s.k, s.v * 2)"
    ).collect()[0]
    assert r["rows_inserted"] == 2
    assert ts.sql("SELECT v FROM m WHERE k = 3").collect()[0][0] == 600.0


def test_merge_rejects_non_equi_on(ts):
    _seed(ts, n=2)
    with pytest.raises(ValueError):
        ts.sql(
            f"MERGE INTO m t USING ({_src_sql(0, 1)}) s "
            "ON t.k < s.k WHEN MATCHED THEN DELETE"
        )


def test_copy_csv_routes_chunks(ts, tmp_path):
    _seed(ts, n=1)
    p = tmp_path / "in.csv"
    p.write_text(
        "ts,k,v\n2024-03-01T00:00:00,100,1.5\n2024-03-02T01:00:00,101,2.5\n"
    )
    r = ts.sql(f"COPY m FROM '{p}' WITH (FORMAT csv, HEADER)").collect()[0]
    assert r["rows_copied"] == 2
    ht = ts.get_hypertable("m")
    # two distinct days -> routed to two distinct chunks
    assert ts.sql("SELECT count(*) AS n FROM m").collect()[0][0] == 3
    assert len(ht.chunks()) == 3


def test_merge_api_cardinality_docs(ts, spark):
    """merge_into is exercised via the SQL path above; the Column-level
    API accepts expression objects too."""
    _seed(ts, n=3)
    ht = ts.get_hypertable("m")
    src = spark.sql(_src_sql(0, 2))
    st = ht.merge_into(
        src, ["ts", "k"], matched_update={"v": F.expr("target.v + 1")}
    )
    assert st["rows_updated"] == 2
    assert ts.sql("SELECT v FROM m WHERE k = 0").collect()[0][0] == 1.0
