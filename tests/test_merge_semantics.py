"""MERGE edge semantics mirroring PostgreSQL's arbiter behavior
(``src/nodes/modify_hypertable.c``, ``test/sql/upsert.sql``):

- two source rows matching the same target row raise ("MERGE command
  cannot affect row a second time") instead of fanning the row out;
- NULL keys never match (plain equality, not null-safe);
- matching is structurally chunk-local: a source row only sees target
  rows in the chunk its own time value routes to;
- non-equi MERGE ON conjuncts are rejected cleanly;
- a pre-existing Hive null-partition dir blocks writes without being
  deleted.
"""

import os

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _ht(ts, spark, rows, schema="us long, k int, v double"):
    ht = ts.create_hypertable("t", "ts", chunk_interval="1 day")
    if rows:
        ht.insert(
            ts.spark.createDataFrame(rows, schema).select(
                F.timestamp_micros("us").alias("ts"), "k", "v"
            )
        )
    return ht


T0 = 1704067200000000  # 2024-01-01
DAY = 86_400_000_000


def _src(spark, rows, schema="us long, k int, v double"):
    return spark.createDataFrame(rows, schema).select(
        F.timestamp_micros("us").alias("ts"), "k", "v"
    )


def test_duplicate_source_match_raises(ts, spark):
    ht = _ht(ts, spark, [(T0, 1, 1.0)])
    dup = _src(spark, [(T0, 1, 10.0), (T0, 1, 20.0)])
    with pytest.raises(ValueError, match="second time"):
        ht.merge_into(
            dup, ["ts", "k"], matched_update={"v": "target.v + excluded.v"}
        )
    # target untouched after the rejected command
    assert [tuple(r) for r in ht.df().select("k", "v").collect()] == [(1, 1.0)]


def test_duplicate_source_without_match_inserts_both(ts, spark):
    ht = _ht(ts, spark, [(T0, 1, 1.0)])
    dup = _src(spark, [(T0, 2, 10.0), (T0, 2, 20.0)])
    st = ht.merge_into(dup, ["ts", "k"], matched_update={"v": "excluded.v"})
    # no target row is affected twice -> no error; both unmatched insert
    assert st["rows_inserted"] == 2
    assert ht.df().count() == 3


def test_null_keys_never_match(ts, spark):
    ht = _ht(ts, spark, [(T0, None, 1.0)])
    src = _src(spark, [(T0, None, 99.0)])
    st = ht.merge_into(src, ["ts", "k"], matched_update={"v": "excluded.v"})
    # SQL equality: NULL = NULL is not true -> insert, not update
    assert (st["rows_updated"], st["rows_inserted"]) == (0, 1)
    vals = sorted(r["v"] for r in ht.df().collect())
    assert vals == [1.0, 99.0]


def test_matching_is_chunk_local(ts, spark):
    # key omits the time column; same k exists in a different chunk
    ht = _ht(ts, spark, [(T0, 5, 1.0)])
    src = _src(spark, [(T0 + DAY, 5, 99.0)])
    st = ht.merge_into(src, ["k"], matched_update={"v": "excluded.v"})
    # source routes to day-2 chunk; must NOT update the day-1 row
    assert (st["rows_updated"], st["rows_inserted"]) == (0, 1)
    day1 = ht.df().filter(F.col("ts") == F.timestamp_micros(F.lit(T0)))
    assert day1.collect()[0]["v"] == 1.0
    assert ht.df().count() == 2


def test_same_chunk_match_without_time_key(ts, spark):
    ht = _ht(ts, spark, [(T0, 5, 1.0)])
    src = _src(spark, [(T0 + 3600_000_000, 5, 99.0)])  # same day-chunk
    st = ht.merge_into(src, ["k"], matched_update={"v": "excluded.v"})
    assert (st["rows_updated"], st["rows_inserted"]) == (1, 0)
    assert ht.df().collect()[0]["v"] == 99.0


@pytest.mark.parametrize("cond", ["t.ts >= s.ts", "t.k != s.k", "t.k <> s.k"])
def test_sql_merge_rejects_all_non_equi_forms(ts, cond):
    ts.sql(
        "SELECT create_hypertable('m', 'ts', chunk_time_interval => INTERVAL '1 day')"
    )
    ts.sql(
        "INSERT INTO m (ts, k, v) SELECT timestamp '2024-01-01', 1, 1.0"
    )
    with pytest.raises(ValueError, match="equality conjunction"):
        ts.sql(
            "MERGE INTO m t USING (SELECT timestamp '2024-01-01' AS ts, "
            f"1 AS k, 2.0 AS v) s ON {cond} WHEN MATCHED THEN DELETE"
        )


def test_preexisting_null_partition_dir_blocks_write_undeleted(ts, spark):
    ht = _ht(ts, spark, [(T0, 1, 1.0)])
    bad = os.path.join(ht.data_dir, "_chunk=__HIVE_DEFAULT_PARTITION__")
    os.makedirs(bad)
    marker = os.path.join(bad, "external.parquet")
    with open(marker, "w") as f:
        f.write("external writer data")
    with pytest.raises(ValueError, match="pre-existing"):
        ht.insert(_src(spark, [(T0 + DAY, 2, 2.0)]))
    # the foreign data was NOT deleted
    assert os.path.exists(marker)


def test_upsert_is_chunk_local(ts, spark):
    """upsert replacement only displaces rows in the new row's OWN
    routed chunk (keys omitting time cannot reach other chunks)."""
    ht = _ht(ts, spark, [(T0, 5, 1.0)])
    st = ht.upsert(_src(spark, [(T0 + DAY, 5, 99.0)]), keys=["k"])
    rows = sorted((r["k"], r["v"]) for r in ht.df().collect())
    # day-1 row survives; day-2 row appended
    assert rows == [(5, 1.0), (5, 99.0)]


def test_upsert_same_chunk_replaces(ts, spark):
    ht = _ht(ts, spark, [(T0, 5, 1.0)])
    ht.upsert(_src(spark, [(T0 + 3600_000_000, 5, 99.0)]), keys=["k"])
    rows = [(r["k"], r["v"]) for r in ht.df().collect()]
    assert rows == [(5, 99.0)]
