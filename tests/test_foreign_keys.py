"""Round-13: declared FOREIGN KEY constraints are recorded and ENFORCED
on hypertable inserts by default — the reference silently enforces them
(``src/foreign_key.c`` propagates hypertable FKs to every chunk so plain
PG enforcement applies), so relaxing them must be the user's explicit
choice (``enforce_foreign_keys=False`` per call or per session). PG
MATCH SIMPLE semantics: any-NULL keys pass. ``REFERENCES t`` without
columns targets ``t``'s primary key."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


def _ts(d, h=0):
    return datetime.datetime(2024, 1, d, h)


@pytest.fixture()
def ts(spark):
    return TSSession(spark, tempfile.mkdtemp(prefix="ts_fk_"))


def _mk_devices(ts, spark):
    ts.sql(
        "CREATE TABLE devices (dev_id int PRIMARY KEY, name text)"
    )
    ts.create_table(
        "devices",
        spark.createDataFrame(
            [(1, "a"), (2, "b"), (3, "c")], "dev_id int, name string"
        ),
    )


class TestForeignKeyEnforcement:
    def _mk_measurements(self, ts):
        ts.sql(
            "CREATE TABLE m (t timestamp, dev_id int REFERENCES devices, "
            "v double) WITH (tsdb.hypertable, "
            "tsdb.partition_column => 't', "
            "tsdb.chunk_interval => '7 days')"
        )
        return ts.get_hypertable("m")

    def test_recorded_on_hypertable(self, ts, spark):
        _mk_devices(ts, spark)
        ht = self._mk_measurements(ts)
        assert ht.row["foreign_keys"] == [
            {"columns": ["dev_id"], "ref_table": "devices",
             "ref_columns": None}
        ]

    def test_violating_insert_raises_by_default(self, ts, spark):
        _mk_devices(ts, spark)
        ht = self._mk_measurements(ts)
        ok = spark.createDataFrame(
            [(_ts(1), 1, 1.0), (_ts(2), 2, 2.0)],
            "t timestamp, dev_id int, v double",
        )
        ht.insert(ok)
        assert ht.read().count() == 2
        bad = spark.createDataFrame(
            [(_ts(3), 99, 3.0)], "t timestamp, dev_id int, v double"
        )
        with pytest.raises(ValueError, match="foreign key"):
            ht.insert(bad)
        # nothing was written
        assert ht.read().count() == 2

    def test_null_key_passes_match_simple(self, ts, spark):
        _mk_devices(ts, spark)
        ht = self._mk_measurements(ts)
        ht.insert(spark.createDataFrame(
            [(_ts(1), None, 1.0)], "t timestamp, dev_id int, v double"
        ))
        assert ht.read().count() == 1

    def test_opt_out_per_call_and_per_session(self, ts, spark):
        _mk_devices(ts, spark)
        ht = self._mk_measurements(ts)
        bad = spark.createDataFrame(
            [(_ts(3), 99, 3.0)], "t timestamp, dev_id int, v double"
        )
        ht.insert(bad, enforce_foreign_keys=False)
        assert ht.read().count() == 1
        ts.enforce_foreign_keys = False
        ht.insert(spark.createDataFrame(
            [(_ts(4), 98, 4.0)], "t timestamp, dev_id int, v double"
        ))
        assert ht.read().count() == 2

    def test_sql_insert_enforced(self, ts, spark):
        _mk_devices(ts, spark)
        self._mk_measurements(ts)
        ts.sql("INSERT INTO m VALUES ('2024-01-01', 1, 1.0)")
        with pytest.raises(Exception, match="foreign key"):
            ts.sql("INSERT INTO m VALUES ('2024-01-02', 77, 2.0)")

    def test_table_level_composite_fk(self, ts, spark):
        ts.sql(
            "CREATE TABLE dim2 (a int, b text, x double, "
            "PRIMARY KEY (a, b))"
        )
        ts.create_table(
            "dim2",
            spark.createDataFrame(
                [(1, "p", 0.0), (2, "q", 0.0)], "a int, b string, x double"
            ),
        )
        ts.sql(
            "CREATE TABLE m2 (t timestamp, a int, b text, v double, "
            "FOREIGN KEY (a, b) REFERENCES dim2 (a, b)) "
            "WITH (tsdb.hypertable, tsdb.partition_column => 't')"
        )
        ht = ts.get_hypertable("m2")
        assert ht.row["foreign_keys"][0]["ref_columns"] == ["a", "b"]
        ht.insert(spark.createDataFrame(
            [(_ts(1), 1, "p", 1.0)],
            "t timestamp, a int, b string, v double",
        ))
        with pytest.raises(ValueError, match="foreign key"):
            ht.insert(spark.createDataFrame(
                [(_ts(2), 1, "q", 2.0)],  # (1,q) not in dim2
                "t timestamp, a int, b string, v double",
            ))

    def test_missing_ref_table_rejected_at_create(self, ts):
        with pytest.raises(ValueError, match="does not exist"):
            ts.sql(
                "CREATE TABLE m3 (t timestamp, "
                "d int REFERENCES nosuch, v double) "
                "WITH (tsdb.hypertable, tsdb.partition_column => 't')"
            )

    def test_ref_without_pk_rejected(self, ts, spark):
        ts.sql("CREATE TABLE nopk (a int, b text)")
        ts.create_table(
            "nopk", spark.createDataFrame([(1, "x")], "a int, b string")
        )
        ts.sql(
            "CREATE TABLE m4 (t timestamp, a int REFERENCES nopk, "
            "v double) WITH (tsdb.hypertable, "
            "tsdb.partition_column => 't')"
        )
        ht = ts.get_hypertable("m4")
        with pytest.raises(ValueError, match="no.*primary key"):
            ht.insert(spark.createDataFrame(
                [(_ts(1), 1, 1.0)], "t timestamp, a int, v double"
            ))

    def test_combined_with_strict_unique(self, ts, spark):
        _mk_devices(ts, spark)
        ts.sql(
            "CREATE TABLE m5 (t timestamp, dev_id int REFERENCES devices, "
            "v double, PRIMARY KEY (t, dev_id)) "
            "WITH (tsdb.hypertable, tsdb.partition_column => 't')"
        )
        ht = ts.get_hypertable("m5")
        ht.insert(
            spark.createDataFrame(
                [(_ts(1), 1, 1.0)], "t timestamp, dev_id int, v double"
            ),
            strict_constraints=True,
        )
        # FK violation still raises on the strict-unique path
        with pytest.raises(ValueError, match="foreign key"):
            ht.insert(
                spark.createDataFrame(
                    [(_ts(2), 99, 2.0)],
                    "t timestamp, dev_id int, v double",
                ),
                strict_constraints=True,
            )
        # unique violation raises too
        with pytest.raises(ValueError, match="duplicate key"):
            ht.insert(
                spark.createDataFrame(
                    [(_ts(1), 1, 9.0)], "t timestamp, dev_id int, v double"
                ),
                strict_constraints=True,
            )
