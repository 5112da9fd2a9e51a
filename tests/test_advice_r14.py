"""Round-14 ADVICE regressions.

1. min_n_by (asc) stored state order with NULL payloads: the stored
   (vals, data) arrays must follow the SAME (value, data *_nulls_last)
   total order the selection window uses — struct-sort put NULL
   payloads first on asc, contradicting the documented order at
   value-tie keep boundaries (caggs.py _maxn_state).
2. Counter/gauge partials gained num_changes in r13/r14; states
   materialized by older code lack the field — serves must tolerate a
   missing field (NULL num_changes) instead of failing at analysis
   time.
3. gauge_agg num_changes parity: the toolkit exposes num_changes for
   gauges too, so the SQL accessor must route it.
"""

import datetime
import tempfile

import pytest

from timescaledb_spark.session import TSSession


def _ts(d, h=0, m=0):
    return datetime.datetime(2024, 1, d, h, m)


def test_min_n_by_null_payload_tie_order(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_mnnull_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    # one bucket: value-tie at the keep boundary, one NULL payload
    ht.insert(spark.createDataFrame(
        [
            (_ts(1, 0, 1), 1.0, None),
            (_ts(1, 0, 2), 1.0, "a"),
            (_ts(1, 0, 3), 5.0, "z"),
        ],
        "ts timestamp, v double, dev string",
    ))
    cagg = ts.create_cagg(
        "mnn", ht, bucket_width="1 hour", aggs={},
        maxn_aggs={"mn": {"value": "v", "by": "dev", "n": 2,
                          "desc": False}},
    )
    cagg.refresh()
    st = cagg.read(realtime=False).collect()[0]["mn"]
    # asc selection order is (v asc_nulls_last, d asc_nulls_last):
    # (1.0,'a') before (1.0,NULL) — NULL payload must NOT sort first
    assert st["vals"] == [1.0, 1.0]
    assert st["data"] == ["a", None]

    # same order surfaces from the child merge path
    child = ts.create_cagg(
        "mnn_d", "_mat_mnn", bucket_width="1 day", aggs={},
        maxn_aggs={"mnd": {"rollup_of": "mn"}},
    )
    child.refresh()
    cst = child.read(realtime=False).collect()[0]["mnd"]
    assert cst["vals"] == [1.0, 1.0]
    assert cst["data"] == ["a", None]


@pytest.fixture(scope="module")
def counter_env(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_ncadv_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    ht.insert(spark.createDataFrame(
        [
            (_ts(1, 0, 0), 10.0),
            (_ts(1, 0, 30), 20.0),
            (_ts(1, 1, 0), 20.0),   # no change
            (_ts(1, 1, 30), 5.0),   # reset
        ],
        "ts timestamp, v double",
    ))
    cagg = ts.create_cagg(
        "nc", ht, bucket_width="1 hour", aggs={},
        counters={"c": {"value": "v"}},
    )
    cagg.refresh()
    return ts, cagg


def _drop_state_field(spark, ht, state_col, field):
    """Rewrite a mat hypertable's parquet in place with ``field``
    removed from the ``state_col`` struct — simulates states
    materialized by code predating the field."""
    import os
    import shutil

    from pyspark.sql import functions as F

    ddir = ht.data_dir
    df = spark.read.option("basePath", ddir).parquet(ddir)
    keep = [
        f.name for f in df.schema[state_col].dataType.fields
        if f.name != field
    ]
    legacy = df.withColumn(
        state_col,
        F.when(
            F.col(state_col).isNotNull(),
            F.struct(
                *[F.col(state_col)[n].alias(n) for n in keep]
            ),
        ),
    )
    tmp = ddir.rstrip("/") + "_legacy_tmp"
    legacy.write.partitionBy("_chunk").parquet(tmp)
    shutil.rmtree(ddir)
    os.rename(tmp, ddir)
    spark.catalog.clearCache()


def test_counter_state_missing_num_changes_tolerated(spark, counter_env):
    """Simulate a pre-r13 materialization: drop num_changes from the
    stored struct and re-serve — accessors must not fail at analysis
    time; num_changes serves NULL for legacy states."""
    ts, cagg = counter_env
    _drop_state_field(spark, cagg._mat(), "c", "num_changes")
    out = (
        cagg.counter_at_grain("c", grain="1 day", realtime=False)
        .collect()
    )
    assert len(out) == 1
    # the surviving fields still serve the reset-adjusted delta
    assert out[0]["num_changes"] is None
    assert out[0]["delta"] == 15.0  # (20-10) + (5 post-reset)
    assert out[0]["num_resets"] == 1


def test_gauge_state_missing_num_changes_tolerated(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_ngadv_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    ht.insert(spark.createDataFrame(
        [(_ts(1, 0, 0), 10.0), (_ts(1, 0, 30), 12.0), (_ts(1, 1, 0), 9.0)],
        "ts timestamp, v double",
    ))
    cagg = ts.create_cagg(
        "ng", ht, bucket_width="1 hour", aggs={},
        gauges={"g": {"value": "v"}},
    )
    cagg.refresh()
    _drop_state_field(spark, cagg._mat(), "g", "num_changes")
    out = cagg.gauge_at_grain("g", grain="1 day", realtime=False).collect()
    assert len(out) == 1
    assert out[0]["num_changes"] is None
    assert out[0]["delta"] == -1.0


def test_gauge_num_changes_sql_accessor(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_gadv_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    ht.insert(spark.createDataFrame(
        [
            (_ts(1, 0, 0), 10.0),
            (_ts(1, 0, 10), 12.0),
            (_ts(1, 0, 20), 12.0),  # no change
            (_ts(1, 0, 30), 9.0),
            (_ts(1, 1, 0), 9.0),    # no change (cross-hour continuity
            #                          is per-bucket for gauge partials)
            (_ts(1, 1, 30), 11.0),
        ],
        "ts timestamp, v double",
    ))
    ts.sql(
        "CREATE MATERIALIZED VIEW gnc WITH (timescaledb.continuous) AS "
        "SELECT time_bucket('1 hour', ts) AS bucket, "
        "gauge_agg(ts, v) AS g FROM m GROUP BY 1"
    )
    cagg = ts.get_cagg("gnc")
    cagg.refresh()
    rows = {
        r["bucket"].hour: r["nc"]
        for r in ts.sql(
            "SELECT bucket, num_changes(rollup(g)) AS nc FROM gnc "
            "GROUP BY bucket"
        ).collect()
    }
    # hour 0: 10->12 (change), 12->12 (no), 12->9 (change) => 2
    # hour 1: 9->11 => 1
    assert rows == {0: 2, 1: 1}
    # rollup serve counts adjacent-bucket boundaries too: last of h0 is
    # 9.0, first of h1 is 9.0 -> no boundary change; total 3
    allrows = ts.sql(
        "SELECT num_changes(rollup(g)) AS nc FROM gnc"
    ).collect()
    assert allrows[0]["nc"] == 3
