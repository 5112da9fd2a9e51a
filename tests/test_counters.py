"""counter_agg / time_weighted_avg semantics on controlled series
(toolkit counter_agg and time_weight families, prometheus reset rules)."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.functions.counters import counter_agg, time_weighted_avg


def _series(spark, rows):
    # rows: (seconds, value, key)
    return spark.createDataFrame(
        [(s * 1_000_000, float(v), k) for s, v, k in rows],
        "us long, value double, k int",
    ).select(F.timestamp_micros("us").alias("ts"), "value", "k")


def test_counter_delta_with_resets(spark):
    # 0→10→25 | reset | 5→15: increases 10+15 + 5(post-reset) + 10 = 40
    df = _series(spark, [(0, 0, 1), (10, 10, 1), (20, 25, 1), (30, 5, 1), (40, 15, 1)])
    row = counter_agg(df, "ts", "value", by=["k"]).collect()[0]
    assert row["delta"] == 40.0
    assert row["num_resets"] == 1
    assert row["n"] == 5
    assert row["rate"] == pytest.approx(40.0 / 40.0)
    # irate: last step 5→15 over 10s
    assert row["irate"] == pytest.approx(1.0)


def test_counter_irate_after_reset_step(spark):
    # last step IS the reset: irate counts the post-reset value
    df = _series(spark, [(0, 100, 1), (10, 4, 1)])
    row = counter_agg(df, "ts", "value", by=["k"]).collect()[0]
    assert row["delta"] == 4.0
    assert row["irate"] == pytest.approx(0.4)


def test_counter_single_sample(spark):
    row = counter_agg(_series(spark, [(0, 7, 1)]), "ts", "value", by=["k"]).collect()[0]
    assert row["delta"] == 0.0
    assert row["rate"] is None and row["irate"] is None


def test_counter_groups_independent(spark):
    df = _series(spark, [(0, 0, 1), (10, 5, 1), (0, 0, 2), (10, 50, 2)])
    got = {r["k"]: r["delta"] for r in counter_agg(df, "ts", "value", by=["k"]).collect()}
    assert got == {1: 5.0, 2: 50.0}


def test_time_weighted_avg_locf(spark):
    # value 10 for 30s, then 40 for 10s (last point weightless):
    # (10*30 + 40*10)/40 = 17.5 ... wait: samples at 0(10), 30(40), 40(0)
    df = _series(spark, [(0, 10, 1), (30, 40, 1), (40, 0, 1)])
    row = time_weighted_avg(df, "ts", "value", by=["k"]).collect()[0]
    assert row["tw_avg"] == pytest.approx((10 * 30 + 40 * 10) / 40.0)


def test_time_weighted_single_sample(spark):
    row = time_weighted_avg(_series(spark, [(5, 3, 1)]), "ts", "value", by=["k"]).collect()[0]
    assert row["tw_avg"] == 3.0


def test_plain_avg_differs_on_irregular_sampling(spark):
    # burst of high samples at the end must NOT dominate the tw average
    rows = [(t, 1, 1) for t in range(0, 100, 10)] + [
        (100 + t, 100, 1) for t in range(3)
    ]
    df = _series(spark, rows)
    tw = time_weighted_avg(df, "ts", "value", by=["k"]).collect()[0]["tw_avg"]
    plain = df.agg(F.avg("value")).collect()[0][0]
    assert tw < 6.0 < plain


def test_gauge_agg_basic(spark):
    """Gauge may decrease: no resets, delta = last - first."""
    from timescaledb_spark.functions.counters import gauge_agg
    from pyspark.sql import functions as F

    T0 = 1704067200000000
    rows = [(T0, 1, 10.0), (T0 + 10_000_000, 2, 4.0), (T0 + 20_000_000, 3, 7.0)]
    df = spark.createDataFrame(rows, "us long, eid long, v double").select(
        F.timestamp_micros("us").alias("ts"), "eid", "v"
    )
    r = gauge_agg(df, "ts", "v", tiebreak=["eid"]).collect()[0]
    assert r["n"] == 3
    assert r["delta"] == -3.0          # 7 - 10, decreases allowed
    assert r["rate"] == -3.0 / 20.0
    assert r["idelta"] == 3.0          # last step 4 -> 7
    assert r["irate"] == 3.0 / 10.0


def test_gauge_agg_single_sample(spark):
    from timescaledb_spark.functions.counters import gauge_agg
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(1704067200000000, 1, 5.0)], "us long, eid long, v double").select(
        F.timestamp_micros("us").alias("ts"), "eid", "v"
    )
    r = gauge_agg(df, "ts", "v", tiebreak=["eid"]).collect()[0]
    assert r["delta"] == 0.0 and r["rate"] is None
    assert r["idelta"] is None and r["irate"] is None


def test_counter_num_changes(spark):
    """Round 13: num_changes — adjacent non-null samples with a
    different value; resets count as changes, flat repeats don't."""
    from pyspark.sql import functions as F

    from timescaledb_spark.functions.counters import counter_agg

    vals = [5.0, 5.0, 7.0, 7.0, 2.0, 9.0]  # changes: 5->7, 7->2, 2->9
    df = spark.createDataFrame(
        [(1704067200000000 + i * 10_000_000, i, v) for i, v in enumerate(vals)],
        "us long, eid long, v double",
    ).select(F.timestamp_micros("us").alias("ts"), "eid", "v")
    r = counter_agg(df, "ts", "v", tiebreak=["eid"]).collect()[0]
    assert r["num_changes"] == 3 and r["num_resets"] == 1


def test_cagg_num_changes_served_and_sql(spark):
    """Served at a coarser grain, boundary changes count exactly once;
    the SQL accessor route serves the same number."""
    import datetime
    import tempfile

    from timescaledb_spark.session import TSSession

    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_ncagg_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    # hour 0: 1,1,3 (1 change); hour 1 starts at 3 (no boundary change)
    # then 3,8 (1 change); hour 2 starts at 2 (boundary change+reset)
    rows = [
        (datetime.datetime(2024, 1, 1, 0, mi), i, v)
        for i, (mi, v) in enumerate([(0, 1.0), (10, 1.0), (20, 3.0)])
    ] + [
        (datetime.datetime(2024, 1, 1, 1, mi), 10 + i, v)
        for i, (mi, v) in enumerate([(0, 3.0), (30, 8.0)])
    ] + [
        (datetime.datetime(2024, 1, 1, 2, 0), 20, 2.0),
    ]
    ht.insert(spark.createDataFrame(rows, "ts timestamp, eid long, v double"))
    cagg = ts.create_cagg(
        "nc", ht, bucket_width="1 hour", aggs={}, group_by=[],
        counters={"cnt": {"value": "v", "tiebreak": ["eid"]}},
    )
    cagg.refresh()
    r = cagg.counter_at_grain("cnt", grain="1 day").collect()[0]
    assert r["num_changes"] == 3 and r["num_resets"] == 1
    s = ts.sql(
        "SELECT num_changes(rollup(cnt)) AS nc, "
        "num_resets(rollup(cnt)) AS nr FROM nc"
    ).collect()[0]
    assert s["nc"] == 3 and s["nr"] == 1
