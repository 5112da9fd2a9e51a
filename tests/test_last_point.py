"""last_point — the SkipScan analog (``tsl/src/nodes/skip_scan/README.md``,
``tsl/test/sql/plan_skip_scan.sql.in``): DISTINCT ON (key) ORDER BY time
DESC answered from the newest chunks backward, stopping once every key is
seen. Asserts both the values (vs a window-model) and the SCAN SHAPE —
only a suffix of chunks is touched when keys live in recent chunks."""

import pytest
from pyspark.sql import Window, functions as F

from timescaledb_spark.session import TSSession

T0 = 1704067200000000  # 2024-01-01
DAY = 86_400_000_000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _mk(ts, spark, rows):
    ht = ts.create_hypertable("lp", "ts", chunk_interval="1 day")
    df = spark.createDataFrame(rows, "us long, k int, v double").select(
        F.timestamp_micros("us").alias("ts"), "k", "v"
    )
    ht.insert(df)
    return ht, df


def _expect(df):
    w = Window.partitionBy("k").orderBy(F.col("ts").desc())
    return {
        (r["k"], r["ts"], r["v"])
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .drop("_rn")
        .collect()
    }


def test_last_point_stops_at_recent_chunks(ts, spark):
    # 10 days of data; every key beats in the last 2 days
    rows = []
    for d in range(10):
        for k in range(5):
            rows.append((T0 + d * DAY + k * 60_000_000, k, float(d)))
    ht, df = _mk(ts, spark, rows)
    got = ht.last_point(by="k", keys=[0, 1, 2, 3, 4])
    assert {(r["k"], r["ts"], r["v"]) for r in got.collect()} == _expect(df)
    st = ht.last_point_stats
    assert st["total_chunks"] == 10
    # all 5 keys present in the newest batch -> early stop
    assert len(st["chunks_scanned"]) < st["total_chunks"]
    # scanned chunks are the NEWEST suffix
    newest = sorted(
        (c["range_start"] for c in ht.chunks()), reverse=True
    )[: len(st["chunks_scanned"])]
    assert sorted(st["chunks_scanned"], reverse=True) == newest


def test_last_point_digs_for_stale_key(ts, spark):
    # key 9 only ever appears in the OLDEST chunk: the walk must reach it
    rows = [(T0, 9, 42.0)]
    for d in range(1, 8):
        rows.append((T0 + d * DAY, 1, float(d)))
    ht, df = _mk(ts, spark, rows)
    got = ht.last_point(by="k", keys=[1, 9])
    assert {(r["k"], r["ts"], r["v"]) for r in got.collect()} == _expect(df)
    assert len(ht.last_point_stats["chunks_scanned"]) == 8


def test_last_point_absent_key_returns_nothing(ts, spark):
    ht, df = _mk(ts, spark, [(T0, 1, 1.0)])
    got = ht.last_point(by="k", keys=[1, 777])
    assert {r["k"] for r in got.collect()} == {1}
    # full scan happened (key 777 never found), result just omits it
    assert len(ht.last_point_stats["chunks_scanned"]) == 1


def test_last_point_no_keys_full_groupby(ts, spark):
    rows = [(T0 + d * DAY, d % 3, float(d)) for d in range(6)]
    ht, df = _mk(ts, spark, rows)
    got = ht.last_point(by="k")
    assert {(r["k"], r["ts"], r["v"]) for r in got.collect()} == _expect(df)


def test_last_point_tiebreak(ts, spark):
    # two rows at the SAME timestamp: larger tiebreak column wins
    ht = ts.create_hypertable("lp2", "ts", chunk_interval="1 day")
    df = spark.createDataFrame(
        [(T0, 1, 1, 10.0), (T0, 2, 1, 20.0)], "us long, eid int, k int, v double"
    ).select(F.timestamp_micros("us").alias("ts"), "eid", "k", "v")
    ht.insert(df)
    got = ht.last_point(by="k", tiebreak=["eid"], keys=[1]).collect()
    assert len(got) == 1 and got[0]["v"] == 20.0


def test_last_point_multi_key(ts, spark):
    ht = ts.create_hypertable("lp3", "ts", chunk_interval="1 day")
    rows = [
        (T0 + d * DAY, d % 2, d % 3, float(d)) for d in range(12)
    ]
    df = spark.createDataFrame(rows, "us long, a int, b int, v double").select(
        F.timestamp_micros("us").alias("ts"), "a", "b", "v"
    )
    ht.insert(df)
    keys = df.select("a", "b").distinct()
    got = ht.last_point(by=["a", "b"], keys=keys)
    w = Window.partitionBy("a", "b").orderBy(F.col("ts").desc())
    exp = {
        (r["a"], r["b"], r["v"])
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .collect()
    }
    assert {(r["a"], r["b"], r["v"]) for r in got.collect()} == exp


# ---------------------------------------------------------------------------
# property: ANY data layout + ANY queried key set == window model
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_DATA = st.lists(
    st.tuples(st.integers(0, 240), st.integers(0, 6)),  # (hour slot, key)
    min_size=1, max_size=40, unique=True,
)
_KEYS = st.sets(st.integers(0, 8), min_size=1, max_size=9)


@settings(max_examples=8, deadline=None)
@given(data=_DATA, keys=_KEYS)
def test_last_point_matches_window_model(spark, data, keys):
    import tempfile

    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_lpprop_"))
    ht = ts.create_hypertable("p", "ts", chunk_interval="1 day")
    rows = [(T0 + h * 3_600_000_000, k, float(h * 10 + k)) for h, k in data]
    df = spark.createDataFrame(rows, "us long, k int, v double").select(
        F.timestamp_micros("us").alias("ts"), "k", "v"
    )
    ht.insert(df)
    got = {
        (r["k"], r["ts"], r["v"])
        for r in ht.last_point(by="k", keys=sorted(keys), batch_chunks=2).collect()
    }
    w = Window.partitionBy("k").orderBy(F.col("ts").desc())
    exp = {
        (r["k"], r["ts"], r["v"])
        for r in df.withColumn("_rn", F.row_number().over(w))
        .filter("_rn = 1")
        .filter(F.col("k").isin(list(keys)))
        .collect()
    }
    assert got == exp


def test_last_point_large_key_universe_falls_back(ts, spark):
    """Above max_collect_keys the catalog walk (driver-side result
    accumulation) must be skipped for the distributed groupBy path —
    proven here with a lowered threshold so the key DataFrame trips it."""
    rows = [
        (T0 + d * DAY + k, k, float(d * 10 + k))
        for d in range(5)
        for k in range(8)
    ]
    ht, df = _mk(ts, spark, rows)
    keys = spark.createDataFrame([(k,) for k in range(8)], "k int")
    got = {
        (r["k"], r["ts"], r["v"])
        for r in ht.last_point(by="k", keys=keys, max_collect_keys=3).collect()
    }
    assert ht.last_point_stats["mode"] == "group_by_fallback"
    assert got == _expect(df)
    # under the threshold the walk runs and matches too
    got2 = {
        (r["k"], r["ts"], r["v"])
        for r in ht.last_point(by="k", keys=keys, max_collect_keys=100).collect()
    }
    assert ht.last_point_stats["mode"] == "catalog_walk"
    assert got2 == _expect(df)
