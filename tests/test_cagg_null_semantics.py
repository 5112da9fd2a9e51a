"""Strict-aggregate NULL semantics for partial-state caggs (round 11,
ADVICE r10): the toolkit partial aggregates (percentile_agg,
counter_agg, gauge_agg, stats_agg) are strict PG aggregates — NULL
inputs are skipped, never counted, and never allowed to break the
within-bucket lag chain. A group whose partial inputs are ALL NULL
keeps its cagg row with a NULL state, and the serving accessors skip
NULL states (rollup() is strict too)."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


def _ts(h, m=0):
    return datetime.datetime(2024, 1, 1, h, m)


def _mk(spark, rows, **cagg_kw):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_nullsem_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    df = spark.createDataFrame(rows, "ts timestamp, dev string, v double")
    ht.insert(df)
    kw = dict(bucket_width="1 hour", aggs={}, group_by=["dev"])
    kw.update(cagg_kw)
    cagg = ts.create_cagg("c", ht, **kw)
    cagg.refresh()
    return ts, ht, cagg


class TestCounterNulls:
    def test_null_sample_does_not_break_increment_chain(self, spark):
        # samples 10, NULL, 25 within one bucket: delta must be 15
        # (the r10 ADVICE probe yielded 0.0 — NULL broke the lag chain)
        rows = [
            (_ts(0, 0), "a", 10.0),
            (_ts(0, 20), "a", None),
            (_ts(0, 40), "a", 25.0),
        ]
        _, _, cagg = _mk(
            spark, rows, counters={"cnt": {"value": "v"}}
        )
        out = cagg.counter_at_grain(grain="all").collect()
        assert len(out) == 1
        r = out[0]
        assert r["delta"] == pytest.approx(15.0)
        assert r["n"] == 2  # non-null samples only
        assert r["num_resets"] == 0

    def test_all_null_group_gets_null_state_and_is_skipped(self, spark):
        rows = [
            (_ts(0, 0), "a", 1.0),
            (_ts(0, 30), "a", 2.0),
            (_ts(0, 10), "b", None),
            (_ts(0, 40), "b", None),
        ]
        _, _, cagg = _mk(
            spark, rows, counters={"cnt": {"value": "v"}}
        )
        mat = {r["dev"]: r for r in cagg.read(realtime=False).collect()}
        # group b survives materialization with a NULL state
        assert set(mat) == {"a", "b"}
        assert mat["b"]["cnt"] is None
        assert mat["a"]["cnt"]["n"] == 2
        # serving skips the NULL state (strict rollup)
        served = {
            r["dev"]: r for r in cagg.counter_at_grain(grain="all").collect()
        }
        assert set(served) == {"a"}

    def test_null_beside_aggs_keeps_group_row(self, spark):
        # a cagg with BOTH plain aggs and a counter: the all-NULL group
        # keeps its agg values (left join, not inner)
        rows = [
            (_ts(0, 0), "a", 5.0),
            (_ts(0, 10), "b", None),
        ]
        _, _, cagg = _mk(
            spark,
            rows,
            aggs={"n_rows": "count(*)"},
            counters={"cnt": {"value": "v"}},
        )
        mat = {r["dev"]: r for r in cagg.read(realtime=False).collect()}
        assert mat["b"]["n_rows"] == 1
        assert mat["b"]["cnt"] is None


class TestGaugeNulls:
    def test_null_sample_skipped(self, spark):
        rows = [
            (_ts(0, 0), "a", 10.0),
            (_ts(0, 20), "a", None),
            (_ts(0, 40), "a", 4.0),
        ]
        _, _, cagg = _mk(spark, rows, gauges={"g": {"value": "v"}})
        r = cagg.gauge_at_grain(grain="all").collect()[0]
        assert r["n"] == 2
        assert r["delta"] == pytest.approx(-6.0)
        assert r["idelta"] == pytest.approx(-6.0)


class TestSketchNulls:
    def test_null_value_does_not_crash_refresh(self, spark):
        # one NULL in the sketch column crashed refresh() with
        # NULL_MAP_KEY before the fix
        rows = [
            (_ts(0, 0), "a", 1.0),
            (_ts(0, 20), "a", None),
            (_ts(0, 40), "a", 3.0),
        ]
        _, _, cagg = _mk(
            spark, rows, sketches={"sk": {"value": "v", "alpha": 0.01}}
        )
        q = cagg.quantiles([0.5], grain="all").collect()[0]
        # median of {1, 3} within 1% relative error
        assert 0.9 <= q["p50"] <= 3.1
        mat = cagg.read(realtime=False).collect()[0]
        total = sum(mat["sk"].values())
        assert total == 2  # NULL row not counted

    def test_all_null_sketch_group_state_is_null(self, spark):
        rows = [
            (_ts(0, 0), "a", 1.0),
            (_ts(0, 10), "b", None),
        ]
        _, _, cagg = _mk(
            spark, rows, sketches={"sk": {"value": "v", "alpha": 0.01}}
        )
        mat = {r["dev"]: r for r in cagg.read(realtime=False).collect()}
        assert mat["b"]["sk"] is None
        # quantiles: explode() skips the NULL map — only group a served
        served = {r["dev"]: r for r in cagg.quantiles([0.5]).collect()}
        assert set(served) == {"a"}


class TestStatsNulls:
    def test_null_values_not_counted(self, spark):
        rows = [
            (_ts(0, 0), "a", 2.0),
            (_ts(0, 20), "a", None),
            (_ts(0, 40), "a", 4.0),
        ]
        _, _, cagg = _mk(spark, rows, stats_aggs={"st": {"value": "v"}})
        r = cagg.stats_at_grain(grain="all").collect()[0]
        assert r["n"] == 2
        assert r["avg"] == pytest.approx(3.0)

    def test_all_null_stats_state_is_null(self, spark):
        rows = [(_ts(0, 0), "a", None)]
        _, _, cagg = _mk(spark, rows, stats_aggs={"st": {"value": "v"}})
        assert cagg.read(realtime=False).collect()[0]["st"] is None
        assert cagg.stats_at_grain(grain="all").count() == 0

    def test_realtime_union_with_nulls(self, spark):
        # NULLs above the watermark (raw-side partial recompute) must
        # also be skipped
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_nullsem_rt_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        df = spark.createDataFrame(
            [(_ts(0, 0), "a", 2.0)], "ts timestamp, dev string, v double"
        )
        ht.insert(df)
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            stats_aggs={"st": {"value": "v"}},
        )
        cagg.refresh()
        late = spark.createDataFrame(
            [(_ts(2, 0), "a", None), (_ts(2, 10), "a", 6.0)],
            "ts timestamp, dev string, v double",
        )
        ht.insert(late)
        r = cagg.stats_at_grain(grain="all", realtime=True).collect()[0]
        assert r["n"] == 2
        assert r["avg"] == pytest.approx(4.0)


class TestGroupByValidation:
    def test_counter_subset_group_by_rejected(self, spark):
        rows = [
            (_ts(0, 0), "a", 1.0),
            (_ts(0, 30), "b", 2.0),
        ]
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_nullsem_gb_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        df = spark.createDataFrame(
            rows, "ts timestamp, dev string, v double"
        )
        ht = ht
        ht.insert(df.withColumn("site", F.lit("s1")))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={},
            group_by=["site", "dev"],
            counters={"cnt": {"value": "v"}},
            gauges={"g": {"value": "v"}},
        )
        cagg.refresh()
        with pytest.raises(ValueError, match="single series"):
            cagg.counter_at_grain("cnt", grain="all", group_by=["site"])
        with pytest.raises(ValueError, match="single series"):
            cagg.gauge_at_grain("g", grain="all", group_by=["site"])
        # full coverage (any order) is fine
        assert (
            cagg.counter_at_grain(
                "cnt", grain="all", group_by=["dev", "site"]
            ).count()
            == 2
        )
