"""Time-weight and candlestick partial families in continuous
aggregates (round 11): the mat table stores mergeable
``time_weight``/``candlestick_agg`` partials so any coarser grain is
served exactly from the states — the toolkit
``average(rollup(time_weight(...)))`` / ``rollup(candlestick_agg)``
idioms (timescaledb-toolkit docs; partial-vs-final discussion in
``tsl/src/continuous_aggs/finalize.c``)."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession
from timescaledb_spark.sources import load_table


def _ts(d, h, m=0):
    return datetime.datetime(2024, 1, d, h, m)


def _mk_manual(spark, rows, **cagg_kw):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_tw_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    ht.insert(spark.createDataFrame(rows, "ts timestamp, dev string, v double"))
    kw = dict(bucket_width="1 hour", aggs={}, group_by=["dev"])
    kw.update(cagg_kw)
    cagg = ts.create_cagg("c", ht, **kw)
    cagg.refresh()
    return ts, ht, cagg


class TestTimeWeightCagg:
    def test_locf_cross_boundary_carry(self, spark):
        """The defining case: a value set in hour 0 carries (LOCF)
        into hour 1 — the boundary segment belongs to the merge, so
        the served day average must weight it correctly."""
        rows = [
            (_ts(1, 0, 0), "a", 10.0),   # holds 90 min -> into hour 1
            (_ts(1, 1, 30), "a", 20.0),  # holds 30 min
            (_ts(1, 2, 0), "a", 40.0),   # final sample: no weight
        ]
        _, _, cagg = _mk_manual(
            spark, rows, time_weights={"tw": {"value": "v"}}
        )
        out = cagg.time_weighted_at_grain(grain="1 day").collect()
        assert len(out) == 1
        # integral = 10*90min + 20*30min over 120min span
        want = (10 * 90 + 20 * 30) / 120
        assert out[0]["tw_avg"] == pytest.approx(want)
        assert out[0]["n"] == 3

    def test_single_sample_bucket_returns_value(self, spark):
        rows = [(_ts(1, 0, 0), "a", 7.5)]
        _, _, cagg = _mk_manual(
            spark, rows, time_weights={"tw": {"value": "v"}}
        )
        out = cagg.time_weighted_at_grain(grain="all").collect()
        assert out[0]["tw_avg"] == pytest.approx(7.5)

    def test_linear_method(self, spark):
        rows = [
            (_ts(1, 0, 0), "a", 0.0),
            (_ts(1, 2, 0), "a", 20.0),  # crosses two hour buckets
        ]
        _, _, cagg = _mk_manual(
            spark,
            rows,
            time_weights={"tw": {"value": "v", "method": "linear"}},
        )
        out = cagg.time_weighted_at_grain(grain="all").collect()
        # trapezoid: avg of a straight line = midpoint value
        assert out[0]["tw_avg"] == pytest.approx(10.0)

    def test_serve_equals_raw_any_grain(self, spark, sf_dir):
        """Property: served LOCF average from hourly partials equals
        the raw-scan time_weighted_avg of the target grain, for both
        per-day and whole-series grains."""
        from timescaledb_spark.functions.counters import time_weighted_avg
        from timescaledb_spark.functions.time import time_bucket

        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_twp_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ev = load_table(spark, sf_dir, "events")
        ht.insert(ev)
        cagg = ts.create_cagg(
            "twp", ht, bucket_width="1 hour", aggs={},
            group_by=["event_type"],
            time_weights={"tw": {"value": "value", "tiebreak": ["event_id"]}},
        )
        cagg.refresh()
        # whole-series grain
        got = {
            r["event_type"]: r["tw_avg"]
            for r in cagg.time_weighted_at_grain(grain="all").collect()
        }
        want = {
            r["event_type"]: r["tw_avg"]
            for r in time_weighted_avg(
                ev, "ts", "value", by=["event_type"], tiebreak=["event_id"]
            ).collect()
        }
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-9), k
        # per-day grain: raw-side must window within each day
        day = ev.withColumn("day", time_bucket("1 day", "ts"))
        want_day = {
            (r["day"], r["event_type"]): r["tw_avg"]
            for r in time_weighted_avg(
                day, "ts", "value", by=["day", "event_type"],
                tiebreak=["event_id"],
            ).collect()
        }
        got_day = {
            (r["bucket"], r["event_type"]): r["tw_avg"]
            for r in cagg.time_weighted_at_grain(grain="1 day").collect()
        }
        assert set(got_day) == set(want_day)
        for k in want_day:
            assert got_day[k] == pytest.approx(want_day[k], rel=1e-9), k

    def test_nulls_skipped(self, spark):
        rows = [
            (_ts(1, 0, 0), "a", 10.0),
            (_ts(1, 0, 30), "a", None),   # skipped: 10 carries through
            (_ts(1, 1, 0), "a", 30.0),
        ]
        _, _, cagg = _mk_manual(
            spark, rows, time_weights={"tw": {"value": "v"}}
        )
        out = cagg.time_weighted_at_grain(grain="all").collect()
        assert out[0]["tw_avg"] == pytest.approx(10.0)
        assert out[0]["n"] == 2

    def test_subset_group_by_rejected(self, spark):
        rows = [(_ts(1, 0), "a", 1.0), (_ts(1, 1), "b", 2.0)]
        _, _, cagg = _mk_manual(
            spark, rows, time_weights={"tw": {"value": "v"}}
        )
        with pytest.raises(ValueError, match="single series"):
            cagg.time_weighted_at_grain(grain="all", group_by=[])

    def test_bad_method_rejected(self, spark):
        with pytest.raises(ValueError, match="locf"):
            _mk_manual(
                spark,
                [(_ts(1, 0), "a", 1.0)],
                time_weights={"tw": {"value": "v", "method": "step"}},
            )


class TestInterpolatedServe:
    def test_empty_gap_bucket_filled(self, spark):
        """A value set before an empty day carries into it — the
        defining interpolated_average behavior per-bucket time_weight
        gets wrong."""
        rows = [
            (_ts(1, 6, 0), "a", 10.0),
            (_ts(3, 6, 0), "a", 30.0),  # day 2 has NO samples
        ]
        _, _, cagg = _mk_manual(
            spark, rows, time_weights={"tw": {"value": "v"}}
        )
        out = {
            r["bucket"].day: r["tw_avg"]
            for r in cagg.interpolated_average_at_grain(
                grain="1 day"
            ).collect()
        }
        assert set(out) == {1, 2, 3}
        assert out[1] == pytest.approx(10.0)   # 10 holds from 06:00
        assert out[2] == pytest.approx(10.0)   # carried across the gap
        assert out[3] == pytest.approx(10.0)   # until 06:00, then ends

    def test_matches_raw_interpolated_average(self, spark, sf_dir):
        from timescaledb_spark.functions.counters import (
            interpolated_average,
        )

        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_twi_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "qv", F.floor(F.col("value")).cast("double")
        )
        ht.insert(ev)
        cagg = ts.create_cagg(
            "twi", ht, bucket_width="1 hour", aggs={},
            group_by=["event_type"],
            time_weights={"tw": {"value": "qv", "tiebreak": ["event_id"]}},
        )
        cagg.refresh()
        got = {
            (r["bucket"], r["event_type"]): r["tw_avg"]
            for r in cagg.interpolated_average_at_grain(
                grain="1 day"
            ).collect()
        }
        want = {
            (r["bucket"], r["event_type"]): r["tw_avg"]
            for r in interpolated_average(
                ev, "1 day", "ts", "qv", by=["event_type"],
                tiebreak=["event_id"],
            ).collect()
        }
        assert set(got) == set(want)
        # integer-quantized values: both sides sum the same exact-int
        # product set, so equality is bitwise
        for k in want:
            assert got[k] == want[k], k

    def test_interpolated_delta_matches_raw(self, spark, sf_dir):
        from timescaledb_spark.functions.counters import (
            interpolated_delta,
        )

        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_idl_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "qv", F.floor(F.col("value")).cast("double")
        )
        ht.insert(ev)
        cagg = ts.create_cagg(
            "idl", ht, bucket_width="1 hour", aggs={},
            group_by=["event_type"],
            counters={"cnt": {"value": "qv", "tiebreak": ["event_id"]}},
        )
        cagg.refresh()
        got = {
            (r["bucket"], r["event_type"]): (r["delta"], r["rate"])
            for r in cagg.interpolated_delta_at_grain(
                grain="1 day"
            ).collect()
        }
        want = {
            (r["bucket"], r["event_type"]): (r["delta"], r["rate"])
            for r in interpolated_delta(
                ev, "1 day", "ts", "qv", by=["event_type"],
                tiebreak=["event_id"],
            ).collect()
        }
        assert set(got) == set(want)
        for k in want:
            # within-span pieces telescope to stored deltas and boundary
            # pieces share the raw formula -> bitwise equal
            assert got[k][0] == want[k][0], k
            assert got[k][1] == pytest.approx(want[k][1], rel=1e-12), k

    def test_interpolated_delta_crossing_boundary_splits(self, spark):
        rows = [
            (_ts(1, 23, 0), "a", 0.0),
            (_ts(2, 1, 0), "a", 20.0),  # +20 over 2h straddling midnight
        ]
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_idl2_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
        ht.insert(
            spark.createDataFrame(rows, "ts timestamp, dev string, v double")
        )
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            counters={"cnt": {"value": "v"}},
        )
        cagg.refresh()
        out = {
            r["bucket"].day: r["delta"]
            for r in cagg.interpolated_delta_at_grain(
                grain="1 day"
            ).collect()
        }
        assert out[1] == pytest.approx(10.0)
        assert out[2] == pytest.approx(10.0)

    def test_non_nesting_grain_rejected(self, spark):
        _, _, cagg = _mk_manual(
            spark,
            [(_ts(1, 0), "a", 1.0)],
            time_weights={"tw": {"value": "v"}},
        )
        with pytest.raises(ValueError, match="multiple"):
            cagg.interpolated_average_at_grain(grain="90 minutes")
        with pytest.raises(ValueError, match="grain"):
            cagg.interpolated_average_at_grain()


class TestSQLCreate:
    def test_cmv_time_weight_and_candlestick(self, spark):
        """SQL CREATE MATERIALIZED VIEW with time_weight('LOCF', ts, v)
        and candlestick_agg(ts, p, vol) — round-trips into the partial
        families and serves through the Python accessors."""
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_tw_sql_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(
            spark.createDataFrame(
                [
                    (_ts(1, 0, 0), "a", 10.0),
                    (_ts(1, 1, 30), "a", 20.0),
                    (_ts(1, 2, 0), "a", 40.0),
                ],
                "ts timestamp, dev string, v double",
            )
        )
        ts.sql(
            "CREATE MATERIALIZED VIEW twc WITH (timescaledb.continuous) "
            "AS SELECT time_bucket('1 hour', ts) AS bucket, dev, "
            "time_weight('LOCF', ts, v) AS tw, "
            "candlestick_agg(ts, v) AS ohlc "
            "FROM m GROUP BY 1, 2"
        )
        cagg = ts.get_cagg("twc")
        assert cagg.row["time_weights"]["tw"]["method"] == "locf"
        assert "ohlc" in cagg.row["candlesticks"]
        out = cagg.time_weighted_at_grain("tw", grain="1 day").collect()
        assert out[0]["tw_avg"] == pytest.approx((10 * 90 + 20 * 30) / 120)
        candle = cagg.candlestick_at_grain("ohlc", grain="1 day").collect()
        assert (candle[0]["open"], candle[0]["close"]) == (10.0, 40.0)

    def test_cmv_time_weight_bad_args_rejected(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_tw_sqlbad_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(
            spark.createDataFrame(
                [(_ts(1, 0), "a", 1.0)], "ts timestamp, dev string, v double"
            )
        )
        with pytest.raises(ValueError, match="method"):
            ts.sql(
                "CREATE MATERIALIZED VIEW bad1 WITH "
                "(timescaledb.continuous) AS SELECT "
                "time_bucket('1 hour', ts) AS bucket, "
                "time_weight('step', ts, v) AS tw FROM m GROUP BY 1"
            )
        # ordering argument must be the cagg's time column
        with pytest.raises(ValueError, match="time"):
            ts.sql(
                "CREATE MATERIALIZED VIEW bad2 WITH "
                "(timescaledb.continuous) AS SELECT "
                "time_bucket('1 hour', ts) AS bucket, "
                "candlestick_agg(v, v) AS c FROM m GROUP BY 1"
            )


class TestCandlestickCagg:
    def test_ohlc_merge_matches_raw(self, spark, sf_dir):
        """Served daily OHLC/volume/vwap from hourly partials equals
        candlestick_agg over the raw rows at day grain."""
        from timescaledb_spark.functions.stats import candlestick_agg

        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_candle_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ev = load_table(spark, sf_dir, "events")
        ht.insert(ev)
        cagg = ts.create_cagg(
            "cnd", ht, bucket_width="1 hour", aggs={},
            group_by=["event_type"],
            candlesticks={
                "ohlc": {
                    "price": "value",
                    "volume": "cast(user_id as double)",
                    "tiebreak": ["event_id"],
                }
            },
        )
        cagg.refresh()
        got = {
            (r["bucket"], r["event_type"]): r
            for r in cagg.candlestick_at_grain(grain="1 day").collect()
        }
        want = {
            (r["bucket"], r["event_type"]): r
            for r in candlestick_agg(
                ev, "ts", "value", F.col("user_id").cast("double"),
                bucket_width="1 day", by=["event_type"],
                tiebreak=["event_id"],
            ).collect()
        }
        assert set(got) == set(want)
        for k, wr in want.items():
            gr = got[k]
            for f in ("open", "high", "low", "close"):
                assert gr[f] == pytest.approx(wr[f], rel=1e-12), (k, f)
            assert gr["volume"] == pytest.approx(wr["volume"], rel=1e-9)
            assert gr["vwap"] == pytest.approx(wr["vwap"], rel=1e-9)
            assert gr["n"] == wr["n"]

    def test_null_price_skipped(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_candle_n_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(
            spark.createDataFrame(
                [
                    (_ts(1, 0, 0), "a", 5.0),
                    (_ts(1, 0, 30), "a", None),
                    (_ts(1, 1, 0), "a", 9.0),
                ],
                "ts timestamp, dev string, v double",
            )
        )
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            candlesticks={"ohlc": {"price": "v"}},
        )
        cagg.refresh()
        r = cagg.candlestick_at_grain(grain="all").collect()[0]
        assert (r["open"], r["close"], r["n"]) == (5.0, 9.0, 2)
        assert r["volume"] == pytest.approx(2.0)  # unit volume, nulls out

    def test_subset_regroup_allowed(self, spark):
        # candlestick states merge commutatively -> regrouping on a
        # subset of group columns is fine (unlike counters/gauges)
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_candle_g_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(
            spark.createDataFrame(
                [
                    (_ts(1, 0, 0), "a", 5.0),
                    (_ts(1, 1, 0), "b", 9.0),
                ],
                "ts timestamp, dev string, v double",
            )
        )
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            candlesticks={"ohlc": {"price": "v"}},
        )
        cagg.refresh()
        r = cagg.candlestick_at_grain(grain="all", group_by=[]).collect()
        assert len(r) == 1
        assert (r[0]["open"], r[0]["close"]) == (5.0, 9.0)

    def test_realtime_union(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_candle_rt_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(
            spark.createDataFrame(
                [(_ts(1, 0, 0), "a", 5.0)],
                "ts timestamp, dev string, v double",
            )
        )
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            candlesticks={"ohlc": {"price": "v"}},
        )
        cagg.refresh()
        ht.insert(
            spark.createDataFrame(
                [(_ts(1, 5, 0), "a", 11.0)],
                "ts timestamp, dev string, v double",
            )
        )
        r = cagg.candlestick_at_grain(grain="all", realtime=True).collect()[0]
        assert (r["open"], r["close"], r["high"]) == (5.0, 11.0, 11.0)
