"""Round-12 ADVICE regressions:

1. interpolated_*_at_grain target buckets are ORIGIN-aligned (the
   2000-01-03 time_bucket convention every other accessor and the cagg
   buckets themselves use), not epoch ``DIV`` — visible at weekly
   grains (Monday- vs Thursday-aligned) and for pre-epoch timestamps.
2. hierarchical caggs reject non-nesting child bucket widths at create
   time (the reference's 'should be multiple of the parent',
   ``tsl/src/continuous_aggs/common.c:1380-1409``).
3. candlestick_at_grain open/close are deterministic under subset
   regrouping when merged series tie on first/last sample time.
4. SQL ``num_vals(rollup(state_agg_col))`` returns the aggregate's
   TOTAL sample count (toolkit semantics), not the duration_in
   state's.
5. TSSession's optimizer-rule exclusion is opt-out-able.
"""

import datetime
import tempfile

import pytest

from timescaledb_spark.session import TSSession


def _mk(spark, rows, schema="ts timestamp, dev string, v double",
        chunk="7 days", **cagg_kw):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_adv12_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval=chunk)
    ht.insert(spark.createDataFrame(rows, schema))
    kw = dict(bucket_width="1 hour", aggs={}, group_by=["dev"])
    kw.update(cagg_kw)
    cagg = ts.create_cagg("c", ht, **kw)
    cagg.refresh()
    return ts, ht, cagg


class TestInterpolatedOriginAlignment:
    def test_weekly_buckets_are_monday_aligned(self, spark):
        """2024-01-01 and 2024-01-08 are Mondays; the origin
        (2000-01-03) is a Monday, so weekly target buckets must start
        on Mondays. Epoch DIV would label them Thursday-aligned
        (1970-01-01 was a Thursday)."""
        rows = [
            (datetime.datetime(2024, 1, 2, 6), "a", 10.0),
            (datetime.datetime(2024, 1, 10, 6), "a", 30.0),
        ]
        _, _, cagg = _mk(
            spark, rows, time_weights={"tw": {"value": "v"}}
        )
        out = {
            r["bucket"]: r["tw_avg"]
            for r in cagg.interpolated_average_at_grain(
                grain="7 days"
            ).collect()
        }
        assert set(out) == {
            datetime.datetime(2024, 1, 1),
            datetime.datetime(2024, 1, 8),
        }
        # LOCF: 10 holds from Jan 2 06:00 through Jan 10 06:00
        assert out[datetime.datetime(2024, 1, 1)] == pytest.approx(10.0)
        assert out[datetime.datetime(2024, 1, 8)] == pytest.approx(10.0)

    def test_weekly_delta_splits_at_monday_edge(self, spark):
        """A linear counter (+1/hour) over Jan 2 -> Jan 9 must split
        144 / 24 at the MONDAY Jan 8 edge; a Thursday-aligned grid
        (epoch DIV) would split 48 / 120 at Jan 4."""
        rows = [
            (datetime.datetime(2024, 1, 2), "a", 0.0),
            (datetime.datetime(2024, 1, 9), "a", 168.0),
        ]
        _, _, cagg = _mk(
            spark, rows, counters={"cnt": {"value": "v"}}
        )
        out = {
            r["bucket"]: r["delta"]
            for r in cagg.interpolated_delta_at_grain(
                grain="7 days"
            ).collect()
        }
        assert out == {
            datetime.datetime(2024, 1, 1): pytest.approx(144.0),
            datetime.datetime(2024, 1, 8): pytest.approx(24.0),
        }

    def test_pre_epoch_bucket_floors(self, spark):
        """DIV truncates toward zero: a pre-epoch sample would round
        its bucket UP. pmod floors correctly."""
        rows = [
            (datetime.datetime(1969, 12, 30, 6), "a", 4.0),
            (datetime.datetime(1969, 12, 30, 18), "a", 8.0),
        ]
        _, _, cagg = _mk(
            spark, rows, time_weights={"tw": {"value": "v"}}
        )
        out = cagg.interpolated_average_at_grain(grain="1 day").collect()
        assert [r["bucket"] for r in out] == [
            datetime.datetime(1969, 12, 30)
        ]
        assert out[0]["tw_avg"] == pytest.approx(4.0)


class TestHierarchicalNesting:
    def _parent(self, spark, width="1 hour"):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_nest_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
        ht.insert(
            spark.createDataFrame(
                [(datetime.datetime(2024, 1, 1), "a", 1.0)],
                "ts timestamp, dev string, v double",
            )
        )
        parent = ts.create_cagg(
            "p", ht, bucket_width=width, aggs={}, group_by=["dev"],
            counters={"cnt": {"value": "v"}},
            sketches={"sk": {"value": "v"}},
        )
        parent.refresh()
        return ts

    def test_non_multiple_child_rejected(self, spark):
        ts = self._parent(spark)
        with pytest.raises(ValueError, match="multiple"):
            ts.create_cagg(
                "c", "_mat_p", bucket_width="90 minutes", aggs={},
                group_by=["dev"],
                counters={"cnt_c": {"rollup_of": "cnt"}},
            )

    def test_smaller_child_rejected(self, spark):
        ts = self._parent(spark)
        with pytest.raises(ValueError, match="multiple"):
            ts.create_cagg(
                "c", "_mat_p", bucket_width="30 minutes", aggs={},
                group_by=["dev"],
                counters={"cnt_c": {"rollup_of": "cnt"}},
            )

    def test_sketch_child_also_validated(self, spark):
        ts = self._parent(spark)
        with pytest.raises(ValueError, match="multiple"):
            ts.create_cagg(
                "c", "_mat_p", bucket_width="90 minutes", aggs={},
                group_by=["dev"],
                sketches={"sk_c": {"rollup_of": "sk"}},
            )

    def test_multiple_child_accepted(self, spark):
        ts = self._parent(spark)
        child = ts.create_cagg(
            "c", "_mat_p", bucket_width="2 hours", aggs={},
            group_by=["dev"],
            counters={"cnt_c": {"rollup_of": "cnt"}},
        )
        child.refresh()
        assert child.counter_at_grain("cnt_c").count() == 1

    def test_month_child_over_nondividing_parent_rejected(self, spark):
        # 7 hours does not divide 1 day -> month edges (midnights)
        # fall inside parent buckets
        ts = self._parent(spark, width="7 hours")
        with pytest.raises(ValueError, match="1 day"):
            ts.create_cagg(
                "c", "_mat_p", bucket_width="1 month", aggs={},
                group_by=["dev"],
                counters={"cnt_c": {"rollup_of": "cnt"}},
            )

    def test_month_child_over_hourly_parent_accepted(self, spark):
        ts = self._parent(spark)
        child = ts.create_cagg(
            "c", "_mat_p", bucket_width="1 month", aggs={},
            group_by=["dev"],
            counters={"cnt_c": {"rollup_of": "cnt"}},
        )
        child.refresh()
        assert child.counter_at_grain("cnt_c").count() == 1


class TestCandlestickTieDeterminism:
    def test_subset_regroup_equal_time_ties(self, spark):
        """Two series share first AND last sample timestamps; under
        group_by=[] the open must deterministically be the LOWEST
        tied-first price and the close the HIGHEST tied-last price."""
        t0 = datetime.datetime(2024, 1, 1, 0)
        t1 = datetime.datetime(2024, 1, 1, 5)
        rows = [
            (t0, "a", 5.0), (t0, "b", 3.0),
            (t1, "a", 8.0), (t1, "b", 9.0),
        ]
        _, _, cagg = _mk(
            spark, rows, candlesticks={"ohlc": {"price": "v"}}
        )
        for _ in range(3):  # deterministic across replans
            r = cagg.candlestick_at_grain(
                grain="all", group_by=[]
            ).collect()[0]
            assert (r["open"], r["close"]) == (3.0, 9.0)


class TestStateAggNumValsSQL:
    @pytest.fixture(scope="class")
    def env(self, spark):
        rows = [
            (datetime.datetime(2024, 1, 1, 0), "a", "up"),
            (datetime.datetime(2024, 1, 1, 1), "a", "down"),
            (datetime.datetime(2024, 1, 1, 2), "a", "up"),
            (datetime.datetime(2024, 1, 1, 3), "a", "up"),
        ]
        return _mk(
            spark, rows, schema="ts timestamp, dev string, s string",
            state_aggs={"sa": {"state": "s"}},
        )

    def test_num_vals_is_total_not_per_state(self, env):
        ts, _, _ = env
        df = ts.sql(
            "SELECT dev, duration_in('down', rollup(sa)) AS d, "
            "num_vals(rollup(sa)) AS nv FROM c GROUP BY dev"
        )
        r = df.collect()[0]
        # 'down' held 1h and has 1 sample, but num_vals counts ALL 4
        assert r["d"] == 3_600_000_000
        assert r["nv"] == 4

    def test_num_vals_alone(self, env):
        ts, _, _ = env
        df = ts.sql("SELECT dev, num_vals(rollup(sa)) AS nv FROM c GROUP BY dev")
        assert df.collect()[0]["nv"] == 4

    def test_python_accessor_unchanged(self, env):
        _, _, cagg = env
        per_state = {
            r["state"]: r["n"]
            for r in cagg.state_durations_at_grain(grain="all").collect()
        }
        assert per_state == {"up": 3, "down": 1}


class TestOptimizerExclusionOptOut:
    def test_opt_out_leaves_conf_untouched(self, spark):
        key = "spark.sql.optimizer.excludedRules"
        saved = spark.conf.get(key, "") or ""
        try:
            spark.conf.set(key, "")
            TSSession(
                spark, tempfile.mkdtemp(prefix="ts_optout_"),
                exclude_broken_rules=False,
            )
            assert (spark.conf.get(key, "") or "") == ""
            TSSession(spark, tempfile.mkdtemp(prefix="ts_optin_"))
            assert "RemoveRedundantAliases" in spark.conf.get(key)
        finally:
            # restore the exclusion the rest of the suite relies on
            from timescaledb_spark.session import (
                _exclude_broken_optimizer_rules,
            )

            spark.conf.set(key, saved)
            _exclude_broken_optimizer_rules(spark)
