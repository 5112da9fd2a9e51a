"""State-agg partial family in continuous aggregates (round 11; the
toolkit ``duration_in(state, rollup(state_agg(...)))`` idiom): hourly
partials store per-state LOCF durations + bookends; merging adjacent
partials adds each boundary gap to the earlier partial's last state,
so any coarser grain serves exactly."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession
from timescaledb_spark.sources import load_table


def _ts(d, h, m=0):
    return datetime.datetime(2024, 1, d, h, m)


def _mk(spark, rows, **kw):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_sagg_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    ht.insert(
        spark.createDataFrame(rows, "ts timestamp, dev string, s string")
    )
    cagg_kw = dict(
        bucket_width="1 hour", aggs={}, group_by=["dev"],
        state_aggs={"sa": {"state": "s"}},
    )
    cagg_kw.update(kw)
    cagg = ts.create_cagg("c", ht, **cagg_kw)
    cagg.refresh()
    return ts, ht, cagg


class TestStateAggCagg:
    def test_boundary_gap_lands_on_earlier_state(self, spark):
        rows = [
            (_ts(1, 0, 0), "a", "up"),     # holds 90 min across hour edge
            (_ts(1, 1, 30), "a", "down"),  # holds 30 min
            (_ts(1, 2, 0), "a", "up"),     # final: zero width
        ]
        _, _, cagg = _mk(spark, rows)
        out = {
            r["state"]: (r["duration_us"], r["n"])
            for r in cagg.state_durations_at_grain(grain="all").collect()
        }
        assert out["up"] == (90 * 60_000_000, 2)
        assert out["down"] == (30 * 60_000_000, 1)

    def test_null_states_skipped(self, spark):
        rows = [
            (_ts(1, 0, 0), "a", "up"),
            (_ts(1, 0, 30), "a", None),    # skipped: up holds through
            (_ts(1, 1, 0), "a", "down"),
        ]
        _, _, cagg = _mk(spark, rows)
        out = {
            r["state"]: r["duration_us"]
            for r in cagg.state_durations_at_grain(grain="all").collect()
        }
        assert out == {"up": 60 * 60_000_000, "down": 0}

    def test_all_null_group_state_is_null(self, spark):
        rows = [
            (_ts(1, 0, 0), "a", "up"),
            (_ts(1, 0, 10), "b", None),
        ]
        _, _, cagg = _mk(spark, rows)
        mat = {r["dev"]: r for r in cagg.read(realtime=False).collect()}
        assert mat["b"]["sa"] is None
        assert mat["a"]["sa"]["durations"]["up"]["d"] == 0

    def test_serve_equals_raw_any_grain(self, spark, sf_dir):
        """Property: served per-state durations at day grain equal the
        raw-scan state_durations over each day's rows (state =
        event_type, one global series)."""
        from timescaledb_spark.functions.state import state_durations
        from timescaledb_spark.functions.time import time_bucket

        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_saggp_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ev = load_table(spark, sf_dir, "events")
        ht.insert(ev)
        cagg = ts.create_cagg(
            "sap", ht, bucket_width="1 hour", aggs={},
            state_aggs={
                "sa": {"state": "event_type", "tiebreak": ["event_id"]}
            },
        )
        cagg.refresh()
        got = {
            (r["bucket"], r["state"]): (r["duration_us"], r["n"])
            for r in cagg.state_durations_at_grain(
                grain="1 day"
            ).collect()
        }
        day = ev.withColumn("day", time_bucket("1 day", "ts"))
        want = {
            (r["day"], r["state"]): (r["duration_us"], r["n"])
            for r in state_durations(
                day, "ts", "event_type", by=["day"],
                tiebreak=["event_id"],
            ).collect()
        }
        assert got == want and len(got) > 0

    def test_hierarchical_rollup(self, spark, sf_dir):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_saggh_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ht.insert(load_table(spark, sf_dir, "events"))
        hourly = ts.create_cagg(
            "sah", ht, bucket_width="1 hour", aggs={},
            state_aggs={
                "sa": {"state": "event_type", "tiebreak": ["event_id"]}
            },
        )
        hourly.refresh()
        daily = ts.create_cagg(
            "sad", "_mat_sah", bucket_width="1 day", aggs={},
            state_aggs={"sa_d": {"rollup_of": "sa"}},
        )
        daily.refresh()
        want = {
            (r["bucket"], r["state"]): (r["duration_us"], r["n"])
            for r in hourly.state_durations_at_grain(
                "sa", grain="1 day", realtime=False
            ).collect()
        }
        got = {
            (r["bucket"], r["state"]): (r["duration_us"], r["n"])
            for r in daily.state_durations_at_grain(
                "sa_d", realtime=False
            ).collect()
        }
        assert got == want and len(got) > 0

    def test_sql_roundtrip(self, spark):
        """CMV with state_agg(ts, s) + duration_in('up', rollup(sa))
        serving via ts.sql."""
        rows = [
            (_ts(1, 0, 0), "a", "up"),
            (_ts(1, 1, 30), "a", "down"),
            (_ts(1, 2, 0), "a", "up"),
        ]
        ts, _, _ = _mk(spark, rows)  # creates table m + cagg c
        ts.sql(
            "CREATE MATERIALIZED VIEW csa WITH (timescaledb.continuous) "
            "AS SELECT time_bucket('1 hour', ts) AS bucket, dev, "
            "state_agg(ts, s) AS sa FROM m GROUP BY 1, 2"
        )
        child = ts.get_cagg("csa")
        assert "sa" in (child.row.get("state_aggs") or {})
        df = ts.sql(
            "SELECT dev, duration_in('up', rollup(sa)) AS up_us "
            "FROM csa GROUP BY dev"
        )
        assert df.columns == ["dev", "up_us"]
        assert df.collect()[0]["up_us"] == 90 * 60_000_000
        # wrong ordering column rejected
        import pytest as _pt

        with _pt.raises(ValueError, match="time"):
            ts.sql(
                "CREATE MATERIALIZED VIEW bad_sa WITH "
                "(timescaledb.continuous) AS SELECT "
                "time_bucket('1 hour', ts) AS bucket, "
                "state_agg(s, s) AS sa FROM m GROUP BY 1"
            )

    def test_realtime_union(self, spark):
        rows = [(_ts(1, 0, 0), "a", "up")]
        ts, ht, cagg = _mk(spark, rows)
        late = spark.createDataFrame(
            [(_ts(1, 5, 0), "a", "down")],
            "ts timestamp, dev string, s string",
        )
        ht.insert(late)
        out = {
            r["state"]: r["duration_us"]
            for r in cagg.state_durations_at_grain(
                grain="all", realtime=True
            ).collect()
        }
        assert out == {"up": 5 * 3_600_000_000, "down": 0}

    def test_tied_keys_deterministic_durations(self, spark):
        """Round 17: the next-non-null lookup is a DESC-mirrored
        growing frame (O(n), r16 verdict #3) with the state appended
        as the final order disambiguator. Rows tied on (time,
        tiebreak) are therefore DETERMINISTIC: the lexicographically
        LARGEST tied state absorbs the forward gap, earlier tied
        states hold zero — and total held time is conserved. (The old
        position-based ASC frame left tie order to the shuffle.)"""
        rows = [
            (_ts(1, 0, 0), "a", "b_state"),   # tied pair at t=0
            (_ts(1, 0, 0), "a", "a_state"),
            (_ts(1, 1, 0), "a", "c_state"),   # final: zero width
        ]
        _, _, cagg = _mk(spark, rows)
        out = {
            r["state"]: (r["duration_us"], r["n"])
            for r in cagg.state_durations_at_grain(grain="all").collect()
        }
        assert out == {
            "a_state": (0, 1),
            "b_state": (60 * 60_000_000, 1),
            "c_state": (0, 1),
        }

    def test_identical_duplicate_rows_conserve_time(self, spark):
        """Fully identical samples (same time, same state): one of the
        duplicates absorbs the forward gap, the rest hold zero — the
        duration multiset is tie-order-independent."""
        rows = [
            (_ts(1, 0, 0), "a", "up"),
            (_ts(1, 0, 0), "a", "up"),     # exact duplicate
            (_ts(1, 0, 30), "a", "down"),  # final: zero width
        ]
        _, _, cagg = _mk(spark, rows)
        out = {
            r["state"]: (r["duration_us"], r["n"])
            for r in cagg.state_durations_at_grain(grain="all").collect()
        }
        assert out == {"up": (30 * 60_000_000, 2), "down": (0, 1)}
