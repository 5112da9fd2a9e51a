"""Interpolated (declared-interval) heartbeat serve (round 13 — closes
the r12 ADVICE deviation): liveness clipped at bucket edges, cross-edge
tails credited to the next bucket with beats, dead time measured over
the full bucket span."""

import datetime
import tempfile

import pytest

from timescaledb_spark.session import TSSession

H = 3_600_000_000
MIN = 60_000_000
DAY = 86_400_000_000


def _ts(d, h, m=0):
    return datetime.datetime(2024, 1, d, h, m)


@pytest.fixture()
def ts(spark):
    return TSSession(spark, tempfile.mkdtemp(prefix="ts_hbi_"))


def _mk(ts, spark, rows, liveness="2 hours"):
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    ht.insert(spark.createDataFrame(rows, "ts timestamp, dev string"))
    cagg = ts.create_cagg(
        "hb", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
        heartbeat_aggs={"hb": {"liveness": liveness}},
    )
    cagg.refresh()
    return cagg


class TestHeartbeatInterpolated:
    def test_tail_clipped_and_carried(self, ts, spark):
        """Beat at 23:00 day 1 with 2h liveness: 1h credited to day 1,
        1h carried into day 2 (which has its own beat)."""
        cagg = _mk(ts, spark, [
            (_ts(1, 23), "g"),
            (_ts(2, 12), "g"),   # day-2 beat, far from the carry
        ])
        out = {
            r["bucket"].day: (r["live_us"], r["dead_us"],
                              r["num_live_ranges"])
            for r in cagg.heartbeat_interpolated_at_grain(
                grain="1 day"
            ).collect()
        }
        assert out[1] == (1 * H, DAY - 1 * H, 1)
        # day 2: 1h carried tail (separate range) + its own 2h
        assert out[2] == (3 * H, DAY - 3 * H, 2)

    def test_carry_merges_with_touching_first_beat(self, ts, spark):
        """Carried tail reaching exactly the next bucket's first beat
        merges into one range."""
        cagg = _mk(ts, spark, [
            (_ts(1, 23), "g"),
            (_ts(2, 1), "g"),   # first beat == carry end (23:00+2h)
        ])
        out = {
            r["bucket"].day: (r["live_us"], r["num_live_ranges"])
            for r in cagg.heartbeat_interpolated_at_grain(
                grain="1 day"
            ).collect()
        }
        assert out[1] == (1 * H, 1)
        assert out[2] == (1 * H + 2 * H, 1)

    def test_empty_bucket_not_emitted(self, ts, spark):
        """A bucket with no beats emits no row even when a tail would
        reach into it (documented: absent-row, like the toolkit's
        NULL-gap convention)."""
        cagg = _mk(ts, spark, [
            (_ts(1, 23, 30), "g"),
            (_ts(3, 0, 30), "g"),  # day 2 empty
        ])
        days = {
            r["bucket"].day
            for r in cagg.heartbeat_interpolated_at_grain(
                grain="1 day"
            ).collect()
        }
        assert days == {1, 3}
        # and the day-3 bucket gets NO carry (the day-1 tail died in
        # day 2): 30min before its beat is dead
        out = {
            r["bucket"].day: r["live_us"]
            for r in cagg.heartbeat_interpolated_at_grain(
                grain="1 day"
            ).collect()
        }
        assert out[3] == 2 * H

    def test_dead_time_spans_whole_bucket(self, ts, spark):
        """Unlike heartbeat_at_grain (observed span), the declared
        interval counts pre-first-beat and post-tail time as dead."""
        cagg = _mk(ts, spark, [(_ts(1, 12), "g")], liveness="30 minutes")
        plain = cagg.heartbeat_at_grain(grain="1 day").collect()[0]

        interp = cagg.heartbeat_interpolated_at_grain(
            grain="1 day"
        ).collect()[0]
        assert plain["live_us"] == 30 * MIN and plain["dead_us"] == 0
        assert interp["live_us"] == 30 * MIN
        assert interp["dead_us"] == DAY - 30 * MIN

    def test_sql_route(self, ts, spark):
        _mk(ts, spark, [
            (_ts(1, 23), "g"),
            (_ts(2, 12), "g"),
        ])
        df = ts.sql(
            "SELECT time_bucket('1 day', bucket) AS day, dev, "
            "interpolated_live_time(rollup(hb)) AS lt, "
            "interpolated_dead_time(rollup(hb)) AS dt "
            "FROM hb GROUP BY 1, 2"
        )
        out = {r["day"].day: (r["lt"], r["dt"]) for r in df.collect()}
        assert out == {
            1: (1 * H, DAY - 1 * H),
            2: (3 * H, DAY - 3 * H),
        }
        # mixing with plain (observed-span) accessors is refused
        with pytest.raises(Exception):
            ts.sql(
                "SELECT time_bucket('1 day', bucket) AS day, dev, "
                "interpolated_live_time(rollup(hb)) AS lt, "
                "live_time(rollup(hb)) AS plain "
                "FROM hb GROUP BY 1, 2"
            ).collect()

    def test_month_grain_rejected(self, ts, spark):
        cagg = _mk(ts, spark, [(_ts(1, 12), "g")])
        with pytest.raises(ValueError, match="fixed-width"):
            cagg.heartbeat_interpolated_at_grain(grain="1 month")
        with pytest.raises(ValueError, match="fixed-width"):
            cagg.heartbeat_interpolated_at_grain(grain="all")
