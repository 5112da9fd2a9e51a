"""Heartbeat (liveness) partials in continuous aggregates and the
raw-scan ``interpolated_duration_in`` accessor (round 12): the mat
table stores per-bucket liveness-union summaries that merge with one
boundary correction per adjacent pair — the toolkit
``rollup(heartbeat_agg(...))`` → ``live_time``/``num_live_ranges``
idiom; ``interpolated_duration_in`` is the toolkit two-step state_agg
accessor with LOCF carried across bucket edges."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession
from timescaledb_spark.sources import load_table


def _ts(d, h, m=0):
    return datetime.datetime(2024, 1, d, h, m)


@pytest.fixture(scope="module")
def env(spark, sf_dir):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_hb_"))
    ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.insert(load_table(spark, sf_dir, "events"))
    cagg = ts.create_cagg(
        "hb", ht, bucket_width="1 hour", aggs={},
        group_by=["event_type"],
        heartbeat_aggs={"hb": {"liveness": "5 minutes"}},
    )
    cagg.refresh()
    return ts, ht, cagg


class TestHeartbeatCagg:
    def test_serve_equals_raw_any_grain(self, env):
        """Served liveness from hourly partials equals heartbeat_agg
        over the raw beats of the target grain — whole-series and
        per-day."""
        from timescaledb_spark.functions.state import heartbeat_agg
        from timescaledb_spark.functions.time import time_bucket

        _, ht, cagg = env
        got = {
            r["event_type"]: (r["live_us"], r["num_live_ranges"], r["n"])
            for r in cagg.heartbeat_at_grain(grain="all").collect()
        }
        want = {
            r["event_type"]: (r["live_us"], r["num_live_ranges"], r["n"])
            for r in heartbeat_agg(
                ht.df(), "ts", by=["event_type"], liveness="5 minutes"
            ).collect()
        }
        assert got == want and len(got) > 1
        day = ht.df().withColumn("day", time_bucket("1 day", "ts"))
        want_d = {
            (r["day"], r["event_type"]): (r["live_us"], r["num_live_ranges"])
            for r in heartbeat_agg(
                day, "ts", by=["day", "event_type"], liveness="5 minutes"
            ).collect()
        }
        got_d = {
            (r["bucket"], r["event_type"]): (
                r["live_us"], r["num_live_ranges"],
            )
            for r in cagg.heartbeat_at_grain(grain="1 day").collect()
        }
        assert got_d == want_d and len(got_d) > 10

    def test_boundary_correction(self, spark):
        """A beat 2 minutes before the hour with 5-minute liveness:
        merged across the edge it must contribute min(gap, L), not L."""
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_hb_b_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0, 58), "g"), (_ts(1, 1, 2), "g")],
            "ts timestamp, dev string",
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            heartbeat_aggs={"hb": {"liveness": "5 minutes"}},
        )
        cagg.refresh()
        r = cagg.heartbeat_at_grain(grain="all").collect()[0]
        # 4 min gap + final full 5 min = 9 min; one joined range
        assert r["live_us"] == 9 * 60_000_000
        assert r["num_live_ranges"] == 1
        assert r["dead_us"] == 0

    def test_dead_time(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_hb_d_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0, 0), "g"), (_ts(1, 2, 0), "g")],
            "ts timestamp, dev string",
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            heartbeat_aggs={"hb": {"liveness": "5 minutes"}},
        )
        cagg.refresh()
        r = cagg.heartbeat_at_grain(grain="all").collect()[0]
        # live 10 min of the 125-minute observed span [0, 2:05)
        assert r["live_us"] == 10 * 60_000_000
        assert r["dead_us"] == 115 * 60_000_000
        assert r["num_live_ranges"] == 2

    def test_hierarchical_child(self, spark, env):
        ts, _, hourly = env
        daily = ts.create_cagg(
            "hb_child", "_mat_hb", bucket_width="1 day", aggs={},
            group_by=["event_type"],
            heartbeat_aggs={"hb_d": {"rollup_of": "hb"}},
        )
        daily.refresh()
        assert daily.row["heartbeat_aggs"]["hb_d"]["liveness_us"] == 300_000_000
        want = {
            (r["bucket"], r["event_type"]): (r["live_us"], r["n"])
            for r in hourly.heartbeat_at_grain(
                grain="1 day", realtime=False
            ).collect()
        }
        got = {
            (r["bucket"], r["event_type"]): (r["live_us"], r["n"])
            for r in daily.heartbeat_at_grain(realtime=False).collect()
        }
        assert got == want and len(got) > 10

    def test_child_liveness_mismatch_rejected(self, spark, env):
        ts, _, _ = env
        with pytest.raises(ValueError, match="liveness"):
            ts.create_cagg(
                "hb_bad", "_mat_hb", bucket_width="1 day", aggs={},
                group_by=["event_type"],
                heartbeat_aggs={
                    "hb_d": {"rollup_of": "hb", "liveness": "1 minute"}
                },
            )

    def test_subset_group_by_rejected(self, env):
        _, _, cagg = env
        with pytest.raises(ValueError, match="single series"):
            cagg.heartbeat_at_grain(grain="all", group_by=[])

    def test_sql_accessor_route(self, env):
        """live_time/dead_time/num_live_ranges(rollup(hb)) route to
        heartbeat_at_grain with the shared GROUP BY discipline."""
        ts, _, cagg = env
        df = ts.sql(
            "SELECT time_bucket('1 day', bucket) AS day, event_type, "
            "live_time(rollup(hb)) AS lt, dead_time(rollup(hb)) AS dt, "
            "num_live_ranges(rollup(hb)) AS nr FROM hb GROUP BY 1, 2"
        )
        got = {
            (r["day"], r["event_type"]): (r["lt"], r["dt"], r["nr"])
            for r in df.collect()
        }
        want = {
            (r["bucket"], r["event_type"]): (
                r["live_us"], r["dead_us"], r["num_live_ranges"],
            )
            for r in cagg.heartbeat_at_grain(grain="1 day").collect()
        }
        assert got == want and len(got) > 10

    def test_cmv_sql(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_hb_sql_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0, 0), "g"), (_ts(1, 0, 3), "g")],
            "ts timestamp, dev string",
        ))
        ts.sql(
            "CREATE MATERIALIZED VIEW hbv WITH (timescaledb.continuous) "
            "AS SELECT time_bucket('1 hour', ts) AS bucket, dev, "
            "heartbeat_agg(ts, '5 minutes') AS hb FROM m GROUP BY 1, 2"
        )
        cagg = ts.get_cagg("hbv")
        assert cagg.row["heartbeat_aggs"]["hb"]["liveness_us"] == 300_000_000
        r = cagg.heartbeat_at_grain(grain="all").collect()[0]
        assert r["live_us"] == 8 * 60_000_000  # 3 min gap + full 5 min


class TestInterpolatedDurationIn:
    def test_carry_across_empty_bucket(self, spark):
        from timescaledb_spark.functions.state import (
            interpolated_duration_in,
        )

        df = spark.createDataFrame(
            [
                (_ts(1, 6), "g", "up"),
                (_ts(3, 6), "g", "down"),   # day 2 has no samples
                (_ts(3, 12), "g", "up"),    # final sample: zero time
            ],
            "ts timestamp, dev string, s string",
        )
        out = {
            r["bucket"].day: r["duration_us"]
            for r in interpolated_duration_in(
                df, "up", "1 day", "ts", "s", by=["dev"]
            ).collect()
        }
        assert out == {
            1: 18 * 3_600_000_000,  # 06:00 -> midnight
            2: 24 * 3_600_000_000,  # carried through the empty day
            3: 6 * 3_600_000_000,   # until 06:00
        }

    def test_agrees_with_state_durations_total(self, spark, sf_dir):
        """Σ over buckets == the unbucketed duration_in of the state."""
        from timescaledb_spark.functions.state import (
            interpolated_duration_in,
            state_durations,
        )

        ev = load_table(spark, sf_dir, "events")
        total = (
            interpolated_duration_in(
                ev, "click", "1 day", "ts", "event_type",
                tiebreak=["event_id"],
            )
            .agg(F.sum("duration_us").alias("d"))
            .collect()[0]["d"]
        )
        want = {
            r["state"]: r["duration_us"]
            for r in state_durations(
                ev, "ts", "event_type", tiebreak=["event_id"]
            ).collect()
        }["click"]
        assert total == want
