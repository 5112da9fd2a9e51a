"""interpolated_duration_in served from state-agg partials (round 12):
the toolkit ``interpolated_duration_in(state, rollup(state_agg(...)),
start, width, prev, next)`` idiom — LOCF state carried across bucket
edges, served exactly from stored per-bucket state partials."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F  # noqa: F401

from timescaledb_spark.session import TSSession
from timescaledb_spark.sources import load_table


def _ts(d, h, m=0):
    return datetime.datetime(2024, 1, d, h, m)


class TestInterpDurationFromPartials:
    def test_carry_across_empty_bucket(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_idur_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
        ht.insert(spark.createDataFrame(
            [
                (_ts(1, 6), "g", "up"),
                (_ts(3, 6), "g", "down"),  # day 2: no samples at all
                (_ts(3, 12), "g", "up"),
            ],
            "ts timestamp, dev string, s string",
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            state_aggs={"sa": {"state": "s"}},
        )
        cagg.refresh()
        out = {
            r["bucket"].day: r["duration_us"]
            for r in cagg.interpolated_duration_in_at_grain(
                "up", grain="1 day"
            ).collect()
        }
        assert out == {
            1: 18 * 3_600_000_000,
            2: 24 * 3_600_000_000,
            3: 6 * 3_600_000_000,
        }

    def test_matches_raw_scan(self, spark, sf_dir):
        """Served daily durations from hourly partials equal the
        raw-scan interpolated_duration_in — bit-for-bit (int64 µs)."""
        from timescaledb_spark.functions.state import (
            interpolated_duration_in,
        )

        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_idur2_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ev = load_table(spark, sf_dir, "events")
        ht.insert(ev)
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=[],
            state_aggs={
                "sa": {"state": "event_type", "tiebreak": ["event_id"]}
            },
        )
        cagg.refresh()
        got = {
            r["bucket"]: r["duration_us"]
            for r in cagg.interpolated_duration_in_at_grain(
                "click", grain="1 day"
            ).collect()
        }
        want = {
            r["bucket"]: r["duration_us"]
            for r in interpolated_duration_in(
                ev, "click", "1 day", "ts", "event_type",
                tiebreak=["event_id"],
            ).collect()
        }
        assert got == want and len(got) > 10

    def test_sql_route(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_idur3_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
        ht.insert(spark.createDataFrame(
            [
                (_ts(1, 6), "g", "up"),
                (_ts(2, 6), "g", "down"),
                (_ts(2, 12), "g", "up"),
            ],
            "ts timestamp, dev string, s string",
        ))
        ts.sql(
            "CREATE MATERIALIZED VIEW sv WITH (timescaledb.continuous) "
            "AS SELECT time_bucket('1 hour', ts) AS bucket, dev, "
            "state_agg(ts, s) AS sa FROM m GROUP BY 1, 2"
        )
        df = ts.sql(
            "SELECT time_bucket('1 day', bucket) AS day, dev, "
            "interpolated_duration_in('up', rollup(sa)) AS d "
            "FROM sv GROUP BY 1, 2"
        )
        out = {r["day"].day: r["d"] for r in df.collect()}
        assert out == {1: 18 * 3_600_000_000, 2: 6 * 3_600_000_000}
        # refusals: no re-bucket grain / subset groups
        with pytest.raises(Exception):
            ts.sql(
                "SELECT bucket, dev, "
                "interpolated_duration_in('up', rollup(sa)) AS d "
                "FROM sv GROUP BY 1, 2"
            ).collect()
        with pytest.raises(Exception):
            ts.sql(
                "SELECT time_bucket('1 day', bucket) AS day, "
                "interpolated_duration_in('up', rollup(sa)) AS d "
                "FROM sv GROUP BY 1"
            ).collect()

    def test_non_nesting_grain_rejected(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_idur4_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 6), "g", "up")], "ts timestamp, dev string, s string"
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            state_aggs={"sa": {"state": "s"}},
        )
        cagg.refresh()
        with pytest.raises(ValueError, match="multiple"):
            cagg.interpolated_duration_in_at_grain(
                "up", grain="90 minutes"
            )
