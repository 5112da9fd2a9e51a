"""Round-12 review fixes: normalized heartbeat-liveness comparison,
2-D stats guards on default resolution and 1-D-parent rollups, SQL
freq_agg argument validation, bounded freq-state build, NULL-robust
heartbeat merges, zero-width grain rejection, and the set-returning
SQL routes (topn / into_values) over freq/maxn partials."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


def _ts(d, h, m=0):
    return datetime.datetime(2024, 1, d, h, m)


def _mk(spark, rows, schema="ts timestamp, dev string, v double", **kw):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_rv12_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    ht.insert(spark.createDataFrame(rows, schema))
    base = dict(bucket_width="1 hour", aggs={}, group_by=["dev"])
    base.update(kw)
    cagg = ts.create_cagg("c", ht, **base)
    cagg.refresh()
    return ts, ht, cagg


class TestReviewFixes:
    def test_heartbeat_liveness_normalized_compare(self, spark):
        """'300 seconds' == '5 minutes' after normalization — the
        child create must accept it (and still reject a real
        mismatch)."""
        ts, _, _ = _mk(
            spark, [(_ts(1, 0), "g")], "ts timestamp, dev string",
            heartbeat_aggs={"hb": {"liveness": "5 minutes"}},
        )
        child = ts.create_cagg(
            "c2", "_mat_c", bucket_width="1 day", aggs={},
            group_by=["dev"],
            heartbeat_aggs={
                "hb_d": {"rollup_of": "hb", "liveness": "300 seconds"}
            },
        )
        assert child.row["heartbeat_aggs"]["hb_d"]["liveness_us"] == 300_000_000
        with pytest.raises(ValueError, match="liveness"):
            ts.create_cagg(
                "c3", "_mat_c", bucket_width="1 day", aggs={},
                group_by=["dev"],
                heartbeat_aggs={
                    "hb_d": {"rollup_of": "hb", "liveness": "1 minute"}
                },
            )

    def test_stats_at_grain_default_resolution_guard(self, spark):
        """A cagg whose ONLY stats column is 2-D must get the clear
        ValueError from stats_at_grain, not a FIELD_NOT_FOUND."""
        _, _, cagg = _mk(
            spark,
            [(_ts(1, 0), "g", 1.0, 2.0)],
            "ts timestamp, dev string, x double, y double",
            stats_aggs={"reg": {"value": "x", "y": "y"}},
        )
        with pytest.raises(ValueError, match="stats2d_at_grain"):
            cagg.stats_at_grain(grain="1 day")

    def test_2d_child_over_1d_parent_rejected(self, spark):
        ts, _, _ = _mk(
            spark, [(_ts(1, 0), "g", 1.0)],
            stats_aggs={"st": {"value": "v"}},
        )
        with pytest.raises(ValueError, match="1-D"):
            ts.create_cagg(
                "c2", "_mat_c", bucket_width="1 day", aggs={},
                group_by=["dev"],
                stats_aggs={"c2d": {"rollup_of": "st", "y": "v"}},
            )

    def test_freq_agg_zero_min_freq_rejected(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_rv12f_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0), "g", "a")], "ts timestamp, dev string, v string"
        ))
        with pytest.raises(ValueError, match="min_freq"):
            ts.sql(
                "CREATE MATERIALIZED VIEW bad WITH "
                "(timescaledb.continuous) AS SELECT "
                "time_bucket('1 hour', ts) AS bucket, dev, "
                "freq_agg(0, v) AS fq FROM m GROUP BY 1, 2"
            )

    def test_zero_width_grain_rejected(self, spark):
        _, _, cagg = _mk(
            spark, [(_ts(1, 0), "g", 1.0)],
            time_weights={"tw": {"value": "v"}},
            counters={"cnt": {"value": "v"}},
            state_aggs={"sa": {"state": "'up'"}},
        )
        for call in (
            lambda: cagg.interpolated_average_at_grain(grain="0 seconds"),
            lambda: cagg.interpolated_delta_at_grain(grain="0 seconds"),
            lambda: cagg.interpolated_duration_in_at_grain(
                "up", grain="0 seconds"
            ),
        ):
            with pytest.raises(ValueError, match="positive"):
                call()

    def test_heartbeat_merge_survives_null_state_row(self, spark):
        """A NULL parent state between two real partials must not
        suppress their boundary correction in a hierarchical child."""
        from pyspark.sql import types as T

        ts, _, parent = _mk(
            spark,
            [(_ts(1, 0, 58), "g"), (_ts(1, 1, 2), "g")],
            "ts timestamp, dev string",
            heartbeat_aggs={"hb": {"liveness": "5 minutes"}},
        )
        # inject a NULL-state mat row BETWEEN the two real partials
        mat = ts.get_hypertable("_mat_c")
        schema = mat.read().schema
        hb_type = next(f.dataType for f in schema if f.name == "hb")
        null_row = spark.createDataFrame(
            [(datetime.datetime(2024, 1, 1, 0, 30), "g", None)],
            T.StructType([
                T.StructField("bucket", T.TimestampType()),
                T.StructField("dev", T.StringType()),
                T.StructField("hb", hb_type),
            ]),
        )
        mat.insert(null_row)
        child = ts.create_cagg(
            "c2", "_mat_c", bucket_width="1 day", aggs={},
            group_by=["dev"],
            heartbeat_aggs={"hb_d": {"rollup_of": "hb"}},
        )
        child.refresh()
        st = child.read(realtime=False).collect()[0]["hb_d"]
        # boundary correction applied: 4-min gap + final 5 min, joined
        assert st["live_us"] == 9 * 60_000_000
        assert st["ranges"] == 1

    def test_freq_state_bounded_and_exact(self, spark):
        """The rank-window bound keeps the trim result identical: with
        distinct > capacity the heavy hitter still surfaces with the
        same lower bound as the unbounded construction."""
        rows = [(_ts(1, 0), "g", "hot")] * 30 + [
            (_ts(1, 0), "g", f"c{i}") for i in range(20)
        ]
        _, _, cagg = _mk(
            spark, rows, "ts timestamp, dev string, v string",
            freq_aggs={"fq": {"value": "v", "capacity": 4}},
        )
        st = cagg.read(realtime=False).collect()[0]["fq"]
        assert st["n"] == 50
        # cut = 5th-largest count = 1 -> hot stored as 30 - 1 = 29
        assert st["counts"]["hot"] == 29


class TestSRFRoutes:
    @pytest.fixture(scope="class")
    def env(self, spark):
        rows = (
            [(_ts(1, 0), "g", "a", 5.0)] * 3
            + [(_ts(1, 1), "g", "b", 9.0)] * 2
            + [(_ts(2, 0), "g", "c", 7.0)]
        )
        return _mk(
            spark, rows, "ts timestamp, dev string, v string, x double",
            freq_aggs={"fq": {"value": "v", "capacity": 16}},
            maxn_aggs={"mx": {"value": "x", "n": 2}},
        )

    def test_topn_route(self, env):
        ts, _, cagg = env
        df = ts.sql(
            "SELECT dev, topn(rollup(fq), 2) AS url FROM c GROUP BY dev"
        )
        got = [(r["url"], r["freq_lb"]) for r in df.collect()]
        assert got == [("a", 3), ("b", 2)]

    def test_topn_route_per_day(self, env):
        ts, _, cagg = env
        df = ts.sql(
            "SELECT time_bucket('1 day', bucket) AS day, dev, "
            "topn(rollup(fq), 1) AS v FROM c GROUP BY 1, 2"
        )
        got = {(r["day"].day, r["v"]): r["freq_lb"] for r in df.collect()}
        assert got == {(1, "a"): 3, (2, "c"): 1}

    def test_into_values_route(self, env):
        ts, _, _ = env
        df = ts.sql(
            "SELECT dev, into_values(rollup(mx)) AS val "
            "FROM c GROUP BY dev"
        )
        assert [r["val"] for r in df.collect()] == [9.0, 9.0]

    def test_topn_agg_n_recorded_and_served(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_rv12t_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0), "g", "a"), (_ts(1, 0), "g", "a"),
             (_ts(1, 1), "g", "b")],
            "ts timestamp, dev string, v string",
        ))
        ts.sql(
            "CREATE MATERIALIZED VIEW tv WITH (timescaledb.continuous) "
            "AS SELECT time_bucket('1 hour', ts) AS bucket, dev, "
            "topn_agg(1, v) AS fq FROM m GROUP BY 1, 2"
        )
        cagg = ts.get_cagg("tv")
        assert cagg.row["freq_aggs"]["fq"]["n"] == 1
        # topn(rollup(fq)) without n uses the agg's recorded n = 1
        df = ts.sql(
            "SELECT dev, topn(rollup(fq)) AS v FROM tv GROUP BY dev"
        )
        assert [(r["v"], r["freq_lb"]) for r in df.collect()] == [("a", 2)]

    def test_srf_mixing_refused(self, env):
        ts, _, _ = env
        with pytest.raises(Exception):
            ts.sql(
                "SELECT dev, topn(rollup(fq), 2) AS v, "
                "num_vals(rollup(fq)) AS n FROM c GROUP BY dev"
            ).collect()

    def test_srf_bad_group_by_refused(self, env):
        ts, _, _ = env
        with pytest.raises(Exception):
            ts.sql(
                "SELECT dev, topn(rollup(fq), 2) AS v FROM c"
            ).collect()
