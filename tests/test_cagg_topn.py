"""Frequency (Misra–Gries) and max_n/min_n candidate-list partials in
continuous aggregates (round 12): the mat table stores capacity-bounded
heavy-hitter summaries / top-n candidate lists per (bucket, group), so
``topn_at_grain`` / ``max_n_at_grain`` serve any coarser grain — the
toolkit ``topn(rollup(freq_agg(...)), n)`` and
``into_values(rollup(max_n(...)))`` idioms (timescaledb-toolkit
frequency/minmax families; mergeable-summaries bound per Agarwal et
al., PODS'12)."""

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
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_topn_"))
    ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "v", (F.col("user_id") % 20).cast("string")
    )
    ht.insert(ev)
    cagg = ts.create_cagg(
        "tp", ht, bucket_width="1 hour", aggs={},
        group_by=["event_type"],
        freq_aggs={"fq": {"value": "v", "capacity": 64}},
        maxn_aggs={"mx": {"value": "value", "n": 3}},
    )
    cagg.refresh()
    return ts, ht, cagg, ev


class TestTopnCagg:
    def test_exact_when_capacity_covers_distinct(self, env):
        """capacity (64) >= per-bucket distinct (20) -> stored counts
        are exact, so any-grain top-n equals an exact raw rank."""
        from pyspark.sql import Window

        _, _, cagg, ev = env
        from timescaledb_spark.functions.time import time_bucket

        got = {
            (r["bucket"], r["event_type"], r["value"]): r["freq_lb"]
            for r in cagg.topn_at_grain(n=5, grain="1 day").collect()
        }
        cnt = ev.groupBy(
            time_bucket("1 day", "ts").alias("bucket"), "event_type", "v"
        ).agg(F.count(F.lit(1)).alias("c"))
        w = Window.partitionBy("bucket", "event_type").orderBy(
            F.col("c").desc(), F.col("v").asc()
        )
        want = {
            (r["bucket"], r["event_type"], r["v"]): r["c"]
            for r in cnt.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 5)
            .collect()
        }
        assert got == want and len(got) > 50

    def test_global_topn(self, env):
        _, _, cagg, ev = env
        got = [
            (r["value"], r["freq_lb"])
            for r in cagg.topn_at_grain(
                n=3, grain="all", group_by=[]
            ).collect()
        ]
        want = [
            (r["v"], r["c"])
            for r in ev.groupBy("v")
            .agg(F.count(F.lit(1)).alias("c"))
            .orderBy(F.col("c").desc(), F.col("v").asc())
            .limit(3)
            .collect()
        ]
        assert got == want

    def test_trim_keeps_heavy_hitter_lower_bound(self, spark):
        """With capacity below distinct, counts become LOWER bounds
        with error <= N/(capacity+1), and the true heavy hitter still
        surfaces (SpaceSaving guarantee)."""
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_topn_lb_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        rows = [(_ts(1, 0), "g", "hot")] * 50 + [
            (_ts(1, 0), "g", f"cold{i}") for i in range(10)
        ]
        ht.insert(spark.createDataFrame(
            rows, "ts timestamp, dev string, v string"
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            freq_aggs={"fq": {"value": "v", "capacity": 4}},
        )
        cagg.refresh()
        out = cagg.topn_at_grain(n=1, grain="all").collect()
        assert out[0]["value"] == "hot"
        assert 50 - 60 / 5 <= out[0]["freq_lb"] <= 50

    def test_nulls_skipped(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_topn_n_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0), "g", "a"), (_ts(1, 0), "g", None)],
            "ts timestamp, dev string, v string",
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            freq_aggs={"fq": {"value": "v"}},
        )
        cagg.refresh()
        st = cagg.read(realtime=False).collect()[0]["fq"]
        assert st["n"] == 1 and st["counts"] == {"a": 1}

    def test_hierarchical_child(self, spark, env):
        ts, _, hourly, _ = env
        daily = ts.create_cagg(
            "tp_child", "_mat_tp", bucket_width="1 day", aggs={},
            group_by=["event_type"],
            freq_aggs={"fq_d": {"rollup_of": "fq"}},
            maxn_aggs={"mx_d": {"rollup_of": "mx"}},
        )
        daily.refresh()
        assert daily.row["freq_aggs"]["fq_d"]["capacity"] == 64
        want = {
            (r["bucket"], r["event_type"], r["value"]): r["freq_lb"]
            for r in hourly.topn_at_grain(
                n=5, grain="1 day", realtime=False
            ).collect()
        }
        got = {
            (r["bucket"], r["event_type"], r["value"]): r["freq_lb"]
            for r in daily.topn_at_grain(
                "fq_d", n=5, realtime=False
            ).collect()
        }
        assert got == want and len(got) > 50
        want_mx = sorted(
            (r["bucket"], r["event_type"], r["value"])
            for r in hourly.max_n_at_grain(
                "mx", grain="1 day", realtime=False
            ).collect()
        )
        got_mx = sorted(
            (r["bucket"], r["event_type"], r["value"])
            for r in daily.max_n_at_grain("mx_d", realtime=False).collect()
        )
        assert got_mx == want_mx

    def test_child_cannot_widen_candidate_list(self, spark, env):
        ts, _, _, _ = env
        with pytest.raises(ValueError, match="exceed"):
            ts.create_cagg(
                "tp_bad", "_mat_tp", bucket_width="1 day", aggs={},
                group_by=["event_type"],
                maxn_aggs={"mx_d": {"rollup_of": "mx", "n": 10}},
            )


class TestMaxNCagg:
    def test_exact_any_grain(self, env):
        """Top-3 of the union == top-3 of the concatenated candidate
        lists — the exactly-mergeable-summary property."""
        from pyspark.sql import Window

        _, _, cagg, ev = env
        from timescaledb_spark.functions.time import time_bucket

        got = sorted(
            (r["bucket"], r["event_type"], r["value"])
            for r in cagg.max_n_at_grain(grain="1 day").collect()
        )
        w = Window.partitionBy("bucket", "event_type").orderBy(
            F.col("value").desc()
        )
        want = sorted(
            (r["bucket"], r["event_type"], r["value"])
            for r in ev.select(
                time_bucket("1 day", "ts").alias("bucket"),
                "event_type", "value",
            )
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= 3)
            .collect()
        )
        assert got == want and len(got) > 50

    def test_min_direction(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_minn_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, h), "g", float(h)) for h in range(6)],
            "ts timestamp, dev string, v double",
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            maxn_aggs={"mn": {"value": "v", "n": 2, "desc": False}},
        )
        cagg.refresh()
        vals = [
            r["value"] for r in cagg.max_n_at_grain(grain="all").collect()
        ]
        assert vals == [0.0, 1.0]

    def test_requesting_more_than_stored_raises(self, env):
        _, _, cagg, _ = env
        with pytest.raises(ValueError, match="exceeds"):
            cagg.max_n_at_grain("mx", n=10, grain="all")


class TestTopnSQL:
    def test_cmv_freq_and_maxn(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_topn_sql_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [
                (_ts(1, 0), "g", "a", 1.0),
                (_ts(1, 0), "g", "a", 2.0),
                (_ts(1, 1), "g", "b", 3.0),
            ],
            "ts timestamp, dev string, v string, x double",
        ))
        ts.sql(
            "CREATE MATERIALIZED VIEW fqv WITH (timescaledb.continuous) "
            "AS SELECT time_bucket('1 hour', ts) AS bucket, dev, "
            "freq_agg(0.01, v) AS fq, max_n(x, 2) AS mx, "
            "min_n(x, 2) AS mn FROM m GROUP BY 1, 2"
        )
        cagg = ts.get_cagg("fqv")
        assert cagg.row["freq_aggs"]["fq"]["capacity"] == 100
        assert cagg.row["maxn_aggs"]["mx"]["desc"] is True
        assert cagg.row["maxn_aggs"]["mn"]["desc"] is False
        top = cagg.topn_at_grain("fq", n=1, grain="all").collect()
        assert (top[0]["value"], top[0]["freq_lb"]) == ("a", 2)
        mx = [r["value"] for r in cagg.max_n_at_grain("mx", grain="all").collect()]
        assert mx == [3.0, 2.0]
        mn = [r["value"] for r in cagg.max_n_at_grain("mn", grain="all").collect()]
        assert mn == [1.0, 2.0]

    def test_info_view_lists_partials(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_topn_iv_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0), "g", "a")], "ts timestamp, dev string, v string"
        ))
        ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            freq_aggs={"fq": {"value": "v"}},
            maxn_aggs={"mx": {"value": "length(v)", "n": 2}},
        )
        row = ts.sql(
            "SELECT partial_columns FROM "
            "timescaledb_information.continuous_aggregates"
        ).collect()[0]
        assert set(row["partial_columns"]) >= {"fq", "mx"}
