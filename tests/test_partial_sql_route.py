"""SQL serving routes for the non-sketch partial-state cagg families
(round 11): ``delta(rollup(cnt))`` / ``average(rollup(st))`` /
``open(rollup(ohlc))`` … FROM <partial cagg> route to the matching
``*_at_grain`` accessor — the toolkit rollup-accessor idiom
(timescaledb-toolkit docs; same GROUP BY discipline as the sketch
route)."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


def _ts(d, h, m=0):
    return datetime.datetime(2024, 1, d, h, m)


@pytest.fixture(scope="module")
def env(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_psr_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    rows = [
        (_ts(1, 0, 0), "a", 10.0),
        (_ts(1, 1, 30), "a", 20.0),
        (_ts(1, 2, 0), "a", 5.0),   # counter reset / gauge drop
        (_ts(1, 0, 30), "b", 1.0),
        (_ts(1, 3, 0), "b", 4.0),
        (_ts(2, 1, 0), "a", 7.0),
    ]
    ht.insert(
        spark.createDataFrame(rows, "ts timestamp, dev string, v double")
    )
    cagg = ts.create_cagg(
        "pc", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
        counters={"cnt": {"value": "v"}},
        stats_aggs={"st": {"value": "v"}},
        candlesticks={"ohlc": {"price": "v"}},
        time_weights={"tw": {"value": "v"}},
    )
    cagg.refresh()
    return ts, cagg


class TestPartialSQLRoute:
    def test_counter_delta_daily(self, env):
        ts, cagg = env
        df = ts.sql(
            "SELECT time_bucket('1 day', bucket) AS day, dev, "
            "delta(rollup(cnt)) AS d, num_resets(rollup(cnt)) AS r "
            "FROM pc GROUP BY 1, 2"
        )
        assert df.columns == ["day", "dev", "d", "r"]
        got = {(r["day"], r["dev"]): (r["d"], r["r"]) for r in df.collect()}
        want = {
            (r["bucket"], r["dev"]): (r["delta"], r["num_resets"])
            for r in cagg.counter_at_grain(grain="1 day").collect()
        }
        assert got == want
        # reset-adjusted: 10 -> 20 -> 5 is +10 then reset to 5
        assert got[(_ts(1, 0), "a")] == (15.0, 1)

    def test_stats_average_global(self, env):
        ts, cagg = env
        rows = ts.sql(
            "SELECT average(rollup(st)) AS avg_v, num_vals(rollup(st)) "
            "AS n FROM pc"
        ).collect()
        assert len(rows) == 1
        assert rows[0]["n"] == 6
        assert rows[0]["avg_v"] == pytest.approx((10 + 20 + 5 + 1 + 4 + 7) / 6)

    def test_candlestick_accessors(self, env):
        ts, cagg = env
        df = ts.sql(
            "SELECT dev, open(rollup(ohlc)) AS o, close(rollup(ohlc)) "
            "AS c, high(rollup(ohlc)) AS h, low(rollup(ohlc)) AS l "
            "FROM pc GROUP BY dev"
        )
        got = {r["dev"]: (r["o"], r["c"], r["h"], r["l"]) for r in df.collect()}
        assert got["a"] == (10.0, 7.0, 20.0, 5.0)
        assert got["b"] == (1.0, 4.0, 4.0, 1.0)

    def test_time_weight_average(self, env):
        ts, cagg = env
        df = ts.sql(
            "SELECT dev, average(rollup(tw)) AS twa FROM pc GROUP BY dev"
        )
        got = {r["dev"]: r["twa"] for r in df.collect()}
        want = {
            r["dev"]: r["tw_avg"]
            for r in cagg.time_weighted_at_grain(grain="all").collect()
        }
        for k in want:
            assert got[k] == pytest.approx(want[k])

    def test_group_by_mismatch_falls_through(self, env):
        ts, _ = env
        # grouped column not selected: must NOT route; normal path
        # raises (delta() is not a Spark function over structs)
        with pytest.raises(Exception):
            ts.sql(
                "SELECT delta(rollup(cnt)) AS d FROM pc GROUP BY dev"
            ).collect()

    def test_unknown_accessor_falls_through(self, env):
        ts, _ = env
        # irate is a gauge accessor, not a counter one
        with pytest.raises(Exception):
            ts.sql(
                "SELECT irate(rollup(cnt)) AS r FROM pc"
            ).collect()

    def test_mixed_families_fall_through(self, env):
        ts, _ = env
        # one state-merge per query: counter + stats in one SELECT is
        # not routed (use two queries or the Python accessors)
        with pytest.raises(Exception):
            ts.sql(
                "SELECT delta(rollup(cnt)) AS d, average(rollup(st)) "
                "AS a FROM pc"
            ).collect()

    def test_where_falls_through(self, env):
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(
                "SELECT delta(rollup(cnt)) AS d FROM pc "
                "WHERE dev = 'a'"
            ).collect()
