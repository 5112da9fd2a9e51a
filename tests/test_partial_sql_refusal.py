"""Adversarial GROUP BY refusal matrix for EVERY partial-serving SQL
route (round 12; VERDICT r11 task #7): a GROUP BY that is a subset of
the selected keys, names an extra column, or is missing entirely must
error LOUDLY (the route falls through and the normal path rejects
rollup() over a struct) — never silently serve a differently-grouped
answer. Plus the round-12 interpolated accessor SQL routes
(interpolated_average/delta/rate over stored partials)."""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F  # noqa: F401

from timescaledb_spark.session import TSSession


def _ts(d, h, m=0):
    return datetime.datetime(2024, 1, d, h, m)


@pytest.fixture(scope="module")
def env(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_refusal_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    rows = [
        (_ts(1, 0, 0), "a", "x", 10.0),
        (_ts(1, 1, 30), "a", "x", 20.0),
        (_ts(1, 2, 0), "a", "y", 5.0),
        (_ts(2, 1, 0), "b", "x", 7.0),
        (_ts(2, 3, 0), "b", "y", 9.0),
    ]
    ht.insert(spark.createDataFrame(
        rows, "ts timestamp, dev string, loc string, v double"
    ))
    cagg = ts.create_cagg(
        "rc", ht, bucket_width="1 hour", aggs={},
        group_by=["dev", "loc"],
        counters={"cnt": {"value": "v"}},
        gauges={"gg": {"value": "v"}},
        stats_aggs={
            "st": {"value": "v"},
            "st2": {"value": "v", "y": "length(loc) * 1.0"},
        },
        time_weights={"tw": {"value": "v"}},
        candlesticks={"ohlc": {"price": "v"}},
        state_aggs={"sa": {"state": "loc"}},
        heartbeat_aggs={"hb": {"liveness": "5 minutes"}},
    )
    cagg.refresh()
    return ts, cagg


# (accessor item, needs) per route family — each serves from cagg 'rc'
_ROUTES = [
    "delta(rollup(cnt)) AS d",
    "rate(rollup(gg)) AS r",
    "average(rollup(st)) AS a",
    "slope(rollup(st2)) AS s",
    "average(rollup(tw)) AS ta",
    "open(rollup(ohlc)) AS o",
    "duration_in('x', rollup(sa)) AS du",
    "num_vals(rollup(sa)) AS nv",
    "live_time(rollup(hb)) AS lt",
    "interpolated_average(rollup(tw)) AS iav",
    "interpolated_delta(rollup(cnt)) AS idl",
]


class TestRefusalMatrix:
    @pytest.mark.parametrize("acc", _ROUTES)
    def test_subset_group_by_errors(self, env, acc):
        """SELECT both group cols but GROUP BY only one."""
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(
                f"SELECT dev, loc, {acc} FROM rc GROUP BY dev"
            ).collect()

    @pytest.mark.parametrize("acc", _ROUTES)
    def test_extra_group_by_errors(self, env, acc):
        """GROUP BY names a column the SELECT does not key on."""
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(
                f"SELECT dev, {acc} FROM rc GROUP BY dev, loc"
            ).collect()

    @pytest.mark.parametrize("acc", _ROUTES)
    def test_missing_group_by_errors(self, env, acc):
        """Group columns selected with no GROUP BY at all."""
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(f"SELECT dev, loc, {acc} FROM rc").collect()

    @pytest.mark.parametrize("acc", _ROUTES)
    def test_unknown_group_col_errors(self, env, acc):
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(
                f"SELECT nosuch, {acc} FROM rc GROUP BY nosuch"
            ).collect()

    @pytest.mark.parametrize("acc", _ROUTES)
    def test_mismatched_rebucket_errors(self, env, acc):
        """GROUP BY re-buckets at a different width than the SELECT."""
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(
                f"SELECT time_bucket('1 day', bucket) AS day, dev, loc, "
                f"{acc} FROM rc "
                f"GROUP BY time_bucket('2 days', bucket), dev, loc"
            ).collect()

    @pytest.mark.parametrize("acc", _ROUTES)
    def test_happy_path_serves(self, env, acc):
        """The well-formed version of every adversarial query above."""
        ts, _ = env
        df = ts.sql(
            f"SELECT time_bucket('1 day', bucket) AS day, dev, loc, "
            f"{acc} FROM rc GROUP BY 1, 2, 3"
        )
        assert df.count() > 0


class TestInterpolatedRoutes:
    def test_interpolated_average_route(self, env):
        ts, cagg = env
        df = ts.sql(
            "SELECT time_bucket('1 day', bucket) AS day, dev, loc, "
            "interpolated_average(rollup(tw)) AS ia "
            "FROM rc GROUP BY 1, 2, 3"
        )
        got = {
            (r["day"], r["dev"], r["loc"]): r["ia"] for r in df.collect()
        }
        want = {
            (r["bucket"], r["dev"], r["loc"]): r["tw_avg"]
            for r in cagg.interpolated_average_at_grain(
                grain="1 day"
            ).collect()
        }
        assert got == want and len(got) > 0

    def test_interpolated_delta_and_rate_route(self, env):
        ts, cagg = env
        df = ts.sql(
            "SELECT time_bucket('1 day', bucket) AS day, dev, loc, "
            "interpolated_delta(rollup(cnt)) AS d, "
            "interpolated_rate(rollup(cnt)) AS r "
            "FROM rc GROUP BY 1, 2, 3"
        )
        got = {
            (r["day"], r["dev"], r["loc"]): (r["d"], r["r"])
            for r in df.collect()
        }
        want = {
            (r["bucket"], r["dev"], r["loc"]): (r["delta"], r["rate"])
            for r in cagg.interpolated_delta_at_grain(
                grain="1 day"
            ).collect()
        }
        assert got == want and len(got) > 0

    def test_interp_requires_explicit_grain(self, env):
        """No re-bucket item -> the interpolated accessor cannot serve
        (needs a target grid) -> loud error, not a silent answer."""
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(
                "SELECT bucket, dev, loc, "
                "interpolated_average(rollup(tw)) AS ia "
                "FROM rc GROUP BY 1, 2, 3"
            ).collect()

    def test_interp_requires_full_groups(self, env):
        """Boundary segments are per-series: serving a SUBSET of the
        cagg's groups must refuse."""
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(
                "SELECT time_bucket('1 day', bucket) AS day, dev, "
                "interpolated_average(rollup(tw)) AS ia "
                "FROM rc GROUP BY 1, 2"
            ).collect()

    def test_mixing_plain_and_interp_errors(self, env):
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(
                "SELECT time_bucket('1 day', bucket) AS day, dev, loc, "
                "delta(rollup(cnt)) AS d, "
                "interpolated_delta(rollup(cnt)) AS i "
                "FROM rc GROUP BY 1, 2, 3"
            ).collect()

    def test_interp_non_nesting_grain_errors(self, env):
        ts, _ = env
        with pytest.raises(Exception):
            ts.sql(
                "SELECT time_bucket('90 minutes', bucket) AS b, dev, "
                "loc, interpolated_delta(rollup(cnt)) AS d "
                "FROM rc GROUP BY 1, 2, 3"
            ).collect()
