"""2-D stats partials in continuous aggregates (round 12): the mat
table stores mergeable comoment partials ``(n, Σx, Σy, Σx², Σy², Σxy)``
so slope/intercept/corr/covariance serve exactly at any coarser grain —
the toolkit ``stats_agg(y, x) → rollup → slope()`` idiom
(timescaledb-toolkit two-variable stats_agg; PG ``regr_*`` family)."""

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
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_s2d_"))
    ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
    ev = load_table(spark, sf_dir, "events").withColumn(
        "x", F.floor(F.col("value") * 100 + F.lit(0.5)).cast("double")
    ).withColumn(
        "y", F.col("user_id").cast("double")
    )
    ht.insert(ev)
    cagg = ts.create_cagg(
        "s2d", ht, bucket_width="1 hour", aggs={},
        group_by=["event_type"],
        stats_aggs={"st2": {"value": "x", "y": "y"}},
    )
    cagg.refresh()
    return ts, ht, cagg, ev


class TestStats2dCagg:
    def test_serve_equals_raw_regr(self, spark, env):
        """Served daily regression stats from hourly comoment partials
        equal the same comoment formulas computed DIRECTLY over the raw
        rows at day grain — the merge-correctness property. (Spark's
        built-in corr/covar_samp throw ANSI DIVIDE_BY_ZERO on
        single-row groups, so the built-in cross-check lives in the
        whole-series test below where groups are large.)"""
        from timescaledb_spark.functions.time import time_bucket

        _, _, cagg, ev = env
        got = {
            (r["bucket"], r["event_type"]): r
            for r in cagg.stats2d_at_grain(grain="1 day").collect()
        }
        x, y = F.col("x"), F.col("y")
        flat = ev.groupBy(
            time_bucket("1 day", "ts").alias("bucket"), "event_type"
        ).agg(
            F.count("x").alias("n"),
            F.sum(x).alias("sx"),
            F.sum(y).alias("sy"),
            F.sum(x * x).alias("sxx"),
            F.sum(y * y).alias("syy"),
            F.sum(x * y).alias("sxy"),
        )
        n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
        cxx = F.greatest(F.col("sxx") - sx * sx / n, F.lit(0.0))
        cyy = F.greatest(F.col("syy") - sy * sy / n, F.lit(0.0))
        cxy = F.col("sxy") - sx * sy / n
        slope = cxy / F.nullif(cxx, F.lit(0.0))
        raw = flat.select(
            "bucket", "event_type", "n",
            (sx / n).alias("average_x"),
            (sy / n).alias("average_y"),
            slope.alias("slope"),
            ((sy - slope * sx) / n).alias("intercept"),
            (
                cxy / F.nullif((n - F.lit(1)).cast("double"), F.lit(0.0))
            ).alias("covariance"),
            (cxy / F.nullif(F.sqrt(cxx * cyy), F.lit(0.0))).alias("corr"),
        )
        want = {(r["bucket"], r["event_type"]): r for r in raw.collect()}
        assert set(got) == set(want) and len(got) > 10
        for k, wr in want.items():
            gr = got[k]
            assert gr["n"] == wr["n"], k
            for f in ("slope", "intercept", "corr", "covariance",
                      "average_x", "average_y"):
                if wr[f] is None:
                    assert gr[f] is None, (k, f)
                else:
                    # integer-quantized inputs -> exact sums -> the
                    # served value is bit-identical to the direct one
                    assert gr[f] == wr[f], (k, f)

    def test_merge_equals_raw_whole_series(self, env):
        """Property: grain='all' (maximal merge depth) equals the raw
        2-D aggregate over the entire series."""
        from timescaledb_spark.functions.stats import stats_agg_2d

        _, _, cagg, ev = env
        got = {
            r["event_type"]: r
            for r in cagg.stats2d_at_grain(grain="all").collect()
        }
        want = {
            r["event_type"]: r
            for r in stats_agg_2d(ev, "x", "y", by=["event_type"]).collect()
        }
        assert set(got) == set(want)
        for k, wr in want.items():
            assert got[k]["n"] == wr["n"]
            assert got[k]["slope"] == pytest.approx(wr["slope"], rel=1e-9)
            assert got[k]["corr"] == pytest.approx(wr["corr"], rel=1e-9)
            assert got[k]["determination_coefficient"] == pytest.approx(
                wr["determination_coefficient"], rel=1e-9
            )

    def test_null_pairs_skipped(self, spark):
        """PG regr_* pair semantics: a row with either side NULL is
        excluded from BOTH sums."""
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_s2dn_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [
                (_ts(1, 0), "a", 1.0, 2.0),
                (_ts(1, 1), "a", 2.0, None),   # skipped pair
                (_ts(1, 2), "a", None, 9.0),   # skipped pair
                (_ts(1, 3), "a", 3.0, 6.0),
            ],
            "ts timestamp, dev string, x double, y double",
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            stats_aggs={"st2": {"value": "x", "y": "y"}},
        )
        cagg.refresh()
        r = cagg.stats2d_at_grain(grain="all").collect()[0]
        # pairs (1,2), (3,6): slope 2, intercept 0, corr 1, n 2
        assert r["n"] == 2
        assert r["slope"] == pytest.approx(2.0)
        assert r["intercept"] == pytest.approx(0.0)
        assert r["corr"] == pytest.approx(1.0)

    def test_degenerate_x_null_slope(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_s2dd_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0), "a", 5.0, 1.0), (_ts(1, 1), "a", 5.0, 2.0)],
            "ts timestamp, dev string, x double, y double",
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            stats_aggs={"st2": {"value": "x", "y": "y"}},
        )
        cagg.refresh()
        r = cagg.stats2d_at_grain(grain="all").collect()[0]
        assert r["slope"] is None and r["corr"] is None
        assert r["covariance"] == pytest.approx(0.0)

    def test_hierarchical_child(self, spark, env):
        """Daily child merging the hourly parent's comoments serves the
        same regression stats as the parent at day grain."""
        ts, _, hourly, _ = env
        daily = ts.create_cagg(
            "s2d_child", "_mat_s2d", bucket_width="1 day", aggs={},
            group_by=["event_type"],
            stats_aggs={"st2_d": {"rollup_of": "st2"}},
        )
        daily.refresh()
        assert daily._is_stats2d("st2_d")
        want = {
            (r["bucket"], r["event_type"]): (r["n"], r["slope"], r["corr"])
            for r in hourly.stats2d_at_grain(
                grain="1 day", realtime=False
            ).collect()
        }
        got = {
            (r["bucket"], r["event_type"]): (r["n"], r["slope"], r["corr"])
            for r in daily.stats2d_at_grain(realtime=False).collect()
        }
        assert set(got) == set(want) and len(got) > 10
        for k in want:
            assert got[k][0] == want[k][0], k
            assert got[k][1] == pytest.approx(want[k][1], rel=1e-12), k
            assert got[k][2] == pytest.approx(want[k][2], rel=1e-12), k

    def test_wrong_accessor_rejected(self, env):
        _, _, cagg, _ = env
        with pytest.raises(ValueError, match="2-D"):
            cagg.stats_at_grain("st2", grain="1 day")

    def test_1d_col_rejected_by_2d_accessor(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_s2dr_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0), "a", 1.0)], "ts timestamp, dev string, v double"
        ))
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
            stats_aggs={"st": {"value": "v"}},
        )
        cagg.refresh()
        with pytest.raises(ValueError, match="not a 2-D"):
            cagg.stats2d_at_grain("st", grain="all")


class TestStats2dSQL:
    def test_cmv_two_arg_and_accessor_route(self, spark):
        """SQL round trip: CREATE MATERIALIZED VIEW with
        stats_agg(y, x), then slope/corr served via rollup accessors."""
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_s2dsql_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [
                (_ts(1, 0), "a", 1.0, 2.0),
                (_ts(1, 1), "a", 2.0, 4.0),
                (_ts(1, 2), "a", 3.0, 6.5),
            ],
            "ts timestamp, dev string, x double, y double",
        ))
        ts.sql(
            "CREATE MATERIALIZED VIEW reg WITH (timescaledb.continuous) "
            "AS SELECT time_bucket('1 hour', ts) AS bucket, dev, "
            "stats_agg(y, x) AS st2 FROM m GROUP BY 1, 2"
        )
        cagg = ts.get_cagg("reg")
        assert cagg.row["stats_aggs"]["st2"]["y"] == "y"
        df = ts.sql(
            "SELECT dev, slope(rollup(st2)) AS s, corr(rollup(st2)) AS c, "
            "num_vals(rollup(st2)) AS nv FROM reg GROUP BY dev"
        )
        r = df.collect()[0]
        want = cagg.stats2d_at_grain(grain="all").collect()[0]
        assert r["s"] == pytest.approx(want["slope"])
        assert r["c"] == pytest.approx(want["corr"])
        assert r["nv"] == 3

    def test_1d_accessors_rejected_on_2d_col(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_s2dsqlr_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
        ht.insert(spark.createDataFrame(
            [(_ts(1, 0), "a", 1.0, 2.0)],
            "ts timestamp, dev string, x double, y double",
        ))
        ts.sql(
            "CREATE MATERIALIZED VIEW reg2 WITH (timescaledb.continuous) "
            "AS SELECT time_bucket('1 hour', ts) AS bucket, dev, "
            "stats_agg(y, x) AS st2 FROM m GROUP BY 1, 2"
        )
        ts.get_cagg("reg2").refresh()
        # stddev is a 1-D accessor; on a 2-D column the route must NOT
        # silently serve — it falls through to the normal path, which
        # rejects rollup() over a struct with an analysis error
        with pytest.raises(Exception):
            ts.sql(
                "SELECT dev, stddev(rollup(st2)) AS sd FROM reg2 "
                "GROUP BY dev"
            ).collect()
