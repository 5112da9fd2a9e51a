"""Sketch-state continuous aggregates (round 10): the mat table stores
MERGEABLE partials — DDSketch bucket-count maps, or Spark's binary HLL
states via plain ``hll_sketch_agg`` in ``aggs`` — so one hourly cagg
serves percentiles / distinct counts at any coarser grain without
rescanning raw data. The toolkit ``percentile_agg`` / ``uddsketch`` /
``hll`` rollup-inside-a-cagg idiom; partial-vs-finalized
materialization discussion in ``tsl/src/continuous_aggs/finalize.c``.
"""

import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession
from timescaledb_spark.sources import load_table


def _mk(spark, sf_dir, prefix, **cagg_kw):
    ts = TSSession(spark, tempfile.mkdtemp(prefix=prefix))
    ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.insert(load_table(spark, sf_dir, "events"))
    kw = dict(
        bucket_width="1 hour",
        aggs={},
        group_by=["event_type"],
        sketches={"sk": {"value": "value", "alpha": 0.01}},
    )
    kw.update(cagg_kw)
    cagg = ts.create_cagg("sk_cagg", ht, **kw)
    return ts, ht, cagg


def _rows(df, keys):
    return {tuple(r[k] for k in keys): r for r in df.collect()}


class TestDDSketchCagg:
    def test_mat_stores_map_states(self, spark, sf_dir):
        _, _, cagg = _mk(spark, sf_dir, "ts_sk_mat_")
        cagg.refresh()
        mat = cagg.read(realtime=False)
        assert dict(mat.dtypes)["sk"] == "map<int,bigint>"
        # every state's counts sum to the bucket's row count
        ev = load_table(spark, sf_dir, "events")
        n_rows = ev.count()
        total = mat.select(
            F.aggregate(
                F.map_values("sk"), F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("c")
        ).agg(F.sum("c")).collect()[0][0]
        assert total == n_rows

    def test_quantiles_equal_raw_built_sketch_any_grain(self, spark, sf_dir):
        """Lossless merge (Masson VLDB'19 §2.3): day-grain quantiles from
        stored hourly states == sketch built directly from raw rows."""
        from timescaledb_spark.functions.ddsketch import (
            ddsketch,
            ddsketch_quantiles,
        )
        from timescaledb_spark.functions.time import time_bucket

        _, _, cagg = _mk(spark, sf_dir, "ts_sk_grain_")
        cagg.refresh()
        ev = load_table(spark, sf_dir, "events")
        for grain, expr in (("1 day", "1 day"), ("all", None)):
            got = cagg.quantiles([0.5, 0.95], grain=grain)
            if expr is None:
                raw = ddsketch(ev, "value", by=["event_type"])
                want = ddsketch_quantiles(raw, [0.5, 0.95], by=["event_type"])
                keys = ["event_type"]
            else:
                raw = ddsketch(
                    ev.select(
                        time_bucket(expr, "ts").alias("b"), "event_type", "value"
                    ),
                    "value",
                    by=["b", "event_type"],
                )
                want = ddsketch_quantiles(
                    raw, [0.5, 0.95], by=["b", "event_type"]
                ).withColumnRenamed("b", "bucket")
                keys = ["bucket", "event_type"]
            g, w = _rows(got, keys), _rows(want, keys)
            assert set(g) == set(w) and g
            for k in g:
                assert (g[k]["n"], g[k]["p50"], g[k]["p95"]) == (
                    w[k]["n"], w[k]["p50"], w[k]["p95"]
                ), k

    def test_realtime_union_merges_mat_and_raw_states(self, spark, sf_dir):
        """Partial refresh: a day straddling the watermark merges
        mat-side hourly states with raw-computed ones — result must be
        identical to the fully-refreshed answer."""
        _, ht, cagg = _mk(spark, sf_dir, "ts_sk_rt_")
        lo = min(c["range_start"] for c in ht.chunks())
        hi = max(c["range_end"] for c in ht.chunks())
        cagg.refresh(start=lo, end=lo + (hi - lo) // 2)
        partial = _rows(
            cagg.quantiles([0.5, 0.95], grain="1 day", realtime=True),
            ["bucket", "event_type"],
        )
        cagg.refresh()
        full = _rows(
            cagg.quantiles([0.5, 0.95], grain="1 day", realtime=False),
            ["bucket", "event_type"],
        )
        assert set(partial) == set(full) and partial
        for k in full:
            assert (partial[k]["p50"], partial[k]["p95"]) == (
                full[k]["p50"], full[k]["p95"]
            ), k

    def test_late_data_refresh_equals_recompute(self, spark, sf_dir):
        """Refresh-vs-recompute property: late rows re-dirty their
        buckets; after re-refresh the stored states equal a from-scratch
        cagg over the full data."""
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_sk_late_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ev = load_table(spark, sf_dir, "events")
        ht.insert(ev.filter(F.pmod("event_id", F.lit(10)) != 0))
        cagg = ts.create_cagg(
            "late_sk", ht, bucket_width="1 hour", aggs={},
            group_by=["event_type"],
            sketches={"sk": {"value": "value", "alpha": 0.01}},
        )
        cagg.refresh()
        ht.insert(ev.filter(F.pmod("event_id", F.lit(10)) == 0))
        cagg.refresh()
        got = _rows(
            cagg.quantiles([0.5, 0.9], grain="1 day", realtime=False),
            ["bucket", "event_type"],
        )
        ts2 = TSSession(spark, tempfile.mkdtemp(prefix="ts_sk_late2_"))
        ht2 = ts2.create_hypertable("events", "ts", chunk_interval="7 days")
        ht2.insert(ev)
        cagg2 = ts2.create_cagg(
            "late_sk2", ht2, bucket_width="1 hour", aggs={},
            group_by=["event_type"],
            sketches={"sk": {"value": "value", "alpha": 0.01}},
        )
        cagg2.refresh()
        want = _rows(
            cagg2.quantiles([0.5, 0.9], grain="1 day", realtime=False),
            ["bucket", "event_type"],
        )
        assert got.keys() == want.keys() and got
        for k in want:
            assert (got[k]["n"], got[k]["p50"], got[k]["p90"]) == (
                want[k]["n"], want[k]["p50"], want[k]["p90"]
            ), k

    def test_mixed_aggs_and_sketch(self, spark, sf_dir):
        """Regular finalized aggs and sketch states coexist in one mat
        row (null-safe 1:1 join of the two grouped frames)."""
        _, _, cagg = _mk(
            spark, sf_dir, "ts_sk_mixed_",
            aggs={"n": "count(*)", "sum_v": "sum(value)"},
        )
        cagg.refresh()
        mat = cagg.read(realtime=False)
        ev = load_table(spark, sf_dir, "events")
        want = ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
        got = mat.groupBy("event_type").agg(F.sum("n").alias("n")).collect()
        assert {r["event_type"]: r["n"] for r in got} == {
            r["event_type"]: r["n"] for r in want
        }
        # sketch column n agrees with the finalized count per bucket row
        bad = mat.select(
            "n",
            F.aggregate(
                F.map_values("sk"), F.lit(0).cast("long"), lambda a, x: a + x
            ).alias("skn"),
        ).filter("n != skn").count()
        assert bad == 0

    def test_errors(self, spark, sf_dir):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_sk_err_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ht.insert(load_table(spark, sf_dir, "events"))
        with pytest.raises(ValueError, match="collides"):
            ts.create_cagg(
                "bad1", ht, bucket_width="1 hour",
                aggs={"n": "count(*)"}, group_by=["event_type"],
                sketches={"n": {"value": "value"}},
            )
        with pytest.raises(ValueError, match="value"):
            ts.create_cagg(
                "bad2", ht, bucket_width="1 hour", aggs={},
                sketches={"sk": {"alpha": 0.5}},
            )
        plain = ts.create_cagg(
            "plain", ht, bucket_width="1 hour", aggs={"n": "count(*)"},
        )
        with pytest.raises(ValueError, match="no sketch columns"):
            plain.quantiles([0.5])


class TestHLLCagg:
    def test_hll_states_in_aggs_rollup(self, spark, sf_dir):
        """Spark's binary HLL states need no engine support: a cagg with
        ``hll_sketch_agg(user_id)`` stores mergeable binaries; any-grain
        distinct counts come from ``hll_union_agg`` +
        ``hll_sketch_estimate`` over the realtime view."""
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_hll_cagg_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ht.insert(load_table(spark, sf_dir, "events"))
        cagg = ts.create_cagg(
            "hll_c", ht, bucket_width="1 hour",
            aggs={"users_hll": "hll_sketch_agg(user_id)",
                  "n": "count(*)"},
        )
        lo = min(c["range_start"] for c in ht.chunks())
        hi = max(c["range_end"] for c in ht.chunks())
        cagg.refresh(start=lo, end=lo + (hi - lo) // 2)
        est = (
            cagg.read(realtime=True)
            .agg(
                F.expr(
                    "hll_sketch_estimate(hll_union_agg(users_hll))"
                ).alias("du")
            )
            .collect()[0]["du"]
        )
        exact = (
            load_table(spark, sf_dir, "events")
            .select("user_id").distinct().count()
        )
        assert abs(est - exact) <= max(2, 0.05 * exact)


class TestSketchSQLRoute:
    """SQL serving idiom: approx_percentile(p, rollup(sk)) FROM <cagg>
    routes to ContinuousAggregate.quantiles (sqlapi round 10)."""

    def test_sql_daily_rollup_matches_accessor(self, spark, sf_dir):
        ts, _, cagg = _mk(spark, sf_dir, "ts_sk_sql_")
        cagg.refresh()
        df = ts.sql(
            "SELECT time_bucket('1 day', bucket) AS day, event_type, "
            "approx_percentile(0.5, rollup(sk)) AS med, "
            "approx_percentile(0.95, rollup(sk)) AS p95 "
            "FROM sk_cagg GROUP BY 1, 2"
        )
        assert df.columns == ["day", "event_type", "med", "p95"]
        py = cagg.quantiles([0.5, 0.95], grain="1 day").select(
            F.col("bucket").alias("day"),
            "event_type",
            F.col("p50").alias("med"),
            "p95",
        )
        assert sorted(map(tuple, df.collect())) == sorted(
            map(tuple, py.collect())
        )

    def test_sql_global_and_per_group(self, spark, sf_dir):
        ts, _, cagg = _mk(spark, sf_dir, "ts_sk_sqlg_")
        cagg.refresh()
        g = ts.sql(
            "SELECT approx_percentile(0.9, rollup(sk)) AS p90 FROM sk_cagg"
        ).collect()
        assert len(g) == 1 and g[0]["p90"] > 0
        per = ts.sql(
            "SELECT event_type, approx_percentile(0.9, rollup(sk)) AS p90 "
            "FROM sk_cagg GROUP BY event_type"
        )
        assert per.columns == ["event_type", "p90"]
        assert per.count() == 5

    def test_sql_group_by_not_in_select_falls_through(self, spark, sf_dir):
        """ADVICE r10: valid SQL need not select the grouped column —
        ``GROUP BY event_type`` without selecting it must NOT route to
        the global-row accessor; the normal path raises loudly."""
        ts, _, cagg = _mk(spark, sf_dir, "ts_sk_sqlgb_")
        cagg.refresh()
        with pytest.raises(Exception):
            ts.sql(
                "SELECT approx_percentile(0.5, rollup(sk)) AS med "
                "FROM sk_cagg GROUP BY event_type"
            ).collect()
        # grouping by a non-key column also falls through
        with pytest.raises(Exception):
            ts.sql(
                "SELECT event_type, "
                "approx_percentile(0.5, rollup(sk)) AS med "
                "FROM sk_cagg GROUP BY bucket"
            ).collect()
        # selected keys WITHOUT any GROUP BY: not a valid aggregate
        # query — must not route either
        with pytest.raises(Exception):
            ts.sql(
                "SELECT event_type, "
                "approx_percentile(0.5, rollup(sk)) AS med FROM sk_cagg"
            ).collect()

    def test_sql_group_by_alias_and_expr_forms(self, spark, sf_dir):
        ts, _, cagg = _mk(spark, sf_dir, "ts_sk_sqlal_")
        cagg.refresh()
        # GROUP BY by output alias and by the same time_bucket call
        for gb in (
            "day, event_type",
            "time_bucket('1 day', bucket), event_type",
        ):
            df = ts.sql(
                "SELECT time_bucket('1 day', bucket) AS day, event_type, "
                "approx_percentile(0.5, rollup(sk)) AS med "
                f"FROM sk_cagg GROUP BY {gb}"
            )
            assert df.columns == ["day", "event_type", "med"]
            assert df.count() > 0
        # a DIFFERENT re-bucket width in GROUP BY is not the same key
        with pytest.raises(Exception):
            ts.sql(
                "SELECT time_bucket('1 day', bucket) AS day, "
                "approx_percentile(0.5, rollup(sk)) AS med "
                "FROM sk_cagg GROUP BY time_bucket('2 days', bucket)"
            ).collect()

    def test_sql_unsupported_shapes_fall_through(self, spark, sf_dir):
        ts, _, cagg = _mk(spark, sf_dir, "ts_sk_sqlf_")
        cagg.refresh()
        # WHERE present -> no route; normal path must raise (rollup over
        # a map column is not a valid Spark aggregate), not silently
        # answer wrong
        with pytest.raises(Exception):
            ts.sql(
                "SELECT approx_percentile(0.9, rollup(sk)) AS p90 "
                "FROM sk_cagg WHERE event_type = 'click'"
            ).collect()


class TestHierarchicalSketchCagg:
    """cagg-on-cagg over sketch states (tsl/test/sql/cagg_on_cagg.sql ×
    the toolkit rollup idiom): the daily child's states are lossless
    merges of the hourly parent's stored states — never a raw rescan."""

    def test_daily_child_equals_parent_grain_rollup(self, spark, sf_dir):
        ts, ht, hourly = _mk(spark, sf_dir, "ts_sk_hier_")
        hourly.refresh()
        daily = ts.create_cagg(
            "sk_daily",
            "_mat_sk_cagg",
            bucket_width="1 day",
            aggs={},
            group_by=["event_type"],
            sketches={"sk_d": {"rollup_of": "sk"}},
        )
        daily.refresh()
        # inherited alpha
        assert daily.row["sketches"]["sk_d"]["alpha"] == 0.01
        got = daily.quantiles([0.5, 0.95], realtime=False)
        want = hourly.quantiles([0.5, 0.95], grain="1 day")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_late_data_flows_parent_to_child(self, spark, sf_dir):
        ts, ht, hourly = _mk(spark, sf_dir, "ts_sk_hier2_")
        hourly.refresh()
        daily = ts.create_cagg(
            "sk_daily2",
            "_mat_sk_cagg",
            bucket_width="1 day",
            aggs={},
            group_by=["event_type"],
            sketches={"sk_d": {"rollup_of": "sk"}},
        )
        daily.refresh()
        late = spark.createDataFrame(
            [("2024-01-03 05:30:00", 999999, 7, "click", 12345.0, "{}")],
            "ts string, event_id long, user_id long, event_type string, "
            "value double, props string",
        ).select(
            F.col("ts").cast("timestamp"), "event_id", "user_id",
            "event_type", "value", "props",
        )
        ht.insert(late)
        hourly.refresh()
        daily.refresh()
        got = daily.quantiles([0.95], realtime=False)
        want = hourly.quantiles([0.95], grain="1 day")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


class TestSketchRank:
    """approx_percentile_rank — the inverse accessor, served from the
    stored states (same merge rules as quantiles)."""

    def test_rank_matches_exact_fraction_within_alpha(self, spark, sf_dir):
        ts, ht, cagg = _mk(spark, sf_dir, "ts_sk_rank_")
        cagg.refresh()
        probe = 50.0
        got = {
            r["event_type"]: r["rank"]
            for r in cagg.rank(probe, grain="all").collect()
        }
        raw = ht.df()
        exact = {
            r["event_type"]: r["f"]
            for r in raw.groupBy("event_type")
            .agg(
                (
                    F.sum((F.col("value") <= probe).cast("long"))
                    / F.count(F.lit(1))
                ).alias("f")
            )
            .collect()
        }
        for et, f in exact.items():
            # bucket-boundary tolerance: values within alpha of the probe
            # can land either side of the probe's bucket
            assert abs(got[et] - f) < 0.05, (et, got[et], f)

    def test_rank_monotone_and_bounds(self, spark, sf_dir):
        ts, _, cagg = _mk(spark, sf_dir, "ts_sk_rank2_")
        cagg.refresh()
        r0 = cagg.rank(0.0, grain="all").collect()
        rbig = cagg.rank(1e12, grain="all").collect()
        rmid = cagg.rank(30.0, grain="all").collect()
        by = lambda rows: {r["event_type"]: r["rank"] for r in rows}  # noqa: E731
        b0, bm, bb = by(r0), by(rmid), by(rbig)
        for et in bb:
            assert 0.0 <= b0[et] <= bm[et] <= bb[et] == 1.0

    def test_sql_rank_route(self, spark, sf_dir):
        ts, _, cagg = _mk(spark, sf_dir, "ts_sk_rank3_")
        cagg.refresh()
        df = ts.sql(
            "SELECT event_type, "
            "approx_percentile(0.5, rollup(sk)) AS med, "
            "approx_percentile_rank(50.0, rollup(sk)) AS frac_le_50 "
            "FROM sk_cagg GROUP BY event_type"
        )
        assert df.columns == ["event_type", "med", "frac_le_50"]
        rows = df.collect()
        assert len(rows) == 5
        py = {
            r["event_type"]: r["rank"]
            for r in cagg.rank(50.0, grain="all").collect()
        }
        for r in rows:
            assert r["frac_le_50"] == py[r["event_type"]]


class TestSketchSQLCreate:
    """Full SQL round-trip: CREATE MATERIALIZED VIEW with toolkit sketch
    aggregates (percentile_agg / uddsketch / hierarchical rollup) maps
    to sketches=, then approx_percentile serves from the states."""

    def test_create_with_percentile_agg(self, spark, sf_dir):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_sk_ddl_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ht.insert(load_table(spark, sf_dir, "events"))
        ts.sql(
            "CREATE MATERIALIZED VIEW sk_sql WITH (timescaledb.continuous)"
            " AS SELECT time_bucket('1 hour', ts) AS bucket, event_type, "
            "percentile_agg(value) AS sk FROM events GROUP BY 1, 2"
        )
        cagg = ts.get_cagg("sk_sql")
        assert cagg.row["sketches"] == {"sk": {"value": "value"}}
        served = ts.sql(
            "SELECT event_type, approx_percentile(0.5, rollup(sk)) AS med "
            "FROM sk_sql GROUP BY event_type"
        )
        want = cagg.quantiles([0.5], grain="all").select(
            "event_type", F.col("p50").alias("med")
        )
        assert sorted(map(tuple, served.collect())) == sorted(
            map(tuple, want.collect())
        )

    def test_create_uddsketch_and_hierarchical_rollup(self, spark, sf_dir):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_sk_ddl2_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ht.insert(load_table(spark, sf_dir, "events"))
        ts.sql(
            "CREATE MATERIALIZED VIEW sk_h WITH (timescaledb.continuous)"
            " AS SELECT time_bucket('1 hour', ts) AS bucket, event_type, "
            "uddsketch(200, 0.05, value) AS sk FROM events GROUP BY 1, 2"
        )
        hourly = ts.get_cagg("sk_h")
        assert hourly.row["sketches"]["sk"]["alpha"] == 0.05
        ts.sql(
            "CREATE MATERIALIZED VIEW sk_hd WITH (timescaledb.continuous)"
            " AS SELECT time_bucket('1 day', bucket) AS bucket, "
            "event_type, rollup(sk) AS sk_d FROM sk_h GROUP BY 1, 2"
        )
        daily = ts.get_cagg("sk_hd")
        assert daily.row["sketches"]["sk_d"] == {
            "rollup_of": "sk",
            "alpha": 0.05,
        }
        got = daily.quantiles([0.9], realtime=False)
        want = hourly.quantiles([0.9], grain="1 day")
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )


class TestSketchServingBounds:
    def test_start_end_bucket_aligned(self, spark, sf_dir):
        ts, ht, cagg = _mk(spark, sf_dir, "ts_sk_rng_")
        cagg.refresh()
        bounded = cagg.quantiles(
            [0.5], grain="all", start="2024-01-03", end="2024-01-10"
        )
        # model: rebuild from raw rows restricted to the same window
        from timescaledb_spark.functions.ddsketch import (
            ddsketch,
            ddsketch_quantiles,
        )

        raw = ht.df().filter(
            (F.col("ts") >= "2024-01-03") & (F.col("ts") < "2024-01-10")
        )
        want = ddsketch_quantiles(
            ddsketch(raw, "value", by=["event_type"]),
            [0.5],
            by=["event_type"],
        )
        assert sorted(map(tuple, bounded.collect())) == sorted(
            map(tuple, want.collect())
        )


class TestCounterCagg:
    """Counter-state caggs: mergeable counter partials in the mat
    table, any-grain reset-adjusted serving (the toolkit
    delta(rollup(counter_agg)) idiom)."""

    def _mk_counter(self, spark, sf_dir, prefix, **kw):
        ts = TSSession(spark, tempfile.mkdtemp(prefix=prefix))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "cv", F.floor(F.col("value") * 1e6 + F.lit(0.5)).cast("double")
        )
        ht.insert(ev)
        cagg = ts.create_cagg(
            "cnt_c",
            ht,
            bucket_width="1 hour",
            aggs={},
            group_by=["event_type"],
            counters={"cnt": {"value": "cv", "tiebreak": ["event_id"]}},
            **kw,
        )
        return ts, ht, cagg

    def test_any_grain_equals_raw_counter_agg(self, spark, sf_dir):
        from timescaledb_spark.functions.counters import counter_agg

        ts, ht, cagg = self._mk_counter(spark, sf_dir, "ts_cnt_")
        cagg.refresh()
        got = {
            (r["bucket"], r["event_type"]): (
                r["n"], r["delta"], r["num_resets"]
            )
            for r in cagg.counter_at_grain(grain="1 day").collect()
        }
        raw = ht.df().withColumn("day", F.date_trunc("day", F.col("ts")))
        want = {
            (r["day"], r["event_type"]): (
                r["n"], r["delta"], r["num_resets"]
            )
            for r in counter_agg(
                raw, ts_col="ts", value_col="cv",
                by=["day", "event_type"], tiebreak=["event_id"],
            ).collect()
        }
        assert got == want

    def test_realtime_union_and_bounds(self, spark, sf_dir):
        from timescaledb_spark.functions.counters import counter_agg

        ts, ht, cagg = self._mk_counter(spark, sf_dir, "ts_cnt_rt_")
        lo = min(c["range_start"] for c in ht.chunks())
        hi = max(c["range_end"] for c in ht.chunks())
        cagg.refresh(start=lo, end=lo + (hi - lo) // 2)
        got = {
            r["event_type"]: (r["n"], r["delta"])
            for r in cagg.counter_at_grain(
                grain="all", realtime=True
            ).collect()
        }
        want = {
            r["event_type"]: (r["n"], r["delta"])
            for r in counter_agg(
                ht.df(), ts_col="ts", value_col="cv",
                by=["event_type"], tiebreak=["event_id"],
            ).collect()
        }
        assert got == want
        # bucket-aligned serving bounds
        b = cagg.counter_at_grain(
            grain="all", start="2024-01-03", end="2024-01-10"
        )
        raw = ht.df().filter(
            (F.col("ts") >= "2024-01-03") & (F.col("ts") < "2024-01-10")
        )
        wantb = {
            r["event_type"]: (r["n"], r["delta"], r["num_resets"])
            for r in counter_agg(
                raw, ts_col="ts", value_col="cv",
                by=["event_type"], tiebreak=["event_id"],
            ).collect()
        }
        gotb = {
            r["event_type"]: (r["n"], r["delta"], r["num_resets"])
            for r in b.collect()
        }
        assert gotb == wantb

    def test_sql_create_counter_cagg(self, spark, sf_dir):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_cnt_sql_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ht.insert(load_table(spark, sf_dir, "events"))
        ts.sql(
            "CREATE MATERIALIZED VIEW cnt_sql WITH "
            "(timescaledb.continuous) AS "
            "SELECT time_bucket('1 hour', ts) AS bucket, event_type, "
            "counter_agg(ts, value) AS cnt FROM events GROUP BY 1, 2"
        )
        cagg = ts.get_cagg("cnt_sql")
        assert cagg.row["counters"] == {"cnt": {"value": "value"}}
        out = cagg.counter_at_grain(grain="1 day")
        assert out.count() > 0
        assert {"n", "delta", "rate", "num_resets"} <= set(out.columns)


class TestGaugeStatsCagg:
    """Gauge + stats moments partials: the remaining toolkit rollup
    families, same merge machinery as counters/sketches."""

    def _mk2(self, spark, sf_dir, prefix):
        ts = TSSession(spark, tempfile.mkdtemp(prefix=prefix))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ev = load_table(spark, sf_dir, "events").withColumn(
            "cv", F.floor(F.col("value") * 1e2 + F.lit(0.5)).cast("double")
        )
        ht.insert(ev)
        cagg = ts.create_cagg(
            "gs_c",
            ht,
            bucket_width="1 hour",
            aggs={},
            group_by=["event_type"],
            gauges={"g": {"value": "cv", "tiebreak": ["event_id"]}},
            stats_aggs={"st": {"value": "cv"}},
        )
        return ts, ht, cagg

    def test_gauge_any_grain_equals_raw(self, spark, sf_dir):
        from timescaledb_spark.functions.counters import gauge_agg

        ts, ht, cagg = self._mk2(spark, sf_dir, "ts_gs_")
        cagg.refresh()
        got = {
            (r["bucket"], r["event_type"]): (
                r["n"], r["delta"], r["idelta"],
                round(r["rate"] or 0, 9), round(r["irate"] or 0, 9),
            )
            for r in cagg.gauge_at_grain(grain="1 day").collect()
        }
        raw = ht.df().withColumn("day", F.date_trunc("day", F.col("ts")))
        want = {
            (r["day"], r["event_type"]): (
                r["n"], r["delta"], r["idelta"],
                round(r["rate"] or 0, 9), round(r["irate"] or 0, 9),
            )
            for r in gauge_agg(
                raw, ts_col="ts", value_col="cv",
                by=["day", "event_type"], tiebreak=["event_id"],
            ).collect()
        }
        assert got == want

    def test_stats_any_grain_matches_builtins(self, spark, sf_dir):
        ts, ht, cagg = self._mk2(spark, sf_dir, "ts_gs2_")
        cagg.refresh()
        got = {
            r["event_type"]: (
                r["n"], r["sum"], round(r["avg"], 6),
                round(r["stddev"], 4), r["min"], r["max"],
            )
            for r in cagg.stats_at_grain(grain="all").collect()
        }
        want = {
            r["event_type"]: (
                r["n"], r["s"], round(r["a"], 6),
                round(r["sd"], 4), r["mn"], r["mx"],
            )
            for r in ht.df()
            .groupBy("event_type")
            .agg(
                F.count("cv").alias("n"),
                F.sum("cv").alias("s"),
                F.avg("cv").alias("a"),
                F.stddev_samp("cv").alias("sd"),
                F.min("cv").alias("mn"),
                F.max("cv").alias("mx"),
            )
            .collect()
        }
        assert got == want

    def test_stats_single_sample_stddev_null(self, spark, sf_dir):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_gs3_"))
        ht = ts.create_hypertable("one", "ts", chunk_interval="1 day")
        ht.insert(
            spark.createDataFrame(
                [("2024-01-01 00:00:00", 5.0)], "ts string, v double"
            ).select(F.col("ts").cast("timestamp"), "v")
        )
        cagg = ts.create_cagg(
            "one_c", ht, bucket_width="1 hour", aggs={},
            stats_aggs={"st": {"value": "v"}},
        )
        cagg.refresh()
        r = cagg.stats_at_grain(grain="all").collect()[0]
        assert r["n"] == 1 and r["stddev"] is None and r["variance"] is None

    def test_sql_create_gauge_and_stats(self, spark, sf_dir):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_gs4_"))
        ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
        ht.insert(load_table(spark, sf_dir, "events"))
        ts.sql(
            "CREATE MATERIALIZED VIEW gs_sql WITH "
            "(timescaledb.continuous) AS "
            "SELECT time_bucket('1 hour', ts) AS bucket, event_type, "
            "gauge_agg(ts, value) AS g, stats_agg(value) AS st "
            "FROM events GROUP BY 1, 2"
        )
        cagg = ts.get_cagg("gs_sql")
        assert cagg.row["gauges"] == {"g": {"value": "value"}}
        assert cagg.row["stats_aggs"] == {"st": {"value": "value"}}
        assert cagg.gauge_at_grain(grain="1 day").count() > 0
        assert cagg.stats_at_grain(grain="1 day").count() > 0


def test_distinct_at_grain_accessor(spark, sf_dir):
    """HLL serving sugar: distinct_at_grain over an hll_sketch_agg aggs
    column matches the manual union+estimate read at every grain."""
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_hll_acc_"))
    ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.insert(load_table(spark, sf_dir, "events"))
    cagg = ts.create_cagg(
        "hll_a", ht, bucket_width="1 hour",
        aggs={"uh": "hll_sketch_agg(user_id)"},
        group_by=["event_type"],
    )
    cagg.refresh()
    got = {
        r["event_type"]: r["approx_distinct"]
        for r in cagg.distinct_at_grain("uh", grain="all").collect()
    }
    want = {
        r["event_type"]: r["du"]
        for r in cagg.read()
        .groupBy("event_type")
        .agg(F.expr("hll_sketch_estimate(hll_union_agg(uh))").alias("du"))
        .collect()
    }
    assert got == want
    daily = cagg.distinct_at_grain("uh", grain="1 day")
    assert daily.count() > 0 and "bucket" in daily.columns
    with pytest.raises(KeyError):
        cagg.distinct_at_grain("nope")


def test_gauge_all_grain_with_dual_partials_and_projection(spark, sf_dir):
    """Regression (round 10): a gauge + stats dual-partial cagg, served
    at grain='all' WITH a column projection on top, tripped Spark
    4.1.2's RemoveRedundantAliases into an unresolved plan when the
    serving aggregate bundled components into aliased-field structs.
    The per-component min_by/max_by rewrite must keep this green."""
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_gdual_"))
    ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
    ht.insert(load_table(spark, sf_dir, "events"))
    cagg = ts.create_cagg(
        "gdual", ht, bucket_width="1 hour", aggs={},
        group_by=["event_type"],
        gauges={"g": {"value": "value"}},
        stats_aggs={"st": {"value": "value"}},
    )
    cagg.refresh()
    rows = (
        cagg.gauge_at_grain("g", grain="all")
        .select("event_type", "n", "delta", "idelta")
        .collect()
    )
    assert len(rows) == 5 and all(r["n"] > 0 for r in rows)
