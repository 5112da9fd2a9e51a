"""Round-13 ADVICE fixes:

1. hierarchical freq children inherit the parent ``topn_agg``'s
   declared ``n`` (sqladmin records it; the SQL route's bare
   ``topn(rollup(col))`` serves it), not the default 10;
2. raw-scan ``interpolated_duration_in`` buckets on the same
   origin-aligned grid as the cagg serve (default Mon 2000-01-03,
   ``src/time_bucket.c:98-105``), so the two documented analogs agree
   for EVERY width — weeks are Monday-anchored, and ``origin=0``
   recovers the bare epoch grid.
"""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


def _ts(d, h, m=0):
    return datetime.datetime(2024, 1, d, h, m)


class TestFreqChildInheritsN:
    def test_child_spec_inherits_declared_n(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_advfq_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
        rows = []
        for d in (1, 2):
            for h in range(6):
                for v, k in (("a", 5), ("b", 3), ("c", 2), ("d", 1)):
                    rows += [(_ts(d, h), "g", v)] * k
        ht.insert(
            spark.createDataFrame(rows, "ts timestamp, dev string, v string")
        )
        # the SQL form records the declared n (sqladmin topn_agg route)
        ts.sql(
            "CREATE MATERIALIZED VIEW pv WITH (timescaledb.continuous) "
            "AS SELECT time_bucket('1 hour', ts) AS bucket, dev, "
            "topn_agg(3, v) AS fq FROM m GROUP BY 1, 2"
        )
        parent = ts.get_cagg("pv")
        parent.refresh()
        assert parent.row["freq_aggs"]["fq"]["n"] == 3
        child = ts.create_cagg(
            "cv", "_mat_pv", bucket_width="1 day", aggs={},
            group_by=["dev"],
            freq_aggs={"fq_d": {"rollup_of": "fq"}},
        )
        child.refresh()
        # the fix: n travels with the rollup, like capacity
        assert child.row["freq_aggs"]["fq_d"]["n"] == 3
        assert (
            child.row["freq_aggs"]["fq_d"]["capacity"]
            == parent.row["freq_aggs"]["fq"]["capacity"]
        )
        # bare topn(rollup(..)) on the CHILD serves the declared 3
        out = ts.sql(
            "SELECT bucket, dev, topn(rollup(fq_d)) AS v "
            "FROM cv GROUP BY 1, 2"
        ).collect()
        per_bucket = {}
        for r in out:
            per_bucket.setdefault((r["bucket"], r["dev"]), []).append(r["v"])
        assert per_bucket and all(
            sorted(vs) == ["a", "b", "c"] for vs in per_bucket.values()
        )


class TestInterpDurationOrigin:
    def _mk(self, spark):
        ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_advidur_"))
        ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
        df = spark.createDataFrame(
            [
                (_ts(1, 6), "g", "up"),      # Mon 2024-01-01
                (_ts(3, 6), "g", "down"),
                (_ts(9, 12), "g", "up"),     # Tue week 2
                (_ts(10, 0), "g", "down"),
            ],
            "ts timestamp, dev string, s string",
        )
        ht.insert(df)
        return ts, ht, df

    def test_week_grid_monday_anchored_matches_cagg_serve(self, spark):
        from timescaledb_spark.functions.state import (
            interpolated_duration_in,
        )

        ts, ht, df = self._mk(spark)
        raw = {
            (r["bucket"], r["duration_us"])
            for r in interpolated_duration_in(
                df, "up", "1 week", "ts", "s", by=[]
            ).collect()
        }
        # Monday-anchored buckets (2000-01-03 origin), never Thursday
        # (the epoch-DIV grid)
        assert raw and all(b.weekday() == 0 for b, _d in raw)
        cagg = ts.create_cagg(
            "c", ht, bucket_width="1 hour", aggs={}, group_by=[],
            state_aggs={"sa": {"state": "s"}},
        )
        cagg.refresh()
        served = {
            (r["bucket"], r["duration_us"])
            for r in cagg.interpolated_duration_in_at_grain(
                "up", grain="1 week", realtime=False
            ).collect()
        }
        assert served == raw

    def test_origin_zero_recovers_epoch_grid(self, spark):
        from timescaledb_spark.functions.state import (
            interpolated_duration_in,
        )
        from timescaledb_spark.functions.time import DEFAULT_ORIGIN_US

        _, _, df = self._mk(spark)
        width = 7 * 3_600_000_000  # 7h: epoch and 2000-01-03 grids differ
        assert DEFAULT_ORIGIN_US % width != 0

        def starts(**kw):
            out = interpolated_duration_in(
                df, "up", "7 hours", "ts", "s", by=[], **kw
            ).collect()
            return [
                int(r["bucket"].replace(
                    tzinfo=datetime.timezone.utc
                ).timestamp() * 1_000_000)
                for r in out
            ]

        dflt = starts()
        assert dflt and all(
            (b - DEFAULT_ORIGIN_US) % width == 0 for b in dflt
        )
        epoch = starts(origin=0)
        assert epoch and all(b % width == 0 for b in epoch)
        # total time in state is grid-independent
        assert sum(
            r["duration_us"]
            for r in interpolated_duration_in(
                df, "up", "7 hours", "ts", "s", by=[]
            ).collect()
        ) == sum(
            r["duration_us"]
            for r in interpolated_duration_in(
                df, "up", "7 hours", "ts", "s", by=[], origin=0
            ).collect()
        )
