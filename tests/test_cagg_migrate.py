"""cagg.alter() — the ``cagg_migrate`` analog (reference procedure
``@extschema@.cagg_migrate``; plan execution in
``_timescaledb_internal.cagg_migrate_execute_plan``): redefine a
continuous aggregate under its existing name via shadow-create →
backfill → atomic catalog swap, with policies (which reference the
cagg by name) surviving the migration."""

import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0 = 1704067200000000  # 2024-01-01
HOUR = 3_600_000_000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _rows(spark, start_h, n_h):
    return spark.range(n_h).select(
        F.timestamp_micros(
            (F.lit(T0) + (F.col("id") + start_h) * HOUR).cast("long")
        ).alias("ts"),
        (F.col("id") % 2).cast("string").alias("kind"),
        (F.col("id") * 1.0).alias("v"),
    )


def _setup(ts, spark):
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    ht.insert(_rows(spark, 0, 96))
    cagg = ts.create_cagg(
        "daily", "m", bucket_width="1 day", aggs={"n": "count(1)"}
    )
    cagg.refresh()
    return ht, cagg


def test_alter_aggs_equals_full_recompute(ts, spark):
    ht, cagg = _setup(ts, spark)
    cagg.alter(aggs={"n": "count(1)", "s": "sum(v)", "mx": "max(v)"})
    got = {
        (r["bucket"], r["n"], r["s"], r["mx"])
        for r in cagg.read(realtime=False).collect()
    }
    exp = {
        (r["b"], r["n"], r["s"], r["mx"])
        for r in ht.df()
        .groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.max("v").alias("mx"),
        )
        .collect()
    }
    assert got == exp
    # the migrated cagg keeps its NAME and stays fully functional
    assert ts.get_cagg("daily").read(realtime=False).count() == 4


def test_alter_bucket_width_and_group_by(ts, spark):
    ht, cagg = _setup(ts, spark)
    cagg.alter(bucket_width="6 hours", group_by=["kind"])
    got = cagg.read(realtime=False)
    assert set(got.columns) == {"bucket", "kind", "n"}
    assert got.count() == 16 * 2  # 96h / 6h buckets x 2 kinds
    assert got.agg(F.sum("n")).collect()[0][0] == 96


def test_alter_survives_later_dml_and_refresh(ts, spark):
    """Invalidation machinery is fully rewired to the new definition:
    post-migration inserts dirty the right ranges and refresh converges."""
    ht, cagg = _setup(ts, spark)
    cagg.alter(aggs={"n": "count(1)", "s": "sum(v)"})
    ht.insert(_rows(spark, 10, 5))  # lands inside materialized day 0
    cagg.refresh()
    got = {
        (r["bucket"], r["n"], r["s"])
        for r in cagg.read(realtime=False).collect()
    }
    exp = {
        (r["b"], r["n"], r["s"])
        for r in ht.df()
        .groupBy(F.date_trunc("day", "ts").alias("b"))
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("s"))
        .collect()
    }
    assert got == exp


def test_alter_keeps_refresh_policy_working(ts, spark):
    ht, cagg = _setup(ts, spark)
    ts.jobs.add_continuous_aggregate_policy(
        "daily", start_offset="7 days", end_offset=None,
        schedule_interval="1 hour",
    )
    cagg.alter(aggs={"n": "count(1)", "s": "sum(v)"})
    ht.insert(_rows(spark, 96, 4))
    # policy resolves the cagg BY NAME and must refresh the new definition
    jobs = [j for j in ts.catalog.bgw_job.read()
            if j.get("proc") == "policy_refresh_continuous_aggregate"]
    assert jobs and jobs[0]["config"]["cagg"] == "daily"
    ts.jobs.run_job(jobs[0]["id"])
    assert "s" in cagg.read(realtime=False).columns


def test_alter_refuses_with_dependent_cagg(ts, spark):
    ht, cagg = _setup(ts, spark)
    child = ts.create_cagg(
        "weekly", cagg.row["mat_table"], bucket_width="7 days",
        aggs={"n": "sum(n)"}, time_column="bucket",
    )
    with pytest.raises(ValueError, match="dependent"):
        cagg.alter(aggs={"n": "count(1)"})
