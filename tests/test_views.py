"""timescaledb_information.* views and size utils over a live catalog."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark import views
from timescaledb_spark.session import TSSession

T0_US = 1704067200000000


@pytest.fixture()
def ts(spark, tmp_path):
    t = TSSession(spark, str(tmp_path / "ts"))
    ht = t.create_hypertable("m", "ts", chunk_interval="1 day", space_column="dev", num_partitions=4)
    df = spark.range(72).select(
        F.timestamp_micros((F.lit(T0_US) + F.col("id") * 3600 * 1_000_000).cast("long")).alias("ts"),
        (F.col("id") % 4).cast("int").alias("dev"),
        F.col("id").cast("double").alias("v"),
    )
    ht.insert(df)
    t.create_cagg("md", "m", bucket_width="1 day", aggs={"n": "count(1)"})
    t.jobs.add_retention_policy("m", drop_after="90 days")
    return t


def test_hypertables_view(ts):
    rows = {r["hypertable_name"]: r for r in views.hypertables(ts).collect()}
    assert rows["m"]["num_dimensions"] == 2
    assert rows["m"]["num_chunks"] == 3
    assert rows["m"]["compression_enabled"] is False
    assert "_mat_md" in rows  # materialization hypertable is itself a hypertable


def test_chunks_and_dimensions_views(ts):
    ch = views.chunks(ts, hypertable="m").collect()
    assert len(ch) == 3 and all(not r["is_compressed"] for r in ch)
    dims = {
        (r["hypertable_name"], r["column_name"]): r
        for r in views.dimensions(ts).collect()
    }
    assert dims[("m", "ts")]["dimension_type"] == "Time"
    assert dims[("m", "dev")]["dimension_type"] == "Space"
    assert dims[("m", "dev")]["num_partitions"] == 4


def test_cagg_and_jobs_views(ts):
    caggs = views.continuous_aggregates(ts).collect()
    assert caggs[0]["view_name"] == "md" and caggs[0]["watermark"] is None
    jobs = views.jobs(ts).collect()
    assert jobs[0]["proc_name"] == "policy_retention"
    ts.jobs.run_job(jobs[0]["job_id"], now=1.0)
    st = views.job_stats(ts).collect()[0]
    assert st["total_runs"] == 1 and st["last_run_status"] == "Success"
    hist = views.job_history(ts).collect()
    assert len(hist) == 1 and hist[0]["success"]


def test_size_utils(ts):
    ht = ts.get_hypertable("m")
    per_chunk = views.chunks_detailed_size(ht)
    assert len(per_chunk) == 3
    assert all(c["total_bytes"] > 0 for c in per_chunk)
    total = views.hypertable_detailed_size(ht)
    assert total["num_chunks"] == 3
    assert total["table_bytes"] == sum(c["total_bytes"] for c in per_chunk)
    assert ht.approximate_row_count() == 72


def test_compression_settings_views(ts):
    from timescaledb_spark.compression import enable_columnstore

    enable_columnstore(ts.get_hypertable("m"), segmentby=["dev"], orderby=[("ts", "asc")])
    hs = views.hypertable_compression_settings(ts).collect()
    assert any(r["hypertable_name"] == "m" and r["segmentby"] == "dev" for r in hs)
    cs = views.chunk_compression_settings(ts).collect()
    assert len([r for r in cs if r["hypertable_name"] == "m"]) == 3
    # columnstore-era aliases resolve to the same views
    assert views.hypertable_columnstore_settings(ts).count() == len(hs)
    assert views.chunk_columnstore_settings(ts).count() == len(cs)


def test_job_errors_view(ts):
    jid = ts.jobs.add_job(
        "policy_retention", "1 hour",
        config={"hypertable": "missing_tbl", "drop_after": "1 day"},
    )
    res = ts.jobs.run_job(jid)
    assert res["success"] is False  # job isolation: recorded, not raised
    errs = views.job_errors(ts).collect()
    assert len(errs) == 1 and errs[0]["job_id"] == jid
    assert "missing_tbl" in (errs[0]["error"] or "")


def test_info_views_sql_surface(ts):
    got = ts.sql(
        "SELECT hypertable_name FROM timescaledb_information.chunk_compression_settings"
    )
    assert got.count() == 0  # compression not enabled in this fixture path
    assert ts.sql(
        "SELECT count(*) AS n FROM timescaledb_information.job_errors"
    ).collect()[0][0] == 0
