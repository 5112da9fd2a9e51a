"""Regressions for the round-7 review findings in jobs + SQL admin:
scheduler-stalling alter_job, duplicate policies, MERGE parsing with
keyword-bearing literals, non-column MERGE keys, and run_job failure
reporting."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0_US = 1704067200000000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _ht(ts, spark, name="m", n=24):
    ht = ts.create_hypertable(name, "ts", chunk_interval="1 day")
    ht.insert(
        spark.range(n).select(
            F.timestamp_micros(
                (F.lit(T0_US) + F.col("id") * 3600 * 1_000_000).cast("long")
            ).alias("ts"),
            F.col("id").alias("k"),
            (F.col("id") * 1.0).alias("value"),
        )
    )
    return ht


def test_alter_job_timestamp_next_start_does_not_stall_scheduler(ts, spark):
    _ht(ts, spark)
    ts.jobs.add_retention_policy("m", drop_after="90 days")
    job_id = ts.jobs.list()[0]["id"]
    ts.sql(
        f"SELECT alter_job({job_id}, "
        f"next_start => TIMESTAMP '2020-01-01 00:00:00')"
    )
    st = ts.catalog.bgw_job_stat.find_one(job_id=job_id)
    assert isinstance(st["next_start"], float)  # epoch seconds, not text
    # the tick must run (next_start is in the past), not TypeError
    out = ts.jobs.run_pending()
    assert len(out) == 1


def test_duplicate_policy_different_params_raises(ts, spark):
    _ht(ts, spark)
    ts.jobs.add_retention_policy("m", drop_after="90 days")
    with pytest.raises(ValueError, match="already exists"):
        ts.jobs.add_retention_policy("m", drop_after="30 days")
    # but a second hypertable gets its own policy
    _ht(ts, spark, name="m2")
    ts.jobs.add_retention_policy("m2", drop_after="30 days")
    assert len(ts.jobs.list()) == 2


def test_run_job_sql_reports_failure(ts, spark):
    def boom(ts_, config):
        raise RuntimeError("payload exploded")

    ts.jobs.register_proc("boom", boom)
    job_id = ts.jobs.add_job("boom", "1 hour")
    row = ts.sql(f"SELECT run_job({job_id})").collect()[0]
    assert "failed" in row["status"] and "exploded" in row["status"]


def test_merge_literal_containing_keywords(ts, spark):
    ht = _ht(ts, spark, n=4)
    ts.sql("""
        MERGE INTO m t
        USING (SELECT ts, k, value FROM m WHERE k < 2) s
        ON t.k = s.k AND t.ts = s.ts
        WHEN MATCHED THEN UPDATE SET value = 0.0
    """)
    # literals containing 'when'/'matched'/'and' must not break parsing:
    # add a string column via schema evolution first
    ht.add_column("note", "string")
    ts.sql("""
        MERGE INTO m t
        USING (SELECT ts, k FROM m WHERE k = 3) s
        ON t.k = s.k AND t.ts = s.ts
        WHEN MATCHED THEN UPDATE SET note = 'updated when matched and more'
    """)
    got = ht.df().filter(F.col("k") == 3).collect()[0]["note"]
    assert got == "updated when matched and more"


def test_merge_on_expression_rejected(ts, spark):
    _ht(ts, spark, n=4)
    with pytest.raises(ValueError, match="plain column"):
        ts.sql("""
            MERGE INTO m t
            USING (SELECT ts, k, value FROM m) s
            ON t.k = abs(s.k)
            WHEN MATCHED THEN UPDATE SET value = 0.0
        """)


def test_create_hypertable_if_not_exists_sql(ts, spark):
    _ht(ts, spark)
    # idempotent setup script: second call must no-op, not raise
    ts.sql(
        "SELECT create_hypertable('m', 'ts', if_not_exists => true)"
    )
    with pytest.raises(ValueError, match="already exists"):
        ts.sql("SELECT create_hypertable('m', 'ts')")


# --- sqlapi/sqlgapfill review regressions -----------------------------------

def test_literal_embedded_predicates_never_prune(ts, spark):
    """Predicate-looking text INSIDE a string literal must not drive
    chunk exclusion."""
    ht = _ht(ts, spark)
    ht.add_column("note", "string")
    total = ts.sql("SELECT count(*) AS n FROM m").collect()[0]["n"]
    got = ts.sql(
        "SELECT count(*) AS n FROM m WHERE note IS NULL "
        "AND 'ts > ''2030-01-01''' != 'x'"
    ).collect()[0]["n"]
    assert got == total


def test_string_space_key_prunes(ts, spark):
    ht = ts.create_hypertable(
        "sk", "ts", chunk_interval="1 day",
        space_column="loc", num_partitions=4,
    )
    ht.insert(
        spark.range(24).select(
            F.timestamp_micros(
                (F.lit(T0_US) + F.col("id") * 3600 * 1_000_000).cast("long")
            ).alias("ts"),
            F.concat(F.lit("loc_"), (F.col("id") % 3).cast("string")).alias("loc"),
            F.col("id").cast("double").alias("value"),
        )
    )
    got = ts.sql(
        "SELECT count(*) AS n FROM sk WHERE loc = 'loc_1'"
    ).collect()[0]["n"]
    assert got == 8


def test_gapfill_group_by_unselected_column_errors(ts, spark):
    _ht(ts, spark)
    with pytest.raises(ValueError, match="must appear in the SELECT"):
        ts.sql(
            "SELECT time_bucket_gapfill('1 hour', ts) AS b, "
            "locf(avg(value)) AS a FROM m "
            "WHERE ts >= '2024-01-01' AND ts < '2024-01-02' "
            "GROUP BY b, device"
        )


def test_gapfill_alias_qualified_where_bounds(ts, spark):
    _ht(ts, spark)
    rows = ts.sql(
        "SELECT time_bucket_gapfill('1 hour', ts) AS b, k, "
        "locf(avg(value)) AS a FROM m r "
        "WHERE r.ts >= '2024-01-01' AND r.ts < '2024-01-02' "
        "GROUP BY b, k"
    ).collect()
    assert len(rows) == 24 * 24  # 24 hourly buckets x 24 distinct k


def test_gapfill_group_alias_honored(ts, spark):
    _ht(ts, spark)
    rows = ts.sql(
        "SELECT time_bucket_gapfill('1 hour', ts) AS b, k AS d, "
        "locf(avg(value)) AS a FROM m "
        "WHERE ts >= '2024-01-01' AND ts < '2024-01-02' "
        "GROUP BY b, d ORDER BY d, b"
    ).collect()
    assert rows and "d" in rows[0].asDict()


def test_backslash_escaped_literal_keeps_macros(ts, spark):
    _ht(ts, spark)
    ht = ts.get_hypertable("m")
    ht.add_column("note", "string")
    rows = ts.sql(
        "SELECT time_bucket('1 day', ts) AS b, first(value, ts) AS f "
        "FROM m WHERE note IS NULL OR note = 'it\\'s' GROUP BY b ORDER BY b"
    ).collect()
    assert rows[0]["f"] == 0.0  # min_by semantics, not Spark's first()
