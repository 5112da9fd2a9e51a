"""SQL-callable coverage for the rest of the reference admin surface:
chunk ops (merge/split/reorder), chunk skipping, compression stats,
dimension DDL with by_hash, job API, policies-v2, integer-now, and the
UUIDv7 scalar family (sql/ddl_api.sql, sql/job_api.sql, sql/policy_api.sql,
sql/uuidv7.sql, sql/size_utils.sql)."""

import pytest

from timescaledb_spark.session import TSSession


@pytest.fixture()
def ts(spark, tmp_path):
    s = TSSession(spark, str(tmp_path / "ts"))
    s.sql(
        "SELECT create_hypertable('e', 'ts', chunk_time_interval => INTERVAL '1 day')"
    )
    s.sql(
        "INSERT INTO e (ts, dev, v) SELECT timestamp '2024-01-01' + "
        "make_interval(0,0,0,CAST(id % 4 AS INT),0,0,0), CAST(id % 3 AS INT), "
        "CAST(id AS DOUBLE) FROM range(40)"
    )
    return s


def _chunks(ts):
    return [r[0] for r in ts.sql("SELECT show_chunks('e')").collect()]


def test_merge_split_reorder_sql(ts):
    ch = _chunks(ts)
    assert len(ch) == 4
    merged = ts.sql(f"SELECT merge_chunks('{ch[0]}', '{ch[1]}')").collect()[0]
    assert merged["range_end"] - merged["range_start"] == 2 * 86_400_000_000
    assert len(_chunks(ts)) == 3
    parts = ts.sql(
        f"SELECT split_chunk('{merged['chunk_name']}', split_at => '2024-01-02')"
    ).collect()
    assert len(parts) == 2
    assert len(_chunks(ts)) == 4
    r = ts.sql(f"SELECT reorder_chunk('{_chunks(ts)[0]}', 'dev, ts')").collect()
    assert r[0]["reordered"] is True
    assert ts.sql("SELECT count(*) AS n FROM e").collect()[0][0] == 40


def test_merge_chunks_concurrently_alias(ts):
    ch = _chunks(ts)
    ts.sql(f"SELECT merge_chunks_concurrently('{ch[2]}', '{ch[3]}')")
    assert len(_chunks(ts)) == 3


def test_chunk_skipping_sql(ts):
    assert ts.sql("SELECT enable_chunk_skipping('e', 'v')").collect()[0][0] == 4
    assert ts.sql("SELECT disable_chunk_skipping('e', 'v')").collect()[0][0] == 4


def test_compression_stats_sql(ts):
    ts.sql(
        "ALTER TABLE e SET (timescaledb.compress, "
        "timescaledb.compress_segmentby = 'dev', "
        "timescaledb.compress_orderby = 'ts')"
    )
    ch = _chunks(ts)
    ts.sql(f"SELECT compress_chunk('{ch[0]}')")
    rows = ts.sql("SELECT chunk_compression_stats('e')").collect()
    assert len(rows) == 1 and rows[0]["before_compression_total_bytes"] > 0
    tot = ts.sql("SELECT hypertable_compression_stats('e')").collect()[0]
    assert tot["total_chunks"] == 1
    # columnstore-named aliases resolve to the same handlers
    assert ts.sql("SELECT hypertable_columnstore_stats('e')").collect()[0][0] == 1
    assert ts.sql("SELECT hypertable_index_size('e')").collect()[0][0] == 0
    assert (
        ts.sql("SELECT hypertable_approximate_size('e')").collect()[0][0] > 0
    )


def test_add_dimension_by_hash_sql(ts):
    ts.sql(
        "SELECT create_hypertable('f', 'ts', chunk_time_interval => INTERVAL '1 day')"
    )
    r = ts.sql("SELECT add_dimension('f', by_hash('dev', 4))").collect()[0]
    assert (r["column_name"], r["num_partitions"]) == ("dev", 4)
    with pytest.raises(ValueError):
        ts.sql("SELECT add_dimension('f', by_range('v', INTERVAL '1 day'))")


def test_job_api_sql(ts):
    jid = ts.sql(
        "SELECT add_job('policy_retention', INTERVAL '1 hour', "
        "config => '{\"hypertable\": \"e\", \"drop_after\": \"30 days\"}')"
    ).collect()[0][0]
    assert jid >= 1
    r = ts.sql(f"SELECT alter_job({jid}, scheduled => false)").collect()[0]
    assert r["scheduled"] is False
    assert ts.sql(f"SELECT run_job({jid})").collect()[0]["status"] == "ok"
    assert ts.sql(f"SELECT delete_job({jid})").collect()[0][0] is True


def test_policies_v2_sql(ts, spark):
    ts.sql(
        "CREATE MATERIALIZED VIEW daily WITH (timescaledb.continuous) AS "
        "SELECT time_bucket(INTERVAL '1 day', ts) AS bucket, count(*) AS n "
        "FROM e GROUP BY 1"
    )
    ok = ts.sql(
        "SELECT add_policies('daily', refresh_start_offset => '7 days', "
        "refresh_end_offset => '1 hour')"
    ).collect()[0][0]
    assert ok is True
    pols = ts.sql("SELECT show_policies('daily')").collect()
    assert any(
        p["policy_name"] == "policy_refresh_continuous_aggregate" for p in pols
    )
    assert ts.sql("SELECT remove_all_policies('daily')").collect()[0][0] is True
    assert ts.sql("SELECT show_policies('daily')").count() == 0


def test_set_integer_now_func_sql(ts):
    ts.sql("SELECT create_hypertable('g', 'tick', chunk_time_interval => 100)")
    ts.sql(
        "INSERT INTO g (tick, v) SELECT id, CAST(id AS DOUBLE) FROM range(250)"
    )
    r = ts.sql("SELECT set_integer_now_func('g', '250')").collect()[0]
    assert r["now_expr"] == "250"
    # the stored expr drives integer-time retention cutoffs
    assert ts.jobs._integer_now["g"]() == 250


def test_uuidv7_scalars_sql(ts):
    row = ts.sql(
        "SELECT to_uuidv7_boundary(timestamp '2024-01-01') AS b, "
        "uuid_version(to_uuidv7(timestamp '2024-01-01')) AS ver, "
        "uuid_timestamp_micros(to_uuidv7(timestamp '2024-01-02 03:04:05.123456')) AS us"
    ).collect()[0]
    assert row["b"].endswith("-7000-8000-000000000000")
    assert row["ver"] == 7
    # 12-bit sub-ms field floors to within 1 µs
    assert abs(row["us"] - 1704164645123456) <= 1
    g = ts.sql(
        "SELECT generate_uuidv7() AS u1, generate_uuidv7() AS u2"
    ).collect()[0]
    assert g["u1"] != g["u2"] and g["u1"][14] == "7"


def test_truncate_hypertable(ts, spark):
    """TRUNCATE (test/sql/truncate.sql): drops every chunk, keeps the
    hypertable usable; caggs are invalidated over the whole range so a
    refresh empties them."""
    from pyspark.sql import functions as F

    ts.sql(
        "SELECT create_hypertable('tr', 'ts', chunk_time_interval => INTERVAL '1 day')"
    )
    ts.sql(
        "INSERT INTO tr (ts, v) SELECT timestamp '2024-01-01' + "
        "make_interval(0,0,0,0,CAST(id AS INT),0,0), CAST(id AS DOUBLE) FROM range(48)"
    )
    ht = ts.get_hypertable("tr")
    cagg = ts.create_cagg("trd", "tr", bucket_width="1 day", aggs={"n": "count(1)"})
    cagg.refresh()
    assert cagg.read(realtime=False).count() == 2
    assert len(ht.chunks()) == 2
    r = ts.sql("TRUNCATE tr").collect()[0]
    assert r["chunks_dropped"] == 2
    assert len(ht.chunks()) == 0
    assert ht.df().count() == 0
    # table stays writable, and the cagg converges to empty on refresh
    ts.sql("INSERT INTO tr (ts, v) SELECT timestamp '2024-03-01', 1.0")
    assert ht.df().count() == 1
    cagg.refresh()
    got = cagg.read(realtime=False).collect()
    assert len(got) == 1 and got[0]["n"] == 1


def test_truncate_refuses_frozen_chunk(ts, spark):
    ts.sql(
        "SELECT create_hypertable('trf', 'ts', chunk_time_interval => INTERVAL '1 day')"
    )
    ts.sql("INSERT INTO trf (ts, v) SELECT timestamp '2024-01-01', 1.0")
    ht = ts.get_hypertable("trf")
    from timescaledb_spark.chunkops import freeze_chunk

    freeze_chunk(ht, ht.chunks()[0])
    import pytest as _pt

    with _pt.raises(PermissionError):
        ht.truncate()


def test_interval_bound_rejected_on_integer_dim(ts):
    """Review fix: an INTERVAL older_than on an integer time dimension
    must error (wall-clock microseconds would match every chunk and
    silently drop all data)."""
    from pyspark.sql import functions as F

    ht = ts.create_hypertable("intdim", "k", chunk_interval=100)
    ht.insert(ts.spark.range(300).select(F.col("id").alias("k")))
    with pytest.raises(ValueError, match="integer time dimension"):
        ts.sql("SELECT drop_chunks('intdim', older_than => INTERVAL '1 day')")
    # absolute integer bound still works
    dropped = ts.sql("SELECT drop_chunks('intdim', older_than => 100)").count()
    assert dropped == 1 and ht.df().count() == 200


def test_alter_add_column_pg_types(ts):
    from pyspark.sql import functions as F

    ht = ts.create_hypertable("addty", "ts", chunk_interval="1 day")
    ht.insert(
        ts.spark.createDataFrame(
            [("2024-01-01 00:00:00", 1.0)], "ts string, v double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    ts.sql("ALTER TABLE addty ADD COLUMN note TEXT")
    ts.sql("ALTER TABLE addty ADD COLUMN cnt INT8 NOT NULL DEFAULT 7")
    row = ts.get_hypertable("addty").read().first()  # fresh catalog view
    assert row["note"] is None and row["cnt"] == 7


def test_merge_case_when_in_set(ts, spark):
    from pyspark.sql import functions as F

    ht = ts.create_hypertable("mcase", "ts", chunk_interval="1 day")
    ht.insert(
        spark.createDataFrame(
            [("2024-01-01 00:00:00", 1, 5.0)], "ts string, id int, v double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    ts.create_table(
        "msrc",
        spark.createDataFrame(
            [("2024-01-01 00:00:00", 1, 3.0)], "ts string, id int, v double"
        ).withColumn("ts", F.col("ts").cast("timestamp")),
    )
    ts.sql(
        "MERGE INTO mcase t USING msrc s ON t.ts = s.ts AND t.id = s.id "
        "WHEN MATCHED THEN UPDATE SET v = CASE WHEN excluded.v > target.v "
        "THEN excluded.v ELSE target.v END"
    )
    assert ht.read().first()["v"] == 5.0  # max(5, 3)


def test_merge_insert_values_renamed_source_key(ts, spark):
    """Review fix: INSERT VALUES referencing the ORIGINAL source column
    name works when the ON clause maps it to a different target name."""
    from pyspark.sql import functions as F

    ht = ts.create_hypertable("mren", "ts", chunk_interval="1 day")
    ht.insert(
        spark.createDataFrame(
            [("2024-01-01 00:00:00", 1, 5.0)], "ts string, id int, v double"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    ts.create_table(
        "mrsrc",
        spark.createDataFrame(
            [("2024-01-02 00:00:00", 9, 2.0)],
            "ts string, sensor int, val double",
        ).withColumn("ts", F.col("ts").cast("timestamp")),
    )
    ts.sql(
        "MERGE INTO mren t USING mrsrc s ON t.ts = s.ts AND t.id = s.sensor "
        "WHEN NOT MATCHED THEN INSERT (ts, id, v) VALUES (s.ts, s.sensor, s.val)"
    )
    rows = {r["id"]: r["v"] for r in ht.read().collect()}
    assert rows == {1: 5.0, 9: 2.0}


def test_alter_job_positional_interval_and_bad_arg(ts):
    ts.jobs.register_proc("noop2", lambda _ts, _cfg: None)
    jid = ts.jobs.add_job("noop2", schedule_interval=3600)
    ts.sql(f"SELECT alter_job({jid}, INTERVAL '2 hours')").collect()
    job = next(j for j in ts.jobs.list() if j["id"] == jid)
    assert float(job["schedule_interval"]) == 7200.0
    with pytest.raises(ValueError, match="cannot parse"):
        ts.sql(f"SELECT alter_job({jid}, INTERVAL '1 hour', whatever)").collect()


def test_copy_text_format_nulls(ts, tmp_path):
    p = str(tmp_path / "in.tsv")
    with open(p, "w") as f:
        f.write("2024-01-01 00:00:00\t\\N\t\"quoted\"\n")
        f.write("2024-01-02 00:00:00\t2\tplain\n")
    ts.sql("CREATE TABLE cpt (ts TIMESTAMP NOT NULL, n INT, s TEXT)")
    ts.sql("SELECT create_hypertable('cpt', 'ts')")
    ts.sql(f"COPY cpt FROM '{p}'")
    rows = {str(r["ts"]): (r["n"], r["s"]) for r in ts.get_hypertable("cpt").read().collect()}
    assert rows["2024-01-01 00:00:00"] == (None, '"quoted"')  # quote is DATA
    assert rows["2024-01-02 00:00:00"] == (2, "plain")
