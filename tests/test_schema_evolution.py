"""ALTER TABLE ADD/DROP COLUMN on hypertables (reference propagates the
DDL to chunks, src/process_utility.c + test/sql/alter.sql; here: lazy
PG-fast-default semantics — no chunk rewrite, reads fill the default for
pre-ALTER files, rewrites materialize it)."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.compression import compress_chunks, enable_columnstore
from timescaledb_spark.chunkops import merge_chunks, split_chunk
from timescaledb_spark.session import TSSession

T0 = "2024-01-01"


@pytest.fixture()
def ht(spark, tmp_path):
    ts = TSSession(spark, str(tmp_path / "se"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    df = spark.range(6 * 24).select(
        F.timestamp_micros(
            (F.lit(1704067200000000) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 4).cast("int").alias("device"),
        F.col("id").cast("double").alias("value"),
    )
    ht.insert(df)
    return ht


def test_add_column_default_fill(ht):
    n = ht.read().count()
    ht.add_column("site", "string", default="eu")
    got = ht.read()
    assert got.filter("site = 'eu'").count() == n
    assert got.filter("site IS NULL").count() == 0


def test_add_column_no_default_reads_null(ht):
    ht.add_column("note", "string")
    assert ht.read().filter("note IS NULL").count() == ht.read().count()


def test_insert_without_new_column_gets_default(ht, spark):
    ht.add_column("site", "string", default="eu")
    late = spark.createDataFrame(
        [("2024-01-07 01:00:00", 1, 7.0)], "ts string, device int, value double"
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    ht.insert(late)
    assert ht.read().filter("site IS NULL").count() == 0
    # explicit value sticks
    late2 = late.select(
        (F.col("ts") + F.expr("INTERVAL 2 HOURS")).alias("ts"),
        "device", "value", F.lit("us").alias("site"),
    )
    ht.insert(late2)
    assert ht.read().filter("site = 'us'").count() == 1


def test_upsert_after_add_rewrites_and_keeps_default(ht, spark):
    ht.add_column("site", "string", default="eu")
    up = spark.createDataFrame(
        [("2024-01-02 05:00:00", 9, 0.0)], "ts string, device int, value double"
    ).select(F.col("ts").cast("timestamp"), "device", "value")
    ht.upsert(up, keys=["ts", "device"])
    got = ht.read()
    assert got.filter("site IS NULL").count() == 0
    assert got.filter("device = 9").count() == 1


def test_compress_merge_split_preserve_default(ht):
    ht.add_column("site", "string", default="eu")
    n = ht.read().count()
    enable_columnstore(ht, segmentby=["device"], orderby=[("ts", "asc")])
    compress_chunks(ht)
    assert ht.read().filter("site = 'eu'").count() == n
    chunks = ht.chunks()
    merge_chunks(ht, [chunks[0], chunks[1]])
    split_chunk(ht, ht.chunks()[0], at="2024-01-01 12:00:00")
    got = ht.read()
    assert got.count() == n and got.filter("site = 'eu'").count() == n


def test_update_where_on_added_column(ht):
    ht.add_column("site", "string", default="eu")
    changed = ht.update_where({"site": "'us'"}, "device = 0")
    got = ht.read()
    assert got.filter("site = 'us'").count() == changed
    assert got.filter("site IS NULL").count() == 0


def test_drop_column(ht):
    ht.add_column("site", "string", default="eu")
    ht.drop_column("site")
    assert "site" not in ht.read().columns
    with pytest.raises(ValueError):
        ht.drop_column("ts")


def test_alter_sql_forms(ht):
    ts = ht.ts
    ts.sql("ALTER TABLE m ADD COLUMN site string DEFAULT 'eu'").collect()
    assert ts.sql("SELECT count(*) AS n FROM m WHERE site = 'eu'").first()["n"] > 0
    ts.sql("ALTER TABLE m ADD COLUMN score double DEFAULT 1.5").collect()
    assert ts.sql("SELECT count(*) AS n FROM m WHERE score = 1.5").first()["n"] > 0
    ts.sql("ALTER TABLE m DROP COLUMN site").collect()
    assert "site" not in ts.sql("SELECT * FROM m").columns


def test_pruned_read_after_alter_still_prunes(ht):
    from timescaledb_spark.plans import scanned_paths

    ht.add_column("site", "string", default="eu")
    pruned = ht.read(start="2024-01-02", end="2024-01-04")
    assert scanned_paths(pruned) == 2
    assert pruned.filter("site = 'eu'").count() == pruned.count()


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ren"))


def _batch(spark, n=48):
    return spark.range(n).select(
        F.timestamp_micros(
            (F.lit(1704067200000000) + F.col("id") * 3600 * 1_000_000).cast(
                "long"
            )
        ).alias("ts"),
        F.col("id").alias("k"),
        F.col("id").cast("double").alias("value"),
    )


def test_rename_column_rewrites_and_reads(ts, spark):
    """ALTER TABLE .. RENAME COLUMN: parquet binds by name, so the
    rename rewrites chunks once; afterwards reads, inserts, and stat
    machinery all speak the new name."""
    ht = ts.create_hypertable("t_ren", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=48))
    ht.enable_chunk_skipping("value")
    ht.rename_column("value", "reading")
    assert "reading" in ht.df().columns and "value" not in ht.df().columns
    assert ht.df().agg(F.sum("reading")).collect()[0][0] == sum(
        float(i) for i in range(48)
    )
    # old-name stats are gone; ANALYZE restores under the new name
    assert ht.row["skip_columns"] == ["reading"]
    ht.analyze()
    stats = ts.catalog.chunk_column_stats.find(hypertable_id=ht.id)
    assert stats and all(s["column"] == "reading" for s in stats)
    # inserts speak the new schema
    ht.insert(
        _batch(spark, n=2).withColumnRenamed("value", "reading")
    )
    assert ht.df().count() == 50


def test_rename_time_column(ts, spark):
    ht = ts.create_hypertable("t_ren_t", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=24))
    ht.rename_column("ts", "event_time")
    assert ht.time_column == "event_time"
    assert ht.read(start="2024-01-01", end="2024-01-02").count() == 24
    ht.insert(
        _batch(spark, n=2).withColumnRenamed("ts", "event_time")
    )
    assert ht.df().count() == 26


def test_rename_conflicts_rejected(ts, spark):
    ht = ts.create_hypertable("t_ren_x", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=4))
    with pytest.raises(ValueError, match="already exists"):
        ht.rename_column("value", "k")
    with pytest.raises(ValueError, match="no column"):
        ht.rename_column("nope", "x")


def test_rename_sql_surface(ts, spark):
    ht = ts.create_hypertable("t_ren_sql", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=24))
    ts.sql("ALTER TABLE t_ren_sql RENAME COLUMN value TO v2")
    got = ts.sql("SELECT sum(v2) AS s FROM t_ren_sql").collect()[0]["s"]
    assert got == sum(float(i) for i in range(24))


def test_rename_hypertable(ts, spark):
    """ALTER TABLE .. RENAME TO: catalog + directory move, no data
    rewrite; policy job configs follow the new name."""
    ht = ts.create_hypertable("t_old", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=24))
    ts.jobs.add_retention_policy("t_old", drop_after="90 days")
    ht.rename_to("t_new")
    assert ht.name == "t_new"
    got = ts.get_hypertable("t_new")
    assert got.df().count() == 24
    with pytest.raises(Exception):
        ts.get_hypertable("t_old")
    jobs = [
        j for j in ts.catalog.bgw_job.read()
        if (j.get("config") or {}).get("hypertable") == "t_new"
    ]
    assert jobs, "retention policy did not follow the rename"
    # SQL surface + further DML on the new name
    ht.insert(_batch(spark, n=2))
    assert ts.sql("SELECT count(*) AS n FROM t_new").collect()[0]["n"] == 26


def test_rename_hypertable_sql_and_conflicts(ts, spark):
    ht = ts.create_hypertable("t_a", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=4))
    ts.create_hypertable("t_b", "ts", chunk_interval="1 day")
    with pytest.raises(ValueError, match="already exists"):
        ht.rename_to("t_b")
    ts.sql("ALTER TABLE t_a RENAME TO t_c")
    assert ts.sql("SELECT count(*) AS n FROM t_c").collect()[0]["n"] == 4


def test_rename_downgrades_columnstore_and_refuses_frozen(ts, spark):
    from timescaledb_spark.chunkops import freeze_chunk, unfreeze_chunk
    from timescaledb_spark.compression import compress_chunk, enable_columnstore

    ht = ts.create_hypertable("t_ren_cs", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=24))
    enable_columnstore(ht, segmentby=["k"], orderby=[("ts", "asc")])
    compress_chunk(ht, ht.chunks()[0])
    assert ht.chunks()[0]["status"] == "columnstore"
    freeze_chunk(ht, ht.chunks()[0])
    with pytest.raises(PermissionError, match="frozen"):
        ht.rename_column("value", "v2")
    unfreeze_chunk(ht, ht.chunks()[0])
    ht.rename_column("value", "v2")
    # rewrite destroyed the clustering: status downgraded, stats dropped
    assert ht.chunks()[0]["status"] == "rowstore"
    assert ts.catalog.chunk_column_stats.find(hypertable_id=ht.id) == []
    assert ht.df().agg(F.sum("v2")).collect()[0][0] == sum(range(24))
