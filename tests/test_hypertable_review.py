"""Regressions for the round-7 hypertable review: space-bucket delete
holes, partition-column updates, fast-default NULL semantics, interval
validation, and after-row trigger coverage on non-insert DML."""

import os

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession

T0_US = 1704067200000000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _batch(spark, n=48, t0=T0_US):
    return spark.range(n).select(
        F.timestamp_micros(
            (F.lit(t0) + F.col("id") * 1_800_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 6).cast("int").alias("device"),
        F.col("id").cast("double").alias("value"),
    )


def test_delete_whole_space_bucket_really_deletes(ts, spark):
    """Deleting every row of one space bucket must remove its subdir —
    dynamic overwrite never touches a dir absent from its output."""
    ht = ts.create_hypertable(
        "sp", "ts", chunk_interval="1 day",
        space_column="device", num_partitions=4,
    )
    ht.insert(_batch(spark))
    before = ht.df().count()
    doomed = ht.df().filter(F.col("device") == 3).count()
    assert doomed > 0
    n = ht.delete_where("device = 3")
    assert n == doomed
    assert ht.df().count() == before - doomed
    assert ht.df().filter(F.col("device") == 3).count() == 0
    # and on disk: no _space subdir still holds the deleted rows
    assert ht.read(space_key=3).count() == 0


def test_merge_delete_whole_space_bucket(ts, spark):
    ht = ts.create_hypertable(
        "spm", "ts", chunk_interval="1 day",
        space_column="device", num_partitions=4,
    )
    ht.insert(_batch(spark, n=24))
    src = ht.df().filter(F.col("device") == 2).select("ts", "device", "value")
    st = ht.merge_into(
        src, ["ts", "device"], delete_matched=True, insert_not_matched=False
    )
    assert st["rows_deleted"] > 0
    assert ht.df().filter(F.col("device") == 2).count() == 0


def test_update_partition_column_rejected(ts, spark):
    ht = ts.create_hypertable("u", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=4))
    with pytest.raises(ValueError, match="partition column"):
        ht.update_where({"ts": F.expr("ts + interval 30 days")}, "value = 1.0")
    with pytest.raises(ValueError, match="partition column"):
        ts.sql("UPDATE u SET ts = ts WHERE value = 1.0")


def test_set_chunk_interval_validation(ts, spark):
    ht = ts.create_hypertable("iv", "ts", chunk_interval="1 day")
    with pytest.raises(ValueError, match="month-granular"):
        ht.set_chunk_time_interval("1 month")
    with pytest.raises(ValueError, match="positive"):
        ht.set_chunk_time_interval(0)


def test_failed_create_leaves_no_half_registration(ts, spark):
    with pytest.raises(ValueError, match="num_partitions"):
        ts.create_hypertable(
            "halfreg", "ts", chunk_interval="1 day",
            space_column="dev", num_partitions=0,
        )
    assert ts.catalog.hypertable.find_one(name="halfreg") is None
    # a corrected retry works
    ts.create_hypertable(
        "halfreg", "ts", chunk_interval="1 day",
        space_column="device", num_partitions=4,
    )


def test_explicit_null_after_add_column_stays_null(ts, spark):
    """PG fast-default semantics: rows inserted AFTER the ADD keep an
    explicitly-stored NULL; only pre-ADD rows read the default."""
    ht = ts.create_hypertable("fd", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=4))
    ht.add_column("site", "string", default="eu")
    # new row with explicit NULL routed into the PRE-EXISTING chunk
    from datetime import datetime

    ht.insert(
        spark.createDataFrame(
            [(datetime(2024, 1, 1, 12, 1), 1, 9.0, None)],
            "ts timestamp, device int, value double, site string",
        )
    )
    rows = {r["value"]: r["site"] for r in ht.df().collect()}
    assert rows[9.0] is None        # explicit NULL survives
    assert rows[0.0] == "eu"        # pre-ADD rows read the default


def test_after_row_fires_on_update_and_delete(ts, spark, tmp_path):
    import glob

    sink = str(tmp_path / "obs")
    os.makedirs(sink, exist_ok=True)
    ht = ts.create_hypertable("ar", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=8))

    def observe(pdf, _sink=sink):
        import uuid

        with open(os.path.join(_sink, uuid.uuid4().hex), "w") as f:
            f.write(str(len(pdf)))

    ht.create_trigger(
        "obs", observe, when="after_row", ops=("update", "delete")
    )
    n_upd = ht.update_where({"value": F.lit(-1.0)}, "device = 1")
    seen = sum(int(open(p).read()) for p in glob.glob(f"{sink}/*"))
    assert seen == n_upd
    for p in glob.glob(f"{sink}/*"):
        os.remove(p)
    n_del = ht.delete_where("device = 2")
    seen = sum(int(open(p).read()) for p in glob.glob(f"{sink}/*"))
    assert seen == n_del


def test_add_dimension_refuses_frozen(ts, spark):
    from timescaledb_spark.chunkops import freeze_chunk

    ht = ts.create_hypertable("adf", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=4))
    freeze_chunk(ht, ht.chunks()[0])
    with pytest.raises(PermissionError, match="frozen"):
        ht.add_dimension("device", 4)


def test_update_where_predicate_snapshot(spark, tmp_path):
    """Review fix: the WHERE predicate is evaluated ONCE on pre-update
    rows — a later assignment must not re-resolve it against mutated
    columns (result depended on dict order)."""
    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession

    ts = TSSession(spark, str(tmp_path / "uw"))
    ht = ts.create_hypertable("uw", "ts", chunk_interval="1 day")
    ht.insert(
        spark.createDataFrame(
            [("2024-01-01 00:00:00", 5, 0)], "ts string, x int, y int"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    n = ht.update_where({"x": "10", "y": "20"}, "x = 5")
    assert n == 1
    r = ht.read().first()
    assert (r["x"], r["y"]) == (10, 20)


def test_update_where_self_referential_triggers(spark, tmp_path):
    """x = x+1 with WHERE x = 5: the post-assignment frame no longer
    matches, but the row WAS updated — after-row observers must see it."""
    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession

    ts = TSSession(spark, str(tmp_path / "uw2"))
    ht = ts.create_hypertable("uw2", "ts", chunk_interval="1 day")
    ht.insert(
        spark.createDataFrame(
            [("2024-01-01 00:00:00", 5)], "ts string, x int"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
    )
    import glob
    import os

    sink = str(tmp_path / "ar_seen")
    os.makedirs(sink, exist_ok=True)

    def obs(pdf, _sink=sink):
        import uuid as _u

        with open(os.path.join(_sink, _u.uuid4().hex), "w") as f:
            f.write(str(len(pdf)))

    ht.create_trigger("obs", obs, when="after_row", ops=("update",))
    n = ht.update_where({"x": "x + 1"}, "x = 5")
    assert n == 1 and ht.read().first()["x"] == 6
    seen = sum(int(open(p).read()) for p in glob.glob(f"{sink}/*"))
    assert seen == 1


def test_upsert_drops_doomed_space_dir(spark, tmp_path):
    """Review fix: a replaced row whose new version hashes to another
    space bucket must not leave its stale copy in the old _space dir."""
    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession

    ts = TSSession(spark, str(tmp_path / "us"))
    ht = ts.create_hypertable(
        "us", "ts", chunk_interval="1 day", space_column="dev",
        num_partitions=4,
    )
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1, 0, 1.0)],
        "ts string, id int, dev int, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ht.insert(df)
    # replacement row, same key, different space value
    newdf = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1, 7, 2.0)],
        "ts string, id int, dev int, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ht.upsert(newdf, keys=["ts", "id"])
    rows = ht.read().collect()
    assert len(rows) == 1 and rows[0]["dev"] == 7 and rows[0]["v"] == 2.0


def test_merge_rejects_space_column_update(spark, tmp_path):
    import pytest as _pt

    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession

    ts = TSSession(spark, str(tmp_path / "ms"))
    ht = ts.create_hypertable(
        "ms", "ts", chunk_interval="1 day", space_column="dev",
        num_partitions=4,
    )
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1, 0, 1.0)],
        "ts string, id int, dev int, v double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ht.insert(df)
    with _pt.raises(ValueError, match="partition column"):
        ht.merge_into(df, ["ts", "id"], matched_update={"dev": "3"})


def test_delete_where_null_predicate_keeps_rows(ts, spark):
    """SQL DELETE semantics: a WHERE that evaluates to NULL keeps the
    row (r17 — the pre-fused path filtered kept with a bare ~cond, so
    NULL-cond rows were silently dropped from the rewrite without being
    counted as deleted; update_where already coalesced)."""
    ht = ts.create_hypertable("nd", "ts", chunk_interval="1 day")
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", 1.0),
            ("2024-01-01 01:00:00", None),
            ("2024-01-01 02:00:00", 5.0),
        ],
        "ts string, value double",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    ht.insert(df)
    # value > 2 is NULL for the NULL-valued row: only 5.0 deletes
    n = ht.delete_where("value > 2")
    assert n == 1
    vals = sorted(
        (r["value"] for r in ht.read().collect()),
        key=lambda v: (v is None, v),
    )
    assert vals == [1.0, None]


def test_delete_where_fused_survivors_drop_emptied_chunk(ts, spark):
    """The per-chunk gating pass must report fully-doomed chunks so
    their dirs drop without a separate kept-side scan (r17 fusion)."""
    ht = ts.create_hypertable("fd", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=96))  # 96 half-hourly rows -> 2 day chunks
    chunks_before = len(ht.chunks())
    assert chunks_before == 2
    # doom every row of day 1 (values 0..47)
    n = ht.delete_where("value < 48")
    assert n == 48
    assert len(ht.chunks()) == 1
    assert ht.read().count() == 48


def test_merge_delete_fused_survivors(ts, spark):
    """delete_matched merge on a plain table: the surviving-chunk set
    rides the gating aggregate (r17) — emptied chunks still drop and
    counts are unchanged."""
    ht = ts.create_hypertable("md", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=96))  # 2 day chunks
    # source = every row of day 1 (values 0..47): deleting empties chunk 1
    src = ht.df().filter(F.col("value") < 48).select("ts", "device", "value")
    st = ht.merge_into(
        src, ["ts", "device"], delete_matched=True, insert_not_matched=False
    )
    assert st["rows_deleted"] == 48
    assert ht.read().count() == 48
    assert len(ht.chunks()) == 1
