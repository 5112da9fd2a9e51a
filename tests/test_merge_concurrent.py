"""merge_chunks_concurrently (sql/maintenance_utils.sql:76): the online
chunk merge. While the heavy rewrite phase runs, DML on UNRELATED chunks
must proceed; DML into the merging range is refused (frozen), like DML
into a tiered chunk. The reference gets this from a lowered lock level
on the participating chunks only."""

import threading

import pytest
from pyspark.sql import functions as F

from timescaledb_spark import chunkops
from timescaledb_spark.session import TSSession

T0_US = 1704067200000000
DAY_US = 86_400 * 1_000_000


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _batch(spark, n=96, t0=T0_US):
    return spark.range(n).select(
        F.timestamp_micros(
            (F.lit(t0) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        F.col("id").alias("k"),
        (F.col("id") * 1.0).alias("value"),
    )


def test_dml_on_unrelated_chunk_proceeds_during_merge(ts, spark, monkeypatch):
    ht = ts.create_hypertable("t_cm", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark))  # 4 day-chunks
    chunks = ht.chunks()
    assert len(chunks) == 4

    in_rewrite = threading.Event()
    release = threading.Event()
    real_rewrite = chunkops._merge_rewrite

    def slow_rewrite(ht_, cs, tmp):
        in_rewrite.set()
        assert release.wait(60), "test never released the rewrite"
        return real_rewrite(ht_, cs, tmp)

    monkeypatch.setattr(chunkops, "_merge_rewrite", slow_rewrite)

    result: dict = {}

    def run_merge():
        result["row"] = chunkops.merge_chunks_concurrently(
            ht, [chunks[0]["range_start"], chunks[1]["range_start"]]
        )

    t = threading.Thread(target=run_merge)
    t.start()
    assert in_rewrite.wait(60)

    # merge is mid-rewrite and holds NO hypertable lock:
    # 1) insert into a NEW (unrelated) chunk completes
    stats = ht.insert(
        _batch(spark, n=12, t0=T0_US + 10 * DAY_US)
    )
    assert stats["rows"] == 12
    # 2) update on an existing unrelated chunk completes
    n_upd = ht.update_where(
        {"value": F.lit(-5.0)}, "k = 90",
        start=T0_US + 3 * DAY_US, end=T0_US + 4 * DAY_US,
    )
    assert n_upd == 1
    # 3) DML into the MERGING range is refused while frozen
    with pytest.raises(PermissionError, match="frozen"):
        ht.insert(_batch(spark, n=1))

    release.set()
    t.join(timeout=120)
    assert not t.is_alive()
    merged = result["row"]
    assert merged["range_start"] == chunks[0]["range_start"]
    assert merged["range_end"] == chunks[1]["range_end"]
    # merged chunk is not frozen; all rows intact (96 + 12, one updated)
    assert not any(c.get("frozen") for c in ht.chunks())
    assert ht.df().count() == 108
    assert ht.df().filter(F.col("value") == -5.0).count() == 1
    # and the merging range accepts writes again
    ht.insert(_batch(spark, n=1))
    assert ht.df().count() == 109


def test_failure_unfreezes_sources(ts, spark, monkeypatch):
    ht = ts.create_hypertable("t_cmf", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=48))
    chunks = ht.chunks()

    def boom(ht_, cs, tmp):
        raise RuntimeError("rewrite exploded")

    monkeypatch.setattr(chunkops, "_merge_rewrite", boom)
    with pytest.raises(RuntimeError, match="exploded"):
        chunkops.merge_chunks_concurrently(
            ht, [chunks[0]["range_start"], chunks[1]["range_start"]]
        )
    # table exactly as before: both chunks present, unfrozen, writable
    assert [c["range_start"] for c in ht.chunks()] == [
        c["range_start"] for c in chunks
    ]
    assert not any(c.get("frozen") for c in ht.chunks())
    ht.insert(_batch(spark, n=1))
    assert ht.df().count() == 49


def test_sql_entry_point_routes_concurrent_variant(ts, spark):
    ht = ts.create_hypertable("t_cms", "ts", chunk_interval="1 day")
    ht.insert(_batch(spark, n=48))
    chunks = ht.chunks()
    c0 = f"_timescaledb_internal._hyper_{ht.id}_{chunks[0]['id']}_chunk"
    c1 = f"_timescaledb_internal._hyper_{ht.id}_{chunks[1]['id']}_chunk"
    out = ts.sql(
        f"SELECT merge_chunks_concurrently('{c0}', '{c1}')"
    ).collect()
    assert len(out) == 1
    assert len(ht.chunks()) == 1
    assert ht.df().count() == 48
