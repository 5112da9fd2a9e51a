"""Jobs & policies: scheduler semantics (src/bgw/job_stat.c) and policy
payloads (tsl/src/bgw_policy/) against a real hypertable."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.jobs import (
    DEFAULT_RETRY_PERIOD_S,
    MAX_INTERVALS_BACKOFF,
)
from timescaledb_spark.session import TSSession


@pytest.fixture()
def ts(spark, tmp_path):
    return TSSession(spark, str(tmp_path / "ts"))


def _seed_events(ts, spark, name="ev", days=30, day_offset=0, create=True):
    """Hypertable with one 1-day chunk per day, 24 rows each."""
    ht = (
        ts.create_hypertable(name, "ts", chunk_interval="1 day")
        if create
        else ts.get_hypertable(name)
    )
    base = 1704067200000000 + day_offset * 86_400_000_000
    df = spark.range(days * 24).select(
        F.timestamp_micros(
            (F.lit(base) + F.col("id") * 3600 * 1_000_000).cast("long")
        ).alias("ts"),
        (F.col("id") % 5).cast("int").alias("device"),
        (F.col("id") * 1.5).alias("value"),
    )
    ht.insert(df)
    return ht


# ---------------------------------------------------------------- scheduler

def test_fixed_schedule_grid(ts):
    ts.jobs.register_proc("noop", lambda _ts, _cfg: None)
    jid = ts.jobs.add_job(
        "noop", schedule_interval=3600, initial_start=1000.0, fixed_schedule=True
    )
    r = ts.jobs.run_job(jid, now=1000.0 + 10)
    assert r["success"]
    st = ts.jobs.stats(jid)[0]
    # next slot on the grid anchored at initial_start
    assert st["next_start"] == 1000.0 + 3600
    ts.jobs.run_job(jid, now=1000.0 + 3600 * 2 + 5)
    assert ts.jobs.stats(jid)[0]["next_start"] == 1000.0 + 3600 * 3


def test_drifting_schedule(ts):
    ts.jobs.register_proc("noop", lambda _ts, _cfg: None)
    jid = ts.jobs.add_job(
        "noop", schedule_interval=600, initial_start=0.0, fixed_schedule=False
    )
    ts.jobs.run_job(jid, now=1234.0)
    assert ts.jobs.stats(jid)[0]["next_start"] == 1234.0 + 600


def test_failure_backoff_and_reset(ts):
    calls = {"n": 0}

    def flaky(_ts, _cfg):
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("boom")

    ts.jobs.register_proc("flaky", flaky)
    interval = 100000.0
    jid = ts.jobs.add_job(
        "flaky", schedule_interval=interval, initial_start=0.0, fixed_schedule=False
    )
    r1 = ts.jobs.run_job(jid, now=50.0)
    assert not r1["success"] and "boom" in r1["error"]
    st = ts.jobs.stats(jid)[0]
    assert st["consecutive_failures"] == 1
    assert st["next_start"] == 50.0 + DEFAULT_RETRY_PERIOD_S * 1
    r2 = ts.jobs.run_job(jid, now=400.0)
    assert not r2["success"]
    st = ts.jobs.stats(jid)[0]
    assert st["consecutive_failures"] == 2
    assert st["next_start"] == 400.0 + DEFAULT_RETRY_PERIOD_S * 2
    r3 = ts.jobs.run_job(jid, now=1100.0)
    assert r3["success"]
    st = ts.jobs.stats(jid)[0]
    assert st["consecutive_failures"] == 0
    assert st["total_runs"] == 3 and st["total_failures"] == 2
    hist = ts.jobs.history(jid)
    assert [h["success"] for h in hist] == [False, False, True]


def test_backoff_ceiling(ts):
    def bad(_ts, _cfg):
        raise RuntimeError("always")

    ts.jobs.register_proc("bad", bad)
    interval = 100.0  # ceiling = 5 * 100 << retry_period accumulation
    jid = ts.jobs.add_job(
        "bad", schedule_interval=interval, initial_start=0.0, fixed_schedule=False
    )
    for i in range(4):
        ts.jobs.run_job(jid, now=float(i))
    st = ts.jobs.stats(jid)[0]
    assert st["next_start"] == 3.0 + MAX_INTERVALS_BACKOFF * interval


def test_run_pending_only_due(ts):
    runs = []
    ts.jobs.register_proc("rec", lambda _ts, cfg: runs.append(cfg["k"]))
    ts.jobs.add_job("rec", 60, config={"k": "a"}, initial_start=100.0)
    ts.jobs.add_job("rec", 60, config={"k": "b"}, initial_start=500.0)
    out = ts.jobs.run_pending(now=200.0)
    assert len(out) == 1 and runs == ["a"]
    out = ts.jobs.run_pending(now=600.0)
    assert runs == ["a", "a", "b"]


def test_alter_and_delete_job(ts):
    ts.jobs.register_proc("noop", lambda _ts, _cfg: None)
    jid = ts.jobs.add_job("noop", 60, scheduled=True)
    ts.jobs.alter_job(jid, scheduled=False, schedule_interval="5 minutes")
    job = [j for j in ts.jobs.list() if j["id"] == jid][0]
    assert job["scheduled"] is False and job["schedule_interval"] == 300.0
    ts.jobs.delete_job(jid)
    assert all(j["id"] != jid for j in ts.jobs.list())
    with pytest.raises(KeyError):
        ts.jobs.delete_job(jid)


# ----------------------------------------------------------------- policies

def test_retention_policy(ts, spark):
    ht = _seed_events(ts, spark)
    n0 = len(ht.chunks())
    assert n0 == 30
    jid = ts.jobs.add_retention_policy("ev", drop_after="10 days")
    # "now" = 2024-01-31T00:00Z → cutoff 2024-01-21; chunks 1..20 dropped
    now_s = 1704067200 + 30 * 86400
    r = ts.jobs.run_job(jid, now=float(now_s))
    assert r["success"] and r["result"]["dropped_chunks"] == 20
    assert len(ht.chunks()) == 10
    # duplicate policy rejected, if_not_exists tolerated
    with pytest.raises(ValueError):
        ts.jobs.add_retention_policy("ev", drop_after="10 days")
    assert (
        ts.jobs.add_retention_policy("ev", drop_after="10 days", if_not_exists=True)
        == jid
    )
    ts.jobs.remove_retention_policy("ev")
    assert ts.jobs.list() == []


def test_compression_policy(ts, spark):
    from timescaledb_spark.compression import enable_columnstore

    ht = _seed_events(ts, spark, name="evc", days=10)
    enable_columnstore(ht, segmentby=["device"], orderby=["ts"])
    jid = ts.jobs.add_compression_policy("evc", compress_after="3 days")
    now_s = 1704067200 + 10 * 86400
    r = ts.jobs.run_job(jid, now=float(now_s))
    assert r["success"] and r["result"]["compressed_chunks"] == 7
    statuses = {c["range_start"]: c["status"] for c in ht.chunks()}
    assert sum(1 for s in statuses.values() if s == "columnstore") == 7
    # rerun compresses nothing new
    r2 = ts.jobs.run_job(jid, now=float(now_s))
    assert r2["result"]["compressed_chunks"] == 0
    # row counts intact
    assert ht.df().count() == 10 * 24


def test_cagg_refresh_policy(ts, spark):
    ht = _seed_events(ts, spark, name="evr", days=5)
    cagg = ts.create_cagg(
        "daily", "evr", bucket_width="1 day", aggs={"n": "count(1)", "avg_value": "avg(value)"}
    )
    jid = ts.jobs.add_continuous_aggregate_policy(
        "daily", start_offset="30 days", end_offset=None, schedule_interval="1 hour"
    )
    now_s = 1704067200 + 5 * 86400
    r = ts.jobs.run_job(jid, now=float(now_s))
    assert r["success"] and r["result"]["materialized_ranges"] >= 1
    mat = cagg.read(realtime=False)
    assert mat.count() == 5
    _ = ht


def test_reorder_policy(ts, spark):
    """Reorders COMPLETED chunks only (newest first, one per run): the
    newest chunk is still receiving inserts — rewriting it would race
    the writes and permanently mark a still-growing chunk done."""
    ht = _seed_events(ts, spark, name="evo", days=3)
    jid = ts.jobs.add_reorder_policy("evo", order_by=["device", "ts"])
    r1 = ts.jobs.run_job(jid, now=1.0)
    assert r1["success"] and r1["result"]["reordered"] == 1
    r2 = ts.jobs.run_job(jid, now=2.0)
    r3 = ts.jobs.run_job(jid, now=3.0)
    assert r2["result"]["reordered"] == 1
    assert r3["result"]["reordered"] == 0  # only the hot chunk remains
    # once newer data lands, the formerly-newest chunk becomes eligible
    _seed_events(ts, spark, name="evo", days=1, day_offset=3, create=False)
    r4 = ts.jobs.run_job(jid, now=4.0)
    assert r4["result"]["reordered"] == 1
    assert ht.df().count() == 4 * 24


def test_integer_time_retention(ts, spark):
    ht = ts.create_hypertable("intht", "k", chunk_interval=100)
    df = spark.range(1000).select(
        F.col("id").cast("long").alias("k"), (F.col("id") * 2).alias("v")
    )
    ht.insert(df)
    assert len(ht.chunks()) == 10
    jid = ts.jobs.add_retention_policy("intht", drop_after=300)
    # integer dim: "now" falls back to max range_end = 1000 → cutoff 700
    r = ts.jobs.run_job(jid)
    assert r["result"]["dropped_chunks"] == 7
    assert ht.df().count() == 300


def test_compaction_policy(ts, spark):
    from timescaledb_spark.compression import enable_columnstore

    ht = _seed_events(ts, spark, name="evk", days=6)
    with pytest.raises(ValueError, match="compression to be enabled"):
        ts.jobs.add_compaction_policy("evk")
    enable_columnstore(ht, segmentby=["device"], orderby=["ts"])
    with pytest.raises(ValueError, match="max_chunks"):
        ts.jobs.add_compaction_policy("evk", max_chunks=-1)
    jid = ts.jobs.add_compaction_policy("evk", max_chunks=4)
    r1 = ts.jobs.run_job(jid, now=1.0)
    assert r1["success"] and r1["result"]["compacted_chunks"] == 4
    r2 = ts.jobs.run_job(jid, now=2.0)
    assert r2["result"]["compacted_chunks"] == 2  # remaining
    assert all(c["status"] == "columnstore" for c in ht.chunks())
    # DML knocks a chunk back to rowstore -> next run recompacts exactly it
    ht.update_where({"value": "value + 1"}, "device = 0",
                    start="2024-01-02", end="2024-01-03")
    assert sum(1 for c in ht.chunks() if c["status"] != "columnstore") == 1
    r3 = ts.jobs.run_job(jid, now=3.0)
    assert r3["result"]["compacted_chunks"] == 1
    ts.jobs.remove_compaction_policy("evk")
    assert ts.jobs.list() == []


def test_compaction_max_chunks_zero_is_unlimited(ts, spark):
    """Advice fix (r9): max_chunks=0 keeps the reference's 'unlimited'
    default — a stored 0 config must compact everything, not nothing."""
    from timescaledb_spark.compression import enable_columnstore

    ht = _seed_events(ts, spark, name="evz", days=5)
    enable_columnstore(ht, segmentby=["device"], orderby=["ts"])
    jid = ts.jobs.add_compaction_policy("evz", max_chunks=0)
    r = ts.jobs.run_job(jid, now=1.0)
    assert r["success"] and r["result"]["compacted_chunks"] == 5
    assert all(c["status"] == "columnstore" for c in ht.chunks())
    ts.jobs.remove_compaction_policy("evz")


def test_policies_v2(ts, spark):
    _seed_events(ts, spark, name="evp", days=5)
    ts.create_cagg(
        "pdaily", "evp", bucket_width="1 day",
        aggs={"n": "count(1)", "sum_v": "sum(value)"},
    )
    assert ts.jobs.add_policies(
        "pdaily",
        refresh_start_offset="30 days",
        refresh_end_offset=None,
        compress_after="2 days",
        drop_after="90 days",
    )
    shown = ts.jobs.show_policies("pdaily")
    names = {p["policy_name"] for p in shown}
    assert names == {
        "policy_refresh_continuous_aggregate",
        "policy_compression",
        "policy_retention",
    }
    # refresh fires against the cagg; compression/retention against the mat
    now_s = 1704067200 + 5 * 86400
    for r in ts.jobs.run_pending(now=float(now_s)):
        assert r["success"], r
    assert ts.jobs.remove_policies("pdaily", False, "policy_retention")
    assert len(ts.jobs.show_policies("pdaily")) == 2
    with pytest.raises(KeyError):
        ts.jobs.remove_policies("pdaily", False, "policy_retention")
    assert ts.jobs.remove_all_policies("pdaily")
    assert ts.jobs.show_policies("pdaily") == []


def test_alter_policies(ts, spark):
    """timescaledb_experimental.alter_policies (policies_v2.c): in-place
    offset updates on existing v2 policies; missing policy errors unless
    if_exists."""
    _seed_events(ts, spark, name="eva", days=5)
    ts.create_cagg(
        "adaily", "eva", bucket_width="1 day", aggs={"n": "count(1)"},
    )
    ts.jobs.add_policies(
        "adaily",
        refresh_start_offset="30 days",
        refresh_end_offset=None,
        compress_after="2 days",
    )
    assert ts.jobs.alter_policies(
        "adaily", refresh_start_offset="10 days", compress_after="5 days"
    )
    cfg = {
        p["policy_name"]: p for p in ts.jobs.show_policies("adaily")
    }
    assert (
        cfg["policy_refresh_continuous_aggregate"]["start_offset"]
        == "10 days"
    )
    assert cfg["policy_compression"]["compress_after"] == "5 days"
    # no retention policy exists -> error, unless if_exists
    with pytest.raises(ValueError, match="alter_policies"):
        ts.jobs.alter_policies("adaily", drop_after="90 days")
    assert not ts.jobs.alter_policies(
        "adaily", drop_after="90 days", if_exists=True
    )
    # SQL surface
    assert ts.sql(
        "SELECT alter_policies('adaily', refresh_start_offset => "
        "INTERVAL '7 days')"
    ).first()["altered"]
