"""state_durations / heartbeat_agg semantics on controlled series
(toolkit state_agg and heartbeat_agg families)."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.functions.state import heartbeat_agg, state_durations


def _series(spark, rows):
    # rows: (seconds, state, key)
    return spark.createDataFrame(
        [(s * 1_000_000, st, k) for s, st, k in rows],
        "us long, state string, k int",
    ).select(F.timestamp_micros("us").alias("ts"), "state", "k")


def test_state_durations_locf(spark):
    # up for 30s, down for 10s, up for 20s, final sample holds 0
    df = _series(
        spark,
        [(0, "up", 1), (30, "down", 1), (40, "up", 1), (60, "down", 1)],
    )
    got = {
        r["state"]: r["duration_us"]
        for r in state_durations(df, "ts", "state", by=["k"]).collect()
    }
    assert got == {"up": 50_000_000, "down": 10_000_000}


def test_state_durations_tie_break(spark):
    # two states at the same second: event order decides who holds
    df = spark.createDataFrame(
        [(0, "a", 1, 1), (0, "b", 2, 1), (10_000_000, "a", 3, 1)],
        "us long, state string, eid int, k int",
    ).select(F.timestamp_micros("us").alias("ts"), "state", "eid", "k")
    got = {
        r["state"]: r["duration_us"]
        for r in state_durations(
            df, "ts", "state", by=["k"], tiebreak=["eid"]
        ).collect()
    }
    # a@eid1 holds 0s (next sample same ts), b@eid2 holds the 10s
    assert got == {"a": 0, "b": 10_000_000}


def test_heartbeat_union_and_ranges(spark):
    # liveness 10s: beats at 0, 5, 8 form one range [0, 18);
    # beat at 60 is its own range [60, 70) -> live 28s, 2 ranges
    df = _series(spark, [(0, "x", 1), (5, "x", 1), (8, "x", 1), (60, "x", 1)])
    row = heartbeat_agg(df, "ts", by=["k"], liveness=10_000_000).collect()[0]
    assert row["live_us"] == 28_000_000
    assert row["num_live_ranges"] == 2
    assert row["n"] == 4


def test_heartbeat_single_beat(spark):
    row = heartbeat_agg(
        _series(spark, [(7, "x", 1)]), "ts", by=["k"], liveness="1 minute"
    ).collect()[0]
    assert row["live_us"] == 60_000_000 and row["num_live_ranges"] == 1


def test_heartbeat_interval_string(spark):
    df = _series(spark, [(0, "x", 1), (3600, "x", 1)])
    row = heartbeat_agg(df, "ts", by=["k"], liveness="1 hour").collect()[0]
    # gap exactly == liveness: contiguous, one range, union = 2h
    assert row["num_live_ranges"] == 1
    assert row["live_us"] == 2 * 3600 * 1_000_000


def test_heartbeat_rejects_month_liveness(spark):
    df = _series(spark, [(0, "x", 1)])
    with pytest.raises(ValueError):
        heartbeat_agg(df, "ts", by=["k"], liveness="1 month")
