"""state_durations / heartbeat_agg semantics on controlled series
(toolkit state_agg and heartbeat_agg families)."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.functions.state import (
    heartbeat_agg,
    state_at,
    state_durations,
    state_periods,
    state_timeline,
)


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


def test_state_timeline_runs(spark):
    # up[0,30) down[30,40) up[40,60]; final period zero-width tail at 60
    df = _series(
        spark,
        [
            (0, "up", 1),
            (10, "up", 1),
            (30, "down", 1),
            (40, "up", 1),
            (60, "up", 1),
        ],
    )
    tl = (
        state_timeline(df, "ts", "state", by=["k"])
        .orderBy("start_us")
        .collect()
    )
    got = [(r["state"], r["start_us"], r["end_us"], r["n"]) for r in tl]
    assert got == [
        ("up", 0, 30_000_000, 2),
        ("down", 30_000_000, 40_000_000, 1),
        ("up", 40_000_000, 60_000_000, 2),
    ]
    # accessor agreement: timeline widths sum to duration_in per state
    dur = {
        r["state"]: r["duration_us"]
        for r in state_durations(df, "ts", "state", by=["k"]).collect()
    }
    widths = {}
    for st, s, e, _ in got:
        widths[st] = widths.get(st, 0) + (e - s)
    assert widths == dur


def test_state_timeline_single_row_island(spark):
    df = _series(spark, [(5, "only", 1)])
    (row,) = state_timeline(df, "ts", "state", by=["k"]).collect()
    assert (row["start_us"], row["end_us"], row["n"]) == (
        5_000_000,
        5_000_000,
        1,
    )


def test_state_periods_filters_one_state(spark):
    df = _series(
        spark,
        [(0, "up", 1), (30, "down", 1), (40, "up", 1), (60, "down", 1)],
    )
    got = sorted(
        (r["start_us"], r["end_us"])
        for r in state_periods(df, "up", "ts", "state", by=["k"]).collect()
    )
    assert got == [(0, 30_000_000), (40_000_000, 60_000_000)]


def test_state_at_locf_and_absent_group(spark):
    df = _series(
        spark,
        [(0, "up", 1), (30, "down", 1), (100, "up", 2)],
    )
    at = "1970-01-01 00:00:45"
    got = {
        r["k"]: r["state"]
        for r in state_at(df, at, "ts", "state", by=["k"]).collect()
    }
    # k=1: last sample <= 45s is down@30; k=2 starts at 100s -> no row
    assert got == {1: "down"}


def test_state_at_tiebreak(spark):
    df = spark.createDataFrame(
        [(0, "a", 1, 1), (0, "b", 2, 1)],
        "us long, state string, eid int, k int",
    ).select(F.timestamp_micros("us").alias("ts"), "state", "eid", "k")
    (row,) = state_at(
        df, "1970-01-01 00:00:01", "ts", "state", by=["k"], tiebreak=["eid"]
    ).collect()
    assert row["state"] == "b"


def test_heartbeat_rejects_month_liveness(spark):
    df = _series(spark, [(0, "x", 1)])
    with pytest.raises(ValueError):
        heartbeat_agg(df, "ts", by=["k"], liveness="1 month")
