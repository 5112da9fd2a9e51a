"""Randomized serve-equals-raw property tests for the partial-state
cagg families (round 11): small adversarial series — duplicate
timestamps broken by tiebreak, NULL values, single-sample buckets,
empty buckets, resets — served from hourly partials at day grain must
equal the raw-scan hyperfunction over each day's rows. Deterministic
seeds (no wall-clock, no hypothesis shrink loops — each case is a
full cagg lifecycle)."""

import datetime
import random
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession
from timescaledb_spark.sources import load_table  # noqa: F401


def _gen(seed, n=120, days=3, null_frac=0.15, dup_frac=0.2):
    rng = random.Random(seed)
    rows = []
    base = datetime.datetime(2024, 1, 1)
    last_ts = None
    for i in range(n):
        if last_ts is not None and rng.random() < dup_frac:
            ts = last_ts  # duplicate timestamp, tiebreak decides order
        else:
            ts = base + datetime.timedelta(
                seconds=rng.randrange(days * 86400)
            )
        last_ts = ts
        v = (
            None
            if rng.random() < null_frac
            else float(rng.randrange(0, 1000))
        )
        dev = rng.choice(["a", "b"])
        rows.append((ts, i, dev, v))
    return rows


def _mk(spark, rows, **families):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_pprop_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    ht.insert(
        spark.createDataFrame(
            rows, "ts timestamp, rid long, dev string, v double"
        )
    )
    cagg = ts.create_cagg(
        "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
        **families,
    )
    cagg.refresh()
    return ts, ht, cagg


@pytest.mark.parametrize("seed", [11, 42, 1337])
def test_counter_serve_equals_raw(spark, seed):
    from timescaledb_spark.functions.counters import counter_agg
    from timescaledb_spark.functions.time import time_bucket

    rows = _gen(seed)
    _, _, cagg = _mk(
        spark, rows,
        counters={"cnt": {"value": "v", "tiebreak": ["rid"]}},
    )
    got = {
        (r["bucket"], r["dev"]): (
            r["n"], r["delta"], r["num_resets"],
            r["first_val"], r["last_val"],
        )
        for r in cagg.counter_at_grain(grain="1 day").collect()
    }
    spark_df = spark.createDataFrame(
        rows, "ts timestamp, rid long, dev string, v double"
    ).filter(F.col("v").isNotNull())
    day = spark_df.withColumn("day", time_bucket("1 day", "ts"))
    raw = counter_agg(day, "ts", "v", by=["day", "dev"], tiebreak=["rid"])
    want = {
        (r["day"], r["dev"]): (
            r["n"], r["delta"], r["num_resets"], None, None,
        )
        for r in raw.collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][:3] == want[k][:3], (seed, k)


@pytest.mark.parametrize("seed", [7, 99])
def test_timeweight_serve_equals_raw(spark, seed):
    from timescaledb_spark.functions.counters import time_weighted_avg
    from timescaledb_spark.functions.time import time_bucket

    rows = _gen(seed)
    _, _, cagg = _mk(
        spark, rows,
        time_weights={"tw": {"value": "v", "tiebreak": ["rid"]}},
    )
    got = {
        (r["bucket"], r["dev"]): r["tw_avg"]
        for r in cagg.time_weighted_at_grain(grain="1 day").collect()
    }
    spark_df = spark.createDataFrame(
        rows, "ts timestamp, rid long, dev string, v double"
    ).filter(F.col("v").isNotNull())
    day = spark_df.withColumn("day", time_bucket("1 day", "ts"))
    want = {
        (r["day"], r["dev"]): r["tw_avg"]
        for r in time_weighted_avg(
            day, "ts", "v", by=["day", "dev"], tiebreak=["rid"]
        ).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), (seed, k)


@pytest.mark.parametrize("seed", [23])
def test_stateagg_serve_equals_raw(spark, seed):
    from timescaledb_spark.functions.state import state_durations
    from timescaledb_spark.functions.time import time_bucket

    rng = random.Random(seed)
    base = datetime.datetime(2024, 1, 1)
    rows = [
        (
            base + datetime.timedelta(seconds=rng.randrange(3 * 86400)),
            i,
            "a",
            rng.choice(["up", "down", "degraded", None]),
        )
        for i in range(150)
    ]
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_pprop_sa_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="1 day")
    ht.insert(
        spark.createDataFrame(
            rows, "ts timestamp, rid long, dev string, s string"
        )
    )
    cagg = ts.create_cagg(
        "c", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
        state_aggs={"sa": {"state": "s", "tiebreak": ["rid"]}},
    )
    cagg.refresh()
    got = {
        (r["bucket"], r["dev"], r["state"]): (r["duration_us"], r["n"])
        for r in cagg.state_durations_at_grain(grain="1 day").collect()
    }
    raw_df = spark.createDataFrame(
        rows, "ts timestamp, rid long, dev string, s string"
    ).filter(F.col("s").isNotNull())
    day = raw_df.withColumn("day", time_bucket("1 day", "ts"))
    want = {
        (r["day"], r["dev"], r["state"]): (r["duration_us"], r["n"])
        for r in state_durations(
            day, "ts", "s", by=["day", "dev"], tiebreak=["rid"]
        ).collect()
    }
    assert got == want and len(got) > 0


@pytest.mark.parametrize("seed", [7, 99])
def test_maxn_by_serve_equals_raw(spark, seed):
    """Round 13: day-grain max_n_by from hourly payload partials equals
    a direct two-key rank over each day's raw rows — on the (value,
    payload) total order, NULL values excluded, duplicate timestamps
    irrelevant (the family orders by value, not time)."""
    rows = _gen(seed)
    _, _, cagg = _mk(
        spark, rows,
        maxn_aggs={"mx": {"value": "v", "by": "rid", "n": 3}},
    )
    got: dict = {}
    for r in cagg.max_n_at_grain("mx", grain="1 day").collect():
        got.setdefault((r["bucket"].day, r["dev"]), []).append(
            (r["value"], r["data"])
        )
    want: dict = {}
    for ts_, rid, dev, v in rows:
        if v is not None:
            want.setdefault((ts_.day, dev), []).append((v, rid))
    for k in want:
        want[k] = sorted(want[k], key=lambda e: (-e[0], -e[1]))[:3]
    assert set(got) == set(want)
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])
