"""SQL ``into_values(rollup(state_agg_col))`` — the toolkit per-state
durations SRF (state_agg.rs ``into_values`` → (state, duration)):
routed to ``state_durations_at_grain``, one row per held state per
served bucket/group, LOCF across partial boundaries."""

import datetime
import tempfile

import pytest

from timescaledb_spark.session import TSSession


def _ts(d, h=0, m=0):
    return datetime.datetime(2024, 1, d, h, m)


@pytest.fixture(scope="module")
def env(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_ivsa_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    rows = [
        (_ts(1, h, mi), "g", ["up", "down", "up", "idle"][h % 4])
        for h in range(12)
        for mi in (0, 30)
    ]
    ht.insert(
        spark.createDataFrame(rows, "ts timestamp, dev string, st string")
    )
    ts.sql(
        "CREATE MATERIALIZED VIEW sv WITH (timescaledb.continuous) AS "
        "SELECT time_bucket('1 hour', ts) AS bucket, dev, "
        "state_agg(ts, st) AS sa FROM m GROUP BY 1, 2"
    )
    ts.get_cagg("sv").refresh()
    return ts


def test_into_values_global(env):
    got = {
        r["state"]: r["duration_us"]
        for r in env.sql(
            "SELECT dev, into_values(rollup(sa)) AS state "
            "FROM sv GROUP BY 1"
        ).collect()
    }
    # LOCF over 12 hourly states (up/down/up/idle cycle, 30-min samples;
    # the final 'idle' holds until the last sample at 11:30)
    h = 3_600_000_000
    assert got == {"up": 6 * h, "down": 3 * h, "idle": int(2.5 * h)}


def test_into_values_per_day_bucket(env):
    rows = env.sql(
        "SELECT time_bucket('1 day', bucket) AS day, dev, "
        "into_values(rollup(sa)) AS state FROM sv GROUP BY 1, 2"
    ).collect()
    assert {r["day"].day for r in rows} == {1}
    assert sum(r["duration_us"] for r in rows) == int(11.5 * 3_600_000_000)


def test_default_output_alias_is_state(env):
    df = env.sql("SELECT dev, into_values(rollup(sa)) FROM sv GROUP BY 1")
    assert df.columns == ["dev", "state", "duration_us"]


def test_maxn_into_values_still_routes(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_ivmx_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    ht.insert(
        spark.createDataFrame(
            [(_ts(1, h), "g", float(h)) for h in range(5)],
            "ts timestamp, dev string, x double",
        )
    )
    cagg = ts.create_cagg(
        "mv", ht, bucket_width="1 hour", aggs={}, group_by=["dev"],
        maxn_aggs={"mx": {"value": "x", "n": 2}},
    )
    cagg.refresh()
    got = [
        r["value"]
        for r in ts.sql(
            "SELECT dev, into_values(rollup(mx)) AS value "
            "FROM mv GROUP BY 1"
        ).collect()
    ]
    assert got == [4.0, 3.0]
