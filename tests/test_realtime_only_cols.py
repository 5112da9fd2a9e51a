"""Realtime serve plans build ONLY the served family's partials.

The realtime union aggregates the un-materialized tail with the cagg's
partial view — a 1:1 join chain over every declared family. Catalyst
prunes columns but not inner joins, so before round 13 a single-family
serve over an N-family cagg paid N partial builds on the raw side.
``Cagg.read(only_cols=...)`` (caggs.py) restricts the build; these are
the plan-shape regression guards.
"""

import datetime
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.session import TSSession


def _plan(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def env(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_oc_"))
    ht = ts.create_hypertable("m", "ts", chunk_interval="7 days")
    rows = [
        (datetime.datetime(2024, 1, 1 + d, h), "g%d" % (h % 2), float(h + d))
        for d in range(6)
        for h in range(24)
    ]
    ht.insert(
        spark.createDataFrame(rows, "ts timestamp, dev string, v double")
    )
    cagg = ts.create_cagg(
        "c",
        ht,
        bucket_width="1 hour",
        aggs={"n": "count(*)"},
        group_by=["dev"],
        time_weights={"tw": {"value": "v", "tiebreak": []}},
        stats_aggs={"st": {"value": "v"}},
        tdigest_aggs={"td": {"value": "v", "delta": 100}},
        heartbeat_aggs={"hb": {"liveness": "30 minutes"}},
    )
    chunks = ht.chunks()
    lo = min(c["range_start"] for c in chunks)
    hi = max(c["range_end"] for c in chunks)
    cagg.refresh(start=lo, end=lo + (hi - lo) // 2)
    return ts, ht, cagg


def test_single_family_serve_plans_no_joins(env):
    _, _, cagg = env
    for mk in (
        lambda: cagg.stats_at_grain("st", grain="1 day", realtime=True),
        lambda: cagg.time_weighted_at_grain(
            "tw", grain="1 day", realtime=True
        ),
        lambda: cagg.heartbeat_at_grain("hb", grain="1 day", realtime=True),
    ):
        plan = _plan(mk())
        assert "Join" not in plan, plan[:2000]


def test_single_family_serve_skips_tdigest_build(env):
    # the t-digest raw build is the only family using asin (k1 scale
    # function) — its absence proves untouched families are not planned
    _, _, cagg = env
    plan = _plan(cagg.stats_at_grain("st", grain="1 day", realtime=True))
    assert "ASIN" not in plan.upper()


def test_full_read_still_builds_everything(env):
    _, _, cagg = env
    plan = _plan(cagg.read(realtime=True))
    assert "ASIN" in plan.upper()  # tdigest build present
    assert plan.count("Join") >= 4  # 5 value columns -> >= 4 joins


def test_restricted_read_matches_full_read(env):
    _, _, cagg = env
    full = {
        (r["bucket"], r["dev"]): r["st"]
        for r in cagg.read(realtime=True)
        .select("bucket", "dev", "st")
        .collect()
    }
    restricted = {
        (r["bucket"], r["dev"]): r["st"]
        for r in cagg.read(realtime=True, only_cols=["st"]).collect()
    }
    assert restricted == full and len(full) > 100


def test_window_fn_request_falls_back_to_full_build(spark):
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_ocw_"))
    ht = ts.create_hypertable("w", "ts", chunk_interval="7 days")
    ht.insert(
        spark.createDataFrame(
            [
                (datetime.datetime(2024, 1, 1, h), "g%d" % g, float(h + g))
                for h in range(24)
                for g in range(2)
            ],
            "ts timestamp, dev string, v double",
        )
    )
    cagg = ts.create_cagg(
        "cw",
        ht,
        bucket_width="1 hour",
        aggs={"s": "sum(v)", "m": "max(v)"},
        group_by=["dev"],
        window_fns={
            "seg_rank": "rank() OVER (PARTITION BY bucket ORDER BY s DESC)"
        },
        enable_window_functions=True,
    )
    # never refreshed: realtime read IS the raw aggregate; the window
    # column depends on the sibling aggregate s, so requesting it must
    # serve correct values (full build), not a missing-column error
    got = cagg.read(realtime=True, only_cols=["seg_rank"]).collect()
    assert len(got) == 48 and {r["seg_rank"] for r in got} == {1, 2}
