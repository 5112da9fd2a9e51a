#!/usr/bin/env python
"""A/B the round-13 single-family realtime build (Cagg.read only_cols)
against its exact counterfactual — the full partial view projected to
the same columns (what Catalyst's column pruning alone achieves, since
the 1:1 family joins survive pruning).

Fixture: the scale-probe shape at MULT=20 — an all-family cagg over a
many-chunk hypertable, refreshed, then a 50k-row tail landed past the
watermark so every realtime serve carries a raw-side partial build.

Prints one JSON line; writes [out.json].
Usage: python scripts/onlycols_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("ONLYCOLS_PROBE_MULT", "20"))


def main() -> None:
    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession, build_spark
    from timescaledb_spark.sources import load_table

    spark = build_spark(app_name="ts_onlycols_probe")
    out: dict = {"sf_dir": SF_DIR, "mult": MULT}
    out_path = sys.argv[1] if len(sys.argv) > 1 else "ONLYCOLS_PROBE.json"

    ev = load_table(spark, SF_DIR, "events")
    span_days = 45
    big = ev.crossJoin(
        spark.range(MULT).select(F.col("id").alias("_rep"))
    ).select(
        (
            F.col("ts")
            + F.expr(f"make_interval(0,0,0,{span_days},0,0,0)")
            * F.col("_rep")
        ).alias("ts"),
        (F.col("event_id") + F.col("_rep") * F.lit(100_000_000)).alias(
            "event_id"
        ),
        "user_id", "event_type", "value", "props",
    )
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_oc_probe_"))
    ht = ts.create_hypertable("big", "ts", chunk_interval="6 hours")
    ht.insert(big)
    out["chunks"] = len(ht.chunks())

    cagg = ts.create_cagg(
        "occ",
        ht,
        bucket_width="1 hour",
        aggs={},
        group_by=["event_type"],
        sketches={"sk": {"value": "value"}},
        counters={"cnt": {"value": "value", "tiebreak": ["event_id"]}},
        gauges={"gg": {"value": "value", "tiebreak": ["event_id"]}},
        stats_aggs={
            "st": {"value": "value"},
            "st2": {"value": "value", "y": "cast(user_id as double)"},
        },
        time_weights={"tw": {"value": "value", "tiebreak": ["event_id"]}},
        candlesticks={"ohlc": {"price": "value", "tiebreak": ["event_id"]}},
        state_aggs={"sa": {"state": "event_type"}},
        freq_aggs={"fq": {"value": "cast(user_id % 20 as string)"}},
        maxn_aggs={"mx": {"value": "value", "n": 3}},
        heartbeat_aggs={"hb": {"liveness": "5 minutes"}},
        tdigest_aggs={"td": {"value": "value", "delta": 200}},
    )
    cagg.refresh()
    # tail past the watermark: the realtime shape every serve pays for
    tail = ev.select(
        (
            F.col("ts")
            + F.expr(f"make_interval(0,0,0,{span_days * MULT},0,0,0)")
        ).alias("ts"),
        (F.col("event_id") + F.lit(MULT * 100_000_000)).alias("event_id"),
        "user_id", "event_type", "value", "props",
    ).limit(50_000)
    ht.insert(tail)

    keys = ["bucket", "event_type"]
    for fam_col in ("st", "tw", "sk"):
        t0 = time.perf_counter()
        cagg.read(realtime=True, only_cols=[fam_col]).count()
        out[f"{fam_col}_restricted_s"] = round(time.perf_counter() - t0, 2)
        t0 = time.perf_counter()
        # counterfactual: full 11-family build, then project — the only
        # plan Catalyst could reach on its own
        cagg.read(realtime=True).select(*keys, fam_col).count()
        out[f"{fam_col}_fullbuild_s"] = round(time.perf_counter() - t0, 2)
        out[f"{fam_col}_speedup"] = round(
            out[f"{fam_col}_fullbuild_s"]
            / max(out[f"{fam_col}_restricted_s"], 1e-9),
            2,
        )

    print(json.dumps(out))
    with open(out_path, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()


