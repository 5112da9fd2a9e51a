#!/usr/bin/env python
"""Round-12 profile of partial-family at-grain serving (VERDICT r11
wrong #1): where do the 15s at x100 go — driver-side plan build,
mat-table listing, or the serve computation itself? Builds the same
big_twc shape as scale_probe (events × MULT, hourly tw+candle cagg),
then times each serve stage separately. Prints one JSON line.

Usage: SCALE_PROBE_MULT=20 python scripts/profile_serve.py [out.json]
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
MULT = int(os.environ.get("SCALE_PROBE_MULT", "20"))


def main() -> None:
    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession, build_spark
    from timescaledb_spark.sources import load_table

    spark = build_spark(app_name="ts_profile_serve")
    out: dict = {"sf_dir": SF_DIR, "mult": MULT}

    ev = load_table(spark, SF_DIR, "events")
    span_days = 45
    big = ev.crossJoin(
        spark.range(MULT).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("ts") + F.expr(f"make_interval(0,0,0,{span_days},0,0,0)") * F.col("_rep")).alias("ts"),
        (F.col("event_id") + F.col("_rep") * F.lit(100_000_000)).alias("event_id"),
        "user_id", "event_type", "value", "props",
    )
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_pserve_"))
    ht = ts.create_hypertable("big", "ts", chunk_interval="6 hours")
    t0 = time.perf_counter()
    ht.insert(big)
    out["insert_s"] = round(time.perf_counter() - t0, 2)
    out["raw_chunks"] = len(ht.chunks())

    twc = ts.create_cagg(
        "big_twc", ht, bucket_width="1 hour", aggs={},
        group_by=["event_type"],
        time_weights={"tw": {"value": "value", "tiebreak": ["event_id"]}},
        candlesticks={"ohlc": {"price": "value", "tiebreak": ["event_id"]}},
    )
    t0 = time.perf_counter()
    twc.refresh()
    out["refresh_s"] = round(time.perf_counter() - t0, 2)

    mat = twc._mat()
    out["mat_chunks"] = len(mat.chunks())
    t0 = time.perf_counter()
    out["mat_rows"] = mat.read().count()
    out["mat_read_count_s"] = round(time.perf_counter() - t0, 2)

    # stage A: plan build only (driver side)
    t0 = time.perf_counter()
    df = twc.time_weighted_at_grain(grain="1 day", realtime=False)
    out["tw_plan_build_s"] = round(time.perf_counter() - t0, 2)
    # stage B: execution
    t0 = time.perf_counter()
    out["tw_serve_rows"] = df.count()
    out["tw_serve_exec_s"] = round(time.perf_counter() - t0, 2)
    # stage C: repeat (warm listing caches)
    t0 = time.perf_counter()
    twc.time_weighted_at_grain(grain="1 day", realtime=False).count()
    out["tw_serve_warm_s"] = round(time.perf_counter() - t0, 2)

    # reference cost: equivalent direct groupBy over one flat read of
    # the mat dir (no per-chunk path list) — the 3x bar from VERDICT
    matdir = mat.data_dir
    t0 = time.perf_counter()
    flat = spark.read.option("basePath", matdir).parquet(matdir)
    flat.groupBy(F.window("bucket", "1 day"), "event_type").agg(
        F.sum(F.col("tw")["integral"])
    ).count()
    out["mat_flat_groupby_s"] = round(time.perf_counter() - t0, 2)

    # candlestick serve
    t0 = time.perf_counter()
    out["candle_serve_rows"] = twc.candlestick_at_grain(
        grain="1 day", realtime=False
    ).count()
    out["candle_serve_s"] = round(time.perf_counter() - t0, 2)

    # plan shape: shuffle count of the serve
    plan = df._jdf.queryExecution().executedPlan().toString()
    out["tw_serve_exchanges"] = plan.count("Exchange")
    out["tw_serve_scans"] = plan.count("Scan parquet")

    print(json.dumps(out))
    if len(sys.argv) > 1:
        with open(sys.argv[1], "w") as f:
            f.write(json.dumps(out) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
