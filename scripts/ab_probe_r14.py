#!/usr/bin/env python
"""Round-14 isolated A/B probe (VERDICT r13 task #3): the two x100 legs
that moved >2x r12->r13 WITHOUT r13 code changes — ``merge_s`` (87.4 ->
192.2s) and ``ordered_scan_full_s`` (4.74 -> 15.51s) — re-measured in a
fresh session with nothing else running, plus:

- a LOCALIZED merge (source confined to one week) with a chunk-pruned
  rewrite assertion: the rewrite must touch only the week's chunks,
  proving merge_into is O(touched chunks), not O(table) — the x100
  uniform-1% source touches EVERY chunk by construction, so its cost
  is O(table) by design, not a pruning bug;
- isolated heartbeat/maxn day-grain serves (the r13 2.8-2.9x watch
  items, measured late in the full-probe serve loop there).

Usage: SCALE_PROBE_MULT=100 python scripts/ab_probe_r14.py [out.json]
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
MULT = int(os.environ.get("SCALE_PROBE_MULT", "100"))


def main() -> None:
    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession, build_spark
    from timescaledb_spark.sources import load_table

    spark = build_spark(app_name="ts_ab_r14")
    out: dict = {"sf_dir": SF_DIR, "mult": MULT}

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
        "user_id",
        "event_type",
        "value",
    )
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_ab14_"))
    ht = ts.create_hypertable("big", "ts", chunk_interval="6 hours")
    t0 = time.perf_counter()
    ht.insert(big)
    out["insert_s"] = round(time.perf_counter() - t0, 2)
    out["chunks"] = len(ht.chunks())

    # ---- leg 1: ordered scan (scale_probe.py ordered_scan_*) ----------
    t0 = time.perf_counter()
    ht.approximate_row_count()
    out["ordered_scan_analyze_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    odf = ht.read_ordered(plan_cap=256)
    odf.limit(5).collect()
    out["ordered_scan_first_rows_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["ordered_scan_rows"] = odf.count()
    out["ordered_scan_full_s"] = round(time.perf_counter() - t0, 2)
    out["ordered_scan_plan"] = dict(ht.last_ordered_plan_info)

    # ---- leg 2a: LOCALIZED merge + chunk-pruned rewrite assertion -----
    def _chunk_mtimes():
        mt = {}
        for c in ht.chunks():
            p = os.path.join(ht.data_dir, f"_chunk={c['range_start']}")
            if os.path.isdir(p):
                mt[c["range_start"]] = max(
                    (os.path.getmtime(os.path.join(p, f))
                     for f in os.listdir(p)),
                    default=0.0,
                )
        return mt

    week_src = big.filter(
        (F.col("ts") >= F.lit("2024-03-01"))
        & (F.col("ts") < F.lit("2024-03-08"))
        & (F.pmod("event_id", F.lit(100)) == 0)
    ).withColumn("value", F.col("value") + F.lit(1.0))
    before = _chunk_mtimes()
    t0 = time.perf_counter()
    st = ht.merge_into(
        week_src, ["ts", "event_id"],
        matched_update={"value": "excluded.value"},
    )
    out["merge_week_s"] = round(time.perf_counter() - t0, 2)
    out["merge_week_updated"] = st["rows_updated"]
    after = _chunk_mtimes()
    rewritten = [s for s in after if after[s] != before.get(s)]
    lo = int(
        __import__("datetime").datetime(2024, 3, 1).timestamp() * 1e6
    )
    hi = int(
        __import__("datetime").datetime(2024, 3, 8).timestamp() * 1e6
    )
    in_range = [s for s in rewritten if lo <= s < hi]
    out["merge_week_chunks_rewritten"] = len(rewritten)
    out["merge_week_chunks_in_range"] = len(in_range)
    out["merge_week_pruned_rewrite"] = len(rewritten) == len(in_range)
    week_chunks = [
        c for c in ht.chunks() if lo <= c["range_start"] < hi
    ]
    out["merge_week_chunks_expected"] = len(week_chunks)

    # ---- leg 2b: the scale_probe uniform-1% merge (touches EVERY
    # chunk by construction — O(table) rewrite is the correct plan) ----
    src = big.filter(F.pmod("event_id", F.lit(100)) == 0).withColumn(
        "value", F.col("value") + F.lit(1.0)
    )
    t0 = time.perf_counter()
    st = ht.merge_into(
        src, ["ts", "event_id"], matched_update={"value": "excluded.value"}
    )
    out["merge_s"] = round(time.perf_counter() - t0, 2)
    out["merge_updated"] = st["rows_updated"]

    # ---- leg 3: heartbeat + maxn serves isolated (r13 watch items) ----
    twc = ts.create_cagg(
        "ab_fam",
        ht,
        bucket_width="1 hour",
        aggs={},
        group_by=["event_type"],
        maxn_aggs={"mx": {"value": "value", "n": 3}},
        heartbeat_aggs={"hb": {"liveness": "5 minutes"}},
    )
    t0 = time.perf_counter()
    twc.refresh()
    out["fam_refresh_s"] = round(time.perf_counter() - t0, 2)
    for tag, fn in {
        "maxn_serve_day": lambda: twc.max_n_at_grain(
            "mx", grain="1 day", realtime=False
        ),
        "heartbeat_serve_day": lambda: twc.heartbeat_at_grain(
            "hb", grain="1 day", realtime=False
        ),
        "heartbeat_interp_serve_day": lambda: (
            twc.heartbeat_interpolated_at_grain(
                "hb", grain="1 day", realtime=False
            )
        ),
    }.items():
        t0 = time.perf_counter()
        out[f"{tag}_rows"] = fn().count()
        out[f"{tag}_s"] = round(time.perf_counter() - t0, 2)
    matdir = twc._mat().data_dir
    t0 = time.perf_counter()
    spark.read.option("basePath", matdir).parquet(matdir).groupBy(
        F.window("bucket", "1 day"), "event_type"
    ).agg(F.sum(F.col("hb")["n"])).count()
    out["mat_flat_groupby_s"] = round(time.perf_counter() - t0, 2)

    path = sys.argv[1] if len(sys.argv) > 1 else "AB_PROBE_r14.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
