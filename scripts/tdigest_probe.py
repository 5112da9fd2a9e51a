#!/usr/bin/env python
"""Round-14 focused probe: t-digest at-grain serve cost vs the flat
groupBy bar (VERDICT r13 task #2 — the one family above the ≤3x serve
bar at x100: 10.71s vs 3.07s).

Builds the scale_probe big-table shape (events x MULT, hourly
tdigest-only cagg over event_type), then times:
- the day-grain serve (merge_states + quantile extraction),
- the flat groupBy bar over the same mat table,
- the serve at the cagg's own grain (pure extraction, no merge).

Usage: SCALE_PROBE_MULT=20 python scripts/tdigest_probe.py [out.json]
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

    spark = build_spark(app_name="ts_tdigest_probe")
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
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_tdprobe_"))
    ht = ts.create_hypertable("big", "ts", chunk_interval="6 hours")
    t0 = time.perf_counter()
    ht.insert(big)
    out["insert_s"] = round(time.perf_counter() - t0, 2)
    out["raw_chunks"] = len(ht.chunks())

    cagg = ts.create_cagg(
        "big_td",
        ht,
        bucket_width="1 hour",
        aggs={},
        group_by=["event_type"],
        tdigest_aggs={"td": {"value": "value", "delta": 200}},
    )
    t0 = time.perf_counter()
    cagg.refresh()
    out["refresh_s"] = round(time.perf_counter() - t0, 2)
    out["mat_chunks"] = len(cagg._mat().chunks())

    for tag, fn in {
        "serve_day": lambda: cagg.tdigest_quantiles_at_grain(
            [0.95], "td", grain="1 day", realtime=False
        ),
        "serve_all": lambda: cagg.tdigest_quantiles_at_grain(
            [0.5, 0.95], "td", grain="all", realtime=False
        ),
        "serve_own_grain": lambda: cagg.tdigest_quantiles_at_grain(
            [0.95], "td", grain=None, realtime=False
        ),
        "rank_day": lambda: cagg.tdigest_rank_at_grain(
            50.0, "td", grain="1 day", realtime=False
        ),
    }.items():
        t0 = time.perf_counter()
        out[f"{tag}_rows"] = fn().count()
        out[f"{tag}_s"] = round(time.perf_counter() - t0, 2)

    # the VERDICT r11 serve bar: within ~3x of a flat groupBy over the
    # same mat table
    matdir = cagg._mat().data_dir
    t0 = time.perf_counter()
    spark.read.option("basePath", matdir).parquet(matdir).groupBy(
        F.window("bucket", "1 day"), "event_type"
    ).agg(F.sum(F.col("td")["n"])).count()
    out["mat_flat_groupby_s"] = round(time.perf_counter() - t0, 2)
    out["serve_day_vs_flat"] = round(
        out["serve_day_s"] / max(out["mat_flat_groupby_s"], 1e-9), 2
    )

    path = sys.argv[1] if len(sys.argv) > 1 else "TDIGEST_PROBE.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
