#!/usr/bin/env python
"""Gapfill interpolate long-series scale probe (r16 optimization round).

Measures the interpolate fill over ONE quarter-hour spine of n buckets
per series (4 series, 10% of buckets present) for the HEAD code (O(n)
mirrored next-value frame) against the pre-optimization code at
905ca33 (first() over ROWS 1 FOLLOWING..UNBOUNDED FOLLOWING — Spark's
UnboundedFollowingWindowFunctionFrame recomputes the aggregate per row,
O(n²) per series). The old side is only run at sizes where the
quadratic is still finishable; the curve makes the asymptote visible.

Writes GAPFILL_PROBE_r16.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import types
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BASE = "905ca33"
N_SERIES = 4
STEP_US = 900_000_000  # 15 min
T0_US = 1_704_067_200_000_000  # 2024-01-01


def old_gapfill_module():
    src = subprocess.run(
        ["git", "-C", REPO, "show",
         f"{BASE}:timescaledb_spark/operators/gapfill.py"],
        capture_output=True, text=True, check=True,
    ).stdout
    m = types.ModuleType("oldmod_gapfill_probe")
    m.__package__ = "timescaledb_spark.operators"
    m.__file__ = f"gapfill.py @{BASE}"
    sys.modules[m.__name__] = m
    exec(compile(src, m.__file__, "exec"), m.__dict__)
    return m


def series(spark, n_buckets: int, present_every: int = 10):
    from pyspark.sql import functions as F

    return (
        spark.range(n_buckets * N_SERIES)
        .select(
            (F.col("id") % N_SERIES).alias("user_id"),
            F.timestamp_micros(
                F.lit(T0_US)
                + (F.col("id") / N_SERIES).cast("long") * STEP_US
            ).alias("ts"),
            (F.col("id") % 1000).cast("double").alias("value"),
        )
        .filter(
            (F.col("id") / N_SERIES).cast("long") % present_every == 0
        )
        .localCheckpoint(eager=True)
    )


def run_one(mod, ev, n_buckets: int) -> tuple[float, int, float]:
    from pyspark.sql import functions as F

    start = datetime(2024, 1, 1, tzinfo=timezone.utc)
    finish = datetime.fromtimestamp(
        (T0_US + STEP_US * (n_buckets - 1)) / 1e6, tz=timezone.utc
    )
    t0 = time.perf_counter()
    df = mod.time_bucket_gapfill(
        ev, "15 minutes", "ts", start=start, finish=finish,
        group_by=["user_id"], aggs={"v": F.sum("value")},
        fill={"v": mod.interpolate()},
    )
    row = df.agg(
        F.sum("v").alias("s"), F.count(F.lit(1)).alias("c")
    ).collect()[0]
    return round(time.perf_counter() - t0, 2), int(row["c"]), float(row["s"])


def main() -> None:
    from timescaledb_spark.operators import gapfill as newG
    from timescaledb_spark.session import build_spark

    spark = build_spark(app_name="ts_gapfill_probe")
    oldG = old_gapfill_module()
    out: dict = {
        "shape": "4 series x n buckets (15-min spine), 10% present, "
                 "interpolate fill; wall seconds of fill + checksum agg",
        "new": {}, "old": {},
    }
    for n in (10_000, 20_000, 40_000, 200_000):
        ev = series(spark, n)
        dt, c, s = run_one(newG, ev, n)
        out["new"][str(n)] = {"sec": dt, "rows": c, "sum": s}
        print(f"new n={n}: {dt}s rows={c}", flush=True)
        if n <= 20_000:  # the quadratic is ~4 min at 20k and ~4x per 2x
            dt_o, c_o, s_o = run_one(oldG, ev, n)
            out["old"][str(n)] = {"sec": dt_o, "rows": c_o, "sum": s_o}
            assert (c_o, s_o) == (c, s), "old/new outputs diverge"
            print(f"old n={n}: {dt_o}s rows={c_o}", flush=True)
    # the old-code 200k leg is never attempted (the measured ~4x-per-
    # doubling quadratic extrapolates to hours); earlier versions baked a
    # hard-coded "aborted at >20 min" entry into the artifact on every
    # run, which a rerun on different hardware would emit as if measured
    # (r16 ADVICE) — the extrapolation now lives in OPTIMIZATION_r16.md
    # prose only, and the artifact records just what this run measured
    with open(os.path.join(REPO, "GAPFILL_PROBE_r16.json"), "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out["new"]))
    spark.stop()


if __name__ == "__main__":
    main()
