#!/usr/bin/env python
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

value = sum of per-query wall seconds (excludes Spark session startup).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    from timescaledb_spark.queries import queries
    from timescaledb_spark.session import build_spark

    spark = build_spark(app_name="ts_bench")
    qs = queries()

    # warm the JVM + parquet footers with the cheapest query once
    warm = next(iter(qs.values()))
    warm(spark, SF_DIR).collect()

    times: dict[str, float] = {}
    for name, fn in sorted(qs.items()):
        t0 = time.perf_counter()
        df = fn(spark, SF_DIR)
        df.collect()
        times[name] = round(time.perf_counter() - t0, 4)
        # queries that cache intermediates (LSH bands, shingle sets) must
        # not bleed memory pressure into the next measurement
        spark.catalog.clearCache()

    m = re.search(r"sf([\d.]+)", SF_DIR)
    sf = float(m.group(1).rstrip(".")) if m else None
    out = {
        "metric": "headline_queries_total_wall",
        "value": round(sum(times.values()), 4),
        "unit": "sec",
        "queries": times,
        "sf": sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
