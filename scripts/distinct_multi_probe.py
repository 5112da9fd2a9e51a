#!/usr/bin/env python
"""Round-17 prove-or-fix probe for q_distinct_multi (VERDICT r16 item 7).

The driver's r16 bench recorded 7.4s; the builder's warm re-measure said
2.6s "box noise" — unproven. This probe settles it in ONE session:

  * N interleaved end-to-end runs of q_distinct_multi and its sibling
    q_distinct_skipscan (same rig shape, 3.3s driver-side) — if the gap
    reproduces warm, it is real; if both converge, it was box drift.
  * a phase breakdown of one q_distinct_multi run (insert / enable /
    compress / post-compress insert / distinct+collect) so any real cost
    is attributed to a rig phase, not guessed.

Prints one JSON line and writes it to DISTINCT_MULTI_PROBE_r17.json.
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
N = int(os.environ.get("PROBE_N", "4"))


def main() -> None:
    from pyspark.sql import functions as F

    from timescaledb_spark.queries import queries
    from timescaledb_spark.session import build_spark

    spark = build_spark(app_name="ts_distinct_multi_probe")
    qs = queries()
    out: dict = {"sf_dir": SF_DIR, "n": N, "interleaved": []}

    # warm like the bench
    qs["q_bucket_hourly"](spark, SF_DIR).collect()

    for i in range(N):
        for name in ("q_distinct_multi", "q_distinct_skipscan"):
            spark.sparkContext.setJobDescription(f"probe {name} #{i}")
            t0 = time.perf_counter()
            qs[name](spark, SF_DIR).collect()
            out["interleaved"].append(
                {"q": name, "i": i, "s": round(time.perf_counter() - t0, 3)}
            )
            spark.catalog.clearCache()

    # phase breakdown of one run (mirrors the gate body exactly)
    from timescaledb_spark.compression import compress_chunks, enable_columnstore
    from timescaledb_spark.session import TSSession
    from timescaledb_spark.sources import load_table

    phases: dict = {}
    t0 = time.perf_counter()
    root = tempfile.mkdtemp(prefix="ts_skipmulti_probe_")
    ts = TSSession(spark, root)
    ht = ts.create_hypertable("events", "ts", chunk_interval="7 days")
    ev = load_table(spark, SF_DIR, "events").withColumn(
        "seg", (F.col("user_id") % 8).cast("long")
    )
    phases["setup_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    ht.insert(ev)
    phases["insert_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    enable_columnstore(ht, segmentby=["event_type", "seg"], orderby=[("ts", "asc")])
    phases["enable_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    compress_chunks(ht)
    phases["compress_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    extra = ev.filter(F.col("event_id") < 40).withColumn(
        "event_type", F.concat(F.lit("x_"), F.col("event_type"))
    )
    ht.insert(extra)
    phases["extra_insert_s"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    res = ht.distinct_values(["event_type", "seg"])
    res.collect()
    phases["distinct_collect_s"] = round(time.perf_counter() - t0, 3)
    phases["distinct_stats"] = ht.distinct_values_stats
    out["phases"] = phases

    # plan dump for the judge
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        res.explain("formatted")
    os.makedirs(os.path.join(REPO, "plans", "r17"), exist_ok=True)
    with open(
        os.path.join(REPO, "plans", "r17", "q_distinct_multi_before.txt"), "w"
    ) as f:
        f.write(buf.getvalue())

    line = json.dumps(out, separators=(",", ":"))
    print(line)
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "DISTINCT_MULTI_PROBE_r17.json"
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
