#!/usr/bin/env python
"""Round-17 streaming per-batch floor probe (VERDICT r16 item 4).

Same-session A/B of q_stream_near_dedup between the working-tree code
and the git-HEAD code (pre-change), interleaved, plus a breakdown of
where the gate's wall goes (staging vs stream run) and the per-batch
durations of a memory-sink streaming gate (q_stream_windowed shape) so
the residual micro-batch floor is quantified rather than guessed.

Usage: python scripts/stream_floor_probe.py [out.json]
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), PROBE_N (3)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N = int(os.environ.get("PROBE_N", "3"))


def oldmod(relpath: str, ref: str = "HEAD"):
    """Load the git-``ref`` version of a repo module as a separate module
    object (same-process A/B against the working-tree code)."""
    src = subprocess.run(
        ["git", "-C", REPO, "show", f"{ref}:{relpath}"],
        capture_output=True, text=True, check=True,
    ).stdout
    mod = types.ModuleType("oldmod_" + relpath.replace("/", "_"))
    mod.__package__ = relpath.rsplit("/", 1)[0].replace("/", ".")
    mod.__file__ = os.path.join(REPO, relpath) + " @" + ref
    exec(compile(src, mod.__file__, "exec"), mod.__dict__)
    return mod


def main() -> None:
    from timescaledb_spark.session import build_spark
    from timescaledb_spark.streaming import neardedup as new_nd

    spark = build_spark(app_name="ts_stream_floor_probe")
    old_nd = oldmod("timescaledb_spark/streaming/neardedup.py")
    out: dict = {"sf_dir": SF_DIR, "n": N, "gate": [], "staging": []}

    # warm
    spark.read.parquet(os.path.join(SF_DIR, "documents.parquet")).count()

    def run_gate(mod) -> tuple[float, float, int]:
        t0 = time.perf_counter()
        sdf = mod.staged_id_stream(spark, SF_DIR, n_batches=4)
        t_stage = time.perf_counter() - t0
        t1 = time.perf_counter()
        res = mod.stream_near_dedup(sdf, max_hamming=3)
        rows = res.count()
        t_run = time.perf_counter() - t1
        return round(t_stage, 3), round(t_run, 3), rows

    rows_seen = set()
    for i in range(N):
        for tag, mod in (("old", old_nd), ("new", new_nd)):
            st, ru, rows = run_gate(mod)
            out["gate"].append(
                {"code": tag, "i": i, "staging_s": st, "stream_s": ru,
                 "total_s": round(st + ru, 3), "rows": rows}
            )
            rows_seen.add((tag, rows))
            spark.catalog.clearCache()
    out["survivor_rows_agree"] = len({r for _, r in rows_seen}) == 1

    # memory-sink micro-batch floor: drive the q_stream_windowed shape
    # directly and record per-batch durations from the progress events
    import uuid as _uuid

    from pyspark.sql import functions as F

    from timescaledb_spark.streaming.replay import heartbeat_stream
    from timescaledb_spark.streaming.windows import windowed_agg

    sdf = heartbeat_stream(spark, SF_DIR, "events")
    agg = windowed_agg(
        sdf, "ts",
        {"n": "cast(count(1) as bigint)", "sum_v": "sum(value)"},
        window="1 day", group_by=("event_type",), watermark="1 hour",
    )
    sink = f"floor_{_uuid.uuid4().hex[:8]}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        q = (
            agg.writeStream.format("memory").queryName(sink)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination()
        prog = []
        for p in q.recentProgress:
            if not isinstance(p, dict):
                p = json.loads(p.json) if hasattr(p, "json") else dict(p)
            prog.append(
                {
                    "batch": p.get("batchId"),
                    "rows": p.get("numInputRows"),
                    "durationMs": p.get("durationMs"),
                }
            )
        out["windowed_batches"] = prog
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    line = json.dumps(out, separators=(",", ":"))
    print(line)
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "STREAM_FLOOR_PROBE_r17.json"
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
