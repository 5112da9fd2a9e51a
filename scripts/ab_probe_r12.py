#!/usr/bin/env python
"""Round-12 A/B of the four x100 probe metrics that drifted 2-3x
between SCALE_PROBE_r10 and SCALE_PROBE_r11 (VERDICT r11 wrong #2):
``stream_dedup_evict_s``, ``ordered_scan_analyze_s``,
``semdedup_100k_s``, ``asap_2m_10kseries_s``.

BENCH_AB_r10 protocol: sequential same-machine runs of ONLY these legs
— the caller passes the repo checkout to measure, so
    python scripts/ab_probe_r12.py /root/repo A.json          (HEAD)
    python scripts/ab_probe_r12.py /root/repo B.json          (HEAD again)
    python scripts/ab_probe_r12.py /path/to/r10-worktree C.json
brackets run-to-run variance (A vs B) and pins code vs environment
(A/B vs C). Env: SCALE_PROBE_MULT (default 100 = the x100 tier),
SCALE_PROBE_STREAM_KEYS (default 10M).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = sys.argv[1] if len(sys.argv) > 1 else os.path.dirname(
    os.path.dirname(os.path.abspath(__file__))
)
OUT = sys.argv[2] if len(sys.argv) > 2 else "AB_PROBE.json"
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALE_PROBE_MULT", "100"))
N_KEYS = int(os.environ.get("SCALE_PROBE_STREAM_KEYS", "10000000"))


def main() -> None:
    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession, build_spark
    from timescaledb_spark.sources import load_table

    spark = build_spark(app_name="ts_ab_probe_r12")
    out: dict = {
        "repo": REPO,
        "sf_dir": SF_DIR,
        "mult": MULT,
        "stream_keys": N_KEYS,
    }
    try:
        import subprocess

        out["commit"] = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True,
        ).stdout.strip()
        out["load_1min"] = os.getloadavg()[0]
    except Exception:
        pass

    # ---- big table (same build as scale_probe) for the ordered leg ----
    ev = load_table(spark, SF_DIR, "events")
    big = ev.crossJoin(
        spark.range(MULT).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("ts") + F.expr("make_interval(0,0,0,45,0,0,0)") * F.col("_rep")).alias("ts"),
        (F.col("event_id") + F.col("_rep") * F.lit(100_000_000)).alias("event_id"),
        "user_id", "event_type", "value", "props",
    )
    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_ab12_"))
    ht = ts.create_hypertable("big", "ts", chunk_interval="6 hours")
    t0 = time.perf_counter()
    ht.insert(big)
    out["insert_s"] = round(time.perf_counter() - t0, 2)
    out["chunks"] = len(ht.chunks())

    # ---- leg 1: ordered_scan_analyze (approximate_row_count cold) ----
    t0 = time.perf_counter()
    ht.approximate_row_count()
    out["ordered_scan_analyze_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    odf = ht.read_ordered(plan_cap=256)
    odf.limit(5).collect()
    out["ordered_scan_first_rows_s"] = round(time.perf_counter() - t0, 2)

    # ---- leg 2: stream_dedup eviction ---------------------------------
    from timescaledb_spark.streaming.dedup import stream_dedup

    sd_src = tempfile.mkdtemp(prefix="ab_sd_src_")
    sd_ck = tempfile.mkdtemp(prefix="ab_sd_ck_")

    def _sd_batch(ts_lit: str, ids, tag: int) -> None:
        ids.select(
            F.lit(ts_lit).cast("timestamp").alias("ts"),
            F.col("id").alias("k"),
        ).write.mode("append").parquet(os.path.join(sd_src, f"b{tag}"))

    def _sd_run() -> dict:
        sdf = (
            spark.readStream.schema("ts timestamp, k long")
            .option("maxFilesPerTrigger", 1_000_000)
            .parquet(os.path.join(sd_src, "*"))
        )
        q = (
            stream_dedup(sdf, ["k"], ts_col="ts", delay="1 hour")
            .writeStream.format("noop")
            .option("checkpointLocation", sd_ck)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        lp = q.lastProgress
        so = (lp.get("stateOperators") or [{}])[0] if lp else {}
        return {"rows": so.get("numRowsTotal")}

    _sd_batch("2024-01-01 00:00:00", spark.range(N_KEYS), 1)
    t0 = time.perf_counter()
    r1 = _sd_run()
    out["stream_dedup_load_s"] = round(time.perf_counter() - t0, 2)
    _sd_batch("2024-01-01 03:00:00", spark.range(1000), 2)
    _sd_run()
    _sd_batch("2024-01-01 03:00:01", spark.range(1), 3)
    t0 = time.perf_counter()
    r3 = _sd_run()
    out["stream_dedup_evict_s"] = round(time.perf_counter() - t0, 2)
    out["stream_dedup_state_evicted"] = bool(
        (r1["rows"] or 0) >= N_KEYS and (r3["rows"] or 0) <= 2000
    )

    # ---- leg 3: ASAP 2M x 10k series ----------------------------------
    from timescaledb_spark.pipeline.smoothing import asap_smooth

    series = spark.range(2_000_000).select(
        (F.col("id") % 10_000).alias("uid"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000)
            + (F.col("id") / 10_000).cast("long") * 60_000_000
        ).alias("ts"),
        (F.sin(F.col("id") / 7.0) * 10 + F.sin(F.col("id") * 13.0)).alias(
            "value"
        ),
    )
    t0 = time.perf_counter()
    asap_smooth(series, "ts", "value", resolution=24, by=["uid"]).count()
    out["asap_2m_10kseries_s"] = round(time.perf_counter() - t0, 2)

    # ---- leg 4: SemDeDup 100k x 64 dims -------------------------------
    from timescaledb_spark.pipeline.dedup import semantic_dedup

    vecs = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.sin(F.col("id") % 997 * i / 9.0)
            + F.sin(F.col("id") * i / 1001.0) * 0.05,
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    semantic_dedup(vecs, threshold=0.995, centroid_stride=100).agg(
        F.count(F.lit(1))
    ).collect()
    out["semdedup_100k_s"] = round(time.perf_counter() - t0, 2)

    try:
        out["load_1min_end"] = os.getloadavg()[0]
    except Exception:
        pass
    print(json.dumps(out))
    with open(OUT, "w") as f:
        f.write(json.dumps(out, indent=1) + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
