#!/usr/bin/env python
"""Streaming soak probe (VERDICT r8 next-round #5): run the scheduler +
streaming ingest + cagg refresh policy + a stateful dedup stream
end-to-end for SOAK_SECONDS and record, over time,

- state-store rows of the watermarked dedup query (must stay bounded by
  the keys-per-horizon, not grow with total input),
- cached-RDD entry count (the runtime counterpart of the AST
  persist-hygiene test: no operator may leak a pinned frame),
- cagg refresh latency per scheduler tick (must stay O(dirty range),
  flat while the dirty slice per tick is constant),
- chunk count and catalog read latency (metadata growth is linear by
  design; access cost must not be).

Prints one JSON line and writes ``soak_*`` keys for SCALE_PROBE_r{N}.

Usage: python scripts/soak_probe.py [out.json]
Env:   SOAK_SECONDS (default 300), SOAK_RATE (rows/s, default 20000)
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SOAK_SECONDS = int(os.environ.get("SOAK_SECONDS", "300"))
SOAK_RATE = int(os.environ.get("SOAK_RATE", "20000"))


def main() -> None:
    from pyspark.sql import functions as F

    from timescaledb_spark.session import TSSession, build_spark
    from timescaledb_spark.streaming.dedup import stream_dedup
    from timescaledb_spark.streaming.ingest import StreamIngest

    spark = build_spark(app_name="ts_soak_probe")
    sc = spark.sparkContext
    out: dict = {"soak_seconds": SOAK_SECONDS, "soak_rate": SOAK_RATE}

    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_soak_"))
    ht = ts.create_hypertable("soak", "ts", chunk_interval="30 seconds")
    # seed one row so the cagg can be created over a typed table
    seed = spark.createDataFrame(
        [("2024-01-01 00:00:00", 0, 0.0)], "ts string, k long, v double"
    ).select(F.col("ts").cast("timestamp"), "k", "v")
    ht.insert(seed)
    ts.create_cagg(
        "soak_minutely",
        "soak",
        bucket_width="30 seconds",
        aggs={"n": "count(1)", "sum_v": "sum(v)"},
    )
    jid = ts.jobs.add_continuous_aggregate_policy(
        "soak_minutely",
        start_offset=None,
        end_offset=None,
        schedule_interval=15,
    )
    # round 10: a policy-driven SKETCH cagg soaks alongside — its mat
    # state must stay bounded (buckets × ~2k sketch entries), refreshes
    # must stay O(dirty), and p95 serving from stored states must stay
    # flat while raw rows grow
    ts.create_cagg(
        "soak_sketch",
        "soak",
        bucket_width="30 seconds",
        aggs={},
        sketches={"skv": {"value": "v", "alpha": 0.01}},
    )
    ts.jobs.add_continuous_aggregate_policy(
        "soak_sketch",
        start_offset=None,
        end_offset=None,
        schedule_interval=15,
    )
    # round 11: a policy-driven TIME-WEIGHT + CANDLESTICK cagg soaks
    # alongside — within-bucket window states must refresh O(dirty) and
    # whole-table serving from the states must stay flat
    ts.create_cagg(
        "soak_twc",
        "soak",
        bucket_width="30 seconds",
        aggs={},
        time_weights={"tw": {"value": "v", "tiebreak": ["k"]}},
        candlesticks={"ohlc": {"price": "v"}},
    )
    ts.jobs.add_continuous_aggregate_policy(
        "soak_twc",
        start_offset=None,
        end_offset=None,
        schedule_interval=15,
    )

    # ingest stream: rate source mapped onto the hypertable schema —
    # event time = wall clock, so new 30s chunks appear continuously
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", SOAK_RATE)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % 1_000_000).alias("k"),
            (F.col("value") % 997).cast("double").alias("v"),
        )
    )
    ingest_q = StreamIngest(ht, tempfile.mkdtemp(prefix="soak_ck_")).start(
        rate, trigger={"processingTime": "5 seconds"}
    )

    # stateful dedup stream on a second rate source: keys cycle every
    # KEYSPACE rows, horizon = 60s → state must plateau at
    # ~keys-seen-per-horizon, not grow with total rows processed
    KEYSPACE = 200_000
    rate2 = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", SOAK_RATE)
        .load()
        .select(
            F.col("timestamp").alias("ts"),
            (F.col("value") % KEYSPACE).alias("k"),
        )
    )
    dedup_q = (
        stream_dedup(rate2, ["k"], ts_col="ts", delay="60 seconds")
        .writeStream.format("noop")
        .option(
            "checkpointLocation", tempfile.mkdtemp(prefix="soak_dd_ck_")
        )
        .trigger(processingTime="5 seconds")
        .start()
    )

    # round-16: a curation tick runs the composed pipeline (flags ->
    # exact dedup -> MinHash -> components) on a static corpus every
    # other sample and drops the result: pipeline ops pin frames via
    # localCheckpoint ONLY, so after a GC the cached-RDD count must fall
    # back to baseline — the runtime counterpart of the extended
    # .cache() AST invariant (a CacheManager pin would accumulate here
    # forever, the round-15 hygiene finding)
    from timescaledb_spark.pipeline.curate import curate_corpus

    curate_src = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("the quick brown fox jumps over the lazy dog number "),
            (F.col("id") % 500).cast("string"),
            F.lit(
                " and it keeps running through the field because the "
                "morning is cold and the work is long"
            ),
        ).alias("text"),
    )

    samples: list[dict] = []
    t_end = time.time() + SOAK_SECONDS
    while time.time() < t_end:
        time.sleep(15)
        tick: dict = {"t": round(time.time() - (t_end - SOAK_SECONDS), 1)}
        t0 = time.perf_counter()
        ran = ts.jobs.run_pending()
        tick["jobs_ran"] = len(ran)
        tick["refresh_s"] = round(time.perf_counter() - t0, 2)
        lp = dedup_q.lastProgress
        if lp and lp.get("stateOperators"):
            so = lp["stateOperators"][0]
            tick["state_rows"] = so.get("numRowsTotal")
        tick["cached_rdds"] = len(sc._jsc.sc().getRDDStorageInfo())
        t0 = time.perf_counter()
        tick["chunks"] = len(ht.chunks())
        tick["catalog_read_ms"] = round(
            (time.perf_counter() - t0) * 1000, 1
        )
        # serve a whole-table p95 from the sketch cagg's stored states —
        # latency must stay flat while raw rows grow (never a raw
        # rescan below the watermark)
        t0 = time.perf_counter()
        p = (
            ts.get_cagg("soak_sketch")
            .quantiles([0.95], grain="all", realtime=False)
            .collect()
        )
        tick["sketch_p95_s"] = round(time.perf_counter() - t0, 2)
        tick["sketch_p95"] = p[0]["p95"] if p else None
        # whole-table time-weighted average from stored partials —
        # same flatness contract as the sketch serve
        t0 = time.perf_counter()
        tw = (
            ts.get_cagg("soak_twc")
            .time_weighted_at_grain("tw", grain="all", realtime=False)
            .collect()
        )
        tick["tw_serve_s"] = round(time.perf_counter() - t0, 2)
        tick["tw_avg"] = (
            round(tw[0]["tw_avg"], 3)
            if tw and tw[0]["tw_avg"] is not None
            else None
        )
        if len(samples) % 2 == 0:
            import gc

            t0 = time.perf_counter()
            curate_corpus(curate_src, min_required_stops=0).count()
            tick["curate_s"] = round(time.perf_counter() - t0, 2)
            gc.collect()  # drop the py4j refs -> JVM weak refs
            sc._jvm.System.gc()  # let the ContextCleaner see them
            time.sleep(1.0)
            tick["cached_rdds_post_curate"] = len(
                sc._jsc.sc().getRDDStorageInfo()
            )
        samples.append(tick)

    ingest_q.stop()
    dedup_q.stop()

    out["soak_samples"] = samples
    out["soak_rows_ingested"] = ht.approximate_row_count()
    out["soak_final_chunks"] = len(ht.chunks())
    out["soak_cagg_rows"] = ts.get_cagg("soak_minutely").read().count()
    # sketch-state boundedness: rows = buckets, entries per row ≤ ~2k
    sk_mat = ts.get_cagg("soak_sketch").read(realtime=False)
    srow = sk_mat.agg(
        F.count(F.lit(1)).alias("rows"),
        F.max(F.size("skv")).alias("max_entries"),
    ).collect()[0]
    out["soak_sketch_mat_rows"] = srow["rows"]
    out["soak_sketch_max_entries_per_state"] = srow["max_entries"]
    # tw/candle mat boundedness: exactly one fixed-size state row per
    # bucket regardless of raw row count
    out["soak_twc_mat_rows"] = (
        ts.get_cagg("soak_twc").read(realtime=False).count()
    )

    state_series = [s["state_rows"] for s in samples if s.get("state_rows")]
    cache_series = [s["cached_rdds"] for s in samples]
    refresh_series = [s["refresh_s"] for s in samples if s["jobs_ran"]]
    # flatness contracts (soft asserts recorded, hard exit on violation):
    # state bounded by keyspace + slack (watermark horizon < keyspace
    # cycle time would plateau lower); cache entries must end at zero
    # leaked frames; late refreshes must not trend upward vs early ones
    out["soak_state_max"] = max(state_series) if state_series else None
    out["soak_state_bounded"] = (
        max(state_series) <= KEYSPACE * 1.5 if state_series else None
    )
    out["soak_cache_max"] = max(cache_series)
    out["soak_cache_flat"] = max(cache_series) <= 1
    if len(refresh_series) >= 4:
        half = len(refresh_series) // 2
        early = sum(refresh_series[:half]) / half
        late = sum(refresh_series[half:]) / (len(refresh_series) - half)
        out["soak_refresh_early_s"] = round(early, 2)
        out["soak_refresh_late_s"] = round(late, 2)
        out["soak_refresh_flat"] = late <= max(early * 2.0, early + 2.0)

    cur_series = [
        s["cached_rdds_post_curate"]
        for s in samples
        if "cached_rdds_post_curate" in s
    ]
    if cur_series:
        out["soak_curate_cache_series"] = cur_series
        # a CacheManager leak grows ~3 entries per tick, linearly; the
        # localCheckpoint lifecycle keeps the count at a small constant
        # (cleanup is async, so individual samples may lag a tick)
        out["soak_curate_cache_flat"] = max(cur_series) <= 6
        out["soak_curate_ticks"] = len(cur_series)

    ok = (
        bool(out.get("soak_state_bounded"))
        and bool(out.get("soak_cache_flat"))
        and out.get("soak_refresh_flat", True)
        and out.get("soak_curate_cache_flat", True)
    )
    out["soak_ok"] = ok

    print(json.dumps(out))
    with open(sys.argv[1] if len(sys.argv) > 1 else "SOAK_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
