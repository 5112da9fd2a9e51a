#!/usr/bin/env python
"""Scale probe: exercise the engine well beyond the driver SFs to catch
scaling cliffs the gates can't see — a many-chunk catalog (thousands of
chunk rows, the 100 TB metadata shape) and multi-million-row operators.

Inputs are the driver testdata multiplied row-wise with shifted
timestamps/ids (synthetic blow-up for stress only — correctness gates
still run exclusively on the pristine tables). Prints one JSON line.

Usage: python scripts/scale_probe.py [out.json]
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

    spark = build_spark(app_name="ts_scale_probe")
    out: dict = {"sf_dir": SF_DIR, "mult": MULT}
    out_path = sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE.json"

    def flush() -> None:
        # checkpoint partial results: a late-section failure (e.g. an
        # OOM in the 10M-key streaming leg) must not discard the
        # finished sections' timings
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    ev = load_table(spark, SF_DIR, "events")
    n0 = ev.count()
    # MULT shifted copies: ~n0*MULT rows spanning MULT times the range
    span_days = 45
    big = ev.crossJoin(
        spark.range(MULT).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("ts") + F.expr(f"make_interval(0,0,0,{span_days},0,0,0)") * F.col("_rep")).alias("ts"),
        (F.col("event_id") + F.col("_rep") * F.lit(100_000_000)).alias("event_id"),
        "user_id", "event_type", "value", "props",
    )
    n = n0 * MULT
    out["rows"] = n

    ts = TSSession(spark, tempfile.mkdtemp(prefix="ts_scale_"))
    # 6-hour chunks over MULT*45 days -> thousands of chunks
    ht = ts.create_hypertable("big", "ts", chunk_interval="6 hours")
    t0 = time.perf_counter()
    ht.insert(big)
    out["insert_s"] = round(time.perf_counter() - t0, 2)
    out["chunks"] = len(ht.chunks())

    t0 = time.perf_counter()
    pruned = ht.read(start="2024-03-01", end="2024-03-08").count()
    out["pruned_read_s"] = round(time.perf_counter() - t0, 2)
    out["pruned_rows"] = pruned

    t0 = time.perf_counter()
    ht.df().groupBy(F.window("ts", "1 hour")).agg(
        F.count(F.lit(1)), F.avg("value")
    ).count()
    out["bucket_agg_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    out["approx_rows"] = ht.approximate_row_count()
    out["approx_count_s"] = round(time.perf_counter() - t0, 2)
    # warm path: counts were written back to the chunk catalog rows, so
    # the second call is catalog-only — the pg-stats analog the
    # reference answers from (sql/size_utils.sql:311)
    t0 = time.perf_counter()
    assert ht.approximate_row_count() == out["approx_rows"]
    out["approx_count_warm_s"] = round(time.perf_counter() - t0, 2)

    # chunk-pruned UPDATE touching one week
    t0 = time.perf_counter()
    ht.update_where(
        {"value": "value * 2"},
        "event_type = 'click'",
        start="2024-03-01",
        end="2024-03-08",
    )
    out["pruned_update_s"] = round(time.perf_counter() - t0, 2)

    # MERGE of a 1%-sized source into the big table
    src = big.filter(F.pmod("event_id", F.lit(100)) == 0).withColumn(
        "value", F.col("value") + F.lit(1.0)
    )
    t0 = time.perf_counter()
    st = ht.merge_into(
        src, ["ts", "event_id"], matched_update={"value": "excluded.value"}
    )
    out["merge_s"] = round(time.perf_counter() - t0, 2)
    out["merge_updated"] = st["rows_updated"]
    flush()

    # ---- skewed space dimension (probe v2): ONE hot device carries 50%
    # of all rows — the shape that melts naive hash partitioning at
    # 100 TB. Measures: (a) ingest through a space dimension with the
    # hot key, (b) plain vs salted hot-key aggregation, (c) skewed join
    # with AQE skew mitigation enabled.
    from timescaledb_spark.pipeline.skew import salted_agg, salted_join

    skewed = big.withColumn(
        "user_id",
        F.when(F.rand(7) < F.lit(0.5), F.lit(1)).otherwise(F.col("user_id")),
    )
    ts2 = TSSession(spark, tempfile.mkdtemp(prefix="ts_skew_"))
    ht2 = ts2.create_hypertable(
        "skewed", "ts", chunk_interval="7 days",
        space_column="user_id", num_partitions=8,
    )
    t0 = time.perf_counter()
    ht2.insert(skewed)
    out["skew_insert_s"] = round(time.perf_counter() - t0, 2)
    out["skew_chunks"] = len(ht2.chunks())

    t0 = time.perf_counter()
    ht2.df().groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.avg("value").alias("a")
    ).count()
    out["skew_agg_plain_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    salted_agg(
        ht2.df(),
        keys=["user_id"],
        aggs={"n": ("count", "value"), "s": ("sum", "value")},
        salt_n=16,
    ).count()
    out["skew_agg_salted_s"] = round(time.perf_counter() - t0, 2)

    dim = ht2.df().select("user_id").distinct().withColumn(
        "tier", F.pmod("user_id", F.lit(3))
    )
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    t0 = time.perf_counter()
    ht2.df().join(dim.hint("merge"), "user_id").groupBy("tier").count().count()
    out["skew_join_aqe_s"] = round(time.perf_counter() - t0, 2)

    t0 = time.perf_counter()
    salted_join(ht2.df(), dim, keys=["user_id"], salt_n=16).groupBy(
        "tier"
    ).count().count()
    out["skew_join_salted_s"] = round(time.perf_counter() - t0, 2)
    flush()

    # ---- round-7 operators at scale ------------------------------------
    # connected components: 1M edges (500k-node chains of length 4 plus
    # cross links) — worst realistic dedup shape, O(log n) star rounds
    from timescaledb_spark.pipeline.dedup import dup_clusters

    edges = (
        spark.range(1_000_000)
        .select(
            F.col("id").alias("id_a"),
            F.when(F.col("id") % 4 == 3, F.col("id") - 3)
            .otherwise(F.col("id") + 1)
            .alias("id_b"),
        )
    )
    t0 = time.perf_counter()
    n_members = dup_clusters(edges).count()
    out["cc_1m_edges_s"] = round(time.perf_counter() - t0, 2)
    out["cc_members"] = n_members

    # online chunk merge: DML lock held only for freeze+commit
    from timescaledb_spark.chunkops import merge_chunks_concurrently

    cs = ht.chunks()[:4]
    t0 = time.perf_counter()
    merge_chunks_concurrently(ht, [c["range_start"] for c in cs])
    out["merge_concurrent_4chunks_s"] = round(time.perf_counter() - t0, 2)

    # UDAF (grouped-agg pandas UDF) over the full 2M rows
    ts.register_aggregate(
        "p90_np",
        lambda v: float(__import__("numpy").quantile(v, 0.9)),
        "double",
    )
    t0 = time.perf_counter()
    ht.df().groupBy("user_id").agg(F.expr("p90_np(value)")).count()
    out["udaf_2m_rows_s"] = round(time.perf_counter() - t0, 2)

    # ---- round-8: the two flagship custom operators at scale -----------
    # gapfill over a ~20M-row frame (big ×10): hourly buckets per
    # event_type with locf — measures the window+explode gap expansion
    # at (groups × full-span hours) output cardinality
    from timescaledb_spark.operators.gapfill import locf, time_bucket_gapfill

    mm2 = big.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx")).collect()[0]
    gap_in = big.crossJoin(
        spark.range(10).select(F.col("id").alias("_r2"))
    ).select("ts", "event_type", (F.col("value") + F.col("_r2")).alias("value"))
    t0 = time.perf_counter()
    gf = time_bucket_gapfill(
        gap_in,
        "1 hour",
        "ts",
        start=mm2["mn"],
        finish=mm2["mx"],
        group_by=["event_type"],
        aggs={"avg_v": F.avg("value")},
        fill={"avg_v": locf()},
    )
    out["gapfill_20m_rows"] = gf.count()
    out["gapfill_20m_s"] = round(time.perf_counter() - t0, 2)
    flush()

    # cagg over the 2,400-chunk hypertable: initial refresh vs a dirty
    # refresh after late data lands in ~1% of the time span — the dirty
    # pass must be O(dirty range), not O(table)
    cagg = ts.create_cagg(
        "big_cagg",
        ht,
        bucket_width="1 hour",
        aggs={"n": "count(*)", "s": "sum(value)"},
    )
    t0 = time.perf_counter()
    cagg.refresh()
    out["cagg_initial_refresh_s"] = round(time.perf_counter() - t0, 2)
    lo_us = int(mm2["mn"].timestamp() * 1_000_000)
    hi_us = int(mm2["mx"].timestamp() * 1_000_000)
    w_lo = lo_us + int((hi_us - lo_us) * 0.50)
    w_hi = w_lo + int((hi_us - lo_us) * 0.01)
    late = big.filter(
        (F.unix_micros("ts") >= w_lo) & (F.unix_micros("ts") < w_hi)
    ).withColumn("event_id", F.col("event_id") + F.lit(10_000_000_000))
    ht.insert(late)
    t0 = time.perf_counter()
    ranges = cagg.refresh()
    out["cagg_refresh_dirty_1pct_s"] = round(time.perf_counter() - t0, 2)
    out["cagg_dirty_ranges"] = len(ranges)
    flush()

    # ---- round-11/12: EVERY partial family at the many-chunk catalog:
    # one refresh materializes all states (one window/aggregate pass
    # per family over the raw scan, joined 1:1), and serving any grain
    # is a state-merge over mat rows only — each family's serve timed
    # separately so the O(states) serve cost is visible next to the
    # O(raw) refresh cost. Round 12: the r11 15s serves were the mat
    # READ path, not the merge — ~50-row mat chunks from the old
    # 10-bucket chunk interval made Spark build a 1,460-root file
    # index per serve; the reference's interval x10 rule plus the
    # single-root scan fast path cut tw/candle serves ~5x at MULT=20
    # (profile_serve.py artifact).
    twc = ts.create_cagg(
        "big_twc",
        ht,
        bucket_width="1 hour",
        aggs={},
        group_by=["event_type"],
        sketches={"sk": {"value": "value"}},
        counters={"cnt": {"value": "value", "tiebreak": ["event_id"]}},
        gauges={"gg": {"value": "value", "tiebreak": ["event_id"]}},
        stats_aggs={
            "st": {"value": "value"},
            "st2": {"value": "value", "y": "cast(user_id as double)"},
        },
        time_weights={"tw": {"value": "value", "tiebreak": ["event_id"]}},
        candlesticks={
            "ohlc": {"price": "value", "tiebreak": ["event_id"]}
        },
        state_aggs={"sa": {"state": "event_type"}},
        freq_aggs={"fq": {"value": "cast(user_id % 20 as string)"}},
        maxn_aggs={"mx": {"value": "value", "n": 3}},
        heartbeat_aggs={"hb": {"liveness": "5 minutes"}},
        tdigest_aggs={"td": {"value": "value", "delta": 200}},
    )
    t0 = time.perf_counter()
    twc.refresh()
    out["allfam_cagg_refresh_s"] = round(time.perf_counter() - t0, 2)
    out["allfam_mat_chunks"] = len(twc._mat().chunks())
    serves = {
        "tw_serve_day": lambda: twc.time_weighted_at_grain(
            "tw", grain="1 day", realtime=False
        ),
        "candle_serve_day": lambda: twc.candlestick_at_grain(
            "ohlc", grain="1 day", realtime=False
        ),
        "sketch_p95_day": lambda: twc.quantiles(
            [0.95], sketch_col="sk", grain="1 day", realtime=False
        ),
        "counter_serve_day": lambda: twc.counter_at_grain(
            "cnt", grain="1 day", realtime=False
        ),
        "gauge_serve_day": lambda: twc.gauge_at_grain(
            "gg", grain="1 day", realtime=False
        ),
        "stats_serve_day": lambda: twc.stats_at_grain(
            "st", grain="1 day", realtime=False
        ),
        "stats2d_serve_day": lambda: twc.stats2d_at_grain(
            "st2", grain="1 day", realtime=False
        ),
        "state_serve_day": lambda: twc.state_durations_at_grain(
            "sa", grain="1 day", realtime=False
        ),
        "topn_serve_day": lambda: twc.topn_at_grain(
            "fq", n=5, grain="1 day", realtime=False
        ),
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
        "tdigest_p95_serve_day": lambda: twc.tdigest_quantiles_at_grain(
            [0.95], "td", grain="1 day", realtime=False
        ),
    }
    for key, mk in serves.items():
        t0 = time.perf_counter()
        out[f"{key}_rows"] = mk().count()
        out[f"{key}_s"] = round(time.perf_counter() - t0, 2)
    # ---- round-13: REALTIME-union serves (VERDICT r12 task #1) ---------
    # the one flagship serve shape with no prior scale datapoint: the
    # realtime view unions mat states below the watermark with raw-side
    # partial builds above it over the 12k-chunk raw table. Production
    # shape: a late tail lands AFTER the refresh, so the watermark sits
    # below max(ts) and every realtime serve must (a) chunk-prune the
    # raw side to [watermark, inf) — src.read(start=wm) — and (b) build
    # partials over only that tail. Done-bar: each family within ~3x of
    # its materialized-only serve above.
    tail = ev.select(
        (
            F.col("ts")
            + F.expr(f"make_interval(0,0,0,{span_days * MULT},0,0,0)")
        ).alias("ts"),
        (F.col("event_id") + F.lit(MULT * 100_000_000)).alias(
            "event_id"
        ),
        "user_id", "event_type", "value", "props",
    ).limit(50_000)
    ht.insert(tail)
    out["realtime_tail_rows"] = 50_000
    for key, mk in {
        "tw_serve_day_realtime": lambda: twc.time_weighted_at_grain(
            "tw", grain="1 day", realtime=True
        ),
        "candle_serve_day_realtime": lambda: twc.candlestick_at_grain(
            "ohlc", grain="1 day", realtime=True
        ),
        "sketch_p95_day_realtime": lambda: twc.quantiles(
            [0.95], sketch_col="sk", grain="1 day", realtime=True
        ),
        "counter_serve_day_realtime": lambda: twc.counter_at_grain(
            "cnt", grain="1 day", realtime=True
        ),
        "gauge_serve_day_realtime": lambda: twc.gauge_at_grain(
            "gg", grain="1 day", realtime=True
        ),
        "stats_serve_day_realtime": lambda: twc.stats_at_grain(
            "st", grain="1 day", realtime=True
        ),
        "stats2d_serve_day_realtime": lambda: twc.stats2d_at_grain(
            "st2", grain="1 day", realtime=True
        ),
        "state_serve_day_realtime": lambda: twc.state_durations_at_grain(
            "sa", grain="1 day", realtime=True
        ),
        "topn_serve_day_realtime": lambda: twc.topn_at_grain(
            "fq", n=5, grain="1 day", realtime=True
        ),
        "maxn_serve_day_realtime": lambda: twc.max_n_at_grain(
            "mx", grain="1 day", realtime=True
        ),
        "heartbeat_serve_day_realtime": lambda: twc.heartbeat_at_grain(
            "hb", grain="1 day", realtime=True
        ),
        "heartbeat_interp_serve_day_realtime": lambda: (
            twc.heartbeat_interpolated_at_grain(
                "hb", grain="1 day", realtime=True
            )
        ),
        "tdigest_p95_serve_day_realtime": lambda: (
            twc.tdigest_quantiles_at_grain(
                [0.95], "td", grain="1 day", realtime=True
            )
        ),
    }.items():
        t0 = time.perf_counter()
        out[f"{key}_rows"] = mk().count()
        out[f"{key}_s"] = round(time.perf_counter() - t0, 2)
    # the VERDICT r11 bar: serve within ~3x of a direct flat groupBy
    # over the same mat table
    matdir = twc._mat().data_dir
    t0 = time.perf_counter()
    spark.read.option("basePath", matdir).parquet(matdir).groupBy(
        F.window("bucket", "1 day"), "event_type"
    ).agg(F.sum(F.col("tw")["integral"])).count()
    out["mat_flat_groupby_s"] = round(time.perf_counter() - t0, 2)
    flush()

    # ---- round-8: text-pipeline operators at corpus scale --------------
    # documents × MULT (~50k-500k docs): replicated docs share every line
    # (worst-case boilerplate for the keeper join) except one unique
    # trailer line per copy, so the dedup has both hot and cold keys
    docs = load_table(spark, SF_DIR, "documents")
    big_docs = docs.crossJoin(
        spark.range(MULT).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("doc_id") + F.col("_rep") * F.lit(1_000_000_000)).alias("doc_id"),
        F.concat(
            F.col("text"), F.lit("\nunique trailer line for copy "),
            F.col("_rep").cast("string"), F.lit(" of doc "),
            F.col("doc_id").cast("string"),
        ).alias("text"),
    )
    n_docs_big = docs.count() * MULT
    out["textcorpus_docs"] = n_docs_big

    from timescaledb_spark.pipeline.dedup import line_dedup
    from timescaledb_spark.pipeline.search import bm25_topk

    t0 = time.perf_counter()
    ld = line_dedup(big_docs)
    kept = ld.agg(
        F.sum("n_kept").alias("k"), F.sum("n_lines").alias("n")
    ).collect()[0]
    out["line_dedup_docs_s"] = round(time.perf_counter() - t0, 2)
    out["line_dedup_kept_frac"] = round(kept["k"] / max(kept["n"], 1), 4)

    # round-11: exact-substring dedup at corpus scale. Shuffle volume =
    # Σ(len_i / stride) × ~24 B (id + pos + 60-bit hash) — stride 8
    # samples window starts (detection guarantee: spans ≥ L+7 starting
    # at sampled offsets), the documented index-side trade; the
    # replicated corpus makes every replica share its whole body with
    # copy 0, so the keeper join sees worst-case hot grams
    from timescaledb_spark.pipeline.dedup import substring_dedup

    t0 = time.perf_counter()
    sd = substring_dedup(big_docs, length=40, stride=8)
    flagged = sd.agg(
        F.sum((~F.col("keep")).cast("long")).alias("f"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    out["substring_dedup_docs_s"] = round(time.perf_counter() - t0, 2)
    out["substring_dedup_flagged_frac"] = round(
        flagged["f"] / max(flagged["n"], 1), 4
    )

    # ---- round-12: the stride LEVER, measured (VERDICT r11 task #6).
    # The gram exchange moves one ~24 B row (doc id + pos + 60-bit
    # hash) per emitted gram = Σ ceil((len−L+1)/stride) rows; stride
    # divides that volume at the cost of the match guarantee degrading
    # from ≥ L to ≥ L+stride−1 spans (pipeline/dedup.py docstring
    # formula). Recorded per stride: wall time, exact gram count, and
    # the implied shuffle bytes-per-corpus-char.
    total_chars = big_docs.agg(
        F.sum(F.length("text")).alias("c")
    ).collect()[0]["c"]
    out["substring_corpus_chars"] = int(total_chars)
    for stride in (1, 8, 16):
        grams = big_docs.agg(
            F.sum(
                F.when(
                    F.length("text") >= 40,
                    F.ceil((F.length("text") - 39) / F.lit(stride)),
                ).otherwise(F.lit(1))
            ).alias("g")
        ).collect()[0]["g"]
        t0 = time.perf_counter()
        substring_dedup(big_docs, length=40, stride=stride).agg(
            F.sum((~F.col("keep")).cast("long"))
        ).collect()
        out[f"substride_{stride}_s"] = round(time.perf_counter() - t0, 2)
        out[f"substride_{stride}_grams"] = int(grams)
        out[f"substride_{stride}_bytes_per_char"] = round(
            grams * 24.0 / max(total_chars, 1), 3
        )

    t0 = time.perf_counter()
    bm25_topk(big_docs, ["data", "model", "training", "quality"], k=25).collect()
    out["bm25_docs_s"] = round(time.perf_counter() - t0, 2)
    flush()

    # heavy hitters at high cardinality: 10M rows over ~1M distinct keys
    # with a few planted heavy keys — the Misra-Gries path's shuffle is
    # partitions x capacity rows; exact topn shuffles every distinct key
    from timescaledb_spark.functions.stats import freq_sketch_topn, topn

    hh = spark.range(10_000_000).select(
        F.when(F.col("id") % 10 < 2, F.concat(F.lit("hot_"), ((F.col("id") / 10).cast("long") % 5).cast("string")))
        .otherwise(F.concat(F.lit("cold_"), (F.col("id") % 1_000_000).cast("string")))
        .alias("v")
    )
    t0 = time.perf_counter()
    sk = {r["v"] for r in freq_sketch_topn(hh, "v", n=5, capacity=256).collect()}
    out["freq_sketch_10m_1mkeys_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    ex = {r["v"] for r in topn(hh, "v", n=5).collect()}
    out["freq_exact_10m_1mkeys_s"] = round(time.perf_counter() - t0, 2)
    out["freq_sketch_topn_match"] = sk == ex
    flush()

    # ---- round-9: stream_dedup state eviction at the x100 key tier ----
    # 10M-distinct-key batch builds 10M state rows; a later batch past
    # the watermark horizon must EVICT them — state is O(keys in
    # horizon), not O(keys ever seen) (dropDuplicatesWithinWatermark's
    # contract; VERDICT r8 next-round #6). Three availableNow runs over
    # one checkpoint: load keys → advance watermark → observe eviction.
    from timescaledb_spark.streaming.dedup import stream_dedup

    n_keys = int(os.environ.get("SCALE_PROBE_STREAM_KEYS", "10000000"))
    sd_src = tempfile.mkdtemp(prefix="probe_sd_src_")
    sd_ck = tempfile.mkdtemp(prefix="probe_sd_ck_")

    def _sd_batch(ts_lit: str, ids, tag: int) -> None:
        ids.select(
            F.lit(ts_lit).cast("timestamp").alias("ts"),
            F.col("id").alias("k"),
        ).write.mode("append").parquet(os.path.join(sd_src, f"b{tag}"))

    _sd_batch("2024-01-01 00:00:00", spark.range(n_keys), 1)

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
        return {
            "rows": so.get("numRowsTotal"),
            "removed": so.get("numRowsRemoved"),
        }

    # 10M keys of state live comfortably off-heap in RocksDB; the
    # default HDFS-backed provider keeps every version in JVM heap and
    # OOMs the shared 8g driver after the many-chunk sections' caches
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )
    t0 = time.perf_counter()
    r1 = _sd_run()
    out["stream_dedup_load_s"] = round(time.perf_counter() - t0, 2)
    out["stream_dedup_state_after_load"] = r1["rows"]
    # batch 2: same ts (duplicates) + a handful of fresh keys 3h later —
    # watermark advances to (3h - 1h) past batch 1, expiring its state
    _sd_batch("2024-01-01 03:00:00", spark.range(1000), 2)
    r2 = _sd_run()
    # eviction happens with the batch-START watermark; one more empty-ish
    # tick applies the advanced watermark to the old rows
    _sd_batch("2024-01-01 03:00:01", spark.range(1), 3)
    t0 = time.perf_counter()
    r3 = _sd_run()
    out["stream_dedup_evict_s"] = round(time.perf_counter() - t0, 2)
    out["stream_dedup_state_after_expiry"] = r3["rows"]
    out["stream_dedup_state_evicted"] = (
        r1["rows"] is not None
        and r3["rows"] is not None
        and r1["rows"] >= n_keys
        and r3["rows"] <= 2000
    )
    flush()

    # ---- round-9/10: ordered scan over the many-chunk hypertable ------
    # catalog-ordered per-chunk sorted scans — the no-global-sort
    # ordered read must hold at the 12k-chunk metadata shape. Round 10:
    # catalog stats populated first (the documented pre-export ANALYZE),
    # groups row-budgeted, arrow merge-append engine auto-selected at
    # this width — plan build must be O(1), not O(chunks) driver-side
    # listings (r9: 45.3s first-rows at 12k chunks; target <10s).
    from timescaledb_spark.plans.inspect import shuffle_count as _shc

    t0 = time.perf_counter()
    ht.approximate_row_count()
    out["ordered_scan_analyze_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    odf = ht.read_ordered(plan_cap=256)
    out["ordered_scan_shuffles"] = _shc(odf)
    first_ts = odf.limit(5).collect()[0]["ts"]
    out["ordered_scan_first_rows_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    out["ordered_scan_rows"] = odf.count()
    out["ordered_scan_full_s"] = round(time.perf_counter() - t0, 2)
    out["ordered_scan_first_ts"] = str(first_ts)
    out["ordered_scan_plan"] = dict(ht.last_ordered_plan_info)

    # ---- round-9: ASAP smoothing at 2M rows / 10k series --------------
    # the search must stay bounded by groups x resolution x candidates:
    # the only full-data pass is the bucketing groupBy
    from timescaledb_spark.pipeline.smoothing import asap_smooth

    series = spark.range(2_000_000).select(
        (F.col("id") % 10_000).alias("uid"),
        F.timestamp_micros(
            F.lit(1_700_000_000_000_000) + (F.col("id") / 10_000).cast("long") * 60_000_000
        ).alias("ts"),
        (F.sin(F.col("id") / 7.0) * 10 + F.sin(F.col("id") * 13.0)).alias("value"),
    )
    t0 = time.perf_counter()
    n_asap = asap_smooth(series, "ts", "value", resolution=24, by=["uid"]).count()
    out["asap_2m_10kseries_s"] = round(time.perf_counter() - t0, 2)
    out["asap_out_rows"] = n_asap
    flush()

    # ---- round-9: SemDeDup at 100k x 64-dim vectors -------------------
    # cluster-then-dedup: assignment is 100k x 128 broadcast argmax; the
    # within-cluster pair scan is Sigma|cluster|^2 ~ n * avg_cluster,
    # vs n^2/2 = 5e9 pairs brute force
    from timescaledb_spark.pipeline.dedup import semantic_dedup

    vecs = spark.range(100_000).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(64)),
            lambda i: F.sin(F.col("id") % 997 * i / 9.0) + F.sin(F.col("id") * i / 1001.0) * 0.05,
        ).alias("embedding"),
    )
    t0 = time.perf_counter()
    # k ~ n/100 (SemDeDup paper regime): 1000 clusters of ~100 keeps the
    # within-cluster pair scan at Sigma|c|^2 ~ n * 100 / 2 = 5M pairs;
    # an under-clustered k=128 run measured 208s from 39M pairs — the
    # cluster-count dial IS the scale contract, so the probe uses it
    sd = semantic_dedup(
        vecs, threshold=0.995, centroid_stride=100  # ~1000 centroids
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("is_kept").cast("long")).alias("kept"),
    ).collect()[0]
    out["semdedup_100k_s"] = round(time.perf_counter() - t0, 2)
    out["semdedup_kept_frac"] = round(sd["kept"] / sd["n"], 4)
    flush()

    # ---- round-9: DISTINCT SkipScan catalog-vs-scan -------------------
    # ~30 compressed chunks: the catalog path must answer with no data
    # job; the full-scan DISTINCT is the comparison bar
    from timescaledb_spark.compression import compress_chunks as _cc
    from timescaledb_spark.compression import enable_columnstore as _ec

    ht4 = ts.create_hypertable("bigseg", "ts", chunk_interval="30 days")
    ht4.insert(big)
    _ec(ht4, segmentby=["event_type"], orderby=[("ts", "asc")])
    t0 = time.perf_counter()
    _cc(ht4)
    out["skipscan_compress_chunks_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    n_dv = ht4.distinct_values("event_type").count()
    out["skipscan_catalog_s"] = round(time.perf_counter() - t0, 2)
    # warm: the cold number is dominated by the first catalog JSONL
    # parse + one literal-frame job; steady-state is the honest
    # "O(segments), zero data I/O" figure
    t0 = time.perf_counter()
    ht4.distinct_values("event_type").count()
    out["skipscan_catalog_warm_s"] = round(time.perf_counter() - t0, 2)
    st4 = ht4.distinct_values_stats
    out["skipscan_covered"] = st4["covered_chunks"]
    out["skipscan_scanned"] = st4["scanned_chunks"]
    t0 = time.perf_counter()
    n_scan = ht4.df().select("event_type").distinct().count()
    out["skipscan_fullscan_s"] = round(time.perf_counter() - t0, 2)
    out["skipscan_match"] = n_dv == n_scan
    flush()

    # ---- round-15: COPY BINARY decode throughput ----------------------
    # 64 dump files, ~100k rows each — the restore-at-scale shape: file-
    # axis task parallelism, bounded Arrow batches inside each task. The
    # encode (driver-side, test-only direction) is done ONCE and the
    # blob reused per file; decode cost is identical either way.
    import shutil

    from timescaledb_spark.sources.pgcopy import read_pgcopy, write_pgcopy

    cb_dir = tempfile.mkdtemp(prefix="ts_pgcopy_scale_")
    cb_schema = "ts timestamp, eid bigint, v double"
    import datetime as _dt

    base_ts = _dt.datetime(2024, 1, 1)
    rows_per_file = 100_000
    n_files = 64
    blob = write_pgcopy(
        [
            (base_ts + _dt.timedelta(seconds=i), i, float(i % 997) / 7.0)
            for i in range(rows_per_file)
        ],
        cb_schema,
    )
    for i in range(n_files):
        with open(os.path.join(cb_dir, f"dump_{i:03d}.bin"), "wb") as f:
            f.write(blob)
    t0 = time.perf_counter()
    cb_df = read_pgcopy(spark, cb_dir, cb_schema)
    cb_n = cb_df.count()
    cb_s = time.perf_counter() - t0
    out["copy_binary_x100_rows"] = cb_n
    out["copy_binary_x100_files"] = n_files
    out["copy_binary_x100_tasks"] = cb_df.rdd.getNumPartitions()
    out["copy_binary_x100_s"] = round(cb_s, 2)
    out["copy_binary_x100_rows_per_s"] = int(cb_n / cb_s)
    shutil.rmtree(cb_dir, ignore_errors=True)
    flush()

    # ---- round-15: perceptual media dedup at corpus scale --------------
    # exact-re-upload-heavy corpus (every doc replicated MULT times
    # verbatim): the hash-collapse path must stay LINEAR in the corpus —
    # banding runs over distinct hashes only
    from timescaledb_spark.pipeline.multimodal import media_dedup, with_payload

    media_corpus = docs.crossJoin(
        spark.range(MULT).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("doc_id") + F.col("_rep") * F.lit(1_000_000_000)).alias(
            "doc_id"
        ),
        "text",
    )
    t0 = time.perf_counter()
    md = media_dedup(with_payload(media_corpus))
    md_stats = md.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("keep").cast("long")).alias("kept"),
        F.countDistinct("dhash").alias("hashes"),
    ).collect()[0]
    out["media_dedup_docs_s"] = round(time.perf_counter() - t0, 2)
    out["media_dedup_docs"] = md_stats["n"]
    out["media_dedup_kept"] = md_stats["kept"]
    out["media_dedup_distinct_hashes"] = md_stats["hashes"]
    flush()

    # ---- round-15: URL/domain curation at corpus scale -----------------
    from timescaledb_spark.pipeline.urlfilter import domain_filter, synth_url

    urls = media_corpus.select(
        "doc_id", synth_url("doc_id").alias("url")
    )
    t0 = time.perf_counter()
    dfilt = domain_filter(
        urls, block=["spam.net"], cap_per_domain=10_000
    )
    out["domain_filter_kept"] = dfilt.count()
    out["domain_filter_docs_s"] = round(time.perf_counter() - t0, 2)
    flush()

    # ---- round-16: bounded Hamming banding at 1e7 DISTINCT fingerprints
    # the round-15 ceiling: 16-bit band keys cap at 65,536 buckets per
    # band, so one-level banding enumerates ~n²/32k candidates past ~1e7
    # distinct fingerprints. This leg builds 100k*MULT distinct 64-bit
    # fingerprints (90% uniform random, 10% in 4-member Hamming-2
    # clusters so real pairs exist), measures the recursive-banding pair
    # enumeration, and records the candidate volume the UNBOUNDED
    # one-level join would have produced (computed analytically from the
    # level-0 bucket histogram — never materialized).
    from timescaledb_spark.pipeline.dedup import banded_hamming_pairs

    n_fp = 100_000 * MULT
    uniq_cut = (n_fp * 9 // 10) // 4 * 4  # 4-aligned: last 10% clusters
    base = F.xxhash64(F.lit("grp"), (F.col("id") / 4).cast("long"))
    member_flip = F.expr(
        "shiftleft(cast(1 as bigint), cast(pmod(id, 4) * 7 + 3 as int))"
    )
    fps = spark.range(n_fp).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < uniq_cut, F.xxhash64("id"))
        .otherwise(base.bitwiseXOR(member_flip))
        .alias("h"),
    )
    out["hamming_fp_distinct"] = fps.select("h").distinct().count()
    # would-be candidate volume of one-level 4x16-bit banding
    t0 = time.perf_counter()
    would_be = (
        fps.select(
            F.explode(
                F.array(
                    *[
                        F.shiftright("h", 16 * b)
                        .bitwiseAND(F.lit(0xFFFF))
                        .bitwiseOR(F.lit(b << 32))
                        .alias("k")
                        for b in range(4)
                    ]
                )
            ).alias("k")
        )
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("m"))
        .agg(F.sum(F.expr("m * (m - 1) / 2")).alias("c"))
        .collect()[0]["c"]
    )
    out["hamming_unbounded_candidates"] = int(would_be)
    out["hamming_histogram_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    pairs = banded_hamming_pairs(
        fps, "doc_id", "h", 64, max_hamming=3, max_bucket=128
    )
    out["hamming_pairs"] = pairs.count()
    out["hamming_bounded_s"] = round(time.perf_counter() - t0, 2)
    out["hamming_unbounded_candidates_per_output_pair"] = (
        round(int(would_be) / max(out["hamming_pairs"], 1), 1)
    )
    flush()

    # ---- round-16: LR distillation, train-small / score-big ------------
    # the 100 TB shape of the quality classifier: the expensive teacher
    # (Gopher rules) + 16 GD rounds run on a 1% hash-sample slice only;
    # the full corpus is then scored as a pure projection under the 66
    # learned literals — no training-scale work ever touches the corpus.
    from timescaledb_spark.pipeline.classify import lr_scores, lr_train
    from timescaledb_spark.pipeline.sampling import hash_sample

    t0 = time.perf_counter()
    lr_w = lr_train(
        hash_sample(media_corpus, 0.01), min_required_stops=1
    )
    out["lr_train_sample_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    lr_stats = (
        lr_scores(media_corpus, lr_w)
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("pred").alias("kept"),
        )
        .collect()[0]
    )
    out["lr_score_docs"] = lr_stats["n"]
    out["lr_score_kept_frac"] = round(lr_stats["kept"] / lr_stats["n"], 4)
    out["lr_score_docs_s"] = round(time.perf_counter() - t0, 2)
    flush()

    print(json.dumps(out))
    with open(sys.argv[1] if len(sys.argv) > 1 else "SCALE_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
