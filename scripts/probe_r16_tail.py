#!/usr/bin/env python
"""Re-run the two round-16 scale-probe legs that OOM'd when the x100
probe shared the box with the soak probe's JVM (hamming_distinct and
lr_distill), in a FRESH session, and merge their keys into the existing
SCALE_PROBE json. Same inputs and measurements as scripts/scale_probe.py
lines 775-850.

Usage: python scripts/probe_r16_tail.py SCALE_PROBE_r16_x100.json
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
MULT = int(os.environ.get("SCALE_PROBE_MULT", "100"))


def main() -> None:
    from pyspark.sql import functions as F

    from timescaledb_spark.pipeline.dedup import banded_hamming_pairs
    from timescaledb_spark.session import build_spark
    from timescaledb_spark.sources import load_table

    out_path = sys.argv[1]
    with open(out_path) as f:
        out = json.load(f)

    spark = build_spark(app_name="ts_probe_r16_tail")

    def flush() -> None:
        with open(out_path, "w") as f:
            json.dump(out, f, indent=1)

    # ---- round-16: >=1e7 DISTINCT fingerprints through the bounded
    # banding (the r15 verdict's missing scale datapoint): 90% uniform
    # hashes, 10% in Hamming-2 clusters of four
    n_fp = 100_000 * MULT
    uniq_cut = (n_fp * 9 // 10) // 4 * 4
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
    out["hamming_unbounded_candidates_per_output_pair"] = round(
        int(would_be) / max(out["hamming_pairs"], 1), 1
    )
    flush()

    # ---- round-16: LR distillation, train-small / score-big
    from timescaledb_spark.pipeline.classify import lr_scores, lr_train
    from timescaledb_spark.pipeline.sampling import hash_sample

    docs = load_table(spark, SF_DIR, "documents")
    media_corpus = docs.crossJoin(
        spark.range(MULT).select(F.col("id").alias("_rep"))
    ).select(
        (F.col("doc_id") + F.col("_rep") * F.lit(1_000_000_000)).alias(
            "doc_id"
        ),
        "text",
    )
    t0 = time.perf_counter()
    lr_w = lr_train(hash_sample(media_corpus, 0.01), min_required_stops=1)
    out["lr_train_sample_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    lr_stats = (
        lr_scores(media_corpus, lr_w)
        .agg(F.count(F.lit(1)).alias("n"), F.sum("pred").alias("kept"))
        .collect()[0]
    )
    out["lr_score_docs"] = lr_stats["n"]
    out["lr_score_kept_frac"] = round(lr_stats["kept"] / lr_stats["n"], 4)
    out["lr_score_docs_s"] = round(time.perf_counter() - t0, 2)
    flush()
    print(json.dumps({k: out[k] for k in out if k.startswith(("hamming", "lr_"))}))
    spark.stop()


if __name__ == "__main__":
    main()
