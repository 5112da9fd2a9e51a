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

    skip_done = os.environ.get("PROBE_SKIP_DONE", "1") == "1"

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
    if not (skip_done and "hamming_pairs" in out):
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
    if not (skip_done and "lr_score_docs" in out):
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

    # ---- round-16 continuation: unigram tokenizer at corpus scale.
    # Training must be vocabulary-bounded: the only corpus-scale work
    # is the word-frequency scan, so a 100x corpus costs ~the scan,
    # not 100x the EM. Encoding IS corpus-scale (broadcast probe +
    # per-doc reassembly) — that's the linear leg.
    from timescaledb_spark.pipeline.unigram import (
        unigram_encode,
        unigram_train,
    )

    t0 = time.perf_counter()
    vocab = unigram_train(media_corpus, top_multi=512, rounds=2)
    out["unigram_train_vocab"] = vocab.count()
    out["unigram_train_docs"] = out.get("lr_score_docs")
    out["unigram_train_s"] = round(time.perf_counter() - t0, 2)
    t0 = time.perf_counter()
    enc = unigram_encode(media_corpus, top_multi=512)
    enc_stats = enc.agg(
        F.count(F.lit(1)).alias("n"), F.sum("n_subtok").alias("subtok")
    ).collect()[0]
    out["unigram_encode_docs"] = enc_stats["n"]
    out["unigram_encode_subtok"] = int(enc_stats["subtok"])
    out["unigram_encode_s"] = round(time.perf_counter() - t0, 2)
    flush()

    # ---- round-16 continuation: streaming near-dedup over the
    # replicated corpus in 8 id-ordered micro-batches — per-batch
    # fingerprinting, banded store joins against a store that grows to
    # the full corpus, survivors = first arrivals per Hamming cluster.
    import tempfile as _tf

    from timescaledb_spark.streaming.neardedup import (
        staged_id_stream,
        stream_near_dedup,
    )

    big_dir = _tf.mkdtemp(prefix="ts_nd_probe_")
    media_corpus.write.mode("overwrite").parquet(
        os.path.join(big_dir, "documents.parquet")
    )
    sdf = staged_id_stream(spark, big_dir, n_batches=8)
    t0 = time.perf_counter()
    survivors = stream_near_dedup(sdf, max_hamming=3)
    out["stream_neardedup_survivors"] = survivors.count()
    out["stream_neardedup_docs"] = out.get("lr_score_docs")
    out["stream_neardedup_batches"] = 8
    out["stream_neardedup_s"] = round(time.perf_counter() - t0, 2)
    flush()

    print(
        json.dumps(
            {
                k: out[k]
                for k in out
                if k.startswith(
                    ("hamming", "lr_", "unigram_", "stream_neardedup")
                )
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
