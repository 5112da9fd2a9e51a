"""Training-data pipeline tour: the LLM-curation operators end-to-end.

Runs every major pipeline family against the sf0.001 testdata:
dedup (exact → MinHash-LSH → cluster resolution), test-set
decontamination, ANN (brute-force vs IVF), LTTB downsampling, text
featurization, and multimodal decode/resize — the operators a 100 TB
curation pipeline chains between ingest and training.

Usage: python examples/pipeline_tour.py  (prints one summary line per stage)
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from timescaledb_spark.session import build_spark  # noqa: E402
from timescaledb_spark.sources import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from pyspark.sql import functions as F

    from timescaledb_spark.pipeline import (
        dedup,
        downsample,
        multimodal,
        similarity,
        textproc,
    )

    spark = build_spark(app_name="pipeline_tour")
    docs = load_table(spark, SF_DIR, "documents")
    emb = load_table(spark, SF_DIR, "embeddings")
    events = load_table(spark, SF_DIR, "events")

    # --- 1. exact dedup (hash groupBy — one map-combined shuffle) ------
    exact = dedup.exact_dedup(docs)
    print(f"exact content-hash groups: {exact.count()}")

    # --- 2. near-dup via MinHash + banded LSH --------------------------
    pairs = dedup.minhash_lsh_pairs(docs, threshold=0.6)
    n_pairs = pairs.count()
    print(f"minhash-lsh near-dup pairs (j>=0.6): {n_pairs}")

    # --- 3. duplicate-cluster resolution (large/small-star CC) ---------
    if n_pairs:
        members = dedup.dup_clusters(pairs.select("id_a", "id_b"))
        print(f"cluster members resolved: {members.count()}")

    # --- 4. test-set decontamination -----------------------------------
    bench = docs.filter(F.col("doc_id") % 100 == 0)
    dirty = dedup.decontaminate(docs, bench, min_hits=3)
    print(f"contaminated docs (>=3 shared 5-grams): {dirty.count()}")

    # --- 5. ANN: brute-force baseline vs IVF ---------------------------
    queries = emb.limit(3)
    bf = similarity.knn_bruteforce(emb, queries, k=5)
    ivf = similarity.knn_ivf(emb, queries, k=5)
    print(f"ann top-k rows: brute={bf.count()} ivf={ivf.count()}")

    # --- 6. LTTB downsample of a series --------------------------------
    lt = downsample.lttb(
        events.select("ts", "user_id", "value"),
        time_col="ts", value_col="value", n_out=50, by=["user_id"],
    )
    print(f"lttb points kept: {lt.count()}")

    # --- 7. text featurization (hashing trick) -------------------------
    feats = textproc.hash_features(docs)
    print(f"feature-hash (doc, bucket) rows: {feats.count()}")

    # --- 7b. deterministic sampling: cap-per-stratum + splits ----------
    from timescaledb_spark.pipeline import sampling

    capped = sampling.stratified_cap(docs, by=["lang"], cap=20)
    splits = (
        sampling.split_assign(docs, {"train": 0.9, "val": 0.05, "test": 0.05})
        .groupBy("split").count().collect()
    )
    print(
        f"stratified cap kept {capped.count()} docs; splits: "
        + ", ".join(f"{r['split']}={r['count']}" for r in sorted(splits, key=lambda r: r['split']))
    )

    # --- 7c. quality filtering: repetition + PII + line dedup + BM25 ---
    from timescaledb_spark.pipeline import search

    sig = textproc.repetition_signals("text")
    clean = docs.filter(
        (sig["dup_line_frac"] < 0.3) & (sig["frac_unique_words"] > 0.2)
    )
    pii = textproc.redact_pii("text")
    redacted = docs.select("doc_id", pii["redacted"].alias("text"))
    ld = dedup.line_dedup(docs)
    kept = ld.agg(F.sum("n_kept").alias("k"), F.sum("n_lines").alias("n")).first()
    hits = search.bm25_topk(docs, ["data", "model"], k=5)
    print(
        f"quality-pass docs: {clean.count()}; redacted rows: {redacted.count()}; "
        f"line-dedup kept {kept['k']}/{kept['n']} lines; "
        f"bm25 top doc: {hits.first()['doc_id']}"
    )

    # --- 7d. LM perplexity filter + training-mix recipe (round 9) -----
    from timescaledb_spark.pipeline import quality_lm

    model = quality_lm.train_chargram_lm(docs)
    scored = quality_lm.chargram_logprob(docs, model)
    cut = scored.approxQuantile("avg_logp", [0.1], 0.0)[0]
    mixed = sampling.source_mix(
        docs, "source", {"src0": 2.0, "src1": 1.0, "src2": 0.5}
    )
    print(
        f"perplexity filter drops bottom decile below avg_logp {cut:.3f} "
        f"({scored.filter(F.col('avg_logp') < cut).count()} docs); "
        f"2.0/1.0/0.5-epoch mix emits {mixed.count()} rows"
    )

    # --- 7e. semantic dedup + ASAP smoothing (round 9) -----------------
    from timescaledb_spark.pipeline import smoothing

    sd = dedup.semantic_dedup(emb, threshold=0.45, centroid_stride=50)
    n_drop = sd.filter(~F.col("is_kept")).count()
    sm = smoothing.asap_smooth(
        events, "ts", "value", resolution=24, by=["user_id"]
    )
    w_dist = sm.select("user_id", "w").distinct().groupBy("w").count().collect()
    print(
        f"semdedup dropped {n_drop} near-dup vectors within clusters; "
        "asap windows chosen: "
        + ", ".join(f"w={r['w']}x{r['count']}" for r in sorted(w_dist, key=lambda r: r["w"]))
    )

    # --- 8. multimodal: payload decode + resize ------------------------
    media = multimodal.with_payload(docs.limit(20))
    meta = multimodal.decode_media(media)
    resized = multimodal.resize_media(media, 64, 48)
    print(
        f"decoded {meta.count()} payloads; "
        f"resized dims: {resized.select('width', 'height').first()}"
    )
    spark.stop()


if __name__ == "__main__":
    main()
