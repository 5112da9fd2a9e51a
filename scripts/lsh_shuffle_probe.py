#!/usr/bin/env python
"""Round-17 LSH dedup shuffle-volume probe (VERDICT r16 item 8).

Measures the actual shuffle bytes of the band joins behind
q_dedup_minhash_lsh and q_dedup_embedding_lsh at a scaled input
(SCALE_PROBE_MULT x the sf0.1 row counts, synthetic near-dup-scarce
data so candidate volume stays realistic), via the UI REST stage
metrics. For the embedding operator it also times the §2.3 "shrink the
banded rows" restructure inline (shuffle (id, band, bval) first, filter
singleton buckets, join vectors back) so the adopt/reject decision is
measured, not argued.

Usage: SCALE_PROBE_MULT=50 python scripts/lsh_shuffle_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

MULT = int(os.environ.get("SCALE_PROBE_MULT", "50"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
UI = "http://localhost:4051"


def stage_shuffle_bytes(app_id: str, after_submission_ms: float) -> dict:
    """Sum shuffle read/write bytes over stages submitted after t0."""
    stages = json.loads(
        urllib.request.urlopen(
            f"{UI}/api/v1/applications/{app_id}/stages?status=complete"
        ).read()
    )
    rd = wr = 0
    from datetime import datetime, timezone

    for s in stages:
        sub = s.get("firstTaskLaunchedTime") or s.get("submissionTime")
        if not sub:
            continue
        ts = (
            datetime.strptime(sub[:-4], "%Y-%m-%dT%H:%M:%S.%f")
            .replace(tzinfo=timezone.utc)
            .timestamp()
        )
        if ts * 1000 < after_submission_ms:
            continue
        rd += s.get("shuffleReadBytes", 0)
        wr += s.get("shuffleWriteBytes", 0)
    return {"shuffle_read_mb": round(rd / 1e6, 1), "shuffle_write_mb": round(wr / 1e6, 1)}


def main() -> None:
    from pyspark.sql import functions as F

    from timescaledb_spark.pipeline import core
    from timescaledb_spark.pipeline.dedup import (
        embedding_dup_pairs_lsh,
        minhash_lsh_pairs,
    )
    from timescaledb_spark.session import build_spark

    spark = build_spark(
        app_name="ts_lsh_probe",
        extra_conf={"spark.ui.enabled": "true", "spark.ui.port": "4051"},
    )
    app_id = spark.sparkContext.applicationId
    out: dict = {"mult": MULT, "sf_dir": SF_DIR}

    # ---- embedding LSH: n = 2000 * MULT synthetic 64-dim vectors.
    # Deterministic pseudo-random components (sin of xxhash) make the
    # vectors near-orthogonal, so near-dup pairs are rare — the realistic
    # candidate regime (duplicating real vectors would make every replica
    # group a dup cluster and explode pair volume instead).
    n_vec = 2000 * MULT
    vec = spark.range(n_vec).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 63), "
            "d -> cast(sin(cast(xxhash64(id, d) as double) / 1e18) as float))"
        ).alias("embedding"),
    ).localCheckpoint(eager=True)
    out["n_vec"] = n_vec

    t0 = time.time() * 1000
    t = time.perf_counter()
    spark.sparkContext.setJobDescription("emb-lsh: current operator")
    n_pairs = embedding_dup_pairs_lsh(vec).count()
    out["emb_current_s"] = round(time.perf_counter() - t, 2)
    out["emb_current_pairs"] = n_pairs
    out["emb_current_bytes"] = stage_shuffle_bytes(app_id, t0)
    # analytic: one exchange of n*bands rows each carrying a 64-double
    # vector (+id+band+bval) ≈ n*10*528B
    out["emb_vector_rides_estimate_mb"] = round(n_vec * 10 * 528 / 1e6, 1)

    # ---- §2.3 restructure, inline: shuffle (id, band, bval) first,
    # filter buckets of size 1 (they can't produce pairs), then join the
    # vectors back by id and re-shuffle survivors into buckets.
    from pyspark.sql.window import Window

    bands, band_bits = 10, 6
    mask = (1 << band_bits) - 1
    dv = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    pre = vec.select(
        F.col("vec_id"),
        dv.alias("v"),
        core.hyperplane_sig_pd("embedding", 60, 64).alias("sig"),
    )
    t0 = time.time() * 1000
    t = time.perf_counter()
    spark.sparkContext.setJobDescription("emb-lsh: proxy-first variant")
    small = pre.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band"),
        F.expr(f"shiftright(sig, band * {band_bits}) & {mask}").alias("bval"),
    )
    surv = small.withColumn(
        "_n", F.count(F.lit(1)).over(Window.partitionBy("band", "bval"))
    ).filter(F.col("_n") >= 2).drop("_n")
    attached = surv.join(pre.select("vec_id", "v"), "vec_id")
    # count-only verification proxy: same shuffles as the bucket verify
    n_rows = attached.groupBy("band", "bval").count().agg(
        F.sum("count")
    ).collect()[0][0]
    out["proxy_variant_s"] = round(time.perf_counter() - t, 2)
    out["proxy_surviving_band_rows"] = int(n_rows or 0)
    out["proxy_band_rows_total"] = n_vec * bands
    out["proxy_bytes"] = stage_shuffle_bytes(app_id, t0)
    spark.sparkContext.setJobDescription(None)

    # ---- minhash LSH: documents scaled with per-replica token salt so
    # replicas don't shingle-match (near-dup-scarce).
    docs = (
        spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
        .crossJoin(spark.range(MULT).select(F.col("id").alias("_rep")))
        .select(
            (F.col("doc_id") * MULT + F.col("_rep")).alias("doc_id"),
            F.concat(
                F.lit("r"), F.col("_rep"), F.lit("x "),
                F.col("text"),
                F.lit(" s"), F.col("_rep"),
            ).alias("text"),
        )
        .localCheckpoint(eager=True)
    )
    out["n_docs"] = docs.count()
    t0 = time.time() * 1000
    t = time.perf_counter()
    spark.sparkContext.setJobDescription("minhash-lsh: current operator")
    out["minhash_pairs"] = minhash_lsh_pairs(docs).count()
    out["minhash_s"] = round(time.perf_counter() - t, 2)
    out["minhash_bytes"] = stage_shuffle_bytes(app_id, t0)
    spark.sparkContext.setJobDescription(None)

    line = json.dumps(out, separators=(",", ":"))
    print(line)
    dst = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        REPO, "LSH_SHUFFLE_PROBE_r17.json"
    )
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
