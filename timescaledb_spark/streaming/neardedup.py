"""Streaming NEAR-duplicate dedup: drop a document as it arrives when
any EARLIER arrival is within a simhash Hamming radius — the streaming
counterpart of ``pipeline.dedup.simhash_pairs`` the way
``streaming.dedup.stream_dedup`` is the counterpart of exact dedup.

Semantics (deterministic, oracle-replayable): a document survives iff
NO earlier-arriving document has ``hamming(simhash) <= max_hamming``,
where "earlier" is (micro-batch, id) lexicographic — with id-ordered
replay batches that is exactly the id order, so the batch oracle is
"every id that never appears as the LATER side of a Hamming pair".
Dropped documents still poison later arrivals (the comparison set is
every ARRIVAL, not every survivor) — the semantics real incremental
corpus dedup ships, and what makes the closure order-independent
within a batch.

Scale shape (100 TB/day):

- The fingerprint STORE is the operator's state: one (id, simhash) row
  per arrival, banded-equi-joined against each new micro-batch. It
  lives as parquet on object storage, not in executor memory — global
  corpus dedup genuinely needs the full fingerprint history, so state
  is disk-resident by design (unlike ``stream_dedup``'s in-horizon
  key store). 1e10 documents ≈ 160 GB of fingerprints: a bounded,
  cheap scan relative to the corpus itself. A production deployment
  writes the store bucketed by band key so each micro-batch join
  prunes to matching buckets; compaction is a background job.
- **Batch-internal pairs** go through the exact recursive-banded
  self-join (:func:`..pipeline.dedup.banded_hamming_pairs` — bounded
  buckets, linear candidates); **batch-vs-store** is a plain banded
  equi-join with the small batch side broadcast: pigeonhole still
  guarantees any in-radius pair shares a band, and no store×store work
  is ever redone.
- Survivors append to the output sink; ALL batch fingerprints append
  to the store. Nothing corpus-scale is ever collected to the driver.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..pipeline.dedup import (
    SIMHASH_BITS,
    banded_hamming_pairs,
    simhash64,
    simhash64_sql,
    simhash_pairs_sql,
)


def _banded_cross(
    batch_fp: DataFrame, store_fp: DataFrame, max_hamming: int
) -> DataFrame:
    """Distinct batch ids within ``max_hamming`` of ANY store row: both
    sides explode into ``max_hamming + 1`` pigeonhole bands and
    equi-join on (band, key) — the batch side is broadcast (a
    micro-batch is small next to the store), candidates verify with
    ``bit_count(xor)``. Complete by the same pigeonhole argument as
    the self-join: an in-radius pair agrees exactly on >= 1 band.

    May return the same batch id more than once (one row per matching
    band/store pair) — the only consumer is a left_anti probe, where
    duplicates are harmless; deduplicating here cost a full aggregate
    exchange per micro-batch for nothing (r16 optimization round)."""
    n_bands = max_hamming + 1
    width = -(-SIMHASH_BITS // n_bands)

    def bands(df: DataFrame, id_col: str) -> DataFrame:
        keys = F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.shiftright("simhash", b * width)
                    .bitwiseAND(F.lit((1 << width) - 1))
                    .alias("key"),
                )
                for b in range(n_bands)
            ]
        )
        return df.select(
            F.col("doc_id").alias(id_col),
            F.col("simhash").alias(f"{id_col}_sim"),
            F.explode(keys).alias("bk"),
        ).select(id_col, f"{id_col}_sim", "bk.band", "bk.key")

    return (
        bands(store_fp, "sid")
        .join(F.broadcast(bands(batch_fp, "bid")), ["band", "key"])
        .filter(
            F.bit_count(F.col("sid_sim").bitwiseXOR(F.col("bid_sim")))
            <= F.lit(max_hamming)
        )
        .select(F.col("bid").alias("doc_id"))
    )


def near_dedup_batch(
    batch: DataFrame,
    store_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 128,
) -> None:
    """Process ONE micro-batch: fingerprint, drop batch-internal later
    duplicates and anything matching the store, append survivors to
    ``out_path`` and every batch fingerprint to ``store_path``. Pure
    DataFrame work — callable from ``foreachBatch`` or batch tests."""
    spark = batch.sparkSession
    fp = (
        simhash64(batch.select(id_col, text_col), text_col, id_col)
        .withColumnRenamed(id_col, "doc_id")
        .localCheckpoint(eager=True)
    )
    # the drop set only ever probes a left_anti join, so duplicate ids
    # are harmless — no distinct anywhere on the drop path (each one
    # cost a full aggregate exchange per micro-batch; r16 optimization
    # round, guide §2.4: a `distinct` on data whose uniqueness nothing
    # downstream needs)
    internal_b = banded_hamming_pairs(
        fp, "doc_id", "simhash", SIMHASH_BITS,
        max_hamming=max_hamming, max_bucket=max_bucket,
    ).select(F.col("id_b").alias("doc_id"))
    dropped = internal_b
    if os.path.isdir(store_path):
        # the store schema IS the fingerprint schema (every append below
        # writes `fp`) — passing it skips the footer-sampling inference
        # job a schemaless parquet open runs per micro-batch (guide §6;
        # same lever as the r17 hypertable/_chunk_reader change)
        store_fp = spark.read.schema(fp.schema).parquet(store_path)
        dropped = dropped.unionByName(
            _banded_cross(fp, store_fp, max_hamming)
        )
    survivors = fp.join(dropped, "doc_id", "left_anti")
    survivors.write.mode("append").parquet(out_path)
    fp.write.mode("append").parquet(store_path)


def stream_near_dedup(
    sdf: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    max_bucket: int = 128,
    work_dir: str | None = None,
) -> DataFrame:
    """Run the near-dedup stream to completion (``availableNow``) and
    return the surviving ``(doc_id, simhash)`` frame.

    ``sdf`` must be a streaming DataFrame whose micro-batches arrive in
    id order (see :func:`staged_id_stream`) for the "earlier arrival"
    rule to equal the id order the oracle replays."""
    spark = sdf.sparkSession
    work = work_dir or tempfile.mkdtemp(prefix="ts_neardedup_")
    store = os.path.join(work, "store")
    out = os.path.join(work, "survivors")
    ckpt = os.path.join(work, "ckpt")

    def handle(batch: DataFrame, _bid: int) -> None:
        near_dedup_batch(
            batch, store, out,
            text_col=text_col, id_col=id_col,
            max_hamming=max_hamming, max_bucket=max_bucket,
        )

    q = (
        sdf.writeStream.foreachBatch(handle)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.read.parquet(out)


def staged_id_stream(
    spark: SparkSession,
    sf_dir: str,
    table: str = "documents",
    id_col: str = "doc_id",
    n_batches: int = 4,
) -> DataFrame:
    """ReadStream over ``<sf_dir>/<table>.parquet`` split into
    ``n_batches`` id-range files replayed IN ORDER (file-name order,
    one micro-batch per file under ``maxFilesPerTrigger=1``) — the
    deterministic arrival order the near-dedup oracle assumes."""
    import pyarrow.compute as pc
    import pyarrow.parquet as papq

    src = os.path.join(sf_dir, f"{table}.parquet")
    tmp = tempfile.mkdtemp(prefix="ts_idstream_")
    # the staging is replay SIMULATION, not query work (production
    # arrivals come from a real stream): slice the source driver-side
    # with pyarrow — the r16 build ran a global-order ntile window +
    # localCheckpoint + n_batches coalesce(1) filtered writes for the
    # same four files (~1.3s of Spark jobs per gate run; r17, guide §1.2
    # "don't compute things you throw away" — heartbeat_stream already
    # stages its files driver-side for the same reason). Slices replay
    # ntile semantics exactly: ordered by id, contiguous, first
    # (rows % n) slices one row larger.
    t = papq.read_table(src)
    t = t.take(pc.sort_indices(t, sort_keys=[(id_col, "ascending")]))
    n_rows = t.num_rows
    base, rem = divmod(n_rows, n_batches)
    off = 0
    for b in range(1, n_batches + 1):
        size = base + (1 if b <= rem else 0)
        dst = os.path.join(tmp, f"part-{b:03d}.parquet")
        papq.write_table(t.slice(off, size), dst)
        # FileStreamSource orders micro-batches by mtime: pin strictly
        # increasing stamps (same discipline as heartbeat_stream)
        os.utime(dst, (1_000_000_000 + b * 100, 1_000_000_000 + b * 100))
        off += size
    schema = spark.read.parquet(os.path.join(tmp, "part-001.parquet")).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(tmp)
    )


def stream_near_dedup_sql(
    table: str = "documents",
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
) -> str:
    """DuckDB oracle: the survivors are exactly the ids that never
    appear as the LATER side of a Hamming-closure pair — the pair
    enumeration replays :func:`..pipeline.dedup.simhash_pairs_sql`
    (same fingerprints, same banding), so the hash gates fingerprints
    AND the arrival-order drop rule."""
    fp = simhash64_sql(table, text_col, id_col)
    pairs = simhash_pairs_sql(table, text_col, id_col, max_hamming)
    return f"""
    WITH fp AS ({fp}),
    pairs AS ({pairs})
    SELECT fp.{id_col} AS doc_id, fp.simhash
    FROM fp
    WHERE fp.{id_col} NOT IN (SELECT id_b FROM pairs)
    """
