"""Streaming near-duplicate dedup (streaming/neardedup.py): cross-batch
state behavior the gate corpus cannot isolate — a later batch's doc
dropped by an arrival two batches earlier, dropped-arrival poisoning,
and the batch-internal id-order rule."""

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.dedup import simhash64
from timescaledb_spark.streaming.neardedup import (
    _banded_cross,
    near_dedup_batch,
    staged_id_stream,
    stream_near_dedup,
)


def _run_batches(spark, batches, max_hamming=3):
    """Drive near_dedup_batch over explicit id-ordered batches and
    return (survivor ids, store row count)."""
    work = tempfile.mkdtemp(prefix="ts_nd_test_")
    store = os.path.join(work, "store")
    out = os.path.join(work, "out")
    for rows in batches:
        df = spark.createDataFrame(rows, "doc_id bigint, text string")
        near_dedup_batch(df, store, out, max_hamming=max_hamming)
    kept = {r["doc_id"] for r in spark.read.parquet(out).collect()}
    n_store = spark.read.parquet(store).count()
    return kept, n_store


def test_cross_batch_drop_and_store_growth(spark):
    """An exact re-arrival two batches later is dropped by the store
    join; the store holds every arrival (kept AND dropped)."""
    a = "the quick brown fox jumps over the lazy dog again and again"
    b = "completely different content about spark shuffles and state"
    kept, n_store = _run_batches(
        spark,
        [
            [(1, a)],
            [(2, b)],
            [(3, a)],  # near-dup of id 1, two batches back
        ],
    )
    assert kept == {1, 2}
    assert n_store == 3


def test_dropped_arrival_still_poisons(spark):
    """id 2 drops as a dup of id 1; id 3 (dup of 2, hence of 1) must
    still drop — the comparison set is arrivals, not survivors."""
    t = "some repeated text about banded hamming joins at corpus scale"
    kept, _ = _run_batches(spark, [[(1, t)], [(2, t)], [(3, t)]])
    assert kept == {1}


def test_batch_internal_id_order(spark):
    """Within one batch the smaller id survives regardless of row
    order in the frame."""
    t = "identical identical identical content content content"
    kept, _ = _run_batches(spark, [[(9, t), (2, t), (5, t)]])
    assert kept == {2}


def test_distinct_content_all_survive(spark):
    rows = [
        (1, "alpha bravo charlie delta echo foxtrot golf hotel india"),
        (2, "kilo lima mike november oscar papa quebec romeo sierra"),
        (3, "tango uniform victor whiskey xray yankee zulu one two"),
    ]
    kept, n_store = _run_batches(spark, [rows[:2], rows[2:]])
    assert kept == {1, 2, 3}
    assert n_store == 3


def test_banded_cross_complete_at_radius(spark):
    """_banded_cross finds every in-radius pair (pigeonhole over
    max_hamming + 1 bands), verified against brute force on perturbed
    fingerprints."""
    import random

    rnd = random.Random(1616)
    store_rows, batch_rows = [], []
    for i in range(30):
        h = rnd.getrandbits(59)
        store_rows.append((i, h))
        flip = h
        for _ in range(rnd.randrange(6)):  # 0..5 bits away
            flip ^= 1 << rnd.randrange(60)
        batch_rows.append((1000 + i, flip))
    store = spark.createDataFrame(store_rows, "doc_id bigint, simhash bigint")
    batch = spark.createDataFrame(batch_rows, "doc_id bigint, simhash bigint")
    for k in (0, 3):
        got = {
            r["doc_id"] for r in _banded_cross(batch, store, k).collect()
        }
        want = {
            bi
            for bi, bh in batch_rows
            if any(bin(bh ^ sh).count("1") <= k for _, sh in store_rows)
        }
        assert got == want, k


def test_staged_stream_replays_in_id_order(spark, sf_dir):
    """staged_id_stream files partition the id domain in order: every
    id in file k is below every id in file k+1."""
    sdf = staged_id_stream(spark, sf_dir, n_batches=3)
    out = stream_near_dedup(sdf, max_hamming=0)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # radius 0 == exact-fingerprint dedup: survivors unique by simhash,
    # and the kept id per fingerprint is the minimum id
    fps = simhash64(docs.select("doc_id", "text"))
    want = {
        r["doc_id"]
        for r in fps.groupBy("simhash").agg(F.min("doc_id").alias("doc_id")).collect()
    }
    got = {r["doc_id"] for r in out.collect()}
    assert got == want
