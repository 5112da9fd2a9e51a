"""Product quantization ANN tier (pipeline/similarity.py): 32x vector
compression with ADC scans. Validated by recall against the exact
brute-force baseline — the honest check for an approximate index
(Faiss-style PQ has no SQL oracle)."""

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.similarity import (
    knn_bruteforce,
    knn_pq,
    pq_encode,
    pq_train,
)
from timescaledb_spark.sources import load_table


@pytest.fixture(scope="module")
def emb(spark, sf_dir):
    return load_table(spark, sf_dir, "embeddings")


def test_pq_roundtrip_shapes(emb):
    books = pq_train(emb, m=8, n_codes=16, sample=256)
    assert books.shape == (8, 16, 8)  # 64-dim / 8 subspaces
    codes = pq_encode(emb, books)
    row = codes.first()
    assert len(row["codes"]) == 8
    assert all(0 <= c < 16 for c in row["codes"])
    assert codes.count() == emb.count()


def test_pq_recall_vs_bruteforce(emb, spark):
    books = pq_train(emb, m=16, n_codes=32, sample=512, iters=12)
    codes = pq_encode(emb, books)
    queries = emb.filter(F.col("vec_id") < 8)
    exact = knn_bruteforce(emb, queries, k=10)
    approx = knn_pq(codes, queries, books, k=10)
    e = {}
    for r in exact.collect():
        e.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    a = {}
    for r in approx.collect():
        a.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recalls = [len(e[q] & a.get(q, set())) / len(e[q]) for q in e]
    mean_recall = sum(recalls) / len(recalls)
    # the synthetic embeddings are near-uniform, where distances
    # concentrate and ANY quantizer's recall is capped; chance recall
    # is 10/500 = 0.02, so >= 0.35 is a strong signal the ADC ranking
    # tracks the true cosine ranking
    assert mean_recall >= 0.35, f"mean recall@10 {mean_recall:.2f}"


def test_pq_deterministic(emb):
    b1 = pq_train(emb, m=4, n_codes=8, sample=128, seed=7)
    b2 = pq_train(emb, m=4, n_codes=8, sample=128, seed=7)
    import numpy as np

    assert np.array_equal(b1, b2)


def test_pq_dim_validation(emb):
    with pytest.raises(ValueError, match="divisible"):
        pq_train(emb, m=7, n_codes=8, sample=64)
