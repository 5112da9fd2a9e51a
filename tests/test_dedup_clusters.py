"""Connected-component duplicate clustering (alternating large/small
star) vs a pure-Python union-find reference, including chain graphs
that need multiple rounds to converge."""

import random

import pytest
from pyspark.sql import functions as F

from timescaledb_spark.pipeline.dedup import dup_clusters, keep_canonical


def _uf_reference(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    got = {
        (r["member"], r["cluster_id"])
        for r in dup_clusters(df).collect()
    }
    want = set(_uf_reference(pairs).items())
    assert got == want


def test_single_pair(spark):
    _check(spark, [(1, 2)])


def test_long_chain_needs_multiple_rounds(spark):
    # path graph 0-1-2-...-63: worst case for label propagation;
    # star rounds must still converge to root 0
    _check(spark, [(i, i + 1) for i in range(63)])


def test_reverse_chain_and_disjoint(spark):
    pairs = [(i + 1, i) for i in range(20)] + [(100, 101), (101, 102), (200, 201)]
    _check(spark, pairs)


def test_random_graph_matches_union_find(spark):
    rng = random.Random(7)
    nodes = list(range(300))
    pairs = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(250)
    ]
    pairs = [(a, b) for a, b in pairs if a != b]
    _check(spark, pairs)


def test_keep_canonical(spark):
    docs = spark.range(10).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2), (2, 5), (7, 8)], "id_a long, id_b long"
    )
    clusters = dup_clusters(pairs)
    kept = sorted(
        r["doc_id"] for r in keep_canonical(docs, clusters).collect()
    )
    # 2, 5 collapse into 1; 8 into 7
    assert kept == [0, 1, 3, 4, 6, 7, 9]
