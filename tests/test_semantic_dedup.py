"""SemDeDup (pipeline/dedup.py semantic_dedup + kmeans_refine):
cluster-scoped dedup semantics and Lloyd refinement behavior."""

import numpy as np
import pandas as pd
import pytest

from timescaledb_spark.pipeline.dedup import kmeans_refine, semantic_dedup


def _mkdf(spark, vecs):
    pdf = pd.DataFrame(
        {"vec_id": range(len(vecs)), "embedding": [list(map(float, v)) for v in vecs]}
    )
    return spark.createDataFrame(pdf, "vec_id long, embedding array<double>")


def test_within_cluster_only(spark):
    """Near-identical vectors in DIFFERENT clusters are both kept —
    the SemDeDup contract (and its known recall trade-off)."""
    # centroids = ids 0 and 2 (stride 2); 0/1 near +x, 2/3 near +y
    vecs = [
        [1.0, 0.01], [1.0, 0.02],   # cluster of centroid 0, near-dups
        [0.01, 1.0], [0.02, 1.0],   # cluster of centroid 2, near-dups
    ]
    out = (
        semantic_dedup(_mkdf(spark, vecs), threshold=0.99, centroid_stride=2)
        .toPandas()
        .set_index("vec_id")
        .sort_index()
    )
    # keep-first within each cluster: 0 keeps, 1 drops; 2 keeps, 3 drops
    assert out.loc[0, "is_kept"] and not out.loc[1, "is_kept"]
    assert out.loc[2, "is_kept"] and not out.loc[3, "is_kept"]
    assert out.loc[0, "centroid_id"] == 0 and out.loc[2, "centroid_id"] == 2
    # cross-cluster near-dup is NOT considered
    v5 = [[1.0, 0.01], [0.9999, 0.0102], [0.01, 1.0], [-1.0, 0.0]]
    out2 = (
        semantic_dedup(_mkdf(spark, v5), threshold=0.99, centroid_stride=2)
        .toPandas()
        .set_index("vec_id")
    )
    # ids 0,1 same cluster (centroid 0) -> 1 dropped; 2,3 kept
    assert not out2.loc[1, "is_kept"]
    assert out2.loc[2, "is_kept"] and out2.loc[3, "is_kept"]


def test_keep_first_transitivity_is_pairwise(spark):
    """Dropping is pairwise vs ANY smaller same-cluster id, matching the
    oracle's EXISTS semantics (not a chain/cluster closure)."""
    vecs = [[1.0, 0.0], [1.0, 0.001], [1.0, 0.002]]
    out = (
        semantic_dedup(_mkdf(spark, vecs), threshold=0.999, centroid_stride=10)
        .toPandas()
        .set_index("vec_id")
    )
    assert out.loc[0, "is_kept"]
    assert not out.loc[1, "is_kept"] and not out.loc[2, "is_kept"]


def test_custom_centroids(spark):
    df = _mkdf(spark, [[1.0, 0.0], [0.0, 1.0]])
    cents = spark.createDataFrame(
        [(7, [1.0, 0.0]), (9, [0.0, 1.0])], "centroid_id long, cvec array<double>"
    )
    out = (
        semantic_dedup(df, threshold=0.99, centroids=cents)
        .toPandas()
        .set_index("vec_id")
    )
    assert out.loc[0, "centroid_id"] == 7 and out.loc[1, "centroid_id"] == 9
    assert out.is_kept.all()


def test_kmeans_refine_converges(spark):
    """Two well-separated blobs: refined centroids move to the blob
    means (cosine direction), and refinement reduces assignment churn."""
    rng = np.random.default_rng(7)
    a = rng.normal([5, 0, 0], 0.1, (40, 3))
    b = rng.normal([0, 5, 0], 0.1, (40, 3))
    vecs = np.vstack([a, b])
    order = rng.permutation(len(vecs))
    df = _mkdf(spark, vecs[order])
    seed = spark.createDataFrame(
        [(0, [1.0, 0.1, 0.0]), (1, [0.1, 1.0, 0.0])],
        "centroid_id long, cvec array<double>",
    )
    ref = kmeans_refine(df, seed, iters=3)
    cents = {r["centroid_id"]: np.array(r["cvec"]) for r in ref.collect()}
    c0, c1 = cents[0], cents[1]
    # each refined centroid is the mean of its blob: dominant axis matches
    assert c0[0] > 10 * abs(c0[1]) and c1[1] > 10 * abs(c1[0])
    # refined centroids feed semantic_dedup cleanly
    out = semantic_dedup(df, threshold=0.999, centroids=ref).toPandas()
    assert set(out.centroid_id.unique()) == {0, 1}


def test_kmeans_refine_empty_cluster_keeps_seed(spark):
    df = _mkdf(spark, [[1.0, 0.0], [0.99, 0.01]])
    seed = spark.createDataFrame(
        [(0, [1.0, 0.0]), (1, [-1.0, 0.0])], "centroid_id long, cvec array<double>"
    )
    ref = kmeans_refine(df, seed, iters=2)
    cents = {r["centroid_id"]: r["cvec"] for r in ref.collect()}
    assert cents[1] == [-1.0, 0.0]  # nothing assigned -> unchanged


def test_empty_stride_pick_raises(spark):
    df = _mkdf(spark, [[1.0, 0.0], [0.0, 1.0]])
    df = df.withColumn("vec_id", df.vec_id + 1)  # ids 1,2: no id % 50 == 0
    with pytest.raises(ValueError, match="centroid"):
        semantic_dedup(df, centroid_stride=50)


def test_zero_norm_vector_is_similar_to_nothing(spark):
    """ANSI mode must not abort on a zero embedding (probe finding r9):
    cosine yields NULL (DuckDB x/0.0 parity), so the zero vector is
    kept and drops nothing."""
    vecs = [[1.0, 0.0], [1.0, 0.001], [0.0, 0.0]]
    out = (
        semantic_dedup(_mkdf(spark, vecs), threshold=0.9, centroid_stride=10)
        .toPandas()
        .set_index("vec_id")
    )
    assert len(out) == 3
    assert out.loc[2, "is_kept"]  # zero vector: near-dup of nothing
    assert not out.loc[1, "is_kept"]  # real near-dups still drop


def test_numpy_assignment_matches_expr(spark):
    """The production Arrow-batched matmul path assigns and dedups
    identically to the oracle-exact expression path on well-separated
    data (ulp score differences can't flip these argmaxes)."""
    rng = np.random.default_rng(11)
    vecs = rng.normal(0, 1, (60, 8))
    vecs[7] = vecs[3] * 1.0001  # a planted near-dup pair
    df = _mkdf(spark, vecs)
    a = (
        semantic_dedup(df, threshold=0.98, centroid_stride=20, assign="expr")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    b = (
        semantic_dedup(df, threshold=0.98, centroid_stride=20, assign="numpy")
        .toPandas().sort_values("vec_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)
    assert not a.loc[7, "is_kept"] or not a.loc[3, "is_kept"]
