"""hash_features (round-8 feature-hashing featurizer) unit edges; the
corpus-level oracle match lives in the q_text_hash_features gate."""

from pyspark.sql import functions as F

from timescaledb_spark.pipeline.textproc import FEAT_DIM, hash_features


def test_hash_features_counts_and_edges(spark):
    df = spark.createDataFrame(
        [(1, "abcabc"), (2, "ab"), (3, ""), (4, None), (5, "abc")],
        "doc_id long, text string",
    )
    out = hash_features(df).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], {})[r["bucket"]] = r["cnt"]
    # "abcabc" has 4 grams: abc, bca, cab, abc -> abc counted twice
    assert sum(by_doc[1].values()) == 4 and max(by_doc[1].values()) == 2
    # texts shorter than the gram size (and NULLs) produce no rows
    assert 2 not in by_doc and 3 not in by_doc and 4 not in by_doc
    # single gram, bucket = polynomial of codepoints mod dim
    key = (ord("a") * 65536 + ord("b") * 256 + ord("c")) % FEAT_DIM
    assert by_doc[5] == {key: 1}
    # all buckets within range
    assert all(0 <= r["bucket"] < FEAT_DIM for r in out)


def test_hash_features_plan_is_narrow(spark, tmp_path):
    """The parquet scan must prune to (id, text): payload-style wide
    columns never reach the explode."""
    from timescaledb_spark.plans import read_schema_columns

    p = str(tmp_path / "docs")
    spark.createDataFrame(
        [(1, "hello world", "x" * 100)], "doc_id long, text string, extra string"
    ).write.parquet(p)
    out = hash_features(spark.read.parquet(p))
    cols = read_schema_columns(out)
    assert "extra" not in cols and "text" in cols
