"""Release-to-release corpus diff — pipeline/export.py corpus_diff
(round 16)."""

from pyspark.sql import functions as F

from timescaledb_spark.pipeline.export import corpus_diff
from timescaledb_spark.sources import load_table


def test_corpus_diff_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id long, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id long, text string"
    )
    res = {r["doc_id"]: r for r in corpus_diff(old, new).collect()}
    assert res[1]["status"] == "unchanged"
    assert res[2]["status"] == "changed"
    assert res[3]["status"] == "removed" and res[3]["new_hash"] is None
    assert res[4]["status"] == "added" and res[4]["old_hash"] is None
    assert len(res) == 4


def test_corpus_diff_identity(spark, sf_dir):
    """Diffing a corpus against itself is all-unchanged."""
    docs = load_table(spark, sf_dir, "documents")
    res = corpus_diff(docs, docs)
    assert res.count() == docs.count()
    assert res.filter(F.col("status") != "unchanged").count() == 0
